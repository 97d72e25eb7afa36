"""Generic iterative fixpoint driver with lineage truncation and
checkpoint/resume.

This is the Spark analog of LLAMA's level-synchronized traversal loop
(ll_bfs_template.h:170-292) and the streaming batch loop
(benchmark.cc:1786-1893): the state is a DataFrame keyed by node id, each
iteration is one declarative plan (join + groupBy shuffle), and the driver
loop is the only sequential point.

Scale notes (the two things that kill naive iterative Spark jobs):
- **lineage blowup** — every iteration's plan references the previous one;
  after ~20 iterations analysis time dominates. We truncate with
  ``localCheckpoint(eager=True)`` each iteration and a durable parquet
  checkpoint every ``checkpoint_every`` iterations.
- **resume** — the durable checkpoint is a parquet snapshot of the state
  plus a JSON manifest carrying lineage (iteration number, parent pointer)
  and per-iteration / per-partition metrics, so an interrupted run resumes
  bit-identically (north-rule resumability; LLAMA analog: snapshot levels,
  ll_mlcsr_sp.h:624-713).
"""

from __future__ import annotations

import json
import os
import time
from collections.abc import Callable
from dataclasses import asdict, dataclass, field

from pyspark.sql import DataFrame

MANIFEST = "manifest.json"


@dataclass
class IterationMetrics:
    iteration: int
    seconds: float
    rows: int
    updated: int | None = None  # convergence delta, if the kernel tracks one
    checkpoint_path: str | None = None
    partition_rows: list[int] | None = None  # per-partition state sizes


@dataclass
class FixpointResult:
    state: DataFrame
    iterations: int
    converged: bool
    metrics: list[IterationMetrics] = field(default_factory=list)


def _write_manifest(checkpoint_dir: str, entries: list[dict]) -> None:
    tmp = os.path.join(checkpoint_dir, MANIFEST + ".tmp")
    with open(tmp, "w") as f:
        json.dump({"version": 1, "iterations": entries}, f, indent=1)
    os.replace(tmp, os.path.join(checkpoint_dir, MANIFEST))


def read_manifest(checkpoint_dir: str) -> list[dict]:
    path = os.path.join(checkpoint_dir, MANIFEST)
    if not os.path.exists(path):
        return []
    with open(path) as f:
        return json.load(f)["iterations"]


def iterate(
    state: DataFrame,
    step: Callable[[DataFrame, int], DataFrame],
    max_iter: int,
    updated_count: Callable[[DataFrame, DataFrame], int] | None = None,
    checkpoint_dir: str | None = None,
    checkpoint_every: int = 5,
    resume: bool = False,
    name: str = "fixpoint",
) -> FixpointResult:
    """Run ``state ← step(state, i)`` until convergence or ``max_iter``.

    ``updated_count(prev, new)`` — optional convergence probe returning the
    number of changed rows; 0 stops the loop. When None the loop always runs
    exactly ``max_iter`` iterations (LLAMA's fixed-iteration PageRank mode,
    pagerank.h:117: ``while (cnt < max)``).
    """
    spark = state.sparkSession
    entries: list[dict] = []
    start_iter = 0

    if checkpoint_dir:
        os.makedirs(checkpoint_dir, exist_ok=True)
        if resume:
            entries = read_manifest(checkpoint_dir)
            done = [e for e in entries if e.get("checkpoint_path")]
            if done:
                last = done[-1]
                state = spark.read.parquet(last["checkpoint_path"])
                start_iter = last["iteration"] + 1
                entries = [e for e in entries if e["iteration"] < start_iter]

    # The state snapshot lives in the localCheckpoint blocks (MEMORY_AND_DISK)
    # — no extra persist layer, or every iteration double-stores the state
    # and the stale blocks pile up faster than the ContextCleaner drops them.
    state = state.localCheckpoint(eager=True)
    metrics: list[IterationMetrics] = []
    converged = False
    it = start_iter - 1

    for it in range(start_iter, max_iter):
        t0 = time.time()
        new_state = step(state, it)
        # Truncate lineage: materialize this iteration's plan now. The eager
        # checkpoint is the ONLY mandatory job per iteration; row counts are
        # taken opportunistically (state size never changes in these kernels)
        # to keep fixed-iteration kernels at one job per iteration.
        new_state = new_state.localCheckpoint(eager=True)
        rows = -1

        updated = None
        if updated_count is not None:
            updated = updated_count(state, new_state)

        m = IterationMetrics(iteration=it, seconds=time.time() - t0, rows=rows, updated=updated)

        if checkpoint_dir and (it % checkpoint_every == checkpoint_every - 1 or it == max_iter - 1):
            rows = new_state.count()
            path = os.path.join(checkpoint_dir, f"iter_{it:05d}")
            new_state.write.mode("overwrite").parquet(path)
            # durable state replaces the in-memory one (also frees executor mem)
            new_state = spark.read.parquet(path)
            m.rows = rows
            m.checkpoint_path = path
            from pyspark.sql import functions as F

            m.partition_rows = [
                r["count"]
                for r in new_state.groupBy(F.spark_partition_id().alias("pid"))
                .count()
                .orderBy("pid")
                .collect()
            ]

        state.unpersist()  # drop the previous iteration's checkpoint blocks
        state = new_state
        metrics.append(m)
        entries.append({k: v for k, v in asdict(m).items() if v is not None} | {"name": name})
        if checkpoint_dir:
            _write_manifest(checkpoint_dir, entries)

        if updated is not None and updated == 0:
            converged = True
            break

    return FixpointResult(
        state=state, iterations=it + 1 - 0, converged=converged, metrics=metrics
    )
