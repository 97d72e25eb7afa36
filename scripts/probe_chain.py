"""Probe: does chaining K fixpoint iterations into ONE materialization job
beat the measured ~1.1s/job floor at sf0.1? (guide §1 — measure first.)

Runs the pagerank pull recurrence (dangling-lost, the bench kernel) with
materialization every K iterations, K in {1, 2, 4, 8}, twice each, and
compares wall time and the 6dp-rounded final ranks against K=1.

Usage: python scripts/probe_chain.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    from llama_spark.entry_queries import load_edges
    from llama_spark.graph import DST, SRC, nodes_of
    from llama_spark.session import get_spark

    spark = get_spark(app_name="probe_chain", cores=32, shuffle_partitions=32)
    edges = load_edges(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()

    p = 32
    nodes = nodes_of(edges).repartition(p, "id").persist(StorageLevel.MEMORY_AND_DISK)
    n = nodes.count()
    out_deg = edges.groupBy(SRC).agg(F.count("*").alias("od"))
    edges_inv = (
        edges.select(SRC, DST)
        .join(out_deg, SRC)
        .select(SRC, DST, (F.lit(1.0) / F.col("od")).alias("inv_deg"))
        .repartition(p, SRC)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    edges_inv.count()
    damping, max_iter = 0.85, 10
    base = (1.0 - damping) / n

    def step(ranks):
        contribs = (
            F.broadcast(ranks)
            .join(edges_inv, ranks["id"] == edges_inv[SRC])
            .select(F.col(DST).alias("id"), (F.col("rank") * F.col("inv_deg")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("contrib"))
        )
        new_rank = F.lit(base) + F.lit(damping) * F.coalesce("contrib", F.lit(0.0))
        return nodes.join(F.broadcast(contribs), "id", "left").select(
            "id", new_rank.alias("rank")
        )

    def run(chain: int) -> tuple[float, str]:
        state = nodes.select("id", F.lit(1.0 / n).alias("rank")).localCheckpoint(
            eager=True
        )
        t0 = time.time()
        it = 0
        while it < max_iter:
            k = min(chain, max_iter - it)
            new_state = state
            for _ in range(k):
                new_state = step(new_state)
            new_state = new_state.localCheckpoint(eager=True)
            state = new_state
            it += k
        dt = time.time() - t0
        sig = (
            state.select(F.sum(F.round("rank", 6)).alias("s"))
            .collect()[0]["s"]
        )
        return dt, f"{sig:.9f}"

    def loadavg() -> float:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])

    # warm-up (JIT, cache population)
    run(1)
    results = {}
    for rep in range(2):
        for k in (1, 2, 4, 8):
            la0 = loadavg()
            dt, sig = run(k)
            results.setdefault(k, []).append(dt)
            print(f"chain={k} rep={rep}: {dt:.2f}s sig={sig} load={la0:.1f}", flush=True)
    print({k: [round(v, 2) for v in vs] for k, vs in results.items()})
    spark.stop()


if __name__ == "__main__":
    main()
