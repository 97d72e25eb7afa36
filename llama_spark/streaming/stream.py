"""Streaming ingestion + sliding-window analytics loop.

The reference's streaming mode (LL_STREAMING, benchmark.cc:1769-1893) pulls
batches of B edges into the writable store, checkpoints a new level, trims
a count-based window of W batches, and re-runs the kernel on each fresh
snapshot. Two Spark-native equivalents:

- ``run_batch_loop``: the deterministic batch driver used by tests and
  benchmarks — identical semantics, no streaming runtime needed.
- ``stream_edges_to_store``: Structured Streaming ``foreachBatch`` into the
  same VersionedEdgeStore (exactly-once per epoch via the manifest commit),
  for when the source actually is a stream. The reference's
  concurrent-load trick (compute on a pinned RO clone while batch k+1
  loads, benchmark.cc:1817-1857) is free here: ``read_at(level)`` is
  immutable, so a kernel can run on level k while foreachBatch commits k+1.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame

from .snapshots import VersionedEdgeStore


def run_batch_loop(
    store: VersionedEdgeStore,
    batches: list[DataFrame],
    kernel: Callable[[DataFrame, int], dict] | None = None,
    window_batches: int = 10,
) -> list[dict]:
    """Ingest batches one by one; after each commit trim the window and run
    ``kernel(snapshot_edges, level)``. Returns one result dict per batch
    (benchmark.cc:1786-1893 shape: load → checkpoint → window → task)."""
    results = []
    for batch in batches:
        level = store.append_level(batch)
        if window_batches is not None and level - window_batches + 1 > 0:
            store.set_min_level(level - window_batches + 1)
        snapshot = store.read_at(level)
        res = {"level": level, "edges": snapshot.count()}
        if kernel is not None:
            res.update(kernel(snapshot, level))
        results.append(res)
    return results


def stream_edges_to_store(
    edges_stream: DataFrame,
    store: VersionedEdgeStore,
    checkpoint_location: str,
    window_batches: int = 10,
):
    """writeStream.foreachBatch appender — each micro-batch becomes one
    snapshot level; retention enforced per commit."""

    def sink(batch_df: DataFrame, epoch_id: int) -> None:
        level = store.append_level(batch_df.select("src", "dst"))
        if window_batches is not None and level - window_batches + 1 > 0:
            store.set_min_level(level - window_batches + 1)

    return (
        edges_stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint_location)
        .foreachBatch(sink)
        .start()
    )
