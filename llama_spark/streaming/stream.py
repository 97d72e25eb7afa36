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


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "5 minutes",
    slide: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Event-time windowed aggregation with late-data handling — the
    streaming counterpart of q_event_window_counts. The watermark bounds
    state: windows older than (max event time − watermark) finalize and
    evict; later-than-watermark events drop (documented Structured
    Streaming semantics; the reference's count-window has no event-time
    notion, so this is mandate surface beyond the reference)."""
    from pyspark.sql import functions as F

    w = F.window("ts", window, slide) if slide else F.window("ts", window)
    return (
        events_stream.withWatermark("ts", watermark)
        .groupBy(w.alias("win"), "event_type")
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("win_start"),
            F.col("win.end").alias("win_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


SESSION_STATE_SCHEMA = "last_ts long, session_no long"
SESSION_OUT_SCHEMA = (
    "user_id long, session_no long, n_events long, start_s long, end_s long"
)


def sessionize_stream(
    events_stream: DataFrame,
    gap_seconds: int = 1800,
    timeout_seconds: int | None = None,
):
    """Custom stateful operator: per-user streaming sessionization via
    ``applyInPandasWithState`` (GroupState keyed by user_id). Each
    micro-batch's events extend the user's open session or start a new one
    after ``gap_seconds`` of inactivity. Emits one row per (user, session)
    touched in the batch — the streaming analog of q_event_sessions' window
    plan; consumers aggregate partial rows by (user_id, session_no).

    ``timeout_seconds`` (None = keep state forever) arms a processing-time
    timeout that evicts idle users' state — use it in long-running
    production queries; tests leave it off because the eviction trigger
    fires on wall-clock time, which ``processAllAvailable`` does not wait
    through deterministically.

    Within-batch semantics match the batch sessionizer exactly: the group's
    whole micro-batch is materialized and sorted on ts once before the scan
    (applyInPandasWithState delivers a group as multiple UNORDERED Arrow
    chunks — sorting per chunk would scan events out of global ts order and
    silently merge sessions across a negative gap). Per-user-per-batch data
    must therefore fit in one executor's memory — fine: a single user's
    events in one micro-batch are bounded by the trigger interval."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        import pandas as pd

        (user_id,) = key
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            last_ts, session_no = state.get
        else:
            last_ts, session_no = None, 0
        rows = []
        cur = None  # (session_no, n, start, end)
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if chunks:
            pdf = pd.concat(chunks).sort_values("ts_s")
            for ts in pdf["ts_s"]:
                ts = int(ts)
                if last_ts is None or ts - last_ts > gap_seconds:
                    if cur is not None:
                        rows.append(cur)
                    session_no += 1
                    cur = [session_no, 0, ts, ts]
                elif cur is None:
                    # continuing the session opened in a previous batch
                    cur = [session_no, 0, ts, ts]
                cur[1] += 1
                cur[3] = max(cur[3], ts)
                last_ts = ts
        if cur is not None:
            rows.append(cur)
        state.update((last_ts, session_no))
        if timeout_seconds is not None:
            state.setTimeoutDuration(timeout_seconds * 1000)
        if rows:
            yield pd.DataFrame(
                {
                    "user_id": [user_id] * len(rows),
                    "session_no": [r[0] for r in rows],
                    "n_events": [r[1] for r in rows],
                    "start_s": [r[2] for r in rows],
                    "end_s": [r[3] for r in rows],
                }
            )

    from pyspark.sql import functions as F

    prepped = events_stream.select(
        "user_id", F.col("ts").cast("timestamp").cast("long").alias("ts_s")
    )
    conf = (
        GroupStateTimeout.ProcessingTimeTimeout
        if timeout_seconds is not None
        else GroupStateTimeout.NoTimeout
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=conf,
    )


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


def dedup_stream(
    events_stream: DataFrame,
    key_cols: list[str],
    watermark: str = "10 minutes",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming exact deduplication with BOUNDED state:
    ``dropDuplicatesWithinWatermark`` keeps only the first occurrence of
    each key within the watermark horizon, and evicts key state older
    than (max event time − watermark) — the streaming counterpart of the
    batch exact-dedup stage (functions/dedup.exact_duplicates). Unbounded
    ``dropDuplicates`` on a stream grows state forever; the watermark
    variant is the only shape that survives an unbounded ingest at
    100 TB/day (duplicates further apart than the horizon pass — that is
    the documented, bounded-memory trade)."""
    return events_stream.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        key_cols
    )


def enrich_stream(events_stream: DataFrame, dim: DataFrame, key: str = "user_id") -> DataFrame:
    """Stream-static enrichment join — the dimension table is a plain
    batch DataFrame broadcast into every micro-batch (Structured
    Streaming re-evaluates the static side per batch, so a refreshed
    dimension view is picked up without restarting the query). LEFT join:
    unmatched stream rows pass through with NULL attributes — an
    enrichment must never drop facts."""
    from pyspark.sql import functions as F

    return events_stream.join(F.broadcast(dim), key, "left")


def attribute_clicks(
    views: DataFrame,
    clicks: DataFrame,
    key: str = "user_id",
    gap_sec: int = 600,
    watermark: str = "30 minutes",
) -> DataFrame:
    """Stream-STREAM interval join — view-to-click attribution: pair each
    click with the views by the same key at most ``gap_sec`` seconds
    earlier. Both sides carry the watermark, which is what lets the
    engine BOUND the join state: a buffered view can be evicted once the
    click-side watermark passes view_ts + gap (the documented
    stream-stream inner-join state contract). Returns
    [key, view_ts, click_ts, value].

    The reference's streaming loop re-runs batch kernels per window
    (benchmark.cc:1080-1140); event-time stream-stream joins are mandate
    surface beyond it."""
    from pyspark.sql import functions as F

    v = views.select(
        F.col(key), F.col("ts").alias("view_ts")
    ).withWatermark("view_ts", watermark)
    c = clicks.select(
        F.col(key).alias("_k"), F.col("ts").alias("click_ts"), "value"
    ).withWatermark("click_ts", watermark)
    return v.join(
        c,
        (F.col(key) == F.col("_k"))
        & (F.col("click_ts") >= F.col("view_ts"))
        & (
            F.col("click_ts")
            <= F.col("view_ts") + F.expr(f"INTERVAL {int(gap_sec)} SECONDS")
        ),
        "inner",
    ).select(key, "view_ts", "click_ts", "value")
