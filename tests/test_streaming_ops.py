"""Event-time streaming operators: watermark windowing + stateful
sessionization (mandate surface beyond the reference's count-window;
reference streaming loop itself is covered in test_snapshots.py)."""

from __future__ import annotations

import pyspark.sql.types as T
from pyspark.sql import functions as F

EVENTS_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)


def _write_batch(spark, path, rows):
    df = spark.createDataFrame(rows, "user_id long, ts_s long, event_type string, value double")
    df.select(
        "user_id", F.to_timestamp(F.from_unixtime("ts_s")).alias("ts"), "event_type", "value"
    ).coalesce(1).write.mode("append").parquet(path)


def test_windowed_counts_watermark_drops_late(spark, tmp_path):
    """Append mode emits only watermark-finalized windows; an event arriving
    later than the watermark is dropped from its (already final) window."""
    from llama_spark.streaming.stream import windowed_event_counts

    src = str(tmp_path / "ev")
    m = 60
    # batch 1: three events in [0,5m) + one at 60m (advances watermark to 50m)
    _write_batch(
        spark,
        src,
        [(1, 0 * m, "a", 1.0), (1, 1 * m, "a", 1.0), (2, 4 * m, "a", 1.0), (1, 60 * m, "a", 1.0)],
    )
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        windowed_event_counts(stream, window="5 minutes", watermark="10 minutes")
        .writeStream.format("memory")
        .queryName("win_counts")
        .outputMode("append")
        .start(checkpointLocation=str(tmp_path / "ck"))
    )
    try:
        q.processAllAvailable()
        # batch 2: a LATE event for the finalized [0,5m) window + one fresh
        _write_batch(spark, src, [(3, 2 * m, "a", 1.0), (1, 61 * m, "a", 1.0)])
        q.processAllAvailable()
        got = {
            (r["win_start"].minute + r["win_start"].hour * 60, r["n"])
            for r in spark.sql("SELECT * FROM win_counts").collect()
        }
    finally:
        q.stop()
    # [0,5m) finalized with the 3 on-time events; the late 4th was dropped;
    # [60,65m) not yet emitted (watermark hasn't passed it)
    assert (0, 3) in got
    assert all(start != 60 for start, _ in got)


def test_sessionize_stream_state_across_batches(spark, tmp_path):
    """applyInPandasWithState sessionizer: gap within a batch starts a new
    session; state (last_ts, session_no) carries across micro-batches."""
    from llama_spark.streaming.stream import sessionize_stream

    src = str(tmp_path / "ev2")
    _write_batch(spark, src, [(7, 0, "a", 1.0), (7, 100, "a", 1.0)])
    stream = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(src)
    )
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .start(checkpointLocation=str(tmp_path / "ck2"))
    )
    try:
        q.processAllAvailable()
        # batch 2: one event continuing session 1, one far gap → session 2
        _write_batch(spark, src, [(7, 200, "a", 1.0), (7, 5000, "a", 1.0)])
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sessions ORDER BY session_no, start_s").collect()
    finally:
        q.stop()
    per_session = {}
    for r in rows:
        k = (r["user_id"], r["session_no"])
        n, lo, hi = per_session.get(k, (0, None, None))
        per_session[k] = (
            n + r["n_events"],
            r["start_s"] if lo is None else min(lo, r["start_s"]),
            r["end_s"] if hi is None else max(hi, r["end_s"]),
        )
    # session 1: events at 0, 100, 200 (continued across the batch boundary)
    assert per_session[(7, 1)] == (3, 0, 200)
    # session 2: the 5000s event (gap 4800 > 1800)
    assert per_session[(7, 2)] == (1, 5000, 5000)


def test_sessionize_stream_multi_chunk_group_sorted_once(spark, tmp_path):
    """A group's micro-batch arrives as multiple unordered Arrow chunks;
    the sessionizer must sort the WHOLE group, not each chunk. Force
    1-row chunks and feed events out of ts order in one batch — per-chunk
    sorting would scan 100, 0, 200 and report session start 100."""
    from llama_spark.streaming.stream import sessionize_stream

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", "10000")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    src = str(tmp_path / "ev3")
    _write_batch(spark, src, [(9, 100, "a", 1.0), (9, 0, "a", 1.0), (9, 200, "a", 1.0)])
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    q = (
        sessionize_stream(stream, gap_seconds=1800)
        .writeStream.format("memory")
        .queryName("sessions_mc")
        .outputMode("append")
        .start(checkpointLocation=str(tmp_path / "ck3"))
    )
    try:
        q.processAllAvailable()
        rows = spark.sql("SELECT * FROM sessions_mc").collect()
    finally:
        q.stop()
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert len(rows) == 1
    r = rows[0]
    assert (r["session_no"], r["n_events"], r["start_s"], r["end_s"]) == (1, 3, 0, 200)


def test_dedup_stream_drops_repeats_keeps_state_bounded(spark, tmp_path):
    """dropDuplicatesWithinWatermark: repeats inside the horizon are
    dropped (across batches — state persists), and a repeat far beyond
    the watermark horizon passes (its key state was evicted)."""
    from llama_spark.streaming.stream import dedup_stream

    src = str(tmp_path / "src")
    _write_batch(spark, src, [(1, 1000, "click", 1.0), (1, 1000, "click", 1.0),
                              (2, 1010, "view", 2.0)])
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    out = dedup_stream(stream, ["user_id", "event_type"], watermark="10 minutes")
    q = (
        out.writeStream.format("memory")
        .queryName("dedup_sink")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        q.processAllAvailable()
        # same key again in a second batch, still inside the horizon → dropped
        _write_batch(spark, src, [(1, 1200, "click", 9.0), (3, 1210, "view", 3.0)])
        q.processAllAvailable()
        rows = spark.sql("SELECT user_id, event_type FROM dedup_sink").collect()
        got = sorted((r["user_id"], r["event_type"]) for r in rows)
        assert got == [(1, "click"), (2, "view"), (3, "view")]
        # advance event time far past the horizon, then repeat user 1:
        # the evicted key passes again (bounded-state semantics)
        _write_batch(spark, src, [(9, 99000, "tick", 0.0)])
        q.processAllAvailable()
        _write_batch(spark, src, [(1, 99010, "click", 5.0)])
        q.processAllAvailable()
        rows = spark.sql(
            "SELECT user_id, event_type FROM dedup_sink WHERE user_id = 1"
        ).collect()
        assert len(rows) == 2  # original + post-eviction repeat
    finally:
        q.stop()


def test_enrich_stream_static_broadcast(spark, tmp_path):
    from llama_spark.streaming.stream import enrich_stream

    src = str(tmp_path / "ev")
    out = []
    _write_batch(spark, src, [(1, 100, "click", 1.0), (2, 200, "view", 2.0)])
    dim = spark.createDataFrame(
        [(1, "pro")], "user_id long, tier string"
    )
    stream = spark.readStream.schema(EVENTS_SCHEMA).parquet(src)
    q = (
        enrich_stream(stream, dim)
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    rows = {r["user_id"]: r["tier"] for r in spark.sql("select * from enriched").collect()}
    assert rows == {1: "pro", 2: None}  # left join keeps unmatched facts


def test_attribute_clicks_stream_stream_interval_join(spark, tmp_path):
    from llama_spark.streaming.stream import attribute_clicks

    vsrc, csrc = str(tmp_path / "views"), str(tmp_path / "clicks")
    _write_batch(spark, vsrc, [(1, 1000, "view", 0.0), (2, 5000, "view", 0.0)])
    _write_batch(
        spark, csrc,
        [
            (1, 1300, "click", 9.0),   # 300s after view → attributed
            (1, 2000, "click", 7.0),   # 1000s after → outside gap
            (2, 4000, "click", 5.0),   # before the view → not attributed
        ],
    )
    views = spark.readStream.schema(EVENTS_SCHEMA).parquet(vsrc)
    clicks = spark.readStream.schema(EVENTS_SCHEMA).parquet(csrc)
    q = (
        attribute_clicks(views, clicks, gap_sec=600)
        .writeStream.format("memory")
        .queryName("attributed")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.sql("select * from attributed").collect()
    assert [(r["user_id"], r["value"]) for r in rows] == [(1, 9.0)]


def test_streaming_pagerank_warm_start_over_store_levels(spark, tmp_path):
    """The LLAMA streaming loop end-to-end: append a batch as a snapshot
    level, run PageRank on the visible graph, warm-start the NEXT level's
    run from the previous ranks — and land on exactly the ranks a cold
    run on the same level computes (warm start changes cost, never the
    fixpoint; the pagerank_incremental gate's invariant, here composed
    with the versioned store instead of a static table)."""
    from llama_spark.operators.pagerank import pagerank_result
    from llama_spark.streaming.snapshots import VersionedEdgeStore

    store = VersionedEdgeStore(spark, str(tmp_path / "store"))
    b1 = [(0, 1), (1, 2), (2, 0)]
    b2 = [(2, 3), (3, 0), (1, 3)]
    store.append_level(spark.createDataFrame(b1, "src long, dst long"))
    g1 = store.read_at()
    r1 = pagerank_result(g1.select("src", "dst"), max_iter=60, tol=1e-10)

    store.append_level(spark.createDataFrame(b2, "src long, dst long"))
    g2 = store.read_at()
    warm = pagerank_result(
        g2.select("src", "dst"), max_iter=200, tol=1e-10,
        initial_ranks=r1.state.select("id", "rank"),
    )
    cold = pagerank_result(g2.select("src", "dst"), max_iter=200, tol=1e-10)
    w = {r["id"]: r["rank"] for r in warm.state.collect()}
    c = {r["id"]: r["rank"] for r in cold.state.collect()}
    assert set(w) == set(c) == {0, 1, 2, 3}
    for k in w:
        assert abs(w[k] - c[k]) < 1e-8  # same fixpoint to the tol scale
    # NOTE deliberately no iteration-count assertion: warm start
    # guarantees the same fixpoint, not fewer iterations — on this toy
    # the appended batch doubles the graph, so the old ranks are a worse
    # init than uniform (123 vs 78 observed). The cost win appears when
    # deltas are small relative to the graph, which is the streaming
    # regime; the invariant under test is fixpoint identity.
    assert warm.converged and cold.converged


def test_streaming_triangle_maintenance_over_store_levels(spark, tmp_path):
    """Versioned store + incremental triangle maintenance composed: after
    appending a batch level, counting via the batch-path must equal a
    full recount of the visible snapshot — per level."""
    from llama_spark.operators.triangles import (
        triangle_count,
        triangle_count_incremental,
    )
    from llama_spark.streaming.snapshots import VersionedEdgeStore

    store = VersionedEdgeStore(spark, str(tmp_path / "store"))
    batches = [
        [(0, 1), (1, 2), (2, 0)],                    # one triangle
        [(2, 3), (3, 0)],                            # closes a second
        [(1, 3), (4, 0), (4, 1)],                    # closes several more
    ]
    prev = None
    for b in batches:
        bdf = spark.createDataFrame(b, "src long, dst long")
        lvl = store.append_level(bdf)
        cur = store.read_at(lvl).select("src", "dst")
        full = triangle_count(cur)
        if prev is not None:
            inc = triangle_count_incremental(prev, bdf).collect()[0]["triangles"]
            assert inc == full, f"level {lvl}: incremental {inc} != full {full}"
        prev = cur
    assert full == 5  # (0,1,2), (0,2,3), (0,1,3), (1,2,3)? verify below
    # brute check of the final count
    import itertools
    E = {frozenset(e) for b in batches for e in b}
    tri = sum(
        1 for t in itertools.combinations(range(5), 3)
        if all(frozenset(p) in E for p in itertools.combinations(t, 2))
    )
    assert full == tri
