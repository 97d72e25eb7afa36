"""Temporal (time-respecting) graph reachability.

Reference semantics: LLAMA's whole design centre is multi-version
snapshots of an evolving graph (ll_mlcsr_design.md; writable/ro levels) —
queries over "the graph as of time t". The temporal-paths formulation
here is the streaming-native completion of that idea: instead of
materialising a snapshot per timestamp, treat each edge occurrence as a
timestamped contact (src, dst, t) and compute EARLIEST-ARRIVAL
reachability along time-respecting paths — a path u0→u1→…→uk is valid
iff its contact times are non-decreasing (you cannot traverse a contact
that happened before you arrived). Wu et al., "Path Problems in Temporal
Graphs" (VLDB 2014) is the published algorithmic frame; the
earliest-arrival recurrence is a min-fixpoint exactly like SSSP:

    arr(v) = min( arr(v),  min_{(u,v,t) : t ≥ arr(u)} t )

Spark plan: the same delta-frontier Bellman-Ford shape as traversal.sssp
— only rows improved last round generate candidates, the time-respecting
constraint is a join predicate (t ≥ arr(u)) pushed into the contact-table
join, and the changed flag doubles as the convergence probe. The contact
table is hash-partitioned on src and persisted once; each round shuffles
only the frontier. At 100-TB scale (every contact = one event row) this
is the plan you'd want: no per-timestamp snapshot materialisation, no
window sorts, monotone state of one row per vertex.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..graph import DST, SRC
from ..plans.fixpoint import iterate


def temporal_reachability(
    contacts: DataFrame,
    sources: list[int],
    start: int = 0,
    max_iter: int = 100,
    time_col: str = "t",
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """Earliest-arrival times along time-respecting paths.

    contacts: DataFrame[src, dst, t] — one row per timestamped contact
    (t: long, e.g. microseconds). sources start at time ``start``; arrival
    at a source is ``start`` itself. Returns DataFrame[id, arrival] for
    REACHED vertices only (same sparse contract as multi_source_bfs).
    Duplicate source ids are deduped at entry.
    """
    spark = contacts.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    sources = sorted(set(sources))
    rel = (
        contacts.select(SRC, DST, F.col(time_col).cast("long").alias("t"))
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
        .repartition(p, SRC)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rel.count()

    init = spark.createDataFrame(
        [(s, int(start), True) for s in sources],
        "id long, arrival long, changed boolean",
    )

    def step(state: DataFrame, _i: int) -> DataFrame:
        frontier = state.filter(F.col("changed")).select("id", "arrival")
        cand = (
            frontier.join(
                rel,
                (frontier["id"] == rel[SRC]) & (rel["t"] >= frontier["arrival"]),
            )
            .groupBy(F.col(DST).alias("id"))
            .agg(F.min("t").alias("cand"))
        )
        # full join: newly-reached vertices enter the (sparse) state here
        return state.join(cand, "id", "full").select(
            "id",
            F.least("arrival", "cand").alias("arrival"),
            (
                F.col("cand").isNotNull()
                & (F.col("arrival").isNull() | (F.col("cand") < F.col("arrival")))
            ).alias("changed"),
        )

    res = iterate(
        init,
        step,
        max_iter=max_iter,
        updated_metric=F.sum(F.col("changed").cast("long")),
        checkpoint_dir=checkpoint_dir,
        truncate_every=1,
        resume=resume,
        name="temporal_reachability",
    )
    rel.unpersist()
    return res.state.select("id", "arrival")


def temporal_reachable_counts(
    contacts: DataFrame, sources: list[int], start: int = 0, **kwargs
) -> DataFrame:
    """DataFrame[n_reached, min_arrival, max_arrival] — one summary row."""
    arr = temporal_reachability(contacts, sources, start=start, **kwargs)
    return arr.agg(
        F.count(F.lit(1)).alias("n_reached"),
        F.min("arrival").alias("min_arrival"),
        F.max("arrival").alias("max_arrival"),
    )


def temporal_pagerank(
    contacts: DataFrame,
    windows: int = 6,
    damping: float = 0.85,
) -> DataFrame:
    """DataFrame[id, rank] — time-decayed PageRank over a timestamped
    contact stream (the windowed form of Rozenshtein & Gionis, ECML 2016:
    authority flows only along time-respecting steps, and older windows'
    influence decays geometrically).

    The event-time span is split into ``windows`` equal buckets (pure
    integer arithmetic on the epoch — engine-portable); the rank vector
    is power-iterated ONCE per bucket in time order, gathering over that
    bucket's distinct edges with per-bucket out-degrees. A contact in
    window w therefore carries weight ∝ d^(W−w) in the final vector —
    recency dominates, and reversing the stream genuinely changes the
    answer (tested). Per-window dangling mass is lost, matching the
    reference PageRank semantics (pagerank.h:287-288).

    Scale shape: ONE pass over the contact table builds the (w, src, dst,
    inv_deg) edge table — persisted, streamed through every window step;
    only the V-row rank vector shuffles per window. At 100 TB the edge
    table would be written partitioned BY window so each step scans only
    its bucket; at gate scale the cached filter serves the same plan."""
    spark = contacts.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))

    span = contacts.agg(
        F.min("t").alias("tmin"), F.max("t").alias("tmax")
    ).collect()[0]
    tmin, tmax = int(span["tmin"]), int(span["tmax"])
    width_den = tmax - tmin + 1

    edges = (
        contacts.filter(F.col(SRC) != F.col(DST))
        .select(
            SRC,
            DST,
            # exact BIGINT division (never float) — engine-portable bucket
            F.expr(
                f"CAST(((t - {tmin}) * {windows}) DIV {width_den} AS BIGINT)"
            ).alias("w"),
        )
        .distinct()
    )
    deg = edges.groupBy("w", SRC).agg(F.count("*").alias("od"))
    ew = (
        edges.join(deg, ["w", SRC])
        .select("w", SRC, DST, (F.lit(1.0) / F.col("od")).alias("inv"))
        .repartition(p, SRC)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    nodes = (
        contacts.select(F.col(SRC).alias("id"))
        .unionByName(contacts.select(F.col(DST).alias("id")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    n = nodes.count()
    base = (1.0 - damping) / n

    rank = nodes.select("id", F.lit(1.0 / n).alias("rank"))
    rank = rank.localCheckpoint(eager=True)
    for w in range(windows):
        gathered = (
            ew.filter(F.col("w") == w)
            .join(rank.withColumnRenamed("id", SRC), SRC)
            .groupBy(F.col(DST).alias("id"))
            .agg(F.sum(F.col("rank") * F.col("inv")).alias("g"))
        )
        rank = (
            nodes.join(gathered, "id", "left")
            .select(
                "id",
                (
                    F.lit(base)
                    + F.lit(damping) * F.coalesce(F.col("g"), F.lit(0.0))
                ).alias("rank"),
            )
            .localCheckpoint(eager=True)
        )
    ew.unpersist()
    return rank
