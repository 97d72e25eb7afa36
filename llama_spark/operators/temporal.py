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


def temporal_triangle_motifs(
    contacts: DataFrame,
    delta: int,
    time_col: str = "t",
) -> DataFrame:
    """δ-temporal triangle motif census → DataFrame[motif, n].

    Published frame: Paranjape, Benson & Leskovec, "Motifs in Temporal
    Networks" (WSDM 2017) — a δ-temporal motif is an ordered sequence of
    timestamped edges, strictly increasing in time, all within a window
    of δ. This operator counts the two 3-node, 3-edge TRIANGLE closures
    of a directed 2-path a→b (t1), b→c (t2):

        cycle : closed by c→a (t3)   — the feedback loop
        ffl   : closed by a→c (t3)   — the feed-forward / shortcut

    with t1 < t2 < t3 ≤ t1 + δ and a, b, c pairwise distinct. The
    cycle : ffl ratio is the classic temporal-network fingerprint the
    paper reports (social networks are ffl-heavy, financial ones
    cycle-heavy).

    Spark plan — time-bucket equi-joins, no range join: candidate
    successors of a contact at time t live in δ-buckets floor(t/δ) and
    floor(t/δ)+1, so the first hop explodes each contact into its two
    candidate buckets and joins on (node key, bucket) — an equi-join
    Catalyst hash-partitions on both columns; the exact t-window is a
    residual predicate. The wedge then emits its two EXPECTED closing
    edges (one per motif) and the final hop is one more (src, dst,
    bucket) equi-join against the contact table. At 100-TB event-stream
    scale this is the plan you'd want: every shuffle is keyed on
    (vertex, time-bucket) — bounded by the δ-locality of the motif
    definition — and no all-pairs time comparison ever materializes.
    Contact streams with hub vertices salt exactly like the triangle
    join (the wedge fan-out is deg_in·deg_out within one δ window, the
    same quantity the static degree-oriented triangle kernel bounds).
    """
    c = (
        contacts.select(
            SRC, DST, F.col(time_col).cast("long").alias("t")
        )
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
        .withColumn("bkt", F.floor(F.col("t") / F.lit(int(delta))))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    c1 = c.select(
        F.col(SRC).alias("a"), F.col(DST).alias("b"),
        F.col("t").alias("t1"), F.col("bkt").alias("b1"),
    ).withColumn("jb", F.explode(F.array(F.col("b1"), F.col("b1") + 1)))
    c2 = c.select(
        F.col(SRC).alias("b"), F.col(DST).alias("c"),
        F.col("t").alias("t2"), F.col("bkt").alias("jb"),
    )
    wedge = c1.join(c2, ["b", "jb"]).filter(
        (F.col("t2") > F.col("t1"))
        & (F.col("t2") <= F.col("t1") + F.lit(int(delta)))
        & (F.col("c") != F.col("a"))
    )

    closing = wedge.select(
        "a", "c", "t1", "b1", "t2",
        F.explode(
            F.array(
                F.struct(
                    F.col("c").alias("x_src"), F.col("a").alias("x_dst"),
                    F.lit("cycle").alias("motif"),
                ),
                F.struct(
                    F.col("a").alias("x_src"), F.col("c").alias("x_dst"),
                    F.lit("ffl").alias("motif"),
                ),
            )
        ).alias("w"),
    ).select(
        F.col("w.x_src").alias("x_src"), F.col("w.x_dst").alias("x_dst"),
        F.col("w.motif").alias("motif"), "t1", "t2", "b1",
    ).withColumn("jb", F.explode(F.array(F.col("b1"), F.col("b1") + 1)))

    c3 = c.select(
        F.col(SRC).alias("x_src"), F.col(DST).alias("x_dst"),
        F.col("t").alias("t3"), F.col("bkt").alias("jb"),
    )
    out = (
        closing.join(c3, ["x_src", "x_dst", "jb"])
        .filter(
            (F.col("t3") > F.col("t2"))
            & (F.col("t3") <= F.col("t1") + F.lit(int(delta)))
        )
        .groupBy("motif")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .localCheckpoint(eager=True)
    )
    c.unpersist()
    return out
