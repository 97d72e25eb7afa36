"""Deterministic random-walk sampling — the DeepWalk/node2vec corpus stage.

Graph-embedding pipelines at 100 TB start by materializing walks (node
sequences) that a skip-gram trainer then consumes; the walk generator is
the graph-side operator. This one is **deterministic**: step t of walk w
moves to out-neighbor index ``H(walk_id:t:seed) mod out_deg`` where H is
the md5-derived 60-bit hash the text operators use — no RNG state, so the
same walks come out of any partitioning, any engine (the DuckDB oracle
replays them exactly), and any resume.

Spark plan per step (the canonical distributed walker):
    frontier(walk_id, cur) ⨝ deg on cur          → pick = H % out_deg + 1
    ... ⨝ adj on (src, idx) = (cur, pick)        → next node
Two equi-joins against ONCE-built persisted tables: deg is partitioned on
src, adj on (src, idx) — each streams through its join while only the
walker state (≤ |V|·walks_per_node rows) shuffles, twice per step. The
composite-key second join makes per-walker work O(1): a hub's 10⁶
neighbors are never scanned, the picked index row is hash-looked-up
(a single `cur = src AND idx = pick` filter-join would scan the whole
neighbor group per walker). Walks ending at a sink (out-degree 0) simply
stop — shorter sequences, like a crawler hitting a dead end.

**Hub-safe index build**: the adjacency index is a per-src rank, but a
naive ``row_number() over (partition by src order by dst)`` sorts the
largest hub's entire out-list in ONE task — the single straggler in an
otherwise skew-proof operator on a web graph. :func:`adjacency_index`
instead ranks in two phases over the canonical ``(dst % salts, dst)``
order: rank *within* (src, salt) — max task sort ≈ out_deg/salts — then
add per-(src, salt) offsets from a count aggregate (the offsets window
partitions by src but runs over ≤ ``salts`` rows per src, never the
out-list). The composed rank is exactly the global rank in (salt, dst)
order, so walks stay engine-replayable: the oracle's single window just
orders by ``(dst % salts, dst)``.

**Weighted walks** (``weight_col``): step to neighbor i with probability
w_i/Σw. Weights are quantized to integers ŵ = floor(w·resolution)+1 so
cumulative sums are exact in any engine; neighbor i owns the contiguous
range [lo_i, hi_i) of [0, T) (T = Σŵ, same salted two-phase cumsum as the
index) and the walker draws u = H mod T. The range member is found via a
precomputed **bucket lookup table**: each src's [0, T) is cut into
≈ out_deg buckets of width step = max(1, ⌊T/out_deg⌋) and each neighbor
row is replicated into the buckets its range spans (≤ 2·|E| rows total);
a walker equi-joins on (src, ⌊u/step⌋) and filters lo ≤ u < hi — expected
O(1) candidates instead of scanning the hub's whole range list with a
non-equi join.

Reference tie-in: the reference's random traversal support is
pick_random_node + the iterator templates (ll_mlcsr_graph.h:677-682) over
the loader's optional edge-weight property (ll_load_utils.h:1076-1090);
walk sampling composes those the way its benchmark drivers do, expressed
here as data-parallel joins instead of per-walker loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.text import token_hash
from ..graph import DST, SRC, nodes_of

ADJ_SALTS = 64  # sub-lists per src in the two-phase rank (bounds task sorts)


def adjacency_index(e: DataFrame, salts: int = ADJ_SALTS) -> DataFrame:
    """DataFrame[src, dst, idx] — idx is the 1-based rank of dst within
    src's out-list in ``(dst % salts, dst)`` order, built WITHOUT any
    single task ever sorting a whole hub's out-list (see module doc)."""
    salted = e.withColumn("salt", F.pmod(F.col(DST), F.lit(salts)))
    ranked = salted.withColumn(
        "r", F.row_number().over(Window.partitionBy(SRC, "salt").orderBy(DST))
    )
    counts = salted.groupBy(SRC, "salt").agg(F.count("*").alias("c"))
    w_off = (
        Window.partitionBy(SRC)
        .orderBy("salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    # ≤ `salts` rows per src flow through this window — never the out-list
    offs = counts.select(
        SRC, "salt", F.coalesce(F.sum("c").over(w_off), F.lit(0)).alias("off")
    )
    return ranked.join(offs, [SRC, "salt"]).select(
        SRC, DST, (F.col("off") + F.col("r")).alias("idx")
    )


def weighted_adjacency_ranges(
    e: DataFrame, weight_col: str, resolution: int = 128, salts: int = ADJ_SALTS
) -> DataFrame:
    """DataFrame[src, dst, lo, hi] — contiguous integer ranges [lo, hi)
    partitioning [0, T_src) proportionally to the quantized weights
    ŵ = floor(w·resolution)+1, in ``(dst % salts, dst)`` order; same
    hub-safe two-phase construction as :func:`adjacency_index` (cumsum
    within (src, salt), per-salt offsets from a sum aggregate)."""
    iw = (
        F.floor(F.col(weight_col).cast("double") * F.lit(float(resolution))).cast(
            "long"
        )
        + F.lit(1).cast("long")
    )
    salted = e.withColumn("salt", F.pmod(F.col(DST), F.lit(salts))).withColumn(
        "iw", iw
    )
    w_cum = (
        Window.partitionBy(SRC, "salt")
        .orderBy(DST)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    ranked = salted.withColumn("cum", F.sum("iw").over(w_cum))
    totals = salted.groupBy(SRC, "salt").agg(F.sum("iw").alias("c"))
    w_off = (
        Window.partitionBy(SRC)
        .orderBy("salt")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = totals.select(
        SRC,
        "salt",
        F.coalesce(F.sum("c").over(w_off), F.lit(0).cast("long")).alias("off"),
    )
    return ranked.join(offs, [SRC, "salt"]).select(
        SRC,
        DST,
        (F.col("off") + F.col("cum") - F.col("iw")).alias("lo"),
        (F.col("off") + F.col("cum")).alias("hi"),
    )


def random_walks(
    edges: DataFrame,
    walk_length: int = 4,
    walks_per_node: int = 1,
    seed: int = 42,
    weight_col: str | None = None,
    weight_resolution: int = 128,
) -> DataFrame:
    """DataFrame[walk_id, step, node] — ``walks_per_node`` deterministic
    walks from every node, ``walk_length`` steps (or fewer at a sink);
    step 0 is the start node, walk_id = node·walks_per_node + w.

    With ``weight_col``, steps are weight-biased: neighbor i is picked
    with probability ŵ_i/Σŵ where ŵ = floor(w·weight_resolution)+1
    (exact integer quantization — relative bias ≤ 1/(w·resolution),
    deterministic and engine-portable)."""
    spark = edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    weighted = weight_col is not None
    if weighted:
        e = (
            edges.groupBy(SRC, DST)
            .agg(F.max(F.col(weight_col).cast("double")).alias("_w"))
        )
        ranges = weighted_adjacency_ranges(e, "_w", resolution=weight_resolution)
        deg = (
            ranges.groupBy(SRC)
            .agg(F.max("hi").alias("tot"), F.count("*").alias("od"))
            .withColumn(
                "step_w",
                F.greatest(
                    F.lit(1).cast("long"),
                    F.floor(F.col("tot") / F.col("od")).cast("long"),
                ),
            )
            .repartition(p, SRC)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        # bucket lookup table: neighbor rows replicated into each bucket
        # their [lo, hi) spans — ≤ T/step + od ≈ 2·od rows per src
        adj = (
            ranges.join(deg.select(SRC, "step_w"), SRC)
            .select(
                SRC,
                DST,
                "lo",
                "hi",
                F.explode(
                    F.sequence(
                        F.floor(F.col("lo") / F.col("step_w")).cast("long"),
                        F.floor((F.col("hi") - 1) / F.col("step_w")).cast("long"),
                    )
                ).alias("bucket"),
            )
            .repartition(p, SRC, "bucket")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        adj.count()
        n_deg = deg.count()
    else:
        e = edges.select(SRC, DST).distinct()
        adj = (
            adjacency_index(e)
            .repartition(p, SRC, "idx")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        adj.count()
        deg = (
            e.groupBy(SRC).agg(F.count("*").alias("od"))
            .repartition(p, SRC)
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        n_deg = deg.count()

    def _hint(df: DataFrame) -> DataFrame:
        # the walker state side: broadcast while tiny, else shuffled-hash
        # so the persisted deg/adj tables stream (pagerank.py policy)
        return F.broadcast(df) if n_deg <= 100_000 else df.hint("shuffle_hash")

    nodes = nodes_of(edges)
    starts = nodes.select(
        F.explode(F.array(*[F.lit(w) for w in range(walks_per_node)])).alias("w"),
        F.col("id").alias("node"),
    ).select(
        (F.col("node") * walks_per_node + F.col("w")).alias("walk_id"),
        F.col("node"),
    )
    frontier = starts.withColumn("step", F.lit(0)).select("walk_id", "step", "node")
    frontier = frontier.localCheckpoint(eager=True)
    parts = [frontier]
    for t in range(walk_length):
        pick_hash = token_hash(
            F.concat_ws(":", F.col("walk_id"), F.lit(t), F.lit(seed))
        )
        if weighted:
            with_pick = (
                _hint(frontier.select("walk_id", "node"))
                .join(deg, frontier["node"] == deg[SRC])
                .select(
                    "walk_id",
                    "node",
                    F.pmod(pick_hash, F.col("tot")).alias("u"),
                    "step_w",
                )
                .withColumn("b", F.floor(F.col("u") / F.col("step_w")).cast("long"))
            )
            nxt = (
                _hint(with_pick)
                .join(
                    adj,
                    (with_pick["node"] == adj[SRC])
                    & (with_pick["b"] == adj["bucket"]),
                )
                .filter((F.col("u") >= F.col("lo")) & (F.col("u") < F.col("hi")))
                .select(
                    "walk_id",
                    F.lit(t + 1).alias("step"),
                    F.col(DST).alias("node"),
                )
                .localCheckpoint(eager=True)
            )
        else:
            with_pick = (
                _hint(frontier.select("walk_id", "node"))
                .join(deg, frontier["node"] == deg[SRC])
                .select(
                    "walk_id",
                    "node",
                    (F.pmod(pick_hash, F.col("od")) + 1).alias("pick"),
                )
            )
            nxt = (
                _hint(with_pick)
                .join(
                    adj,
                    (with_pick["node"] == adj[SRC])
                    & (with_pick["pick"] == adj["idx"]),
                )
                .select(
                    "walk_id",
                    F.lit(t + 1).alias("step"),
                    F.col(DST).alias("node"),
                )
                .localCheckpoint(eager=True)
            )
        if nxt.isEmpty():
            break
        parts.append(nxt)
        frontier = nxt

    out = parts[0]
    for part in parts[1:]:
        out = out.unionByName(part)
    out = out.localCheckpoint(eager=True)
    adj.unpersist()
    deg.unpersist()
    return out
