"""SimRank structural similarity — candidate-pair refinement form.

SimRank (Jeh & Widom, KDD 2002): two pages are similar if they are
referenced by similar pages. s(a, a) = 1 and

    s(a, b) = C / (|I(a)|·|I(b)|) · Σ_{i∈I(a)} Σ_{j∈I(b)} s(i, j)

over in-neighbor sets I(·), decay C (0.8 in the paper). It is the
canonical *recursive* deepening of co-citation: with S₀ = I the first
iteration is exactly normalized co-citation,

    s₁(a, b) = C · |I(a) ∩ I(b)| / (|I(a)|·|I(b)|),

and the second iteration re-scores each pair through the s₁ similarity
of ALL its in-neighbor pairs — catching pairs whose citing pages are
*similar* rather than *identical* (the signal co-citation misses).

Reference tie-in: the reference's directed edge lists and in-edge
iterators (llama/ll_mlcsr_graph.h in-edge access used by the pull
kernels) support exactly this access pattern; SimRank itself is not in
its benchmark set — this is a beyond-reference link-analysis addition
alongside hits.py / trust.py.

Scale design (the all-pairs SimRank matrix is O(V²) and NEVER
materialized): the two-stage candidates→refine shape of the dedup
pipeline (functions/dedup.py) applied to link analysis —

1. **Candidates** = top-K co-cited pairs by exact BIGINT strength
   (deterministic tie-break: strength DESC, a, b). Integer-exact cut,
   so the candidate set is engine-reproducible — no float threshold on
   scores, which would be borderline-unstable cross-engine.
2. **s₁ support** = all co-cited pairs (the only pairs with s₁ > 0 —
   structurally sparse, bounded by Σ_w C(dout(w), 2), the same wedge
   bound as cocitation_pairs with the same ``hub_cap`` control).
3. **Refine** = for candidates only, expand I(a) × I(b) (two equi-joins
   against the in-edge table, bounded by K · din(a)·din(b); ``indeg_cap``
   documents the hub control) and left-join s₁ on the (least, greatest)
   key; the diagonal i = j contributes s(i,i) = 1.

Everything is JVM-side DataFrame ops: two wedge joins, one pair rollup,
one bounded expansion, one left join. No UDFs, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..graph import DST, SRC, drop_self_loops


def simrank_refine(
    edges: DataFrame,
    c: float = 0.8,
    top_k: int = 500,
    hub_cap: int | None = None,
) -> DataFrame:
    """DataFrame[a, b, common, s1, s2] for the top-K co-cited pairs.

    * ``common`` — |I(a) ∩ I(b)| (exact BIGINT; the candidate cut key)
    * ``s1``     — first SimRank iteration  C·common/(din_a·din_b)
    * ``s2``     — second SimRank iteration C/(din_a·din_b) · Σ s₁(i,j)
                   over (i, j) ∈ I(a)×I(b), with s₁(i,i) = 1

    Floats rounded to 6 dp at the output only (cross-engine policy).
    ``hub_cap`` drops citing pages with out-fan > cap from the wedge
    join (the df-cap discipline of functions/dedup.py); the oracle gate
    runs uncapped so both engines see identical pair sets.
    """
    e = drop_self_loops(edges.select(SRC, DST)).dropDuplicates([SRC, DST])
    e = e.persist(StorageLevel.MEMORY_AND_DISK)
    # in-degree of every cited page
    din = e.groupBy(F.col(DST).alias("x")).agg(F.count("*").alias("d"))

    wedge_src = e
    if hub_cap is not None:
        fan = e.groupBy(SRC).agg(F.count("*").alias("_f"))
        wedge_src = e.join(
            fan.filter(F.col("_f") <= hub_cap).select(SRC), SRC, "left_semi"
        )
    # co-citation wedge: pages a < b cited together by w
    e1 = wedge_src.select(F.col(SRC).alias("w"), F.col(DST).alias("a"))
    e2 = wedge_src.select(F.col(SRC).alias("w"), F.col(DST).alias("b"))
    cocit = (
        e1.join(e2, "w")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("common"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    # s1 over the FULL co-cited support (the refine stage reads it)
    s1 = (
        cocit.join(din.withColumnRenamed("x", "a"), "a")
        .withColumnRenamed("d", "da")
        .join(din.withColumnRenamed("x", "b"), "b")
        .withColumnRenamed("d", "db")
        .select(
            "a",
            "b",
            (F.lit(c) * F.col("common") / (F.col("da") * F.col("db"))).alias(
                "s"
            ),
        )
    )

    # integer-deterministic candidate cut
    cand = cocit.orderBy(F.desc("common"), "a", "b").limit(top_k)

    # expansion: (a, b) -> every (i, j) in I(a) x I(b)
    ia = e.select(F.col(DST).alias("a"), F.col(SRC).alias("i"))
    ib = e.select(F.col(DST).alias("b"), F.col(SRC).alias("j"))
    expanded = (
        F.broadcast(cand)
        .join(ia, "a")
        .join(ib, "b")
        .withColumn("_p", F.least("i", "j"))
        .withColumn("_q", F.greatest("i", "j"))
    )
    contrib = (
        expanded.join(
            s1.select(
                F.col("a").alias("_p"), F.col("b").alias("_q"), "s"
            ).hint("shuffle_hash"),
            ["_p", "_q"],
            "left",
        )
        .groupBy("a", "b")
        .agg(
            F.sum(
                F.when(F.col("i") == F.col("j"), F.lit(1.0)).otherwise(
                    F.coalesce(F.col("s"), F.lit(0.0))
                )
            ).alias("tot")
        )
    )

    out = (
        cand.join(contrib, ["a", "b"])
        .join(din.withColumnRenamed("x", "a"), "a")
        .withColumnRenamed("d", "da")
        .join(din.withColumnRenamed("x", "b"), "b")
        .withColumnRenamed("d", "db")
        .select(
            "a",
            "b",
            F.col("common").cast("long").alias("common"),
            F.round(
                F.lit(c) * F.col("common") / (F.col("da") * F.col("db")), 6
            ).alias("s1"),
            F.round(
                F.lit(c) * F.col("tot") / (F.col("da") * F.col("db")), 6
            ).alias("s2"),
        )
    )
    return out
