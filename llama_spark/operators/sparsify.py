"""Edge embeddedness (neighborhood overlap) and local graph sparsification.

``edge_overlap`` scores every undirected edge by the Jaccard overlap of
its endpoints' neighborhoods (excluding the endpoints themselves) — the
classic tie-strength / embeddedness measure (Granovetter; Onnela et al.
2007). ``sparsify_top_overlap`` keeps each node's top-k strongest
incident edges by that score — local similarity-based sparsification
(Satuluri, Parthasarathy, Ruan, SIGMOD 2011), the standard pre-filter
that shrinks a web-scale link graph before expensive community/cluster
passes while preserving local structure.

Builds on the same skew-safe oriented wedge join as triangle counting
(benchmark/benchmarks/triangle_counting.h is the reference's kernel of
this join class): common-neighbor counts per edge are exactly per-edge
triangle supports, built at each wedge's lowest-degree corner, so a hub
of degree D costs O(D) oriented edges instead of O(D²) hub wedges.

Scale notes (100-TB lens):
  * counts and degrees are exact integers; the single float (overlap)
    is one division rounded to 6 dp — cross-engine deterministic.
  * the top-k rank in ``sparsify_top_overlap`` is a per-node window over
    incident edges — bounded by max degree per task. That is the same
    bound every per-node top-k in the stack carries; edges are ranked by
    (overlap desc, cn desc, neighbor id) so the kept set is deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..graph import DST, SRC, drop_self_loops, undirected_ordered
from .triangles import oriented_edges


def edge_overlap(edges: DataFrame, orient: str = "degree") -> DataFrame:
    """DataFrame[src, dst, cn, overlap] — every canonical undirected edge
    (src < dst) with its common-neighbor count and neighborhood overlap

        overlap = cn / (deg(u) + deg(v) − 2 − cn)

    (|N(u)∩N(v)| over |N(u)∪N(v)| with u,v removed from each other's
    neighborhoods; 0 when the union is empty). 6 dp.
    """
    canon = (
        drop_self_loops(undirected_ordered(edges))
        .dropDuplicates([SRC, DST])
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    deg = (
        canon.select(F.col(SRC).alias("id"))
        .unionAll(canon.select(F.col(DST).alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("d"))
    )
    # per-edge triangle support via the degree-oriented wedge join; each
    # triangle credits its three edges, re-canonicalized to (min, max)
    e = oriented_edges(canon, orient=orient).persist(StorageLevel.MEMORY_AND_DISK)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tris = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e1.src") == F.col("e3.src")) & (F.col("e2.dst") == F.col("e3.dst")),
        )
        .select(
            F.col("e1.src").alias("a"),
            F.col("e1.dst").alias("b"),
            F.col("e2.dst").alias("c"),
        )
    )
    sides = tris.select(
        F.explode(
            F.array(
                F.struct(F.least("a", "b").alias("u"), F.greatest("a", "b").alias("v")),
                F.struct(F.least("b", "c").alias("u"), F.greatest("b", "c").alias("v")),
                F.struct(F.least("a", "c").alias("u"), F.greatest("a", "c").alias("v")),
            )
        ).alias("s")
    ).select(F.col("s.u").alias(SRC), F.col("s.v").alias(DST))
    cn = sides.groupBy(SRC, DST).agg(F.count("*").alias("cn"))

    du = deg.select(F.col("id").alias(SRC), F.col("d").alias("du"))
    dv = deg.select(F.col("id").alias(DST), F.col("d").alias("dv"))
    out = (
        canon.join(cn, [SRC, DST], "left")
        .join(du.hint("shuffle_hash"), SRC)
        .join(dv.hint("shuffle_hash"), DST)
        .select(
            SRC,
            DST,
            F.coalesce("cn", F.lit(0)).cast("long").alias("cn"),
            (F.col("du") + F.col("dv") - F.lit(2) - F.coalesce("cn", F.lit(0))).alias(
                "_den"
            ),
        )
        .select(
            SRC,
            DST,
            "cn",
            F.when(F.col("_den") > 0, F.round(F.col("cn") / F.col("_den"), 6))
            .otherwise(F.lit(0.0))
            .alias("overlap"),
        )
        .localCheckpoint(eager=True)
    )
    e.unpersist()
    canon.unpersist()
    return out


def sparsify_top_overlap(
    edges: DataFrame, k: int = 4, orient: str = "degree"
) -> DataFrame:
    """DataFrame[src, dst] — the union over nodes of each node's top-``k``
    incident canonical edges ranked by (overlap desc, cn desc, neighbor
    id asc). An edge survives if EITHER endpoint ranks it — the
    union-form guarantee of Satuluri et al. that keeps every node at
    least min(k, degree) edges, so no node is disconnected by the
    sparsifier.
    """
    ov = edge_overlap(edges, orient=orient)
    incident = ov.select(
        F.col(SRC).alias("node"), F.col(DST).alias("other"), SRC, DST, "cn", "overlap"
    ).unionByName(
        ov.select(
            F.col(DST).alias("node"), F.col(SRC).alias("other"), SRC, DST, "cn", "overlap"
        )
    )
    w = Window.partitionBy("node").orderBy(
        F.desc("overlap"), F.desc("cn"), F.asc("other")
    )
    return (
        incident.withColumn("r", F.row_number().over(w))
        .filter(F.col("r") <= k)
        .select(SRC, DST)
        .dropDuplicates([SRC, DST])
    )
