"""k-truss decomposition — iterative triangle-support peeling.

Same fixpoint family as k-core (kcore.py) one level up the subgraph
hierarchy: the k-truss is the maximal subgraph in which every edge closes
at least k-2 triangles *within the subgraph*. Peeling: repeatedly drop
edges whose in-subgraph support < k-2 until none change — the community-
core detector of choice on link graphs (denser than k-core, cheaper than
clique mining).

Spark plan per round over the canonical oriented edge set (u < v,
deduped, self-loop-free — triangles.py's orientation trick):
    tri   = e(u,v) ⨝ e(v,w) ⨝ e(u,w)          (each triangle found once)
    supp  = explode each triangle into its 3 edges → groupBy count
    e'    = e ⨝ supp WHERE support ≥ k-2       (no supp row ⇒ support 0)
The edge set only shrinks, so per-round cost is monotone non-increasing;
each round truncates lineage with an eager checkpoint. ``rounds`` forces
the fixed-round SQL-portable mode (like k_core/coreness); ``rounds=None``
peels to convergence.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..graph import DST, SRC


def _canonical(edges: DataFrame) -> DataFrame:
    return (
        edges.select(
            F.least(SRC, DST).alias(SRC), F.greatest(SRC, DST).alias(DST)
        )
        .filter(F.col(SRC) != F.col(DST))
        .distinct()
    )


def edge_support(e: DataFrame) -> DataFrame:
    """DataFrame[src, dst, support] over a canonical oriented edge set —
    number of triangles each edge closes (edges in no triangle absent)."""
    a, b, c = e.alias("a"), e.alias("b"), e.alias("c")
    tri = (
        a.join(b, F.col("a.dst") == F.col("b.src"))
        .join(
            c,
            (F.col("c.src") == F.col("a.src")) & (F.col("c.dst") == F.col("b.dst")),
        )
        .select(
            F.col("a.src").alias("u"), F.col("a.dst").alias("v"), F.col("b.dst").alias("w")
        )
    )
    # ONE pass over the triangle join: explode each triangle into its 3
    # sides (a unionAll of three projections would re-plan the whole
    # e⨝e⨝e subtree per branch — measured 14 exchanges/round vs 6 here)
    sides = tri.select(
        F.explode(
            F.array(
                F.struct(F.col("u").alias(SRC), F.col("v").alias(DST)),
                F.struct(F.col("v").alias(SRC), F.col("w").alias(DST)),
                F.struct(F.col("u").alias(SRC), F.col("w").alias(DST)),
            )
        ).alias("e")
    ).select("e.src", "e.dst")
    return sides.groupBy(SRC, DST).agg(F.count("*").alias("support"))


def k_truss(
    edges: DataFrame,
    k: int,
    rounds: int | None = None,
    max_iter: int = 50,
) -> DataFrame:
    """DataFrame[src, dst] (src < dst) — the k-truss of the undirected,
    deduped view of ``edges``."""
    if k < 3:
        raise ValueError("k-truss is defined for k >= 3")
    spark = edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # persist (not localCheckpoint) keeps the hash(src) layout so the
    # triangle join's b-side needs no exchange each round (localCheckpoint
    # drops partitioning in this build — see plans/fixpoint.py); lineage is
    # truncated with a localCheckpoint every 4th peel
    e = _canonical(edges).repartition(p, SRC).persist(StorageLevel.MEMORY_AND_DISK)
    m = e.count()
    e_persisted = True

    limit = rounds if rounds is not None else max_iter
    for _i in range(limit):
        if m == 0:
            break
        supp = edge_support(e)
        kept = (
            e.join(supp, [SRC, DST], "left")
            .filter(F.coalesce("support", F.lit(0)) >= k - 2)
            .select(SRC, DST)
        )
        if _i % 4 == 3:
            kept = kept.localCheckpoint(eager=True)
            kept_persisted = False
        else:
            kept = kept.persist(StorageLevel.MEMORY_AND_DISK)
            kept_persisted = True
        m2 = kept.count()
        if m2 == m:
            if kept_persisted:
                kept.unpersist()
            break  # fixpoint — remaining unrolled rounds are no-ops too
        if e_persisted:
            e.unpersist()
        e, m, e_persisted = kept, m2, kept_persisted

    if e_persisted:
        # hand back a checkpointed frame, never a live CacheManager entry
        out = e.localCheckpoint(eager=True)
        e.unpersist()
        return out
    return e
