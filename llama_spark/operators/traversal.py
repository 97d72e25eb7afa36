"""BFS / SSSP — frontier-expansion and Bellman-Ford fixpoints.

Reference semantics:
- ``sssp_unweighted`` — BFS depth per node (sssp.h:220-333, via the
  adaptive ll_bfs_template); unreachable nodes keep +inf (we emit NULL).
- ``sssp_weighted`` — Bellman-Ford min-relaxation to fixpoint
  (sssp.h:59-216: relax dist[s] = min(dist[s], dist[n]+len(e)) over the
  updated frontier, loop until no update); returns max finite dist.
- ``bfs_count`` — number of vertices reachable from root (bfs.h:56-128).

Spark plan: the frontier is a DataFrame; each round is
``frontier ⨝ edges → groupBy(dst).min → improve dists``. LLAMA's adaptive
small/queue/scan frontier switch (ll_bfs_template.h:170-292) maps to
broadcast-vs-shuffle join selection: the frontier side is always the small
side of the join and AQE broadcasts it when it fits, which is exactly the
ST_SMALL/ST_QUE→ST_RD transition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..graph import DST, SRC, nodes_of
from ..plans.fixpoint import iterate


def sssp(
    edges: DataFrame,
    root: int = 0,
    weight_col: str | None = None,
    max_iter: int = 100,
    checkpoint_dir: str | None = None,
    resume: bool = False,
) -> DataFrame:
    """DataFrame[id, dist] — min distance from root; NULL = unreachable.

    weight_col=None → unweighted (dist = BFS depth, weight 1 per hop);
    else Bellman-Ford over ``edges[weight_col]`` (double).
    """
    spark = edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    w = F.col(weight_col).cast("double") if weight_col else F.lit(1.0)
    rel = (
        edges.select(SRC, DST, w.alias("w"))
        .repartition(p, SRC)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    m_edges = rel.count()
    nodes = nodes_of(edges)
    init = nodes.select(
        "id",
        F.when(F.col("id") == root, F.lit(0.0)).otherwise(F.lit(None).cast("double")).alias(
            "dist"
        ),
        (F.col("id") == root).alias("changed"),
    )

    # Delta iteration (sssp.h:131-161 relaxes only the updated frontier):
    # candidates are generated ONLY from rows improved last round, and the
    # changed flag doubles as the "no update → stop" probe (sssp.h:124-179).
    def step(dists: DataFrame, _i: int) -> DataFrame:
        frontier = dists.filter(F.col("changed")).select("id", "dist")
        cand = (
            frontier.join(rel, frontier["id"] == rel[SRC])
            .groupBy(F.col(DST).alias("id"))
            .agg(F.min(F.col("dist") + F.col("w")).alias("cand"))
        )
        return dists.join(cand, "id", "left").select(
            "id",
            F.when(
                F.col("cand").isNotNull()
                & (F.col("dist").isNull() | (F.col("cand") < F.col("dist"))),
                F.col("cand"),
            )
            .otherwise(F.col("dist"))
            .alias("dist"),
            (
                F.col("cand").isNotNull()
                & (F.col("dist").isNull() | (F.col("cand") < F.col("dist")))
            ).alias("changed"),
        )

    res = iterate(
        init,
        step,
        max_iter=max_iter,
        updated_metric=F.sum(F.col("changed").cast("long")),
        checkpoint_dir=checkpoint_dir,
        # edge count is already materialized; nodes ≤ 2m, so m bounds the
        # state size for the tiny/big truncation-cadence choice
        truncate_every=1 if m_edges <= 100_000 else 4,
        resume=resume,
        name="sssp",
    )
    rel.unpersist()
    return res.state.select("id", "dist")


def bfs_depths(edges: DataFrame, root: int = 0, max_iter: int = 100) -> DataFrame:
    """DataFrame[id, depth: long] (NULL = unreachable) — sssp_unweighted."""
    return sssp(edges, root=root, weight_col=None, max_iter=max_iter).select(
        "id", F.col("dist").cast("long").alias("depth")
    )


def bfs_count(edges: DataFrame, root: int = 0, max_iter: int = 100) -> int:
    """Reachable-vertex count from root (bfs.h:70-73 atomic counter)."""
    return (
        bfs_depths(edges, root=root, max_iter=max_iter)
        .filter(F.col("depth").isNotNull())
        .count()
    )


def sssp_max_finite(edges: DataFrame, root: int = 0, weight_col: str | None = None) -> float:
    """LLAMA's SSSP 'result' — max finite distance (sssp.h:191-205)."""
    d = sssp(edges, root=root, weight_col=weight_col)
    row = d.agg(F.max("dist").alias("m")).collect()[0]
    return row["m"]
