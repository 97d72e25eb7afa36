"""Gonzalez farthest-point k-center clustering on the hop metric.

Published frame: Gonzalez, "Clustering to minimize the maximum intercluster
distance" (TCS 1985) — the classic greedy 2-approximation for metric
k-center: seed with one center, then repeatedly add the point farthest
from the current center set. Here the metric is undirected hop distance
(the BFS metric the reference's traversal engines compute,
ll_bfs_template.h), so every greedy step is one BFS — the graph analogue
used for landmark selection and graph-partition seeding at web scale.

Determinism contract (both engines replay it exactly):
  - first center = MIN(id);
  - next center  = an UNREACHED vertex of MIN(id) if any exists
    (infinite distance sorts first), else the reached vertex with
    (max dist, then min id);
  - final assignment: nearest center by (dist, center id) lexicographic.

Spark plan: exactly K single-source BFS waves through the audited sparse
multi-source kernel (traversal.py), min-merged into ONE V-row
(dist, center) vector — never a K×V table, and no extra assignment pass:
the merge that drives the farthest-point pick IS the final assignment.
The argmax is a 1-row TakeOrdered collect per round (K rows total cross
the driver, the influence_max convention). At 100-TB scale each merge is
an id-keyed outer join of two V-row vectors — the pagerank shuffle
class — and the frontier deltas shrink like any BFS.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..graph import DST, SRC, nodes_of, symmetrize
from .traversal import multi_source_bfs_depths


def k_center(edges: DataFrame, k: int = 3, max_iter: int = 16) -> DataFrame:
    """DataFrame[id, center, dist] — greedy 2-approx k-center assignment
    over the undirected hop metric. Only vertices reached by at least one
    center appear (the sparse multi-source contract); on a connected
    graph that is every vertex."""
    if k < 1:
        raise ValueError("k must be >= 1")
    und = symmetrize(edges).persist(StorageLevel.MEMORY_AND_DISK)
    nodes = nodes_of(und).persist(StorageLevel.MEMORY_AND_DISK)
    first = nodes.agg(F.min("id")).collect()[0][0]
    if first is None:
        und.unpersist()
        nodes.unpersist()
        return edges.sparkSession.createDataFrame(
            [], "id long, center long, dist long"
        )

    centers = [int(first)]
    best: DataFrame | None = None
    while True:
        c = centers[-1]
        wave = multi_source_bfs_depths(und, [c], max_iter=max_iter).select(
            "id", F.col("depth").alias("nd"), F.lit(c).cast("long").alias("nc")
        )
        if best is None:
            best = wave.select(
                "id", F.col("nd").alias("dist"), F.col("nc").alias("center")
            )
        else:
            take_new = F.col("dist").isNull() | (
                F.col("nd").isNotNull()
                & (
                    (F.col("nd") < F.col("dist"))
                    | ((F.col("nd") == F.col("dist")) & (F.col("nc") < F.col("center")))
                )
            )
            best = best.join(wave, "id", "full").select(
                "id",
                F.when(take_new, F.col("nd")).otherwise(F.col("dist")).alias("dist"),
                F.when(take_new, F.col("nc")).otherwise(F.col("center")).alias("center"),
            )
        best = best.localCheckpoint(eager=True)
        if len(centers) >= k:
            break
        # farthest-first pick: unreached (absent row → NULL dist after the
        # left join) first by min id, else max dist, then min id
        pick = (
            nodes.join(best.select("id", "dist"), "id", "left")
            .orderBy(
                F.col("dist").isNotNull().asc(),
                F.col("dist").desc(),
                F.col("id").asc(),
            )
            .limit(1)
            .collect()
        )
        nxt = int(pick[0]["id"])
        if nxt in centers:  # all vertices are centers already (k > V)
            break
        centers.append(nxt)

    und.unpersist()
    nodes.unpersist()
    return best.select("id", "center", "dist")
