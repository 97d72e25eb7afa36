"""Triangle counting — direction-ignored exact count.

Reference semantics: tc_i / tc_u / tc_od all count each undirected triangle
once via the u<v<w orientation over sorted adjacency
(benchmark/benchmarks/triangle_counting.h:155-336, 481-831; strictness
:104-120). The merge-vs-binary-search intersection heuristic
(``u_num < 32·v_num`` → merge, triangle_counting.h:531-567) is LLAMA's
hand-rolled join-strategy choice; in Spark that's Catalyst/AQE's job.

Spark plan: canonicalize to an oriented edge set, then the 2-path self-join

    wedges(a,b,c) = E(a,b) ⨝ E(b,c)      closed by ⨝ E(a,c)

**Degree orientation** (orient="degree") is the scale-critical trick: order
each undirected edge from the lower-(degree, id) endpoint to the higher one.
Every wedge is then built at its lowest-degree vertex, so a hub of degree D
generates O(D) oriented out-edges split across its *low-degree* neighbors
instead of O(D²) wedges at the hub — the standard mitigation for power-law
graphs (same effect LLAMA gets from its blocked intersection). Counts are
identical to id-orientation; the DuckDB oracle uses id-orientation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..graph import DST, SRC, drop_self_loops, undirected_ordered


def oriented_edges(edges: DataFrame, orient: str = "degree") -> DataFrame:
    """Each undirected edge exactly once, oriented low→high endpoint.

    orient="id": (least, greatest) — matches the oracle SQL literally.
    orient="degree": lower (undirected degree, id) first — skew-resistant.
    """
    und = drop_self_loops(undirected_ordered(edges)).dropDuplicates([SRC, DST])
    if orient == "id":
        return und
    deg = (
        und.select(F.col(SRC).alias("id"))
        .unionAll(und.select(F.col(DST).alias("id")))
        .groupBy("id")
        .agg(F.count("*").alias("deg"))
    )
    da, db = deg.alias("da"), deg.alias("db")
    u = und.join(da, und[SRC] == F.col("da.id")).join(db, und[DST] == F.col("db.id"))
    lo_first = (F.col("da.deg") < F.col("db.deg")) | (
        (F.col("da.deg") == F.col("db.deg")) & (und[SRC] < und[DST])
    )
    return u.select(
        F.when(lo_first, und[SRC]).otherwise(und[DST]).alias(SRC),
        F.when(lo_first, und[DST]).otherwise(und[SRC]).alias(DST),
    )


def triangle_count(edges: DataFrame, orient: str = "degree") -> int:
    return triangles_df(edges, orient=orient).collect()[0]["triangles"]


def triangles_df(edges: DataFrame, orient: str = "degree") -> DataFrame:
    """DataFrame with single column ``triangles: long`` (exact count)."""
    e = oriented_edges(edges, orient=orient).persist(StorageLevel.MEMORY_AND_DISK)
    e1 = e.alias("e1")
    e2 = e.alias("e2")
    e3 = e.alias("e3")
    wedges = e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
    closed = wedges.join(
        e3,
        (F.col("e1.src") == F.col("e3.src")) & (F.col("e2.dst") == F.col("e3.dst")),
        "left_semi",
    )
    out = closed.agg(F.count("*").cast("long").alias("triangles")).localCheckpoint(
        eager=True
    )
    e.unpersist()
    return out


def triangles_per_node(edges: DataFrame, orient: str = "degree") -> DataFrame:
    """DataFrame[id, triangles] — per-node incident-triangle counts
    (each triangle credited to all three corners)."""
    e = oriented_edges(edges, orient=orient).persist(StorageLevel.MEMORY_AND_DISK)
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    tris = (
        e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
        .join(
            e3,
            (F.col("e1.src") == F.col("e3.src")) & (F.col("e2.dst") == F.col("e3.dst")),
        )
        .select(
            F.col("e1.src").alias("a"), F.col("e1.dst").alias("b"), F.col("e2.dst").alias("c")
        )
    )
    # one pass over the triangle join — a unionAll of three projections
    # would re-plan (and re-execute) the whole 3-way join per branch
    corners = tris.select(
        F.explode(F.array("a", "b", "c")).alias("id")
    )
    out = corners.groupBy("id").agg(F.count("*").alias("triangles")).localCheckpoint(
        eager=True
    )
    e.unpersist()
    return out
