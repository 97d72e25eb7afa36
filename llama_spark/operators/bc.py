"""Betweenness centrality — multi-source Brandes as vectorized frontier
DataFrames.

Reference: exact BC (bc_adj.h:56-207) runs Brandes from EVERY source —
O(V·E), impractical at web scale and not demanded by the north rule;
``bc_random`` (bc_random.h:56-220, default K=100, benchmark.cc:1474)
approximates from K random roots. We implement the K-root variant with the
roots as a **key column**, so all K forward BFS waves and all K backward
sweeps run in the same DataFrame jobs (the Spark answer to LLAMA's
per-source sequential loop: parallelism across sources AND edges at once).

Forward phase (σ = shortest-path counts, level-synchronous BFS):
    frontier(root, id, depth, σ) ⨝ edges → anti-join visited
    → groupBy(root, dst): σ' = Σ σ     (bc_adj.h:73-90 σ-push)
Backward phase (δ accumulation over the BFS DAG's "down edges", which the
reference saves during the forward pass, ll_bfs_template.h:337-351; we
recover them as edges whose endpoints sit on consecutive depths):
    δ(v) = σ_v · Σ_{w ∈ succ(v)} (1 + δ(w)) / σ_w   (bc_adj.h:92-111)
    bc(v) = Σ_roots δ(v), v ≠ root
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..graph import DST, SRC, nodes_of


def pick_roots(edges: DataFrame, k: int, seed: int = 42) -> list[int]:
    """K deterministic pseudo-random existing nodes — the analog of
    pick_random_node (ll_mlcsr_graph.h:677-682) with a fixed seed."""
    nodes = nodes_of(edges)
    return [
        r["id"]
        for r in nodes.orderBy(F.xxhash64(F.col("id") + F.lit(seed)), F.col("id"))
        .limit(k)
        .collect()
    ]


def betweenness_centrality(
    edges: DataFrame,
    roots: list[int] | None = None,
    k: int = 8,
    seed: int = 42,
    max_depth: int = 64,
) -> DataFrame:
    """DataFrame[id, bc: double] — Brandes from the given (or K sampled)
    roots; nodes never reached contribute/receive 0."""
    spark = edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    if roots is None:
        roots = pick_roots(edges, k, seed)

    e = edges.select(SRC, DST).distinct().repartition(p, SRC).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    e.count()
    nodes = nodes_of(edges).persist(StorageLevel.MEMORY_AND_DISK)
    nodes.count()

    roots_df = spark.createDataFrame([(r,) for r in roots], "root long")
    visited = (
        roots_df.select(
            "root",
            F.col("root").alias("id"),
            F.lit(0).alias("depth"),
            F.lit(1.0).alias("sigma"),
        )
        .localCheckpoint(eager=True)
    )

    # ---- forward: level-synchronous multi-source BFS with σ counting ----
    depth = 0
    frontier = visited
    while depth < max_depth:
        cand = (
            F.broadcast(frontier)
            .join(e, frontier["id"] == e[SRC])
            .select("root", F.col(DST).alias("id"), "sigma")
        )
        nxt = (
            cand.join(visited.select("root", "id"), ["root", "id"], "left_anti")
            .groupBy("root", "id")
            .agg(F.sum("sigma").alias("sigma"))
            .withColumn("depth", F.lit(depth + 1))
            .select("root", "id", "depth", "sigma")
            .localCheckpoint(eager=True)
        )
        if nxt.count() == 0:
            break
        visited = visited.unionByName(nxt).localCheckpoint(eager=True)
        frontier = nxt
        depth += 1

    visited = visited.persist(StorageLevel.MEMORY_AND_DISK)
    max_d = visited.agg(F.max("depth").alias("m")).collect()[0]["m"]

    # ---- backward: δ sweep from the deepest level up (bc_adj.h:92-111) ----
    delta = visited.select("root", "id", F.lit(0.0).alias("delta")).localCheckpoint(
        eager=True
    )
    for d in range(max_d - 1, -1, -1):
        v = visited.filter(F.col("depth") == d).select("root", "id", "sigma")
        w = (
            visited.filter(F.col("depth") == d + 1)
            .select("root", F.col("id").alias("wid"), F.col("sigma").alias("wsigma"))
            .join(delta.withColumnRenamed("id", "wid").withColumnRenamed("delta", "wdelta"),
                  ["root", "wid"])
        )
        down = (
            F.broadcast(v)
            .join(e, v["id"] == e[SRC])
            .select("root", "id", "sigma", F.col(DST).alias("wid"))
            .join(w, ["root", "wid"])
            .groupBy("root", "id")
            .agg(
                F.sum((F.lit(1.0) + F.col("wdelta")) / F.col("wsigma")).alias("acc")
            )
            .join(v.select("root", "id", "sigma"), ["root", "id"])
            .select("root", "id", (F.col("sigma") * F.col("acc")).alias("new_delta"))
        )
        delta = (
            delta.join(down, ["root", "id"], "left")
            .select(
                "root", "id", F.coalesce("new_delta", "delta").alias("delta")
            )
            .localCheckpoint(eager=True)
        )

    bc = (
        delta.filter(F.col("id") != F.col("root"))
        .groupBy("id")
        .agg(F.sum("delta").alias("bc"))
    )
    out = nodes.join(bc, "id", "left").select(
        "id", F.coalesce("bc", F.lit(0.0)).alias("bc")
    )
    e.unpersist()
    return out
