"""Strongly connected components — distributed FW-BW coloring.

The reference computes SCC with sequential Tarjan DFS (tarjan_scc.h:57-206,
ll_dfs_template.h) — inherently unparallelizable, so SURVEY §2.1 scoped it
out in favor of the north rule's hash-min CC. This module provides the
distributed stand-in anyway: the forward-backward *coloring* decomposition
(Orzan-style FW-BW-MS, the standard vertex-centric SCC):

repeat on the active subgraph:
  1. **color** — propagate ``color(v) = max(color(v), colors of
     in-neighbors)`` to fixpoint; every v with color(v)==v is a root, and
     color(v)==c implies c→v (forward reachability partition).
  2. **backward mark** — multi-source BFS from the roots along REVERSED
     edges, restricted to same-color nodes; marked v satisfies v→c, so
     marked ∩ color-class == the complete SCC of each root (FW∩BW theorem).
  3. peel the found SCCs off and repeat on the remainder.

Each outer round settles at least every root's SCC; worst case (a reversed
path) needs O(V) rounds, web graphs settle in a handful. Output labels are
canonical: scc = min node id of the component (exact-match testable
against a sequential Kosaraju oracle).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..graph import DST, SRC, drop_self_loops, nodes_of


def strongly_connected_components(
    edges: DataFrame, max_rounds: int = 50, max_prop_iters: int = 100
) -> DataFrame:
    """DataFrame[id, scc] — scc = min member id of the node's SCC."""
    spark = edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))

    all_nodes = nodes_of(edges).persist(StorageLevel.MEMORY_AND_DISK)
    all_nodes.count()
    active_edges = (
        drop_self_loops(edges.select(SRC, DST).distinct())
        .repartition(p, SRC)
        .localCheckpoint(eager=True)
    )
    active_nodes = all_nodes.localCheckpoint(eager=True)
    assigned = None  # (id, scc) accumulated

    remaining = active_nodes.count()
    for _round in range(max_rounds):
        if remaining == 0:
            break

        # 1. forward coloring to fixpoint (max-propagation along out-edges)
        colors = active_nodes.select("id", F.col("id").alias("color"))
        colors = colors.localCheckpoint(eager=True)
        changed = 0
        for _ in range(max_prop_iters):
            incoming = (
                colors.join(active_edges, colors["id"] == active_edges[SRC])
                .groupBy(F.col(DST).alias("id"))
                .agg(F.max("color").alias("cmax"))
            )
            new_colors = (
                colors.join(incoming, "id", "left")
                .select(
                    "id",
                    F.greatest("color", F.coalesce("cmax", "color")).alias("color"),
                    (
                        F.col("cmax").isNotNull() & (F.col("cmax") > F.col("color"))
                    ).alias("changed"),
                )
                .localCheckpoint(eager=True)
            )
            changed = new_colors.filter("changed").count()
            colors = new_colors.select("id", "color").localCheckpoint(eager=True)
            if changed == 0:
                break
        if changed != 0:
            # a non-fixpoint coloring would split real SCCs silently
            raise RuntimeError(
                f"SCC forward coloring did not converge within "
                f"max_prop_iters={max_prop_iters} (round {_round}, "
                f"{changed} nodes still changing); raise max_prop_iters"
            )

        # 2. backward mark from roots within color classes
        rev = active_edges.select(
            F.col(DST).alias(SRC), F.col(SRC).alias(DST)
        )
        marked = colors.filter(F.col("id") == F.col("color")).select("id", "color")
        marked = marked.localCheckpoint(eager=True)
        frontier = marked
        while True:
            step = (
                frontier.join(rev, frontier["id"] == rev[SRC])
                .select(F.col(DST).alias("id"), "color")
                .join(colors.withColumnRenamed("color", "c2"), "id")
                .filter(F.col("color") == F.col("c2"))
                .select("id", "color")
                .join(marked, ["id", "color"], "left_anti")
                .distinct()
                .localCheckpoint(eager=True)
            )
            if step.count() == 0:
                break
            marked = marked.unionByName(step).localCheckpoint(eager=True)
            frontier = step

        # canonical label: min member id per (root) color class found
        canon = marked.groupBy("color").agg(F.min("id").alias("scc"))
        found = marked.join(canon, "color").select("id", "scc").localCheckpoint(
            eager=True
        )
        assigned = (
            found if assigned is None else assigned.unionByName(found).localCheckpoint(eager=True)
        )

        # 3. peel off and continue on the remainder
        active_nodes = active_nodes.join(found, "id", "left_anti").localCheckpoint(
            eager=True
        )
        remaining = active_nodes.count()
        active_edges = (
            active_edges.join(found.select(F.col("id").alias(SRC)), SRC, "left_anti")
            .join(found.select(F.col("id").alias(DST)), DST, "left_anti")
            .localCheckpoint(eager=True)
        )

    if remaining > 0:
        raise RuntimeError(
            f"SCC did not settle all nodes within max_rounds={max_rounds} "
            f"({remaining} nodes unassigned); raise max_rounds"
        )
    out = all_nodes.join(assigned, "id", "left") if assigned is not None else (
        all_nodes.select("id", F.col("id").alias("scc"))
    )
    if assigned is not None:
        out = out.select("id", F.coalesce("scc", "id").alias("scc"))
    out = out.localCheckpoint(eager=True)
    all_nodes.unpersist()
    return out
