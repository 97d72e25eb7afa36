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

Reference tie-in: the reference's random traversal support is
pick_random_node + the iterator templates (ll_mlcsr_graph.h:677-682);
walk sampling composes those the way its benchmark drivers do, expressed
here as data-parallel joins instead of per-walker loops.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..functions.text import token_hash
from ..graph import DST, SRC, nodes_of


def random_walks(
    edges: DataFrame,
    walk_length: int = 4,
    walks_per_node: int = 1,
    seed: int = 42,
) -> DataFrame:
    """DataFrame[walk_id, step, node] — ``walks_per_node`` deterministic
    walks from every node, ``walk_length`` steps (or fewer at a sink);
    step 0 is the start node, walk_id = node·walks_per_node + w."""
    spark = edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    e = edges.select(SRC, DST).distinct()
    adj = (
        e.withColumn(
            "idx", F.row_number().over(Window.partitionBy(SRC).orderBy(DST))
        )
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
                (with_pick["node"] == adj[SRC]) & (with_pick["pick"] == adj["idx"]),
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
