"""Local clustering by PPR sweep cut (Andersen–Chung–Lang, FOCS 2006).

Given a seed set, compute personalized PageRank over the UNDIRECTED view
of the graph, order nodes by degree-normalized score (the ACL sweep
ordering), and report the conductance of every prefix of the top-R
ranking. The prefix minimizing conductance is the seed's local community
— the classic local-partitioning primitive link-graph pipelines use for
spam-neighborhood and topic-cluster extraction around a known page.

Complements the reference's global kernels (PageRank
benchmark/benchmarks/pagerank.h, CC benchmark/benchmarks/tarjan_scc.h)
with the seed-local variant neither engine ships but the same edge
representation supports directly.

Scale shape (100-TB lens):
  * PPR is the existing power-iteration kernel — cached und edge table
    streamed through shuffled-hash joins, only the V-row rank vector
    moves per iteration.
  * The sweep NEVER sorts the node set: the top-R ranking is an
    ``orderBy(...).limit(R)`` (per-partition heaps + R-row merge, the
    TakeOrdered pattern), R defaulting to 64.
  * Cut counts come from ONE pass of the canonical edge table against
    the broadcast R-row rank map: an undirected edge {u,v} is in the cut
    of prefix r exactly for lo ≤ r < hi (lo/hi = endpoint ranks, +inf if
    unranked), so each edge contributes a +1/−1 delta pair and the
    per-prefix cut is a running sum over R rows on the driver-side-tiny
    sweep table. No per-prefix rescan, no quadratic anything.

Cross-engine determinism: the sweep orders by
round(rank·N, 6) / degree — the 6-dp scaled score is the gate-proven
cross-engine-equal quantity, the integer division is then exact IEEE on
equal inputs, and ties break by id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..graph import DST, SRC, symmetrize
from .pagerank import personalized_pagerank_result

_UNRANKED = 999_999_999  # sentinel rank for nodes outside the top-R prefix


def ppr_sweep(
    edges: DataFrame,
    sources: list[int],
    damping: float = 0.85,
    max_iter: int = 10,
    top_r: int = 64,
) -> DataFrame:
    """DataFrame[rank, id, volume, cut_edges, conductance] — the ACL sweep
    over the top ``top_r`` nodes by degree-normalized personalized
    PageRank from ``sources`` on the undirected view.

    ``conductance`` = cut(S_r) / min(vol(S_r), vol(V∖S_r)) for the prefix
    S_r of the first r swept nodes (6 dp; NULL when the denominator is 0,
    i.e. the prefix already swallowed the whole graph's volume).
    """
    spark = edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    und = symmetrize(edges).repartition(p, SRC).persist(StorageLevel.MEMORY_AND_DISK)
    total_vol = und.count()  # symmetric rows = Σ degrees

    res = personalized_pagerank_result(
        und, sources, damping=damping, max_iter=max_iter
    )
    deg = und.groupBy(F.col(SRC).alias("id")).agg(F.count("*").alias("d"))
    scored = res.state.join(deg.hint("shuffle_hash"), "id").select(
        "id",
        "d",
        (F.round(F.col("rank") * F.lit(float(res.n_nodes)), 6) / F.col("d")).alias(
            "ratio"
        ),
    )
    # top-R selection is TakeOrdered (per-partition heaps), not a global sort
    top = scored.orderBy(F.desc("ratio"), "id").limit(top_r)
    w_rank = Window.orderBy(F.desc("ratio"), "id")  # R rows — single task is fine
    ranked = (
        top.select("id", "d", F.row_number().over(w_rank).cast("long").alias("r"))
        .localCheckpoint(eager=True)
    )

    # each canonical undirected edge is cut for prefixes lo <= r < hi
    canon = und.filter(F.col(SRC) < F.col(DST))
    ru = ranked.select(F.col("id").alias(SRC), F.col("r").alias("ru"))
    rv = ranked.select(F.col("id").alias(DST), F.col("r").alias("rv"))
    pe = (
        canon.join(F.broadcast(ru), SRC, "left")
        .join(F.broadcast(rv), DST, "left")
        .select(
            F.least(
                F.coalesce("ru", F.lit(_UNRANKED)), F.coalesce("rv", F.lit(_UNRANKED))
            ).alias("lo"),
            F.greatest(
                F.coalesce("ru", F.lit(_UNRANKED)), F.coalesce("rv", F.lit(_UNRANKED))
            ).alias("hi"),
        )
        .filter(F.col("lo") < _UNRANKED)
    )
    deltas = (
        pe.select(F.col("lo").alias("r"), F.lit(1).alias("x"))
        .unionByName(
            pe.filter(F.col("hi") < _UNRANKED).select(
                F.col("hi").alias("r"), F.lit(-1).alias("x")
            )
        )
        .groupBy("r")
        .agg(F.sum("x").alias("dx"))
    )

    w_sweep = Window.orderBy("r")  # R rows
    sweep = (
        ranked.join(deltas, "r", "left")
        .select("r", "id", "d", F.coalesce("dx", F.lit(0)).alias("dx"))
        .select(
            F.col("r").alias("rank"),
            "id",
            F.sum("d").over(w_sweep).cast("long").alias("volume"),
            F.sum("dx").over(w_sweep).cast("long").alias("cut_edges"),
        )
    )
    denom = F.least(F.col("volume"), F.lit(total_vol) - F.col("volume"))
    out = sweep.select(
        "rank",
        "id",
        "volume",
        "cut_edges",
        F.when(denom > 0, F.round(F.col("cut_edges") / denom, 6)).alias("conductance"),
    ).localCheckpoint(eager=True)
    und.unpersist()
    return out
