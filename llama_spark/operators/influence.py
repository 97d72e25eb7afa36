"""Influence maximization — greedy seed selection by reachability coverage.

Published frame: Kempe-Kleinberg-Tardos (KDD 2003) greedy (1-1/e)
maximisation of a monotone submodular spread function. The deterministic
special case implemented here is the Independent-Cascade model at p=1,
where spread(S) = |reach(S)| — exact directed reachability — so the gate
is fully replayable in ANSI SQL (randomised cascades are gated separately
via bond_percolation's hash-seeded realisations).

Spark plan:
1. Candidate pool = top-C vertices by out-degree (deterministic
   tie-break on id) — the standard degree-heuristic pool that keeps the
   greedy's reach-set state bounded at C waves instead of V.
2. ONE batched multi-source BFS over all C candidates (the sparse
   (root, id) frontier kernel from traversal.py) → reach table.
3. K greedy rounds, each a pure aggregation over the cached reach table:
   marginal gain = # reached vertices not yet covered; argmax is a 1-row
   collect per round (K rows total cross the driver, nothing else).

100-TB lens: exact reach sets of high-degree roots on a web graph are
each O(giant-component) — the reach table is O(C·V) worst case, which is
why C is a pool bound, not V. The production-scale replacement is
Cohen-style bottom-k / HLL reachability sketches per vertex (one
HyperBall-like fixpoint, then sketch-space greedy); the greedy logic
below is unchanged under that substitution — only `reach` swaps from
exact pairs to sketches.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..graph import SRC
from .traversal import multi_source_bfs_depths


def top_degree_candidates(edges: DataFrame, pool: int) -> list[int]:
    """Top-``pool`` vertices by out-degree, ties broken by smaller id —
    a deterministic O(pool)-row collect (TakeOrdered, no full sort)."""
    rows = (
        edges.groupBy(F.col(SRC).alias("id"))
        .agg(F.count(F.lit(1)).alias("od"))
        .orderBy(F.desc("od"), F.asc("id"))
        .limit(pool)
        .collect()
    )
    return [r.id for r in rows]


def influence_max(
    edges: DataFrame, k: int = 3, pool: int = 16, horizon: int = 100
) -> DataFrame:
    """Greedy IC(p=1) seed selection → DataFrame[seed, step, gain].

    step = 1..k in pick order; gain = exact marginal coverage (number of
    newly reached vertices, the seed itself included the first time).
    ``horizon`` truncates the cascade at that many rounds (the bounded-IC
    variant) — reach = vertices within ``horizon`` hops of the seed.
    """
    cands = top_degree_candidates(edges, pool)
    reach = (
        multi_source_bfs_depths(edges, cands, max_iter=horizon)
        .select("root", "id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    reach.count()

    spark = edges.sparkSession
    cand_df = spark.createDataFrame([(c,) for c in cands], "root long")
    picked: list[tuple[int, int, int]] = []
    for step in range(1, k + 1):
        chosen = [p[0] for p in picked]
        remaining = [c for c in cands if c not in chosen]
        if not remaining:
            break
        # one job per round: coverage is re-derived from the persisted
        # reach table (cheap re-aggregation beats a chain of checkpoints),
        # and zero-gain candidates stay pickable via the left join
        cov = reach.filter(F.col("root").isin(chosen or [-1])).select("id").distinct()
        gains = (
            reach.filter(F.col("root").isin(remaining))
            .join(cov, "id", "left_anti")
            .groupBy("root")
            .agg(F.count(F.lit(1)).alias("g"))
        )
        best = (
            cand_df.filter(F.col("root").isin(remaining))
            .join(gains, "root", "left")
            .select("root", F.coalesce("g", F.lit(0)).alias("gain"))
            .orderBy(F.desc("gain"), F.asc("root"))
            .limit(1)
            .collect()[0]
        )
        picked.append((best.root, step, best.gain))
    reach.unpersist()
    return spark.createDataFrame(picked, "seed long, step int, gain long")
