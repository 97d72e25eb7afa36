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

from ..graph import DST, SRC
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


def lt_cascade(
    edges: DataFrame,
    seed_mod: int = 64,
    rounds: int = 6,
    threshold_mod: int = 100,
) -> DataFrame:
    """Deterministic Linear Threshold cascade → DataFrame[id, round].

    Published frame: the SECOND Kempe-Kleinberg-Tardos (KDD 2003)
    diffusion model — node v activates once the weighted fraction of its
    active in-neighbors reaches its threshold θ_v. The deterministic
    instance gated here uses uniform weights w_uv = 1/indeg(v) (so
    Σ_u w_uv = 1 exactly) and the synthetic-threshold convention of the
    house (pure modulo arithmetic, like with_synthetic_weights):

        θ_v = (1 + (v·131) mod threshold_mod) / (threshold_mod + 1)

    Activation test is EXACT BIGINT — v activates in round r iff

        active_in(v) · (threshold_mod + 1)  ≥  indeg(v) · θ_num(v)

    with θ_num(v) = 1 + (v·131) mod threshold_mod — no float division on
    either engine, so the gate is hash-exact by construction.

    Seeds: v with v mod seed_mod = 0 activate at round 0 (SQL-trivial,
    deterministic). ``round`` is the synchronous activation time; the
    model is monotone so the cascade settles in ≤ diameter rounds and
    converged rounds are no-ops on both sides (fixed-round SQL-portable
    mode, the house convention for iterative gates).

    Spark plan (the delta-gather frontier shape shared with BFS /
    influence_max): only the nodes activated in round r-1 join the cached
    edge table in round r; the accumulated active-in-neighbor count lives
    in the V-row state (exact running mass — in the monotone LT model the
    synchronous full recount equals the sum of per-round deltas). One job
    per round via plans/fixpoint with an observed new-activation metric;
    no count() side jobs, no driver collect.

    100-TB lens: per round one E⨝Δ shuffle-hash join (Δ = newly active,
    shrinking) + one V-row state merge on the same id key — the audited
    pagerank/BFS plan family; no window over hub adjacency, no cartesian.
    """
    from ..graph import drop_self_loops, nodes_of
    from ..plans.fixpoint import iterate

    e = drop_self_loops(edges.select(SRC, DST)).dropDuplicates([SRC, DST])
    e = e.persist(StorageLevel.MEMORY_AND_DISK)

    indeg = e.groupBy(F.col(DST).alias("id")).agg(F.count(F.lit(1)).alias("ind"))
    m1 = threshold_mod + 1
    state0 = (
        nodes_of(e)
        .join(indeg, "id", "left")
        .select(
            "id",
            F.coalesce("ind", F.lit(0)).cast("long").alias("ind"),
            (F.lit(1) + (F.col("id") * 131) % threshold_mod)
            .cast("long")
            .alias("th_num"),
            F.when(F.col("id") % seed_mod == 0, F.lit(0)).cast("int").alias("round"),
            F.lit(0).cast("long").alias("mass"),
            F.lit(0).cast("long").alias("new"),
        )
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        # iterate() passes 0-based iteration indices; iteration i consumes
        # the round-i activations and produces round i+1.
        r = i + 1
        delta = state.filter(F.col("round") == r - 1).select(F.col("id").alias(SRC))
        incr = (
            e.join(delta.hint("shuffle_hash"), SRC)
            .groupBy(F.col(DST).alias("id"))
            .agg(F.count(F.lit(1)).alias("inc"))
        )
        s = state.join(incr, "id", "left").withColumn(
            "mass2", F.col("mass") + F.coalesce(F.col("inc"), F.lit(0))
        )
        # ind > 0 guard: a node with no in-neighbors has no incoming weight
        # and can never be influenced (only seeded) — without it the exact
        # integer test degenerates to 0 >= 0 and wrongly fires every
        # isolated-in node in round 1.
        fires = (
            F.col("round").isNull()
            & (F.col("ind") > 0)
            & (F.col("mass2") * m1 >= F.col("ind") * F.col("th_num"))
        )
        return s.select(
            "id",
            "ind",
            "th_num",
            F.when(fires, F.lit(r)).otherwise(F.col("round")).alias("round"),
            F.col("mass2").alias("mass"),
            fires.cast("long").alias("new"),
        )

    res = iterate(
        state0,
        step,
        max_iter=rounds,
        updated_metric=F.sum("new"),
        name="lt_cascade",
    )
    out = res.state.filter(F.col("round").isNotNull()).select("id", "round")
    e.unpersist()
    return out
