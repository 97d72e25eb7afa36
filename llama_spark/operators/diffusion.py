"""Heat-kernel PageRank — truncated-Taylor diffusion over the walk matrix.

Chung's heat-kernel pagerank (PNAS 2007): h = Σ_k e^{-t} t^k/k! · (Pᵀ)^k s,
the continuous-time analog of the power-iteration family LLAMA's pagerank
kernel implements (benchmark/benchmarks/pagerank.h:240-300) — same
per-iteration sparse gather over out-edges, but the per-round results are
*accumulated* with Poisson weights instead of damped-replaced. Both engines
compute the identical K-term truncation, so the gate compare is exact by
construction (no convergence-tolerance ambiguity).

Spark plan: the same cached hash(src)-partitioned inverse-degree edge
table the pagerank kernel streams — only the K-row state vector shuffles
per step; the Poisson coefficients are Python-float literals shared with
the oracle SQL. Dangling mass is lost, matching the reference pagerank
convention (pagerank.h:287-288).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..graph import DST, SRC, materialize, nodes_of


def heat_coefficients(t: float, taylor_k: int) -> list[float]:
    """Poisson weights e^{-t} t^k/k!, k = 0..K — shared Spark/oracle
    literals (both sides embed the same Python doubles)."""
    return [math.exp(-t) * t**k / math.factorial(k) for k in range(taylor_k + 1)]


def heat_kernel_pagerank(
    edges: DataFrame, t: float = 3.0, taylor_k: int = 6
) -> DataFrame:
    """DataFrame[id, heat_scaled] — heat-kernel rank ×N, rounded 6 dp.

    x_0 = uniform 1/N; x_{k+1}(v) = Σ_{u→v} x_k(u)/outdeg(u);
    h = Σ_{k=0..K} e^{-t} t^k/k! · x_k. One job per Taylor term, each the
    same edges⨝state shuffled-hash join as a pagerank iteration.
    """
    spark = edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    nodes = nodes_of(edges).repartition(p, "id").persist(StorageLevel.MEMORY_AND_DISK)
    n = nodes.count()
    if n == 0:
        return nodes.select("id", F.lit(0.0).alias("heat_scaled"))

    outdeg = edges.groupBy(F.col(SRC).alias("id")).agg(F.count("*").alias("od"))
    # per-edge share factor precomputed once; cached hash(src) so the
    # per-term join streams it without re-exchange (pagerank plan shape)
    ew = (
        edges.join(outdeg, edges[SRC] == outdeg["id"])
        .select(edges[SRC], edges[DST], (F.lit(1.0) / F.col("od")).alias("share"))
        .repartition(p, SRC)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ew.count()

    coef = heat_coefficients(t, taylor_k)
    state = nodes.select(
        "id", F.lit(1.0 / n).alias("x"), F.lit(coef[0] / n).alias("h")
    )
    for k in range(1, taylor_k + 1):
        contrib = (
            ew.join(state.select(F.col("id").alias(SRC), "x"), SRC)
            .groupBy(F.col(DST).alias("id"))
            .agg(F.sum(F.col("x") * F.col("share")).alias("nx"))
        )
        state = materialize(
            state.join(contrib, "id", "left").select(
                "id",
                F.coalesce(F.col("nx"), F.lit(0.0)).alias("x"),
                (F.col("h") + F.lit(coef[k]) * F.coalesce(F.col("nx"), F.lit(0.0))).alias(
                    "h"
                ),
            )
        )
    out = state.select(
        "id", F.round(F.col("h") * F.lit(float(n)), 6).alias("heat_scaled")
    ).localCheckpoint(eager=True)
    ew.unpersist()
    nodes.unpersist()
    return out


def truncated_hitting_time(
    edges: DataFrame,
    seeds: list[int],
    horizon: int = 8,
) -> DataFrame:
    """Truncated hitting time (Sarkar & Moore, UAI 2007) — DataFrame[id,
    hitting]: the expected number of random-walk steps from each node to
    the FIRST visit of any seed, truncated at ``horizon`` — i.e.
    E[min(τ_S, horizon)] exactly (walks not arrived by the horizon count
    as exactly ``horizon``; a walk stuck on a dangling node likewise).
    The classic random-walk proximity for link prediction and
    trusted-set distance — the absorbing-walk companion of spam_mass's
    TrustRank (same seed-set semantics) and of personalized PageRank
    (which discounts by damping where this one counts steps).

    Exact finite recursion (the time-decreasing horizon is implicit):
    g_0 = 0 everywhere; g_k(v) = 0 on S, else 1 + Σ_u P(v,u)·g_{k-1}(u)
    with P the out-degree-uniform walk matrix and a dangling node falling
    back to its OWN g_{k-1} (stuck walk: g_k = k). g_k is then exactly
    E[min(τ_S, k)] — no cap operator needed (g_k ≤ k holds inductively).
    NOTE: a value-level cap h = min(T, 1+Ph) iterated to fixpoint is NOT
    this quantity (it over-counts looping mass); the horizon must decay
    with the recursion depth, which the g_k indexing provides.

    Plan: same shape as the pagerank kernel but gathered on SRC — the
    per-edge 1/out-degree factor table is built once, cached
    hash-partitioned on DST (the join key), and only the V-row state
    shuffles per step; the loop runs through plans/fixpoint.iterate, so
    the state stays persisted/partitioned between lineage truncations and
    each step costs ONE Spark job. Reference parity: the same
    vertex-centric fixpoint loop as benchmark/benchmarks/pagerank.h,
    absorbing variant."""
    from ..plans.fixpoint import iterate

    if not seeds:
        raise ValueError("seeds must be non-empty")
    seeds = sorted(set(seeds))
    spark = edges.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    nodes = nodes_of(edges).repartition(p, "id").persist(StorageLevel.MEMORY_AND_DISK)
    n = nodes.count()
    if n == 0:
        nodes.unpersist()
        return nodes.select("id", F.lit(0.0).alias("hitting"))

    out_deg = edges.groupBy(SRC).agg(F.count("*").alias("od"))
    ew = (
        edges.select(SRC, DST)
        .join(out_deg, SRC)
        .select(SRC, DST, (F.lit(1.0) / F.col("od")).alias("inv"))
        .repartition(p, DST)
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ew.count()

    is_seed = F.col("id").isin(seeds)
    tiny = n <= 100_000

    def _hint(df: DataFrame) -> DataFrame:
        return F.broadcast(df) if tiny else df.hint("shuffle_hash")

    def step(h: DataFrame, _i: int) -> DataFrame:
        gathered = (
            _hint(h).join(ew, h["id"] == ew[DST])
            .select(F.col(SRC).alias("id"), (F.col("inv") * F.col("h")).alias("c"))
            .groupBy("id")
            .agg(F.sum("c").alias("s"))
        )
        return (
            h.select("id", F.col("h").alias("_hp"))
            .join(_hint(gathered), "id", "left")
            .select(
                "id",
                F.when(is_seed, F.lit(0.0))
                .otherwise(F.lit(1.0) + F.coalesce("s", F.col("_hp")))
                .alias("h"),
            )
        )

    result = iterate(
        nodes.select("id", F.lit(0.0).alias("h")),
        step,
        max_iter=horizon,
        name="hitting_time",
    )
    out = materialize(result.state.select("id", F.col("h").alias("hitting")))
    ew.unpersist()
    nodes.unpersist()
    return out
