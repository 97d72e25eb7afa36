"""TrustRank and spam mass — the anti-spam ranking pair for web graphs.

TrustRank (Gyöngyi, Garcia-Molina, Pedersen, "Combating Web Spam with
TrustRank", VLDB 2004) is PageRank with the teleport vector restricted
to a hand-verified trusted seed set: trust flows out of the seeds along
links, attenuated by the damping factor, so pages far from any trusted
page score near zero even when raw PageRank likes them.

Spam mass (Gyöngyi, Berkhin, Garcia-Molina, Pedersen, "Link Spam
Detection Based on Mass Estimation", VLDB 2006): the fraction of a
page's PageRank that does NOT come through the trusted core —

    relative_mass(v) = (PR(v) − TR(v)) / PR(v)

with PR and TR both normalized to sum 1 over the node set. Pages whose
rank is mostly spam-supported score near 1; pages inside the trusted
flow score near (or below) 0.

Both rankings reuse the audited PageRank kernels (operators/pagerank.py)
— same damping, same iteration count, same dangling handling — so the
difference is exactly the teleport vector, which is the paper's
definition. One extra V-row join computes the mass; nothing new
shuffles. The reference ships the PageRank kernel this builds on
(benchmark/benchmarks/pagerank.h); the trust pair is the composition a
link-spam pipeline runs it for.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .pagerank import pagerank_result, personalized_pagerank_result


def trustrank(
    edges: DataFrame,
    seeds: list[int],
    damping: float = 0.85,
    max_iter: int = 10,
) -> DataFrame:
    """DataFrame[id, trust] — biased PageRank with teleport uniform over
    ``seeds`` (must all exist in the graph; raises otherwise)."""
    res = personalized_pagerank_result(
        edges, sources=seeds, damping=damping, max_iter=max_iter
    )
    return res.state.select("id", F.col("rank").alias("trust"))


def spam_mass(
    edges: DataFrame,
    seeds: list[int],
    damping: float = 0.85,
    max_iter: int = 10,
) -> DataFrame:
    """DataFrame[id, pr_scaled, trust_scaled, rel_mass] — relative spam
    mass per node: (PR − TR)/PR with both vectors as distributed (sum-1)
    ranks. pr/trust are returned ×N (the O(1) gate scaling convention)
    and all three columns round to 6 dp."""
    pr = pagerank_result(edges, damping=damping, max_iter=max_iter)
    tr = personalized_pagerank_result(
        edges, sources=seeds, damping=damping, max_iter=max_iter
    )
    n = float(pr.n_nodes or pr.state.count())
    p = pr.state.select("id", F.col("rank").alias("_pr"))
    t = tr.state.select("id", F.col("rank").alias("_tr"))
    # rel_mass divides the ALREADY-6dp-ROUNDED scaled ranks: the rounded
    # values are the gate-proven cross-engine-identical quantities, so the
    # quotient is bit-identical in both engines (dividing the raw doubles
    # would amplify last-ulp accumulation noise exactly where PR ≈ TR)
    scaled = p.join(t, "id").select(
        "id",
        F.round(F.col("_pr") * F.lit(n), 6).alias("pr_scaled"),
        F.round(F.col("_tr") * F.lit(n), 6).alias("trust_scaled"),
    )
    return scaled.select(
        "id",
        "pr_scaled",
        "trust_scaled",
        F.round(
            (F.col("pr_scaled") - F.col("trust_scaled")) / F.col("pr_scaled"), 6
        ).alias("rel_mass"),
    )
