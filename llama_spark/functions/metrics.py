"""Ranking-comparison metrics — rank-biased overlap.

Published frame: Webber, Moffat & Zobel, "A similarity measure for
indefinite rankings" (ACM TOIS 2010) — RBO is the top-weighted,
prefix-convergent overlap measure that replaced Kendall/footrule for
comparing search rankings:

    RBO_p = (1 − p) · Σ_{d≥1} p^(d−1) · |A_d ∩ B_d| / d

where A_d, B_d are the depth-d prefixes. Truncated at depth k this is
the RBO_MIN lower bound (no residual extrapolation), the standard
reported form for two k-length lists.

Determinism contract: the (1−p)·p^(d−1) coefficients are computed ONCE
in Python and shipped to BOTH engines as literal values (the pinned-
extractor convention), so no cross-engine pow() divergence enters; the
remaining float work is one weighted sum, rounded to 6 dp.

Spark plan: the joint-membership depth of each shared item is
max(pos_a, pos_b) → a ≤k-row histogram; the depth join is a ≤k×k
broadcast range join; everything after the input top-k cuts is
driver-free and tiny.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def rbo_coefficients(p: float, k: int) -> list[tuple[int, float]]:
    """[(d, (1-p)·p^(d-1))] for d = 1..k — the shared literal table."""
    return [(d, (1.0 - p) * p ** (d - 1)) for d in range(1, k + 1)]


def rank_biased_overlap(
    a: DataFrame, b: DataFrame, p: float = 0.9, k: int = 100
) -> DataFrame:
    """RBO_MIN@k of two rankings → one-row DataFrame[k, p, rbo].

    ``a`` and ``b``: DataFrame[id, pos] with 1-based positions (any rows
    with pos > k are ignored). Items absent from either list contribute
    nothing (set-intersection semantics of the prefix overlap).
    """
    spark = a.sparkSession
    ab = (
        a.select("id", F.col("pos").alias("pa"))
        .join(b.select("id", F.col("pos").alias("pb")), "id")
        .select(F.greatest("pa", "pb").alias("m"))
        .filter(F.col("m") <= k)
    )
    hist = ab.groupBy("m").agg(F.count(F.lit(1)).alias("c"))
    coefs = spark.createDataFrame(
        rbo_coefficients(p, k), "d long, coef double"
    )
    inter = (
        coefs.join(hist, hist["m"] <= coefs["d"], "left")
        .groupBy("d", "coef")
        .agg(F.coalesce(F.sum("c"), F.lit(0)).alias("inter_d"))
    )
    return inter.agg(
        F.lit(k).cast("long").alias("k"),
        F.lit(p).alias("p"),
        F.round(
            F.sum(F.col("coef") * F.col("inter_d") / F.col("d")), 6
        ).alias("rbo"),
    )
