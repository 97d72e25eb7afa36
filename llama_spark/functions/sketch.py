"""Corpus-statistics sketches for 100-TB profiling.

- ``kmv_distinct``: K-Minimum-Values cardinality estimator (Bar-Yossef et
  al. 2002): hash every element to (0,1), keep the k smallest DISTINCT
  hashes, estimate |D| ≈ (k-1)/u_(k). The Spark plan is a TakeOrdered —
  each partition contributes at most k rows to the driver-side merge, so
  the full-shuffle ``countDistinct`` is replaced by O(P·k) movement.
  Deterministic (md5-derived hash, no RNG) and exactly reproducible in
  ANSI SQL, so the driver gate can hash-match it against DuckDB — unlike
  HyperLogLog, whose register layout is engine-private.
- ``top_tokens``: exact corpus heavy hitters — groupBy(token) is
  map-side-combined (one row per distinct token per partition reaches the
  shuffle) and the top-k cut is a TakeOrderedAndProject, so the full
  sorted token histogram never materializes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import P31, token_hash, tokenize


def kmv_distinct(values: DataFrame, col: str = "h", k: int = 256) -> DataFrame:
    """1-row DataFrame[n_seen_k, kth_min_u, distinct_est] from a DataFrame
    of already-hashed values ``col`` in [0, P31). When fewer than k
    distinct hashes exist the estimate IS the exact distinct count."""
    u = (
        values.select(F.col(col).alias("h"))
        .distinct()
        .select((F.col("h").cast("double") / F.lit(float(P31))).alias("u"))
    )
    topk = u.orderBy("u").limit(k)
    return topk.agg(
        F.count("*").alias("n_seen_k"),
        F.round(F.max("u"), 9).alias("kth_min_u"),
        F.round(
            F.when(F.count("*") < k, F.count("*").cast("double")).otherwise(
                F.lit(float(k - 1)) / F.max("u")
            ),
            3,
        ).alias("distinct_est"),
    )


def kmv_distinct_tokens(documents: DataFrame, k: int = 256) -> DataFrame:
    """KMV estimate of the corpus's distinct-token cardinality."""
    toks = tokenize(documents).select((token_hash(F.col("tok")) % P31).alias("h"))
    return kmv_distinct(toks, "h", k)


def top_tokens(documents: DataFrame, k: int = 20) -> DataFrame:
    """DataFrame[tok, n] — the k most frequent tokens (ties → lexicographic
    smallest), exact."""
    return (
        tokenize(documents)
        .groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(k)
    )


def exact_quantiles(
    df: DataFrame,
    value_col: str,
    qs_bp: tuple[int, ...] = (1000, 2500, 5000, 7500, 9000, 9900),
) -> DataFrame:
    """EXACT discrete quantiles of an integer-valued column —
    DataFrame[q_bp, rank, value]: for each q (BASIS POINTS), the value of
    the rank-⌈q·n/10000⌉ row in sorted order. Integer q and an
    integer-exact ceiling ((q·n + 9999) DIV 10000) on purpose: no float
    threshold ever sits ambiguously on a rank boundary, so Spark and any
    SQL mirror cut identical ranks.

    The scale-safe exact-quantile plan (vs approx_percentile, whose merge
    buffers are engine-private and gate-unfriendly): the VALUE histogram
    (groupBy value → count) is bounded by #distinct values, the cumulative
    sum runs over THAT bounded table (the degree_distribution precedent —
    the window never sees the row-level table), and each quantile is a
    min() over the qualifying suffix. Works whenever the value domain is
    materially smaller than the row count — doc lengths, degrees, token
    counts; for unbounded domains bucket first."""
    hist = df.groupBy(F.col(value_col).cast("long").alias("v")).agg(
        F.count("*").alias("c")
    )
    from pyspark.sql import Window

    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = hist.withColumn("cum", F.sum("c").over(w))
    tot = hist.agg(F.sum("c").alias("n"))
    qdf = df.sparkSession.createDataFrame(
        [(int(q),) for q in sorted(qs_bp)], "q_bp long"
    )
    # integer ceiling — double division would lose exactness past 2^53
    # (q_bp·n ≈ 10^16 at 10^12 rows)
    ranks = qdf.crossJoin(tot).select(
        "q_bp", F.expr("(q_bp * n + 9999) DIV 10000").cast("long").alias("rank")
    )
    return (
        F.broadcast(ranks)
        .join(cum, cum["cum"] >= ranks["rank"])
        .groupBy("q_bp", "rank")
        .agg(F.min("v").alias("value"))
        .select("q_bp", "rank", "value")
    )


def grouped_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    qs_bp: tuple[int, ...] = (2500, 5000, 9000),
) -> DataFrame:
    """EXACT discrete quantiles PER GROUP — DataFrame[group, q_bp, rank,
    value]: the grouped generalization of ``exact_quantiles`` with the
    same integer-exact rank ceiling. The per-group cumulative window runs
    over each group's VALUE HISTOGRAM (bounded by that group's distinct
    values, never its row count), so a billion-row group with a few
    thousand distinct lengths costs a few thousand window rows."""
    from pyspark.sql import Window

    hist = df.groupBy(
        F.col(group_col).alias("grp"), F.col(value_col).cast("long").alias("v")
    ).agg(F.count("*").alias("c"))
    w = (
        Window.partitionBy("grp")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("c").over(w))
    tot = hist.groupBy("grp").agg(F.sum("c").alias("n"))
    qdf = df.sparkSession.createDataFrame(
        [(int(q),) for q in sorted(qs_bp)], "q_bp long"
    )
    ranks = tot.crossJoin(F.broadcast(qdf)).select(
        "grp", "q_bp", F.expr("(q_bp * n + 9999) DIV 10000").cast("long").alias("rank")
    )
    return (
        ranks.join(cum, ["grp"])
        .filter(F.col("cum") >= F.col("rank"))
        .groupBy("grp", "q_bp", "rank")
        .agg(F.min("v").alias("value"))
        .select(F.col("grp").alias(group_col), "q_bp", "rank", "value")
    )
