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


HLL_P = 10  # 2^10 = 1024 registers
HLL_ALPHA = 0.7213 / (1.0 + 1.079 / (1 << HLL_P))


def hll_registers(values: DataFrame, col: str = "h", p: int = HLL_P) -> DataFrame:
    """DataFrame[b, M] — HyperLogLog registers over already-hashed 60-bit
    values (Flajolet et al. 2007): bucket = low p bits, rank = leading
    zeros of the remaining 50 bits + 1, register = max rank per bucket.

    The engine-private-layout objection to gating HLL (see module
    docstring) doesn't apply here because the registers are built from
    OUR portable md5 hash with exact integer ops — ``h & (m-1)`` /
    ``h >> p`` bit ops and ``length(bin(w))`` for the leading-zero rank
    (never float log2, whose boundary rounding flips ranks) — so any SQL
    engine reproduces the identical register table.

    Plan: one map-side-combined groupBy to ≤ m rows. At 100 TB this is
    the textbook distributed sketch: partial registers merge with MAX."""
    m = 1 << p
    w = F.shiftright(F.col(col), p)
    rho = F.when(w == 0, F.lit(51 - p + 10)).otherwise(
        F.lit(60 - p + 1) - F.length(F.bin(w))
    )
    return (
        values.select(
            F.col(col).bitwiseAND(F.lit(m - 1)).alias("b"), rho.alias("r")
        )
        .groupBy("b")
        .agg(F.max("r").alias("M"))
    )


def hll_estimate(regs: DataFrame, p: int = HLL_P) -> DataFrame:
    """1-row DataFrame[n_registers, hll_est] from a register table —
    harmonic-mean estimate with the small-range linear-counting
    correction (E ≤ 2.5m and empty registers present)."""
    m = 1 << p
    agg = regs.agg(
        F.count("*").alias("cnt"),
        F.sum(F.pow(F.lit(2.0), -F.col("M"))).alias("s"),
    )
    z_inv = F.col("s") + (F.lit(float(m)) - F.col("cnt"))
    e_raw = F.lit(HLL_ALPHA * m * m) / z_inv
    v = F.lit(m) - F.col("cnt")
    e = F.when(
        (e_raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(e_raw)
    return agg.select(
        F.col("cnt").alias("n_registers"), F.round(e, 4).alias("hll_est")
    )


def hll_distinct_tokens(documents: DataFrame, p: int = HLL_P) -> DataFrame:
    """1-row DataFrame[n_registers, hll_est, exact_distinct, rel_err] —
    the HLL distinct-token estimate next to the exact count (the gate
    verifies the ESTIMATOR's arithmetic, and the artifact shows its
    accuracy at this corpus size)."""
    toks = tokenize(documents).select(token_hash(F.col("tok")).alias("h"))
    est = hll_estimate(hll_registers(toks, "h", p), p)
    exact = tokenize(documents).agg(F.countDistinct("tok").alias("exact_distinct"))
    return (
        est.crossJoin(exact)
        .select(
            "n_registers",
            "hll_est",
            "exact_distinct",
            F.round(
                F.abs(F.col("hll_est") - F.col("exact_distinct"))
                / F.col("exact_distinct"),
                4,
            ).alias("rel_err"),
        )
    )


def cms_counters(
    documents: DataFrame, depth: int = 4, width: int = 512
) -> DataFrame:
    """DataFrame[row, col, c] — Count-Min sketch of corpus token
    frequencies (Cormode & Muthukrishnan 2005): ``depth`` independent
    md5-derived hash lanes × ``width`` counters. The groupBy(row, col) is
    map-side combined, so at most depth·width rows per partition reach
    the shuffle regardless of corpus size — the fixed-size mergeable
    summary that answers point frequency queries with an ε = e/width
    one-sided (over-)estimate. Deterministic lanes (tok ‖ ':cms{r}'
    md5) → exactly replicable in ANSI SQL, like kmv_distinct."""
    toks = tokenize(documents)
    lanes = [
        toks.select(
            F.lit(r).alias("row"),
            (
                token_hash(F.concat(F.col("tok"), F.lit(f":cms{r}"))) % width
            ).alias("col"),
        )
        for r in range(depth)
    ]
    out = lanes[0]
    for l in lanes[1:]:
        out = out.unionByName(l)
    return out.groupBy("row", "col").agg(F.count("*").alias("c"))


def cms_token_estimates(
    documents: DataFrame, depth: int = 4, width: int = 512, k: int = 20
) -> DataFrame:
    """DataFrame[tok, n, n_est] — the exact top-k tokens with their
    Count-Min estimates (n_est = MIN over lanes ≥ n, the CMS one-sided
    guarantee landing in the gate artifact). The counter table
    (≤ depth·width rows) broadcasts into the probe join."""
    counters = cms_counters(documents, depth=depth, width=width)
    top = top_tokens(documents, k=k)
    probes = [
        top.select(
            "tok",
            "n",
            F.lit(r).alias("row"),
            (
                token_hash(F.concat(F.col("tok"), F.lit(f":cms{r}"))) % width
            ).alias("col"),
        )
        for r in range(depth)
    ]
    q = probes[0]
    for pr in probes[1:]:
        q = q.unionByName(pr)
    return (
        q.join(F.broadcast(counters), ["row", "col"])
        .groupBy("tok", "n")
        .agg(F.min("c").alias("n_est"))
    )
