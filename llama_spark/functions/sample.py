"""Corpus sampling — the source-reweighting curation step.

``source_weighted_sample`` is the C4/DoReMi-style downsampler: every
source gets an acceptance RATE and membership is a pure hash function of
the document id — stable under corpus growth, reshuffles, partial reruns,
and engine (the dataset_splits reproducibility contract). This is the
step that turns a ``source_profile`` census into an actual rebalanced
corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import token_hash


def source_weighted_sample(
    documents: DataFrame,
    rates_bp: dict[str, int],
    default_bp: int = 10000,
    seed: int = 42,
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """DataFrame[doc_id, source] — keep a document iff

        H(doc_id:sample:seed) mod 10000  <  rate_bp(source)

    where rate_bp is in BASIS POINTS (2500 = keep ~25%) and H is the
    portable md5-derived 60-bit hash. Integer rates on purpose: no float
    threshold can sit ambiguously on a hash bucket boundary, so Spark and
    any SQL mirror keep byte-identical document sets.

    Scale shape: the rate table is #sources rows (driver-sized) and ships
    as a literal map expression — ONE map-side filter over the corpus, no
    shuffle, no RNG state, no join. Acceptance being a pure function of
    the id means appending documents never reselects existing ones — the
    property a reproducible 100-TB curation rerun needs."""
    for s, bp in rates_bp.items():
        if not 0 <= bp <= 10000:
            raise ValueError(f"rate for {s!r} out of [0, 10000]: {bp}")
    if not 0 <= default_bp <= 10000:
        raise ValueError(f"default rate out of [0, 10000]: {default_bp}")
    if rates_bp:
        rate_map = F.create_map(
            *[F.lit(x) for kv in sorted(rates_bp.items()) for x in kv]
        )
        rate = F.coalesce(rate_map[F.col(source_col)], F.lit(default_bp))
    else:
        rate = F.lit(default_bp)
    bucket = F.pmod(
        token_hash(
            F.concat(F.col(id_col).cast("string"), F.lit(f":sample:{seed}"))
        ),
        F.lit(10000),
    )
    return documents.filter(bucket < rate).select(id_col, source_col)


def temperature_mixture(
    documents: DataFrame,
    by: str = "lang",
    smoothing: float = 0.7,
    size_col: str = "n_chars",
) -> DataFrame:
    """Exponent-smoothed sampling mixture →
    DataFrame[group, n_docs, n_chars, share, weight].

    Published frame: the multilingual exponential-smoothing mixture of
    mBERT / XLM-R (Conneau & Lample 2019; Conneau et al., ACL 2020) —
    sample group i with probability q_i ∝ p_i^S where p_i is its natural
    share and S the smoothing exponent (mBERT's S = 0.7; equivalently
    temperature T = 1/S): S < 1 up-weights the tail (low-resource
    languages / small sources), S = 1 recovers proportional sampling.
    The table this emits (natural share → smoothed weight per group) is
    exactly the sampler configuration a corpus-mixing stage consumes.

    Spark plan: one groupBy over the corpus + a 1-row total broadcast —
    a pure aggregation pipeline (map-side combined) at any scale.
    Weights are ROUND(·, 6) under the house float-gate convention; the
    p^((1/T)) power is computed on the 6-dp-rounded natural share so
    both engines exponentiate bit-identical inputs.
    """
    alpha = float(smoothing)
    g = documents.groupBy(F.col(by).alias("grp")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum(size_col).cast("long").alias("n_chars"),
    )
    tot = g.agg(F.sum("n_docs").alias("t")).select("t")
    shared = g.crossJoin(F.broadcast(tot)).withColumn(
        "share", F.round(F.col("n_docs") / F.col("t"), 6)
    )
    pw = shared.withColumn("pw", F.pow(F.col("share"), F.lit(alpha)))
    z = pw.agg(F.sum("pw").alias("z")).select("z")
    return (
        pw.crossJoin(F.broadcast(z))
        .select(
            F.col("grp").alias(by),
            "n_docs",
            "n_chars",
            "share",
            F.round(F.col("pw") / F.col("z"), 6).alias("weight"),
        )
    )
