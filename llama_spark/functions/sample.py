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
