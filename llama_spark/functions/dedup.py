"""Deduplication operators for corpus curation at 100 TB.

All five standard flavors, each a pure DataFrame plan (JVM built-ins only,
portable to the DuckDB oracle):

- **exact**: hash-groupBy on md5(text) → canonical = min doc_id.
- **n-gram Jaccard**: shingle → inverted-index self-join → |A∩B| and
  |A|+|B| → exact Jaccard on candidate pairs. The self-join only meets
  pairs sharing ≥1 shingle — the classic sparse-similarity plan.
- **MinHash + LSH**: k permutation-style hashes h_i(x) = (a_i·x + b_i)
  mod 2^31-1 over shingle hashes, banded into b bands of r rows; pairs
  colliding on any full band become candidates. Scale path: candidate
  generation is a groupBy(band, signature) — no quadratic blow-up.
- **SimHash**: 60-bit majority-vote fingerprint of token hashes; near-dups
  = small Hamming distance (pairs via band-of-bits blocking).
- **embedding cosine**: see functions/similarity.py near_duplicate_pairs.

MinHash constants derive from a fixed LCG (a_i = (1103515245·i + 12345)
mod P | 1) so Spark and the SQL oracle generate identical hash families.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .text import P31, token_hash, tokenize

MINHASH_K = 16
LSH_BANDS = 4  # 4 bands × 4 rows


def minhash_params(k: int = MINHASH_K) -> list[tuple[int, int, int]]:
    """(i, a_i, b_i) — identical formula inlined into the oracle SQL."""
    return [
        (i, ((1103515245 * i + 12345) % P31) | 1, (22695477 * i + 1) % P31)
        for i in range(k)
    ]


def shingles(documents: DataFrame, n: int = 3) -> DataFrame:
    """DataFrame[doc_id, shingle] — distinct n-token shingles (1 row per
    distinct shingle per doc). Docs with < n tokens contribute their full
    (shorter) token sequence as a single shingle."""
    toks = tokenize(documents)
    w = Window.partitionBy("doc_id").orderBy("pos")
    parts = [F.col("tok")] + [F.lead("tok", j).over(w) for j in range(1, n)]
    with_gram = toks.select(
        "doc_id",
        "pos",
        F.concat_ws(" ", *parts).alias("shingle"),
        F.lead("tok", n - 1).over(w).isNotNull().alias("full"),
        F.max("pos").over(Window.partitionBy("doc_id")).alias("max_pos"),
    )
    return (
        with_gram.filter(F.col("full") | ((F.col("max_pos") < n) & (F.col("pos") == 1)))
        .select("doc_id", "shingle")
        .distinct()
    )


def exact_duplicates(documents: DataFrame) -> DataFrame:
    """DataFrame[doc_id, canonical_id, text_hash] — canonical = min doc_id
    among byte-identical texts. Keep-filter: doc_id == canonical_id."""
    hashed = documents.select("doc_id", F.md5(F.col("text")).alias("text_hash"))
    canon = hashed.groupBy("text_hash").agg(F.min("doc_id").alias("canonical_id"))
    return hashed.join(canon, "text_hash").select("doc_id", "canonical_id", "text_hash")


def ngram_jaccard_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.4,
    max_shingle_df: int | None = 256,
) -> DataFrame:
    """DataFrame[doc_a, doc_b, jaccard] for pairs with J ≥ threshold.

    J = |A∩B| / (|A|+|B|-|A∩B|) over distinct n-gram shingle sets; the
    inverted-index join means disjoint docs never meet.

    **Hot-shingle bound**: a shingle appearing in M documents contributes
    M(M-1)/2 rows to the inverted-index self-join — a single boilerplate
    phrase ("all rights reserved …") makes the join quadratic at corpus
    scale. Shingles with document frequency > ``max_shingle_df`` are
    dropped from the shingle space BEFORE the join (both intersection and
    set sizes — J stays an exact Jaccard over the df-filtered space; the
    same bound the LSH paths apply via ``max_bucket_size``). High-df
    shingles are near-uninformative for near-dup detection (they raise
    |A∩B| for essentially all pairs equally), so candidate recall is
    barely affected; ``None`` disables the cap (exact classic Jaccard)."""
    sh = shingles(documents, n)
    if max_shingle_df is not None:
        # hot set is small by definition — anti-join it away (AQE broadcasts)
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a = sh.alias("a")
    b = sh.alias("b")
    inter = (
        a.join(b, (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")))
        .groupBy(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(documents: DataFrame, k: int = MINHASH_K, n: int = 3) -> DataFrame:
    """DataFrame[doc_id, i, minhash] — k min-hash values per doc."""
    spark = documents.sparkSession
    params = F.broadcast(
        spark.createDataFrame(minhash_params(k), "i int, a long, b long")
    )
    sh = shingles(documents, n).withColumn("x", token_hash(F.col("shingle")) % P31)
    return (
        sh.crossJoin(params)
        .select(
            "doc_id", "i", ((F.col("a") * F.col("x") + F.col("b")) % P31).alias("hv")
        )
        .groupBy("doc_id", "i")
        .agg(F.min("hv").alias("minhash"))
    )


def lsh_candidate_pairs(
    documents: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = 3,
    max_bucket_size: int | None = 256,
) -> DataFrame:
    """DataFrame[doc_a, doc_b] — pairs agreeing on at least one full band
    of the minhash signature (doc_a < doc_b, distinct).

    **Giant-bucket bound**: a bucket of M near-identical docs (boilerplate,
    templated pages) would emit M(M-1)/2 pairs — quadratic at 100 TB. Buckets
    larger than ``max_bucket_size`` are **canonical-star linked** instead:
    every member pairs only with the bucket's min doc_id (O(M) pairs). The
    transitive duplicate-cluster closure is identical — within one bucket
    all members are mutually candidates, and the star spans them — only the
    explicit pair list shrinks. ``max_bucket_size=None`` disables the bound
    (exact all-pairs; what the sf0.01 oracle gate exercises is unaffected
    either way because its buckets are far below the default cap)."""
    rows_per_band = k // bands
    sig = minhash_signatures(documents, k, n)
    band_sig = (
        sig.withColumn("band", (F.col("i") / rows_per_band).cast("int"))
        .groupBy("doc_id", "band")
        .agg(
            F.concat_ws(
                ",", F.sort_array(F.collect_list(F.concat_ws(":", "i", "minhash")))
            ).alias("bsig")
        )
    )
    if max_bucket_size is not None:
        # bucket sizes via groupBy (partial-aggregated — no single-task
        # window sort over a giant bucket), joined back on the bucket key
        stats = band_sig.groupBy("band", "bsig").agg(
            F.count("*").alias("_m"), F.min("doc_id").alias("_hub")
        )
        band_sig = band_sig.join(stats, ["band", "bsig"])
        small = band_sig.filter(F.col("_m") <= max_bucket_size)
        star = (
            band_sig.filter(
                (F.col("_m") > max_bucket_size) & (F.col("doc_id") != F.col("_hub"))
            )
            .select(F.col("_hub").alias("doc_a"), F.col("doc_id").alias("doc_b"))
        )
    else:
        small, star = band_sig, None
    x = small.alias("x")
    y = small.alias("y")
    pairs = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bsig") == F.col("y.bsig"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
    )
    if star is not None:
        pairs = pairs.unionByName(star)
    return pairs.distinct()


def simhash(documents: DataFrame, bits: int = 60) -> DataFrame:
    """DataFrame[doc_id, simhash] — 60-bit majority fingerprint over token
    hashes (bit b set iff more token hashes have bit b set than not).

    One groupBy with ``bits`` sum-expressions — no row inflation: the old
    plan crossJoined every token row with a 60-row bit table (60× the token
    count through the shuffle); here each bit's ±1 vote is a separate
    aggregate column, partially aggregated map-side, and the whole thing
    stays in whole-stage codegen."""
    toks = tokenize(documents).select("doc_id", (token_hash(F.col("tok"))).alias("h"))
    votes = toks.groupBy("doc_id").agg(
        *[
            F.sum(
                F.when(F.expr(f"shiftright(h, {b}) & 1") == 1, 1).otherwise(-1)
            ).alias(f"s{b}")
            for b in range(bits)
        ]
    )
    fingerprint = None
    for b in range(bits):
        term = F.when(F.col(f"s{b}") > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
        fingerprint = term if fingerprint is None else fingerprint + term
    return votes.select("doc_id", fingerprint.alias("simhash"))


SIMHASH_BITS = 60
SIMHASH_BANDS = 4  # 4 bands × 15 bits


def simhash_near_dup_pairs(
    documents: DataFrame,
    max_hamming: int = 3,
    bits: int = SIMHASH_BITS,
    bands: int = SIMHASH_BANDS,
    max_bucket_size: int | None = 256,
) -> DataFrame:
    """DataFrame[doc_a, doc_b, hamming] — document pairs whose simhash
    fingerprints differ in at most ``max_hamming`` bits (doc_a < doc_b).

    The two-stage shape every simhash dedup runs at scale:

    1. **band-of-bits blocking**: the ``bits``-bit fingerprint splits into
       ``bands`` equal bit-bands; candidates = pairs agreeing exactly on at
       least one band (a groupBy on (band, band_value) — subquadratic).
       By pigeonhole, ``max_hamming < bands`` differing bits cannot touch
       every band, so recall is EXACT for the default (3 < 4) **provided no
       band bucket exceeds** ``max_bucket_size`` (star-linking a giant
       bucket keeps duplicate clusters spanned but drops its non-hub
       pairs — pass ``max_bucket_size=None`` for the unconditional
       pigeonhole guarantee, as the oracle-gated query does); at larger
       ``max_hamming`` blocking is approximate (standard Manku et al.
       trade-off) but deterministic.
    2. **verify**: ``bit_count(a XOR b) <= max_hamming`` on candidates only.

    **Giant-bucket bound**: same canonical-star treatment as
    ``lsh_candidate_pairs`` — a band bucket larger than ``max_bucket_size``
    links every member to the bucket's min doc_id (O(M) pairs, duplicate
    clusters still spanned) instead of emitting M(M-1)/2 pairs."""
    band_bits = bits // bands
    mask = (1 << band_bits) - 1
    sh = simhash(documents, bits=bits)
    banded = sh.select(
        "doc_id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.expr(f"shiftright(simhash, {b * band_bits}) & {mask}")
                    for b in range(bands)
                ]
            )
        ).alias("band", "bv"),
    )
    if max_bucket_size is not None:
        stats = banded.groupBy("band", "bv").agg(
            F.count("*").alias("_m"), F.min("doc_id").alias("_hub")
        )
        banded = banded.join(stats, ["band", "bv"])
        small = banded.filter(F.col("_m") <= max_bucket_size)
        star = banded.filter(
            (F.col("_m") > max_bucket_size) & (F.col("doc_id") != F.col("_hub"))
        ).select(F.col("_hub").alias("doc_a"), F.col("doc_id").alias("doc_b"))
    else:
        small, star = banded, None
    x, y = small.alias("x"), small.alias("y")
    cands = (
        x.join(
            y,
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bv") == F.col("y.bv"))
            & (F.col("x.doc_id") < F.col("y.doc_id")),
        )
        .select(F.col("x.doc_id").alias("doc_a"), F.col("y.doc_id").alias("doc_b"))
    )
    if star is not None:
        cands = cands.unionByName(star)
    cands = cands.distinct()
    sa = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("_ha"))
    sb = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("_hb"))
    return (
        cands.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("_ha").bitwiseXOR(F.col("_hb"))).cast("long").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def verified_near_duplicates(
    documents: DataFrame,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = 3,
    max_bucket_size: int | None = 256,
) -> DataFrame:
    """DataFrame[doc_a, doc_b, jaccard] — the canonical two-stage dedup:
    LSH candidate pairs (subquadratic) verified by exact shingle Jaccard
    (computed only on candidate pairs), kept at J ≥ threshold."""
    cands = lsh_candidate_pairs(documents, k, bands, n, max_bucket_size)
    sh = shingles(documents, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        cands.join(a, cands["doc_a"] == F.col("a.doc_id"))
        .join(
            b,
            (cands["doc_b"] == F.col("b.doc_id"))
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("common"))
    )
    sa = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"))
    sb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("common") / (F.col("sz_a") + F.col("sz_b") - F.col("common")), 6
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def curate_corpus(
    documents: DataFrame,
    min_tokens: int = 20,
    langs: tuple[str, ...] = ("en",),
    jaccard_t: float = 0.5,
    near_dup: str = "minhash",
    max_hamming: int = 3,
    max_bucket_size: int | None = 256,
    gopher: bool = False,
) -> DataFrame:
    """DataFrame[doc_id, keep, reject_reason] — the composed training-data
    curation pipeline a 100-TB corpus actually runs, as ONE declarative
    plan: token-count floor → language filter → exact dedup (keep the min
    doc_id of each byte-identical cluster) → two-stage near-dup removal
    (the larger doc_id of each near-dup pair loses). ``reject_reason`` is
    the FIRST failing stage in that fixed order (deterministic,
    cross-engine-stable); keep = no stage failed.

    ``gopher=True`` inserts the published Gopher keep/drop rule screen
    (functions/text.gopher_rules) between the language filter and exact
    dedup — reject_reason ``"quality"`` — matching the real pipeline
    order (cheap per-doc screens before any pairwise stage).

    ``near_dup`` selects the near-dup family for stage 4:
    - ``"minhash"`` — MinHash-LSH candidates → exact-Jaccard ≥ jaccard_t
      verify (the shingle-set view of similarity);
    - ``"simhash"`` — band-blocked simhash pairs with Hamming distance ≤
      ``max_hamming`` (the weighted-token-profile view; cheaper — no
      shingle inverted index — and the usual choice when the corpus is
      dominated by boilerplate-perturbed pages).

    Every stage is a reused, individually-oracle-gated operator — this
    gate checks their composition."""
    from .text import gopher_rules, language_id, token_counts

    tc = token_counts(documents).select("doc_id", "n_tokens")
    li = language_id(documents)
    gq = (
        gopher_rules(documents).select("doc_id", F.col("keep").alias("_gq"))
        if gopher
        else documents.select("doc_id", F.lit(True).alias("_gq"))
    )
    ed = exact_duplicates(documents).select("doc_id", "canonical_id")
    if near_dup == "minhash":
        nd_pairs = verified_near_duplicates(
            documents, threshold=jaccard_t, max_bucket_size=max_bucket_size
        )
    elif near_dup == "simhash":
        nd_pairs = simhash_near_dup_pairs(
            documents, max_hamming=max_hamming, max_bucket_size=max_bucket_size
        )
    else:
        raise ValueError(f"near_dup must be 'minhash' or 'simhash', got {near_dup!r}")
    losers = (
        nd_pairs
        .select(F.col("doc_b").alias("doc_id"))
        .distinct()
        .withColumn("_nd", F.lit(True))
    )
    reason = (
        F.when(F.col("n_tokens") < min_tokens, F.lit("too_short"))
        .when(~F.col("lang_pred").isin(*langs), F.lit("lang"))
        .when(~F.col("_gq"), F.lit("quality"))
        .when(F.col("canonical_id") != F.col("doc_id"), F.lit("exact_dup"))
        .when(F.col("_nd"), F.lit("near_dup"))
    )
    return (
        documents.select("doc_id")
        .join(tc, "doc_id")
        .join(li, "doc_id")
        .join(gq, "doc_id")
        .join(ed, "doc_id")
        .join(losers, "doc_id", "left")
        .select(
            "doc_id",
            reason.isNull().alias("keep"),
            reason.alias("reject_reason"),
        )
    )


def decontaminate(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    min_hits: int = 5,
) -> DataFrame:
    """Eval-set decontamination — DataFrame[doc_id, n_hits, contaminated]
    over every TRAIN doc: ``n_hits`` counts its distinct n-gram shingles
    that also occur anywhere in the eval set, ``contaminated`` flags
    ``n_hits >= min_hits`` (the GPT-3 / Pile n-gram-overlap rule: a
    training document that reproduces enough eval n-grams leaks the
    benchmark and must be dropped before training).

    Scale shape: the eval shingle set is DISTINCT-reduced first — eval
    suites are thousands of documents, so it broadcasts; the train-side
    shingle stream then inner-joins it with no shuffle of the corpus. One
    groupBy(doc_id) count and a left join back onto the doc list.
    """
    ev = shingles(eval_docs, n).select("shingle").distinct()
    hits = (
        shingles(train_docs, n)
        .join(ev, "shingle")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hits"))
    )
    return (
        train_docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce("n_hits", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


def dedup_clusters(
    documents: DataFrame,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = 3,
    max_bucket_size: int | None = 256,
) -> DataFrame:
    """DataFrame[doc_id, cluster, keep] — near-duplicate documents grouped
    into clusters via connected components over the verified-pair graph,
    the production web-corpus dedup shape (MinHash LSH → exact verify →
    CC closure): pairwise near-duplication is NOT transitive, so keep/drop
    decisions need the component closure, not the pair list (a≈b and b≈c
    must drop two of {a,b,c} even when a≉c directly).

    cluster = min doc_id of the component (hash-min CC labels ARE min
    member ids; singletons keep their own id); keep = (doc_id == cluster),
    exactly one survivor per cluster. The CC input is the verified pair
    graph — orders of magnitude smaller than the corpus — so the iterative
    kernel runs on near-dup docs only; the corpus itself is touched once
    by the left join that fills in singleton clusters."""
    from ..operators.components import connected_components

    pairs = verified_near_duplicates(
        documents, threshold=threshold, k=k, bands=bands, n=n,
        max_bucket_size=max_bucket_size,
    )
    e = pairs.select(F.col("doc_a").alias("src"), F.col("doc_b").alias("dst"))
    comp = connected_components(e).withColumnRenamed("id", "doc_id")
    return (
        documents.select("doc_id")
        .join(comp, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("component", "doc_id").alias("cluster"),
            (F.coalesce("component", "doc_id") == F.col("doc_id")).alias("keep"),
        )
    )


def segment_dedup(documents: DataFrame, width: int = 8) -> DataFrame:
    """CCNet-style exact segment-level dedup (Wenzek et al. 2020 dedup
    paragraphs across shards; the synthetic corpus has no newlines, so
    the unit here is a fixed ``width``-token window — the same shared
    tokenizer contract as every other text op).

    Every occurrence of a duplicated segment EXCEPT the first — first =
    smallest (doc_id, seg_no) — is removed, and each doc's surviving
    segments are re-joined in order. Returns one row per input doc:
    DataFrame[doc_id, n_segs, n_kept, text_dedup] (text_dedup = '' when
    every segment was a repeat).

    Plan: tokenize → posexplode → groupBy (doc, seg) to build segment
    strings (sort_array over in-segment positions — bounded by ``width``,
    never by doc length) → global first-occurrence via a segment-text
    groupBy-min (NO window over the segment partition: a segment
    duplicated 10⁹ times at corpus scale becomes one min-aggregate row,
    not one sort partition) → semi-join back → per-doc ordered re-join.
    Exact strings and BIGINTs only; nothing float anywhere.
    """
    from .text import tokens_col

    toks = documents.select(
        "doc_id", F.posexplode(tokens_col()).alias("_pos", "_tok")
    )
    segs = (
        toks.withColumn("_seg", (F.col("_pos") / width).cast("long"))
        .groupBy("doc_id", "_seg")
        .agg(
            F.array_join(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("_pos", "_tok"))),
                    lambda s: s["_tok"],
                ),
                " ",
            ).alias("_stext")
        )
    )
    first = segs.groupBy("_stext").agg(
        F.min(F.struct("doc_id", "_seg")).alias("_first")
    )
    kept = segs.join(first, "_stext").filter(
        (F.col("doc_id") == F.col("_first.doc_id"))
        & (F.col("_seg") == F.col("_first._seg"))
    )
    per_doc_kept = kept.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_kept"),
        F.array_join(
            F.transform(
                F.sort_array(F.collect_list(F.struct("_seg", "_stext"))),
                lambda s: s["_stext"],
            ),
            " ",
        ).alias("text_dedup"),
    )
    per_doc_all = segs.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_segs")
    )
    return (
        documents.select("doc_id")
        .join(per_doc_all, "doc_id", "left")
        .join(per_doc_kept, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_segs", F.lit(0)).cast("long").alias("n_segs"),
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("text_dedup", F.lit("")).alias("text_dedup"),
        )
    )


def minhash_estimate_error(
    documents: DataFrame,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = 3,
    max_bucket_size: int | None = 256,
) -> DataFrame:
    """ONE row [n_pairs, mae, max_err] — the measured estimation error of
    the MinHash sketch against exact shingle Jaccard over the LSH
    candidate pairs: est = (matching signature components)/k, err =
    |est − J_exact|. The sketch-accuracy sibling of the ivf_recall gate —
    the k=16 sketch's ±1/√k error bar becomes a gated number.

    Plan: candidates are the subquadratic LSH set; the signature-match
    join touches only candidate·k rows and the exact verify only
    candidate shingle lists — nothing quadratic anywhere. Per-pair values
    are exact rationals in double; floats only meet at the final
    mean/max, rounded to 6 dp.
    """
    cands = lsh_candidate_pairs(documents, k, bands, n, max_bucket_size)
    sig = minhash_signatures(documents, k, n)
    sa = sig.select(
        F.col("doc_id").alias("doc_a"), "i", F.col("minhash").alias("_ma")
    )
    sb = sig.select(
        F.col("doc_id").alias("doc_b"), "i", F.col("minhash").alias("_mb")
    )
    agree = (
        cands.join(sa, "doc_a")
        .join(sb, ["doc_b", "i"])
        .groupBy("doc_a", "doc_b")
        .agg(
            F.sum(
                F.when(F.col("_ma") == F.col("_mb"), 1).otherwise(0)
            ).alias("_agree")
        )
    )
    sh = shingles(documents, n)
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        cands.join(a, cands["doc_a"] == F.col("a.doc_id"))
        .join(
            b,
            (cands["doc_b"] == F.col("b.doc_id"))
            & (F.col("a.shingle") == F.col("b.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("_common"))
    )
    za = sizes.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("_sza"))
    zb = sizes.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("_szb"))
    err = (
        agree.join(inter, ["doc_a", "doc_b"], "left")
        .join(za, "doc_a")
        .join(zb, "doc_b")
        .select(
            F.abs(
                F.col("_agree").cast("double") / F.lit(float(k))
                - F.coalesce("_common", F.lit(0)).cast("double")
                / (F.col("_sza") + F.col("_szb") - F.coalesce("_common", F.lit(0)))
            ).alias("_e")
        )
    )
    return err.agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.round(F.avg("_e"), 6).alias("mae"),
        F.round(F.max("_e"), 6).alias("max_err"),
    )


def substring_dup_spans(
    documents: DataFrame, window: int = 8
) -> DataFrame:
    """Exact-substring duplication scores (Lee et al., "Deduplicating
    Training Data Makes Language Models Better", ACL 2022 — the ExactSubstr
    criterion at token-window granularity): for every doc,

        [doc_id, n_windows, dup_windows, dup_fraction]

    where n_windows counts the doc's FULL ``window``-token Karp–Rabin
    grams (the fingerprints hash family) and dup_windows counts those
    whose gram occurs more than once in the ENTIRE corpus (including
    elsewhere in the same doc — the paper's criterion). dup_fraction =
    dup_windows / n_windows (6 dp; 0 for docs shorter than the window).
    The removal policy (cut the duplicated spans / drop the doc above a
    threshold) composes downstream; this operator is the measurement.

    Plan: one tokenize + per-doc lead-window gram (window bounded by doc
    length, partition = one doc), one corpus-wide gram-count aggregate
    (map-side combined), one equi-join of the doc's grams against the
    count table, one per-doc count aggregate. The gram-count table is the
    only corpus-sized intermediate and it is count-reduced before the
    join — the boilerplate gram that appears 10^9 times is ONE row here.
    """
    toks = tokenize(documents).withColumn(
        "h", token_hash(F.col("tok")) % P31
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    gram = F.lit(0)
    for k in range(window):
        gram = gram + F.coalesce(F.lead("h", k).over(w), F.lit(0)) * (3**k)
    grams = (
        toks.select(
            "doc_id",
            (gram % P31).alias("gh"),
            F.lead("h", window - 1).over(w).alias("_full"),
        )
        .filter(F.col("_full").isNotNull())
        .drop("_full")
    )
    cnt = grams.groupBy("gh").agg(F.count("*").alias("c"))
    per_doc = (
        grams.join(cnt, "gh")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_windows"),
            F.sum((F.col("c") > 1).cast("long")).alias("dup_windows"),
        )
    )
    return (
        documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_windows", F.lit(0)).cast("long").alias("n_windows"),
            F.coalesce("dup_windows", F.lit(0)).cast("long").alias("dup_windows"),
            F.round(
                F.when(
                    F.coalesce("n_windows", F.lit(0)) > 0,
                    F.coalesce("dup_windows", F.lit(0))
                    / F.col("n_windows").cast("double"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_fraction"),
        )
    )


def dedup_survivors(
    documents: DataFrame,
    threshold: float = 0.5,
    k: int = MINHASH_K,
    bands: int = LSH_BANDS,
    n: int = 3,
    max_bucket_size: int | None = 256,
) -> DataFrame:
    """``dedup_clusters`` with CONTENT-aware survivor selection — the rule
    real corpus pipelines use: within each near-dup cluster keep the
    LONGEST document (n_chars DESC, doc_id ASC tie-break), not the
    smallest id, because near-dup clusters routinely mix truncated and
    complete copies of the same page.

    DataFrame[doc_id, cluster, keep] — same shape as dedup_clusters,
    exactly one keep per cluster. The per-cluster rank is a window over
    CLUSTERS (≈ all singletons on a real corpus, hash-spread; a cluster's
    size is bounded by the verified-pair closure, never the corpus)."""
    from pyspark.sql import Window

    clusters = dedup_clusters(
        documents, threshold=threshold, k=k, bands=bands, n=n,
        max_bucket_size=max_bucket_size,
    ).select("doc_id", "cluster")
    ranked = clusters.join(documents.select("doc_id", "n_chars"), "doc_id")
    w = Window.partitionBy("cluster").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    return ranked.select(
        "doc_id",
        "cluster",
        (F.row_number().over(w) == 1).alias("keep"),
    )


def containment_pairs(
    documents: DataFrame,
    n: int = 3,
    threshold: float = 0.7,
    max_shingle_df: int | None = 256,
) -> DataFrame:
    """DataFrame[doc_a, doc_b, containment] — ASYMMETRIC near-dup
    detection (Broder 1997's resemblance vs CONTAINMENT distinction):
    c(A→B) = |A∩B| / |A|, the fraction of A's shingles that also appear
    in B. Catches what symmetric Jaccard misses — a short document
    QUOTED INSIDE a long one scores c ≈ 1 while J ≈ |A|/|B| ≈ 0, and
    quote-inclusion is the dominant near-dup mode Jaccard leaves behind
    in web corpora. Both directions emitted (doc_a ≠ doc_b, one row per
    ordered pair over threshold).

    Same inverted-index plan and hot-shingle df-cap as
    ``ngram_jaccard_pairs`` — the intersection table is computed once on
    unordered pairs and the two ordered rows derive from it."""
    sh = shingles(documents, n)
    if max_shingle_df is not None:
        hot = (
            sh.groupBy("shingle")
            .agg(F.count("*").alias("_df"))
            .filter(F.col("_df") > max_shingle_df)
            .select("shingle")
        )
        sh = sh.join(hot, "shingle", "left_anti")
    sizes = sh.groupBy("doc_id").agg(F.count("*").alias("sz"))
    a, b = sh.alias("a"), sh.alias("b")
    inter = (
        a.join(
            b,
            (F.col("a.shingle") == F.col("b.shingle"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(F.col("a.doc_id").alias("u"), F.col("b.doc_id").alias("v"))
        .agg(F.count("*").alias("common"))
    )
    both = inter.select("u", "v", "common").unionByName(
        inter.select(
            F.col("v").alias("u"), F.col("u").alias("v"), "common"
        )
    )
    sa = sizes.select(F.col("doc_id").alias("u"), F.col("sz").alias("sz_a"))
    return (
        both.join(sa, "u")
        .select(
            F.col("u").alias("doc_a"),
            F.col("v").alias("doc_b"),
            F.round(F.col("common") / F.col("sz_a"), 6).alias("containment"),
        )
        .filter(F.col("containment") >= threshold)
    )


BLOOM_BITS = 1 << 16    # m = 65,536 bits → 2,048 32-bit words (8 KiB)
BLOOM_HASHES = 4        # k; FPR ≈ (1 − e^{−kn/m})^k — ~2.4% at n = 20k


def _bloom_positions(col) -> list:
    """K deterministic bit positions from disjoint 8-hex md5 slices —
    portable to DuckDB as CAST('0x'||substr(md5(s),1+8i,8) AS BIGINT)."""
    h = F.md5(col)
    return [
        (
            F.conv(F.substring(h, 1 + 8 * i, 8), 16, 10).cast("long")
            % F.lit(BLOOM_BITS)
        )
        for i in range(BLOOM_HASHES)
    ]


def bloom_decontaminate(
    train_docs: DataFrame,
    eval_docs: DataFrame,
    n: int = 3,
    min_hits: int = 5,
) -> DataFrame:
    """Bloom-filter eval-set decontamination — DataFrame[doc_id,
    n_bloom_hits, contaminated]: :func:`decontaminate` with the eval
    shingle set compressed into an 8-KiB Bloom filter instead of shipped
    as a join side. ``n_bloom_hits`` ≥ the exact ``n_hits`` (one-sided:
    Bloom probes never miss a real hit, so ``contaminated`` only
    over-flags at the documented FPR — the safe direction for a screen
    whose false positives merely drop extra training docs).

    Scale shape: the filter build aggregates eval shingles to ≤ 2,048
    (word, mask) rows — the ONLY thing that leaves the executors — and the
    probe is a pure per-row expression over the embedded 2,048-long array
    literal: the training corpus is never shuffled AT ALL (the exact
    variant broadcasts the full distinct eval shingle set, which at a
    10⁶-doc eval suite is hundreds of MB; the filter is 8 KiB forever).
    Bit layout: word = pos >> 5, bit = pos & 31 — masks stay positive in
    both engines' BIGINTs.
    """
    ev = shingles(eval_docs, n).select("shingle").distinct()
    words = (
        ev.select(
            F.explode(F.array(*_bloom_positions(F.col("shingle")))).alias("pos")
        )
        .select(
            F.shiftright(F.col("pos"), 5).alias("word"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 32 AS INT))").alias(
                "mask"
            ),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("mask"))
        .collect()  # ≤ 2,048 rows — the bounded driver transfer
    )
    filt = [0] * (BLOOM_BITS >> 5)
    for r in words:
        filt[r["word"]] = r["mask"]

    sh = shingles(train_docs, n)
    pos = _bloom_positions(F.col("shingle"))
    arr = F.lit(filt)  # one array<bigint> literal, projected once
    probed = sh.select(
        "doc_id",
        arr.alias("bf"),
        *[pos[i].alias(f"p{i}") for i in range(BLOOM_HASHES)],
    )
    member = None
    for i in range(BLOOM_HASHES):
        hit = (
            F.element_at(F.col("bf"), (F.shiftright(F.col(f"p{i}"), 5) + 1).cast("int"))
            .bitwiseAND(
                F.expr(f"shiftleft(CAST(1 AS BIGINT), CAST(p{i} % 32 AS INT))")
            )
            != 0
        )
        member = hit if member is None else (member & hit)
    hits = (
        probed.filter(member)
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_bloom_hits"))
    )
    return (
        train_docs.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_bloom_hits", F.lit(0)).cast("long").alias("n_bloom_hits"),
            (F.coalesce("n_bloom_hits", F.lit(0)) >= min_hits).alias("contaminated"),
        )
    )


# --------------------------------------------------- robust winnowing (MOSS)


def winnowing_fingerprints(
    documents: DataFrame, k: int = 3, window: int = 4
) -> DataFrame:
    """DataFrame[doc_id, pos, fp] — robust winnowing (Schleimer, Wilkerson
    & Aiken, SIGMOD 2003 — the MOSS algorithm), the *local* fingerprint
    selection the existing global schemes (minhash / simhash) cannot give:
    every window of ``window`` consecutive k-gram hashes selects its
    minimum (rightmost on ties), which guarantees any shared token run of
    length ≥ window + k − 1 between two documents yields at least one
    SHARED fingerprint — a positional, deterministic partial-overlap
    detector (quote inclusion, boilerplate reuse).

    Grams are the same Karp-Rabin token-gram hashes as
    functions/text.py::fingerprints (Σ 3^j·h(tok_{p+j}) mod 2³¹−1), full
    grams only — docs with < k tokens contribute no fingerprints. Docs
    with fewer than ``window`` grams form one short window (rightmost min
    of all grams), matching the MOSS tail convention.

    Plan (all JVM-side): tokenize → per-doc lead() gram hash → explode
    each gram into the ≤ ``window`` windows containing it → rightmost-min
    per (doc, window) via one row_number over ≤ ``window``-row groups →
    distinct. Every window function is partitioned by (doc, ...) and
    bounded by document length — bounded-doc corpora (the 100-TB
    operating point) have no skew exposure; nothing global, nothing
    driver-side.
    """
    toks = tokenize(documents).withColumn("h", token_hash(F.col("tok")) % P31)
    w_ord = Window.partitionBy("doc_id").orderBy("pos")
    gram = F.lit(0)
    for j in range(k):
        gram = gram + F.lead("h", j).over(w_ord) * (3**j)
    grams = (
        toks.select(
            "doc_id",
            "pos",
            (gram % P31).alias("gh"),
            F.lead("h", k - 1).over(w_ord).alias("_full"),
        )
        .filter(F.col("_full").isNotNull())
        .drop("_full")
    )
    ng = grams.groupBy("doc_id").agg(
        F.count("*").alias("_n"), F.max("pos").alias("_mx")
    )
    # window start positions live in [1, max(n_grams - window + 1, 1)],
    # expressed in gram-pos space (grams are at pos 1..n_grams)
    cand = (
        grams.join(ng, "doc_id")
        .select(
            "doc_id",
            "pos",
            "gh",
            F.greatest(F.col("_n") - F.lit(window - 1), F.lit(1)).alias(
                "_maxw"
            ),
            F.explode(F.sequence(F.lit(0), F.lit(window - 1))).alias("_off"),
        )
        .withColumn("wid", F.col("pos") - F.col("_off"))
        .filter((F.col("wid") >= 1) & (F.col("wid") <= F.col("_maxw")))
    )
    sel = Window.partitionBy("doc_id", "wid").orderBy(
        F.asc("gh"), F.desc("pos")
    )
    return (
        cand.withColumn("_rn", F.row_number().over(sel))
        .filter(F.col("_rn") == 1)
        .select("doc_id", "pos", F.col("gh").alias("fp"))
        .distinct()
    )


def winnowing_matches(
    documents: DataFrame,
    k: int = 3,
    window: int = 4,
    min_shared: int = 2,
    max_df: int | None = None,
) -> DataFrame:
    """DataFrame[a, b, shared] — document pairs sharing ≥ ``min_shared``
    distinct winnowing fingerprint VALUES (the MOSS match report). The
    standard two-stage shape: local fingerprints, then an inverted-index
    self-join on fingerprint value. ``max_df`` drops fingerprints shared
    by more than ``max_df`` docs (boilerplate — the df-cap discipline of
    the n-gram joiner above); the oracle gate runs uncapped.
    """
    fps = (
        winnowing_fingerprints(documents, k=k, window=window)
        .select("doc_id", "fp")
        .distinct()
    )
    if max_df is not None:
        hot = fps.groupBy("fp").agg(F.count("*").alias("_d"))
        fps = fps.join(
            hot.filter(F.col("_d") <= max_df).select("fp"), "fp", "left_semi"
        )
    a = fps.select(F.col("fp"), F.col("doc_id").alias("a"))
    b = fps.select(F.col("fp"), F.col("doc_id").alias("b"))
    return (
        a.join(b, "fp")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count("*").alias("shared"))
        .filter(F.col("shared") >= min_shared)
    )
