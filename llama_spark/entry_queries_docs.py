"""Driver-gate queries + DuckDB oracles for the training-data operators
(documents / embeddings tables). See entry_queries.py for the graph set.

Portability contract (identical in Spark and DuckDB):
- tokens  = filter(split(lower(text), '\\s+'), x <> '')
- hash(s) = int(md5(s)[:15 hex], 16)  (60-bit)
- minhash params from the fixed LCG in functions/dedup.minhash_params
- LSH hyperplane weights from the closed form in functions/similarity
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .functions.dedup import MINHASH_K, minhash_params
from .functions.text import LANG_MARKERS, P31, STOPWORDS

JACCARD_T = 0.3
NGRAM_MAX_DF = 256  # hot-shingle df-cap, symmetric with LSH max_bucket_size
ANN_PLANES = 4
NEAR_DUP_T = 0.2
TOPK_K = 5
TOPK_QUERIES = 20
EMB_DIM = 64

# shared SQL fragments -------------------------------------------------------

TOKS_SQL = r"""
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '')) AS tok,
         generate_subscripts(list_filter(string_split_regex(lower(text), '\s+'), x -> x <> ''), 1) AS pos
  FROM documents
"""

HASH = "CAST(('0x' || substr(md5({0}), 1, 15)) AS BIGINT)"

SHINGLES_SQL = f"""
  SELECT DISTINCT doc_id, shingle FROM (
    SELECT doc_id, pos,
           concat_ws(' ', tok,
                     lead(tok, 1) OVER w,
                     lead(tok, 2) OVER w) AS shingle,
           lead(tok, 2) OVER w IS NOT NULL AS is_full,
           max(pos) OVER (PARTITION BY doc_id) AS max_pos
    FROM toks
    WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
  ) WHERE is_full OR (max_pos < 3 AND pos = 1)
"""


def _lang_markers_values() -> str:
    return ", ".join(
        f"('{lang}', '{w}')" for lang, ws in sorted(LANG_MARKERS.items()) for w in ws
    )


def _minhash_params_values() -> str:
    return ", ".join(f"({i}, {a}, {b})" for i, a, b in minhash_params(MINHASH_K))


def _plane_dot(p: int, vec: str = "v") -> str:
    terms = []
    for d in range(EMB_DIM):
        w = ((1103515245 * (p * EMB_DIM + d) + 12345) % 65536) / 65536.0 - 0.5
        terms.append(f"{vec}[{d+1}]*({w!r})")
    return " + ".join(terms)


def _bucket_expr(planes: int, vec: str = "v") -> str:
    cases = [
        f"(CASE WHEN ({_plane_dot(p, vec)}) > 0 THEN {1 << p} ELSE 0 END)"
        for p in range(planes)
    ]
    return " + ".join(cases)


VECS_SQL = """
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
"""

NORMED_SQL = """
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm FROM vecs
"""


# ---------------------------------------------------------------- queries


def q_token_counts(spark, sf_dir):
    from .functions.text import token_counts

    return token_counts(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_quality_scores(spark, sf_dir):
    from .functions.text import quality_scores

    return quality_scores(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_language_id(spark, sf_dir):
    from .functions.text import language_id

    return language_id(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_fingerprints(spark, sf_dir):
    from .functions.text import fingerprints

    return fingerprints(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_exact_duplicates(spark, sf_dir):
    from .functions.dedup import exact_duplicates

    return exact_duplicates(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_ngram_jaccard(spark, sf_dir):
    from .functions.dedup import ngram_jaccard_pairs

    return ngram_jaccard_pairs(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        n=3,
        threshold=JACCARD_T,
        max_shingle_df=NGRAM_MAX_DF,
    )


def q_minhash_signatures(spark, sf_dir):
    from .functions.dedup import minhash_signatures

    return minhash_signatures(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_lsh_candidates(spark, sf_dir):
    from .functions.dedup import lsh_candidate_pairs

    return lsh_candidate_pairs(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def q_simhash(spark, sf_dir):
    from .functions.dedup import simhash

    return simhash(spark.read.parquet(f"{sf_dir}/documents.parquet"))


KMV_K = 256
TOP_TOKENS_K = 20


def q_kmv_distinct_tokens(spark, sf_dir):
    from .functions.sketch import kmv_distinct_tokens

    return kmv_distinct_tokens(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), k=KMV_K
    )


def q_top_tokens(spark, sf_dir):
    from .functions.sketch import top_tokens

    return top_tokens(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), k=TOP_TOKENS_K
    )


SIMHASH_MAX_HAMMING = 3  # < bands(4) → pigeonhole-exact recall


def q_simhash_pairs(spark, sf_dir):
    """max_bucket_size=None mirrors the oracle SQL, which has no giant-
    bucket star-linking — the gate stays hash-exact even if some band
    bucket ever exceeds the library default cap of 256 docs."""
    from .functions.dedup import simhash_near_dup_pairs

    return simhash_near_dup_pairs(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        max_hamming=SIMHASH_MAX_HAMMING,
        max_bucket_size=None,
    )


def q_cosine_topk(spark, sf_dir):
    from .functions.similarity import cosine_topk

    df = cosine_topk(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), k=TOPK_K, n_queries=TOPK_QUERIES
    )
    return df.withColumn("rank", F.col("rank").cast("long"))


def q_lsh_ann(spark, sf_dir):
    from .functions.similarity import lsh_ann

    df = lsh_ann(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        k=TOPK_K,
        planes=ANN_PLANES,
        n_queries=TOPK_QUERIES,
    )
    return df.withColumn("rank", F.col("rank").cast("long"))


def q_media_features(spark, sf_dir):
    """Multimodal plumbing gate: documents.text bytes become the binary
    payload column of a media table; the REAL mapInPandas/Arrow plan runs
    with the deterministic digest-derived fake decoder (the documented
    stub for the absent codec), so every derived feature is exactly
    SQL-replicable. feature_bytes_sum folds the float32 feature vector
    back to its integer digest bytes (x*255 rounds exactly)."""
    from .functions.multimodal import extract_features

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    media = docs.select(
        F.col("doc_id").alias("media_id"),
        F.lit("doc").alias("kind"),
        F.col("text").cast("binary").alias("payload"),
        F.create_map(F.lit("src"), F.lit("documents")).alias("meta"),
    )
    feats = extract_features(media, feat_dim=8, decoder="fake")
    return feats.select(
        F.col("media_id").alias("doc_id"),
        F.col("width").cast("long").alias("width"),
        F.col("height").cast("long").alias("height"),
        F.col("n_bytes").cast("long").alias("n_bytes"),
        F.round("mean_intensity", 6).alias("mean_intensity"),
        F.aggregate(
            "feature",
            F.lit(0).cast("long"),
            lambda a, x: a + F.round(x * 255, 0).cast("long"),
        ).alias("feature_bytes_sum"),
    )


def q_near_dup_embeddings(spark, sf_dir):
    from .functions.similarity import near_duplicate_pairs

    return near_duplicate_pairs(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        threshold=NEAR_DUP_T,
        planes=ANN_PLANES,
    )


# ------------------------------------------------------------- oracle SQL

_STOP_LIST = "[" + ", ".join(f"'{s}'" for s in STOPWORDS) + "]"

DOCS_ORACLE: dict[str, str] = {
    "token_counts": r"""
WITH lt AS (
  SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens
FROM lt""",
    "quality_scores": rf"""
WITH lt AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
  FROM documents)
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars_measured,
       CAST(len(toks) AS BIGINT) AS n_tokens,
       ROUND(CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
             / (CASE WHEN len(toks) > 0 THEN len(toks) END), 6) AS avg_token_len,
       ROUND(CAST(len(list_filter(toks, x -> list_contains({_STOP_LIST}, x))) AS DOUBLE)
             / (CASE WHEN len(toks) > 0 THEN len(toks) END), 6) AS stopword_ratio,
       ROUND(CAST(length(text) - length(regexp_replace(text, '[.,!?;:]', '', 'g')) AS DOUBLE)
             / (CASE WHEN length(text) > 0 THEN length(text) END), 6) AS punct_ratio
FROM lt""",
    "language_id": f"""
WITH toks AS MATERIALIZED ({TOKS_SQL}),
markers(cand_lang, marker) AS (VALUES {_lang_markers_values()}),
hits AS (
  SELECT t.doc_id, m.cand_lang, COUNT(*) AS hits
  FROM toks t JOIN markers m ON t.tok = m.marker
  GROUP BY t.doc_id, m.cand_lang),
ranked AS (
  SELECT doc_id, cand_lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand_lang ASC) AS rn
  FROM hits)
SELECT d.doc_id, COALESCE(r.cand_lang, 'und') AS lang_pred
FROM documents d LEFT JOIN (SELECT doc_id, cand_lang FROM ranked WHERE rn = 1) r
  ON d.doc_id = r.doc_id""",
    "fingerprints": f"""
WITH toks AS MATERIALIZED ({TOKS_SQL}),
h AS (SELECT doc_id, pos, {HASH.format('tok')} % {P31} AS h FROM toks),
grams AS (
  SELECT doc_id,
         (h + 3*COALESCE(lead(h,1) OVER w, 0) + 9*COALESCE(lead(h,2) OVER w, 0)
            + 27*COALESCE(lead(h,3) OVER w, 0)) % {P31} AS gram_hash
  FROM h WINDOW w AS (PARTITION BY doc_id ORDER BY pos))
SELECT doc_id, MIN(gram_hash) AS fingerprint FROM grams GROUP BY doc_id""",
    "exact_duplicates": """
WITH hashed AS (SELECT doc_id, md5(text) AS text_hash FROM documents),
canon AS (SELECT text_hash, MIN(doc_id) AS canonical_id FROM hashed GROUP BY text_hash)
SELECT h.doc_id, c.canonical_id, h.text_hash
FROM hashed h JOIN canon c ON h.text_hash = c.text_hash""",
    "ngram_jaccard": f"""
WITH toks AS MATERIALIZED ({TOKS_SQL}),
sh0 AS MATERIALIZED ({SHINGLES_SQL}),
-- same hot-shingle df-cap as ngram_jaccard_pairs(max_shingle_df={NGRAM_MAX_DF})
sh AS MATERIALIZED (
  SELECT doc_id, shingle FROM sh0
  WHERE shingle NOT IN (
    SELECT shingle FROM sh0 GROUP BY shingle HAVING COUNT(*) > {NGRAM_MAX_DF})),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY a.doc_id, b.doc_id)
SELECT doc_a, doc_b,
       ROUND(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
WHERE ROUND(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6) >= {JACCARD_T}""",
    "media_features": """
WITH d AS (
  SELECT doc_id, md5(text) AS mh, sha256(text) AS sh,
         octet_length(CAST(text AS BLOB)) AS nb
  FROM documents)
SELECT doc_id,
       CAST(16 + CAST(('0x' || substr(mh, 1, 2)) AS INTEGER) % 240 AS BIGINT) AS width,
       CAST(16 + CAST(('0x' || substr(mh, 3, 2)) AS INTEGER) % 240 AS BIGINT) AS height,
       CAST(nb AS BIGINT) AS n_bytes,
       ROUND(CAST(('0x' || substr(mh, 5, 4)) AS INTEGER) / 65535.0, 6) AS mean_intensity,
       CAST(CAST(('0x' || substr(sh, 1, 2)) AS INTEGER)
          + CAST(('0x' || substr(sh, 3, 2)) AS INTEGER)
          + CAST(('0x' || substr(sh, 5, 2)) AS INTEGER)
          + CAST(('0x' || substr(sh, 7, 2)) AS INTEGER)
          + CAST(('0x' || substr(sh, 9, 2)) AS INTEGER)
          + CAST(('0x' || substr(sh, 11, 2)) AS INTEGER)
          + CAST(('0x' || substr(sh, 13, 2)) AS INTEGER)
          + CAST(('0x' || substr(sh, 15, 2)) AS INTEGER) AS BIGINT) AS feature_bytes_sum
FROM d""",
    "minhash_signatures": f"""
WITH toks AS MATERIALIZED ({TOKS_SQL}),
sh AS MATERIALIZED ({SHINGLES_SQL}),
params(i, a, b) AS (VALUES {_minhash_params_values()}),
x AS (SELECT doc_id, {HASH.format('shingle')} % {P31} AS x FROM sh)
SELECT x.doc_id, CAST(p.i AS INTEGER) AS i, MIN((p.a * x.x + p.b) % {P31}) AS minhash
FROM x CROSS JOIN params p
GROUP BY x.doc_id, p.i""",
    "lsh_candidates": f"""
WITH toks AS MATERIALIZED ({TOKS_SQL}),
sh AS MATERIALIZED ({SHINGLES_SQL}),
params(i, a, b) AS (VALUES {_minhash_params_values()}),
x AS (SELECT doc_id, {HASH.format('shingle')} % {P31} AS x FROM sh),
sig AS MATERIALIZED (
  SELECT x.doc_id, p.i, MIN((p.a * x.x + p.b) % {P31}) AS minhash
  FROM x CROSS JOIN params p GROUP BY x.doc_id, p.i),
band_sig AS MATERIALIZED (
  -- i // 4: DuckDB '/' on ints is float division and CAST rounds-to-nearest;
  -- '//' floors, matching Spark's cast-truncation of (i/4)
  SELECT doc_id, CAST(i // 4 AS INTEGER) AS band,
         string_agg(concat(i, ':', minhash), ',' ORDER BY concat(i, ':', minhash)) AS bsig
  FROM sig GROUP BY doc_id, CAST(i // 4 AS INTEGER))
SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
FROM band_sig x JOIN band_sig y
  ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id""",
    "simhash": f"""
WITH toks AS MATERIALIZED ({TOKS_SQL}),
h AS (SELECT doc_id, {HASH.format('tok')} AS h FROM toks),
bits AS (SELECT CAST(range AS INTEGER) AS b FROM range(60)),
votes AS (
  SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h CROSS JOIN bits GROUP BY doc_id, b)
SELECT doc_id,
       CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
FROM votes GROUP BY doc_id""",
    "kmv_distinct_tokens": f"""
WITH toks AS MATERIALIZED ({TOKS_SQL}),
h AS (SELECT DISTINCT {HASH.format('tok')} % {P31} AS h FROM toks),
u AS (SELECT h / CAST({P31} AS DOUBLE) AS u FROM h ORDER BY u LIMIT {KMV_K})
SELECT COUNT(*) AS n_seen_k,
       ROUND(MAX(u), 9) AS kth_min_u,
       ROUND(CASE WHEN COUNT(*) < {KMV_K} THEN CAST(COUNT(*) AS DOUBLE)
                  ELSE {float(KMV_K - 1)!r} / MAX(u) END, 3) AS distinct_est
FROM u""",
    "top_tokens": f"""
WITH toks AS MATERIALIZED ({TOKS_SQL})
SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
ORDER BY n DESC, tok ASC LIMIT {TOP_TOKENS_K}""",
    "simhash_pairs": f"""
WITH toks AS MATERIALIZED ({TOKS_SQL}),
h AS (SELECT doc_id, {HASH.format('tok')} AS h FROM toks),
bits AS (SELECT CAST(range AS INTEGER) AS b FROM range(60)),
votes AS (
  SELECT doc_id, b, SUM(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM h CROSS JOIN bits GROUP BY doc_id, b),
sh AS MATERIALIZED (
  SELECT doc_id,
         CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
  FROM votes GROUP BY doc_id),
bands AS (SELECT CAST(range AS INTEGER) AS band FROM range(4)),
banded AS MATERIALIZED (
  SELECT doc_id, simhash, band, (simhash >> (band * 15)) & 32767 AS bv
  FROM sh CROSS JOIN bands),
cands AS (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bv = y.bv AND x.doc_id < y.doc_id)
SELECT c.doc_a, c.doc_b,
       CAST(bit_count(xor(a.simhash, b.simhash)) AS BIGINT) AS hamming
FROM cands c JOIN sh a ON a.doc_id = c.doc_a JOIN sh b ON b.doc_id = c.doc_b
WHERE bit_count(xor(a.simhash, b.simhash)) <= 3""",
    "cosine_topk": f"""
WITH vecs AS ({VECS_SQL}),
normed AS MATERIALIZED ({NORMED_SQL}),
q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn FROM normed ORDER BY vec_id LIMIT {TOPK_QUERIES}),
scored AS (
  SELECT q.qid AS query_id, n.vec_id AS neighbor_id,
         ROUND(list_sum(list_transform(list_zip(q.qv, n.v), p -> p[1]*p[2]))
               / (q.qn * n.nrm), 4) AS cos_sim
  FROM q CROSS JOIN normed n WHERE q.qid <> n.vec_id),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {TOPK_K}""",
}


def _ann_sql() -> str:
    bucket = _bucket_expr(ANN_PLANES)
    return f"""
WITH vecs AS ({VECS_SQL}),
normed AS MATERIALIZED (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm,
         ({bucket}) AS bucket
  FROM vecs),
q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn, bucket AS qbucket
      FROM normed ORDER BY vec_id LIMIT {TOPK_QUERIES}),
scored AS (
  SELECT q.qid AS query_id, n.vec_id AS neighbor_id,
         ROUND(list_sum(list_transform(list_zip(q.qv, n.v), p -> p[1]*p[2]))
               / (q.qn * n.nrm), 4) AS cos_sim
  FROM q JOIN normed n ON q.qbucket = n.bucket WHERE q.qid <> n.vec_id),
ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored)
SELECT query_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {TOPK_K}"""


def _near_dup_sql() -> str:
    bucket = _bucket_expr(ANN_PLANES)
    return f"""
WITH vecs AS ({VECS_SQL}),
normed AS MATERIALIZED (
  SELECT vec_id, v, sqrt(list_sum(list_transform(v, x -> x*x))) AS nrm,
         ({bucket}) AS bucket
  FROM vecs)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       ROUND(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1]*p[2]))
             / (a.nrm * b.nrm), 4) AS cos_sim
FROM normed a JOIN normed b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
WHERE ROUND(list_sum(list_transform(list_zip(a.v, b.v), p -> p[1]*p[2]))
            / (a.nrm * b.nrm), 4) >= {NEAR_DUP_T}"""


DOCS_ORACLE["lsh_ann"] = _ann_sql()
DOCS_ORACLE["near_dup_embeddings"] = _near_dup_sql()

DOCS_QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "token_counts": q_token_counts,
    "quality_scores": q_quality_scores,
    "language_id": q_language_id,
    "fingerprints": q_fingerprints,
    "exact_duplicates": q_exact_duplicates,
    "ngram_jaccard": q_ngram_jaccard,
    "minhash_signatures": q_minhash_signatures,
    "lsh_candidates": q_lsh_candidates,
    "simhash": q_simhash,
    "simhash_pairs": q_simhash_pairs,
    "kmv_distinct_tokens": q_kmv_distinct_tokens,
    "top_tokens": q_top_tokens,
    "cosine_topk": q_cosine_topk,
    "lsh_ann": q_lsh_ann,
    "near_dup_embeddings": q_near_dup_embeddings,
    "media_features": q_media_features,
}


def q_lsh_verified_dedup(spark, sf_dir):
    """The canonical two-stage dedup: LSH candidates → exact Jaccard verify
    (≥ 0.5). Candidate generation is subquadratic; verification touches
    only candidate pairs."""
    from .functions.dedup import verified_near_duplicates

    return verified_near_duplicates(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), threshold=0.5
    )


DOCS_ORACLE["lsh_verified_dedup"] = DOCS_ORACLE["lsh_candidates"].replace(
    """SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
FROM band_sig x JOIN band_sig y
  ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id""",
    """, cands AS MATERIALIZED (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM band_sig x JOIN band_sig y
    ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS common
  FROM cands c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b)
SELECT i.doc_a, i.doc_b,
       ROUND(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6) AS jaccard
FROM inter i JOIN sizes sa ON sa.doc_id = i.doc_a
JOIN sizes sb ON sb.doc_id = i.doc_b
WHERE ROUND(CAST(common AS DOUBLE) / (sa.sz + sb.sz - common), 6) >= 0.5""",
)
DOCS_QUERIES["lsh_verified_dedup"] = q_lsh_verified_dedup

CURATE_MIN_TOKENS = 20


def q_corpus_curation(spark, sf_dir):
    """The composed curation pipeline (token floor → lang → exact dedup →
    verified near-dup) — each stage an already-gated operator; this gate
    checks the composition end-to-end."""
    from .functions.dedup import curate_corpus

    return curate_corpus(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        min_tokens=CURATE_MIN_TOKENS,
        langs=("en",),
        jaccard_t=0.5,
    )


def q_corpus_curation_simhash(spark, sf_dir):
    """The same composed curation with the OTHER near-dup family: stage 4
    rejects the larger doc of every simhash pair at Hamming ≤ 3 (uncapped
    band buckets to mirror the oracle, like q_simhash_pairs)."""
    from .functions.dedup import curate_corpus

    return curate_corpus(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        min_tokens=CURATE_MIN_TOKENS,
        langs=("en",),
        near_dup="simhash",
        max_hamming=SIMHASH_MAX_HAMMING,
        max_bucket_size=None,
    )


DOCS_QUERIES["corpus_curation_simhash"] = q_corpus_curation_simhash

DOCS_ORACLE["corpus_curation"] = f"""
WITH tc AS MATERIALIZED (SELECT doc_id, n_tokens FROM ({DOCS_ORACLE['token_counts']})),
li AS MATERIALIZED (SELECT doc_id, lang_pred FROM ({DOCS_ORACLE['language_id']})),
ed AS MATERIALIZED (SELECT doc_id, canonical_id FROM ({DOCS_ORACLE['exact_duplicates']})),
nd AS MATERIALIZED (SELECT DISTINCT doc_b AS doc_id FROM ({DOCS_ORACLE['lsh_verified_dedup']})),
r AS (
  SELECT d.doc_id,
         CASE WHEN tc.n_tokens < {CURATE_MIN_TOKENS} THEN 'too_short'
              WHEN li.lang_pred <> 'en' THEN 'lang'
              WHEN ed.canonical_id <> d.doc_id THEN 'exact_dup'
              WHEN nd.doc_id IS NOT NULL THEN 'near_dup' END AS reject_reason
  FROM documents d
  JOIN tc ON tc.doc_id = d.doc_id
  JOIN li ON li.doc_id = d.doc_id
  JOIN ed ON ed.doc_id = d.doc_id
  LEFT JOIN nd ON nd.doc_id = d.doc_id)
SELECT doc_id, reject_reason IS NULL AS keep, reject_reason FROM r"""
DOCS_QUERIES["corpus_curation"] = q_corpus_curation

DOCS_ORACLE["corpus_curation_simhash"] = f"""
WITH tc AS MATERIALIZED (SELECT doc_id, n_tokens FROM ({DOCS_ORACLE['token_counts']})),
li AS MATERIALIZED (SELECT doc_id, lang_pred FROM ({DOCS_ORACLE['language_id']})),
ed AS MATERIALIZED (SELECT doc_id, canonical_id FROM ({DOCS_ORACLE['exact_duplicates']})),
nd AS MATERIALIZED (SELECT DISTINCT doc_b AS doc_id FROM ({DOCS_ORACLE['simhash_pairs']})),
r AS (
  SELECT d.doc_id,
         CASE WHEN tc.n_tokens < {CURATE_MIN_TOKENS} THEN 'too_short'
              WHEN li.lang_pred <> 'en' THEN 'lang'
              WHEN ed.canonical_id <> d.doc_id THEN 'exact_dup'
              WHEN nd.doc_id IS NOT NULL THEN 'near_dup' END AS reject_reason
  FROM documents d
  JOIN tc ON tc.doc_id = d.doc_id
  JOIN li ON li.doc_id = d.doc_id
  JOIN ed ON ed.doc_id = d.doc_id
  LEFT JOIN nd ON nd.doc_id = d.doc_id)
SELECT doc_id, reject_reason IS NULL AS keep, reject_reason FROM r"""


# ---- tf-idf top terms + BM25 retrieval (functions/text) --------------------

TFIDF_TOP_K = 3
BM25_TERMS = ["spark", "join", "stream"]
BM25_TOP_K = 20


def q_tfidf_top_terms(spark, sf_dir):
    from .functions.text import tfidf_top_terms

    return tfidf_top_terms(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), top_k=TFIDF_TOP_K
    )


DOCS_ORACLE["tfidf_top_terms"] = f"""WITH toks AS MATERIALIZED ({TOKS_SQL}),
tf AS MATERIALIZED (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY doc_id, tok),
nd AS (SELECT COUNT(*) AS n FROM documents),
dfx AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
scored AS (
  SELECT t.doc_id, t.tok, t.tf,
         t.tf * LN(CAST((SELECT n FROM nd) AS DOUBLE) / d.df) AS s
  FROM tf t JOIN dfx d ON d.tok = t.tok)
SELECT doc_id, tok, CAST(tf AS BIGINT) AS tf, ROUND(s, 6) AS score FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY s DESC, tok) AS rn
  FROM scored) t WHERE rn <= {TFIDF_TOP_K}"""

DOCS_QUERIES["tfidf_top_terms"] = q_tfidf_top_terms


def q_bm25(spark, sf_dir):
    from .functions.text import bm25_scores

    return bm25_scores(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        query_terms=BM25_TERMS,
        top_k=BM25_TOP_K,
    )


_BM25_IN = ", ".join(f"'{t}'" for t in BM25_TERMS)

DOCS_ORACLE["bm25"] = f"""WITH toks AS MATERIALIZED ({TOKS_SQL}),
lens AS MATERIALIZED (SELECT doc_id, COUNT(*) AS dl FROM toks GROUP BY doc_id),
avgdl AS (SELECT CAST(SUM(dl) AS DOUBLE) / COUNT(*) AS a FROM lens),
nd AS (SELECT COUNT(*) AS n FROM documents),
qtf AS MATERIALIZED (
  SELECT doc_id, tok, COUNT(*) AS tf FROM toks
  WHERE tok IN ({_BM25_IN}) GROUP BY doc_id, tok),
qdf AS (SELECT tok, COUNT(*) AS df FROM qtf GROUP BY tok),
idf AS (SELECT tok,
               LN(1e0 + (CAST((SELECT n FROM nd) AS DOUBLE) - df + 0.5) / (df + 0.5)) AS idf
        FROM qdf),
contrib AS (
  SELECT q.doc_id,
         i.idf * q.tf * 2.2e0
         / (q.tf + 1.2e0 * (1e0 - 0.75e0 + 0.75e0 * l.dl / (SELECT a FROM avgdl))) AS c
  FROM qtf q JOIN idf i ON i.tok = q.tok JOIN lens l ON l.doc_id = q.doc_id)
SELECT doc_id, ROUND(SUM(c), 6) AS score FROM contrib
GROUP BY doc_id ORDER BY score DESC, doc_id LIMIT {BM25_TOP_K}"""

DOCS_QUERIES["bm25"] = q_bm25


# ---- k-means + IVF ANN (functions/cluster, functions/similarity) -----------

KMEANS_SQL_K = 10
KMEANS_SQL_ITERS = 4
IVF_NPROBE = 2


def _kmeans_ctes(k: int = KMEANS_SQL_K, iters: int = KMEANS_SQL_ITERS) -> list[str]:
    """Unrolled Lloyd: c0 = vectors of the k smallest vec_ids; then
    a{i} = argmin_cl ROUND(sqdist, 6) (ties on cl) against c{i-1},
    c{i} = per-(cl, dim) AVG — exactly functions/cluster.kmeans_fit.
    The FINAL assignment a{iters} is computed against c{iters-1}."""
    ctes = [
        """dvecs AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings)""",
        f"""c0 AS MATERIALIZED (
  SELECT r.cl, d.dim, d.val
  FROM (SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cl
        FROM embeddings ORDER BY vec_id LIMIT {k}) r
  JOIN dvecs d ON d.vec_id = r.vec_id)""",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""d{i} AS (
  SELECT v.vec_id, c.cl,
         ROUND(SUM((v.val - c.val) * (v.val - c.val)), 6) AS dist
  FROM dvecs v JOIN c{i-1} c ON c.dim = v.dim
  GROUP BY v.vec_id, c.cl),
a{i} AS MATERIALIZED (
  SELECT vec_id, cl FROM (
    SELECT vec_id, cl,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
    FROM d{i}) t WHERE rn = 1)"""
        )
        if i < iters:
            ctes.append(
                f"""c{i} AS MATERIALIZED (
  SELECT a.cl, v.dim, AVG(v.val) AS val
  FROM a{i} a JOIN dvecs v ON v.vec_id = a.vec_id
  GROUP BY a.cl, v.dim)"""
            )
    return ctes


def q_kmeans(spark, sf_dir):
    from .functions.cluster import kmeans_assign

    return kmeans_assign(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        k=KMEANS_SQL_K,
        iters=KMEANS_SQL_ITERS,
    )


DOCS_ORACLE["kmeans"] = (
    "WITH "
    + ",\n".join(_kmeans_ctes())
    + f"\nSELECT vec_id, cl AS cluster FROM a{KMEANS_SQL_ITERS}"
)
DOCS_QUERIES["kmeans"] = q_kmeans


def q_ivf_ann(spark, sf_dir):
    from .functions.similarity import ivf_ann

    df = ivf_ann(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        k=TOPK_K,
        n_clusters=KMEANS_SQL_K,
        kmeans_iters=KMEANS_SQL_ITERS,
        nprobe=IVF_NPROBE,
        n_queries=TOPK_QUERIES,
    )
    return df.withColumn("rank", F.col("rank").cast("long"))


def _ivf_sql() -> str:
    I = KMEANS_SQL_ITERS
    ctes = _kmeans_ctes() + [
        f"vecs AS ({VECS_SQL})",
        f"normed AS MATERIALIZED ({NORMED_SQL})",
        f"""inv AS MATERIALIZED (
  SELECT a.vec_id AS nid, a.cl AS cluster, n.v, n.nrm
  FROM a{I} a JOIN normed n ON n.vec_id = a.vec_id)""",
        f"""q AS (SELECT vec_id AS qid, v AS qv, nrm AS qn
  FROM normed ORDER BY vec_id LIMIT {TOPK_QUERIES})""",
        f"""qdist AS (
  SELECT v.vec_id AS qid, c.cl,
         ROUND(SUM((v.val - c.val) * (v.val - c.val)), 6) AS d
  FROM dvecs v JOIN c{I-1} c ON c.dim = v.dim
  WHERE v.vec_id IN (SELECT qid FROM q)
  GROUP BY v.vec_id, c.cl)""",
        f"""probes AS (
  SELECT qid, cl FROM (
    SELECT qid, cl, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY d, cl) AS rn
    FROM qdist) t WHERE rn <= {IVF_NPROBE})""",
        """scored AS (
  SELECT p.qid AS query_id, i.nid AS neighbor_id,
         ROUND(list_sum(list_transform(list_zip(q.qv, i.v), z -> z[1]*z[2]))
               / (q.qn * i.nrm), 4) AS cos_sim
  FROM probes p JOIN q ON q.qid = p.qid JOIN inv i ON i.cluster = p.cl
  WHERE i.nid <> p.qid)""",
        """ranked AS (
  SELECT query_id, neighbor_id, cos_sim,
         ROW_NUMBER() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
  FROM scored)""",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + f"""\nSELECT query_id, neighbor_id, cos_sim, CAST(rank AS BIGINT) AS rank
FROM ranked WHERE rank <= {TOPK_K}"""
    )


DOCS_ORACLE["ivf_ann"] = _ivf_sql()
DOCS_QUERIES["ivf_ann"] = q_ivf_ann


# ---- cluster-balanced diversity sampling ------------------------------------

SAMPLE_PER_CLUSTER = 10


def q_balanced_sample(spark, sf_dir):
    from .functions.cluster import cluster_balanced_sample

    return cluster_balanced_sample(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        per_cluster=SAMPLE_PER_CLUSTER,
        k=KMEANS_SQL_K,
        iters=KMEANS_SQL_ITERS,
    )


DOCS_ORACLE["balanced_sample"] = (
    "WITH "
    + ",\n".join(_kmeans_ctes())
    + f""",
ranked AS (
  SELECT vec_id, cl AS cluster,
         ROW_NUMBER() OVER (PARTITION BY cl ORDER BY vec_id) AS rn
  FROM a{KMEANS_SQL_ITERS})
SELECT vec_id, cluster FROM ranked WHERE rn <= {SAMPLE_PER_CLUSTER}"""
)
DOCS_QUERIES["balanced_sample"] = q_balanced_sample


# ---- eval-set decontamination ----------------------------------------------

DECON_MOD = 41  # synthetic eval set: doc_id % 41 == 0
DECON_MIN_HITS = 5


def q_decontaminate(spark, sf_dir):
    from .functions.dedup import decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return decontaminate(
        docs.filter(F.col("doc_id") % DECON_MOD != 0),
        docs.filter(F.col("doc_id") % DECON_MOD == 0),
        n=3,
        min_hits=DECON_MIN_HITS,
    )


DOCS_ORACLE["decontaminate"] = f"""WITH toks AS MATERIALIZED ({TOKS_SQL}),
sh AS MATERIALIZED ({SHINGLES_SQL}),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {DECON_MOD} = 0),
tr AS (SELECT * FROM sh WHERE doc_id % {DECON_MOD} <> 0),
hits AS (SELECT t.doc_id, COUNT(*) AS n_hits
         FROM tr t JOIN ev ON ev.shingle = t.shingle GROUP BY t.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(h.n_hits, 0) AS BIGINT) AS n_hits,
       COALESCE(h.n_hits, 0) >= {DECON_MIN_HITS} AS contaminated
FROM documents d LEFT JOIN hits h ON h.doc_id = d.doc_id
WHERE d.doc_id % {DECON_MOD} <> 0"""
DOCS_QUERIES["decontaminate"] = q_decontaminate


# --- dedup clusters: CC closure over verified near-dup pairs (r5) ----------

def q_dedup_clusters(spark, sf_dir):
    """Pair-level near-duplication is not transitive — the keep/drop
    decision needs the connected-component closure of the verified-pair
    graph. cluster = min doc_id of the component (hash-min CC); keep =
    exactly one survivor per cluster. Composes three gated operators:
    lsh_candidates → verified jaccard → connected_components."""
    from .functions.dedup import dedup_clusters

    return dedup_clusters(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), threshold=0.5
    )


DOCS_ORACLE["dedup_clusters"] = f"""WITH RECURSIVE pairs AS MATERIALIZED (
{DOCS_ORACLE["lsh_verified_dedup"]}
),
und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b AS a, doc_a AS b FROM pairs),
reach AS (SELECT a, b FROM und
          UNION SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b),
comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster FROM reach GROUP BY a)
SELECT d.doc_id,
       COALESCE(c.cluster, d.doc_id) AS cluster,
       COALESCE(c.cluster, d.doc_id) = d.doc_id AS keep
FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id"""
DOCS_QUERIES["dedup_clusters"] = q_dedup_clusters


# --- Gopher repetition filters (r5) -----------------------------------------

def q_repetition_ratios(spark, sf_dir):
    """Duplicate/top n-gram token fractions per doc (Gopher repetition
    rules) — boilerplate and degenerate-text signal."""
    from .functions.text import repetition_ratios

    return repetition_ratios(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), ns=(2, 3)
    )


def _rep_sql() -> str:
    ctes = [f"toks AS MATERIALIZED ({TOKS_SQL})"]
    joins, cols = [], []
    for n in (2, 3):
        parts = ", ".join(
            ["tok"] + [f"lead(tok, {i}) OVER w" for i in range(1, n)]
        )
        ctes.append(
            f"""g{n} AS (
  SELECT doc_id, concat_ws(' ', {parts}) AS gram,
         lead(tok, {n - 1}) OVER w IS NOT NULL AS f
  FROM toks WINDOW w AS (PARTITION BY doc_id ORDER BY pos))"""
        )
        ctes.append(
            f"c{n} AS (SELECT doc_id, gram, COUNT(*) AS c FROM g{n} "
            f"WHERE f GROUP BY doc_id, gram)"
        )
        ctes.append(
            f"""a{n} AS (
  SELECT doc_id,
         ROUND(1e0 - CAST(COUNT(*) AS DOUBLE) / SUM(c), 6) AS dup_{n}gram_frac,
         ROUND(CAST(MAX(c) AS DOUBLE) / SUM(c), 6) AS top_{n}gram_frac
  FROM c{n} GROUP BY doc_id)"""
        )
        joins.append(f"LEFT JOIN a{n} ON a{n}.doc_id = d.doc_id")
        cols.append(
            f"COALESCE(dup_{n}gram_frac, 0e0) AS dup_{n}gram_frac, "
            f"COALESCE(top_{n}gram_frac, 0e0) AS top_{n}gram_frac"
        )
    return (
        "WITH " + ",\n".join(ctes)
        + "\nSELECT d.doc_id, " + ", ".join(cols)
        + "\nFROM documents d " + " ".join(joins)
    )


DOCS_ORACLE["repetition_ratios"] = _rep_sql()
DOCS_QUERIES["repetition_ratios"] = q_repetition_ratios


# --- deterministic dataset splits (r5) ---------------------------------------

SPLIT_SEED = 42


def q_dataset_splits(spark, sf_dir):
    """Hash-based train/val/test assignment — stable under corpus growth
    and reshuffles (membership is a pure function of doc_id), the
    reproducibility property row_number/sample-based splits lack."""
    from .functions.cluster import dataset_splits

    return dataset_splits(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), seed=SPLIT_SEED
    )


DOCS_ORACLE["dataset_splits"] = f"""WITH b AS (
  SELECT doc_id,
         {HASH.format(f"concat(CAST(doc_id AS VARCHAR), ':split:{SPLIT_SEED}')")} % 100
           AS bucket
  FROM documents)
SELECT doc_id, bucket,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split
FROM b"""
DOCS_QUERIES["dataset_splits"] = q_dataset_splits


# --- unigram NLL quality score (r5) ------------------------------------------

def q_unigram_logprob(spark, sf_dir):
    """CCNet-style perplexity-proxy: per-doc avg −ln p(token) under the
    corpus unigram distribution; per-token costs quantized to integer
    micro-nats so per-doc sums are order-independent and engine-exact."""
    from .functions.text import unigram_logprob

    return unigram_logprob(spark.read.parquet(f"{sf_dir}/documents.parquet"))


DOCS_ORACLE["unigram_logprob"] = f"""WITH toks AS MATERIALIZED ({TOKS_SQL}),
freq AS (SELECT tok, COUNT(*) AS cnt FROM toks GROUP BY tok),
tt AS (SELECT CAST(COUNT(*) AS BIGINT) AS total FROM toks),
costs AS (
  SELECT tok,
         CAST(ROUND((ln(CAST(total AS DOUBLE)) - ln(CAST(cnt AS DOUBLE)))
              * 1000000.0) AS BIGINT) AS micro_nll
  FROM freq CROSS JOIN tt),
per_doc AS (
  SELECT t.doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         CAST(SUM(c.micro_nll) AS BIGINT) AS nll_micro
  FROM toks t JOIN costs c ON c.tok = t.tok GROUP BY t.doc_id)
SELECT d.doc_id,
       COALESCE(p.n_tokens, 0) AS n_tokens,
       COALESCE(p.nll_micro, 0) AS nll_micro,
       CASE WHEN COALESCE(p.n_tokens, 0) > 0
            THEN ROUND(p.nll_micro / (p.n_tokens * 1000000.0), 6)
            ELSE 0e0 END AS avg_nll
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id"""
DOCS_QUERIES["unigram_logprob"] = q_unigram_logprob


# --- content/PII screening flags (r5) ----------------------------------------

def q_content_flags(spark, sf_dir):
    """Regex safety screen (emails, long digit runs, urls) — patterns kept
    in the Java-regex ∩ RE2 common subset so both engines agree on the
    semantics, not just the aggregate."""
    from .functions.text import content_flags

    return content_flags(spark.read.parquet(f"{sf_dir}/documents.parquet"))


DOCS_ORACLE["content_flags"] = r"""SELECT doc_id,
       regexp_matches(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
         AS has_email,
       regexp_matches(text, '[0-9]{9,}') AS has_long_digits,
       regexp_matches(text, '(https?://|www\.)') AS has_url,
       (regexp_matches(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')
        OR regexp_matches(text, '[0-9]{9,}')
        OR regexp_matches(text, '(https?://|www\.)')) AS flagged
FROM documents"""
DOCS_QUERIES["content_flags"] = q_content_flags


# ------------------------------------------------ segment-level dedup

SEG_WIDTH = 8


def q_segment_dedup(spark, sf_dir):
    """CCNet-style exact segment dedup — every non-first occurrence of a
    duplicated 8-token window removed, docs re-joined in order."""
    from .functions.dedup import segment_dedup

    return segment_dedup(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), width=SEG_WIDTH
    )


DOCS_ORACLE["segment_dedup"] = f"""WITH toks AS MATERIALIZED ({TOKS_SQL}),
segs AS MATERIALIZED (
  SELECT doc_id, CAST((pos - 1) // {SEG_WIDTH} AS BIGINT) AS seg,
         string_agg(tok, ' ' ORDER BY pos) AS stext
  FROM toks GROUP BY doc_id, (pos - 1) // {SEG_WIDTH}),
ranked AS (
  SELECT doc_id, seg, stext,
         row_number() OVER (PARTITION BY stext ORDER BY doc_id, seg) AS rn
  FROM segs),
pk AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(stext, ' ' ORDER BY seg) AS text_dedup
  FROM ranked WHERE rn = 1 GROUP BY doc_id),
pa AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segs FROM segs GROUP BY doc_id)
SELECT d.doc_id, COALESCE(pa.n_segs, 0) AS n_segs,
       COALESCE(pk.n_kept, 0) AS n_kept,
       COALESCE(pk.text_dedup, '') AS text_dedup
FROM documents d
LEFT JOIN pa ON pa.doc_id = d.doc_id
LEFT JOIN pk ON pk.doc_id = d.doc_id"""
DOCS_QUERIES["segment_dedup"] = q_segment_dedup


# ---------------------------------------------------- sequence packing

PACK_BUDGET = 64
PACK_GROUPS = 8


def q_pack_sequences(spark, sf_dir):
    """Greedy fixed-budget sequence packing — docs sharded into streams,
    each stream packed in doc_id order (see functions/text.pack_sequences).
    Non-SQL-native semantics, so the oracle replays the greedy walk with a
    recursive CTE (bounded by the longest stream)."""
    from .functions.text import pack_sequences

    return pack_sequences(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        budget=PACK_BUDGET,
        n_groups=PACK_GROUPS,
    )


DOCS_ORACLE["pack_sequences"] = rf"""WITH RECURSIVE lt AS (
  SELECT doc_id, CAST(doc_id % {PACK_GROUPS} AS BIGINT) AS grp,
         CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents),
base AS (
  SELECT doc_id, grp, n_tokens,
         row_number() OVER (PARTITION BY grp ORDER BY doc_id) AS rn
  FROM lt),
walk AS (
  SELECT doc_id, grp, n_tokens, rn,
         CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS "offset",
         n_tokens AS acc
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.doc_id, b.grp, b.n_tokens, b.rn,
         CASE WHEN w.acc + b.n_tokens > {PACK_BUDGET}
              THEN w.seq_id + 1 ELSE w.seq_id END,
         CASE WHEN w.acc + b.n_tokens > {PACK_BUDGET}
              THEN CAST(0 AS BIGINT) ELSE w.acc END,
         CASE WHEN w.acc + b.n_tokens > {PACK_BUDGET}
              THEN b.n_tokens ELSE w.acc + b.n_tokens END
  FROM walk w JOIN base b ON b.grp = w.grp AND b.rn = w.rn + 1)
SELECT doc_id, grp, seq_id, "offset", n_tokens FROM walk"""
DOCS_QUERIES["pack_sequences"] = q_pack_sequences


# ------------------------------------- graph × embeddings feature join

NMEAN_DIMS = 8


def q_neighbor_features(spark, sf_dir):
    """GraphSAGE-style 1-hop mean feature aggregation — the link graph
    joined to the embedding table, element-wise neighbor means in long
    (id, dim, mean_val) format."""
    from .entry_queries import load_edges
    from .functions.similarity import neighbor_mean_embeddings

    return neighbor_mean_embeddings(
        load_edges(spark, sf_dir),
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        dims=NMEAN_DIMS,
    )


def _neighbor_features_sql() -> str:
    from .entry_queries import EDGES_SQL

    return f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
emb AS (SELECT vec_id, embedding[1:{NMEAN_DIMS}] AS e FROM embeddings),
comp AS (
  SELECT g.src AS id,
         generate_subscripts(m.e, 1) - 1 AS dim,
         unnest(m.e) AS val
  FROM edges g JOIN emb m ON m.vec_id = g.dst)
SELECT id, CAST(dim AS BIGINT) AS dim,
       ROUND(SUM(CAST(val AS DOUBLE)) / COUNT(*), 6) AS mean_val
FROM comp GROUP BY id, dim"""


DOCS_ORACLE["neighbor_features"] = _neighbor_features_sql()
DOCS_QUERIES["neighbor_features"] = q_neighbor_features


# ------------------------------------------------- ANN recall meta-gate


def q_ivf_recall(spark, sf_dir):
    """Recall@k of the IVF-Flat index against brute-force cosine truth on
    the same query set — the ANN quality knob measured, not asserted.
    Composes the two already-gated pipelines; the oracle composes their
    SQL the same way."""
    from .functions.similarity import ann_recall

    return ann_recall(
        q_cosine_topk(spark, sf_dir), q_ivf_ann(spark, sf_dir)
    )


def _ivf_recall_sql() -> str:
    truth = DOCS_ORACLE["cosine_topk"]
    appr = DOCS_ORACLE["ivf_ann"]
    return f"""WITH truth AS (
  SELECT query_id, neighbor_id FROM ({truth}) t),
appr AS (
  SELECT query_id, neighbor_id FROM ({appr}) a),
hit AS (SELECT CAST(COUNT(*) AS BIGINT) AS hits
        FROM truth JOIN appr USING (query_id, neighbor_id)),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS truth_pairs FROM truth)
SELECT t.truth_pairs, h.hits,
       ROUND(CAST(h.hits AS DOUBLE)
             / (CASE WHEN t.truth_pairs > 0 THEN t.truth_pairs END), 6)
         AS recall
FROM tot t, hit h"""


DOCS_ORACLE["ivf_recall"] = _ivf_recall_sql()
DOCS_QUERIES["ivf_recall"] = q_ivf_recall


# -------------------------------------------- minhash estimation error


def q_minhash_error(spark, sf_dir):
    """Measured MinHash sketch accuracy: |est − exact Jaccard| over the
    LSH candidate pairs (mean + worst). The sketch-error sibling of
    ivf_recall — accuracy claimed by the k=16 signature becomes a gated
    number."""
    from .functions.dedup import minhash_estimate_error

    return minhash_estimate_error(
        spark.read.parquet(f"{sf_dir}/documents.parquet")
    )


DOCS_ORACLE["minhash_error"] = DOCS_ORACLE["lsh_candidates"].replace(
    """SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
FROM band_sig x JOIN band_sig y
  ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id""",
    """, cands AS MATERIALIZED (
  SELECT DISTINCT x.doc_id AS doc_a, y.doc_id AS doc_b
  FROM band_sig x JOIN band_sig y
    ON x.band = y.band AND x.bsig = y.bsig AND x.doc_id < y.doc_id),
agree AS (
  SELECT c.doc_a, c.doc_b,
         SUM(CASE WHEN sa.minhash = sb.minhash THEN 1 ELSE 0 END) AS agree
  FROM cands c
  JOIN sig sa ON sa.doc_id = c.doc_a
  JOIN sig sb ON sb.doc_id = c.doc_b AND sb.i = sa.i
  GROUP BY c.doc_a, c.doc_b),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT c.doc_a, c.doc_b, COUNT(*) AS common
  FROM cands c
  JOIN sh a ON a.doc_id = c.doc_a
  JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
  GROUP BY c.doc_a, c.doc_b),
err AS (
  SELECT ABS(CAST(g.agree AS DOUBLE) / 16
             - CAST(COALESCE(i.common, 0) AS DOUBLE)
               / (sa.sz + sb.sz - COALESCE(i.common, 0))) AS e
  FROM agree g
  LEFT JOIN inter i ON i.doc_a = g.doc_a AND i.doc_b = g.doc_b
  JOIN sizes sa ON sa.doc_id = g.doc_a
  JOIN sizes sb ON sb.doc_id = g.doc_b)
SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
       ROUND(AVG(e), 6) AS mae, ROUND(MAX(e), 6) AS max_err
FROM err""",
)
DOCS_QUERIES["minhash_error"] = q_minhash_error


def q_neighbor_features_2hop(spark, sf_dir):
    """Stacked (2-layer) mean aggregation — each node averages its
    out-neighbors' 1-hop mean vectors; the GraphSAGE layer-stack shape
    without learned weights."""
    from .entry_queries import load_edges
    from .functions.similarity import neighbor_mean_embeddings

    return neighbor_mean_embeddings(
        load_edges(spark, sf_dir),
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        dims=NMEAN_DIMS,
        hops=2,
    )


def _neighbor_features_2hop_sql() -> str:
    from .entry_queries import EDGES_SQL

    return f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
emb AS (SELECT vec_id, embedding[1:{NMEAN_DIMS}] AS e FROM embeddings),
comp AS (
  SELECT g.src AS id,
         generate_subscripts(m.e, 1) - 1 AS dim,
         unnest(m.e) AS val
  FROM edges g JOIN emb m ON m.vec_id = g.dst),
h1 AS MATERIALIZED (
  SELECT id, CAST(dim AS BIGINT) AS dim,
         ROUND(SUM(CAST(val AS DOUBLE)) / COUNT(*), 6) AS mean_val
  FROM comp GROUP BY id, dim),
h1i AS (SELECT id, dim, CAST(ROUND(mean_val * 1e6) AS BIGINT) AS pv FROM h1),
agg2 AS (
  SELECT g.src AS id, p.dim,
         CAST(SUM(p.pv) AS BIGINT) AS s, CAST(COUNT(*) AS BIGINT) AS c
  FROM edges g JOIN h1i p ON p.id = g.dst
  GROUP BY g.src, p.dim)
SELECT id, dim,
       CAST((CASE WHEN s < 0 THEN -1 ELSE 1 END)
            * ((abs(s) * 2 + c) // (2 * c)) AS DOUBLE) / 1e6 AS mean_val
FROM agg2"""


DOCS_ORACLE["neighbor_features_2hop"] = _neighbor_features_2hop_sql()
DOCS_QUERIES["neighbor_features_2hop"] = q_neighbor_features_2hop


# ------------------------------------------------------------ BPE training

BPE_MERGES = 6
BPE_TOP_WORDS = 512


def q_bpe_merges(spark, sf_dir):
    """Tokenizer training: learn the first 6 BPE merges from corpus word
    frequencies (capped vocabulary) — deterministic tie-breaks, greedy
    run-parity pairing; the oracle replays the identical recurrence."""
    from .functions.bpe import bpe_merges

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bpe_merges(docs, n_merges=BPE_MERGES, top_words=BPE_TOP_WORDS)


def _bpe_sql() -> str:
    ctes = [
        f"""words AS MATERIALIZED (
  SELECT w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
    SELECT unnest(regexp_split_to_array(lower(text), '\\s+')) AS w
    FROM documents) WHERE w <> ''
  GROUP BY w ORDER BY freq DESC, w ASC LIMIT {BPE_TOP_WORDS})""",
        """s0 AS MATERIALIZED (
  SELECT w, freq,
         CAST(generate_subscripts(string_split(w, ''), 1) AS INTEGER) AS pos,
         unnest(string_split(w, '')) AS sym
  FROM words)""",
    ]
    for r in range(1, BPE_MERGES + 1):
        ctes.append(
            f"""p{r} AS MATERIALIZED (
  SELECT w, freq, pos, sym,
         lead(sym) OVER (PARTITION BY w ORDER BY pos) AS nxt
  FROM s{r-1})"""
        )
        ctes.append(
            f"""best{r} AS MATERIALIZED (
  SELECT sym AS a, nxt AS b, CAST(SUM(freq) AS BIGINT) AS total
  FROM p{r} WHERE nxt IS NOT NULL
  GROUP BY sym, nxt ORDER BY total DESC, a ASC, b ASC LIMIT 1)"""
        )
        ctes.append(
            f"""heads{r} AS MATERIALIZED (
  SELECT w, pos FROM (
    SELECT w, pos, row_number() OVER (PARTITION BY w, run_id ORDER BY pos) AS idx
    FROM (
      SELECT w, pos,
             SUM(CASE WHEN prev IS NULL OR pos <> prev + 1 THEN 1 ELSE 0 END)
               OVER (PARTITION BY w ORDER BY pos
                     ROWS UNBOUNDED PRECEDING) AS run_id
      FROM (SELECT m.w, m.pos, lag(m.pos) OVER (PARTITION BY m.w ORDER BY m.pos) AS prev
            FROM (SELECT p.w, p.pos FROM p{r} p JOIN best{r} bb
                  ON p.sym = bb.a AND p.nxt = bb.b) m)))
  WHERE idx % 2 = 1)"""
        )
        ctes.append(
            f"""s{r} AS MATERIALIZED (
  SELECT w, freq, CAST(row_number() OVER (PARTITION BY w ORDER BY pos) AS INTEGER) AS pos, sym
  FROM (
    SELECT p.w AS w, p.freq AS freq, p.pos AS pos,
           CASE WHEN h.pos IS NOT NULL THEN p.sym || p.nxt ELSE p.sym END AS sym,
           g.pos AS gone
    FROM p{r} p
    LEFT JOIN heads{r} h ON h.w = p.w AND h.pos = p.pos
    LEFT JOIN heads{r} g ON g.w = p.w AND g.pos = p.pos - 1
  ) WHERE gone IS NULL)"""
        )
    unions = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS INTEGER) AS merge_rank, a AS left_sym, b AS right_sym, total AS pair_freq FROM best{r}"
        for r in range(1, BPE_MERGES + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + unions


DOCS_ORACLE["bpe_merges"] = _bpe_sql()
DOCS_QUERIES["bpe_merges"] = q_bpe_merges


# --- bigram conditional NLL quality score -------------------------------------

def q_bigram_logprob(spark, sf_dir):
    """Second-order perplexity proxy: per-doc avg −ln p(w2|w1) under the
    corpus bigram model; per-bigram costs quantized to integer micro-nats
    so per-doc sums are order-independent and engine-exact."""
    from .functions.text import bigram_logprob

    return bigram_logprob(spark.read.parquet(f"{sf_dir}/documents.parquet"))


DOCS_ORACLE["bigram_logprob"] = f"""WITH toks AS MATERIALIZED ({TOKS_SQL}),
bi AS MATERIALIZED (
  SELECT a.doc_id, a.tok AS w1, b.tok AS w2
  FROM toks a JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + 1),
cnt AS (SELECT w1, w2, COUNT(*) AS cnt FROM bi GROUP BY w1, w2),
ctx AS (SELECT w1, SUM(cnt) AS ctx FROM cnt GROUP BY w1),
costs AS (
  SELECT c.w1, c.w2,
         CAST(ROUND((ln(CAST(x.ctx AS DOUBLE)) - ln(CAST(c.cnt AS DOUBLE)))
              * 1000000.0) AS BIGINT) AS micro_nll
  FROM cnt c JOIN ctx x ON x.w1 = c.w1),
per_doc AS (
  SELECT b.doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         CAST(SUM(c.micro_nll) AS BIGINT) AS nll_micro
  FROM bi b JOIN costs c ON c.w1 = b.w1 AND c.w2 = b.w2
  GROUP BY b.doc_id)
SELECT d.doc_id,
       COALESCE(p.n_bigrams, 0) AS n_bigrams,
       COALESCE(p.nll_micro, 0) AS nll_micro,
       CASE WHEN COALESCE(p.n_bigrams, 0) > 0
            THEN ROUND(p.nll_micro / (p.n_bigrams * 1000000.0), 6)
            ELSE 0e0 END AS avg_nll
FROM documents d LEFT JOIN per_doc p ON p.doc_id = d.doc_id"""
DOCS_QUERIES["bigram_logprob"] = q_bigram_logprob


# --- best-fit-decreasing packing ----------------------------------------------

def q_pack_bestfit(spark, sf_dir):
    """Best-fit-decreasing packing: longest-first, fullest-fitting-bin
    placement per stream (see functions/text.pack_sequences_bestfit).
    The oracle replays the walk with a recursive CTE whose state is the
    per-stream LIST of open-bin loads."""
    from .functions.text import pack_sequences_bestfit

    return pack_sequences_bestfit(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        budget=PACK_BUDGET,
        n_groups=PACK_GROUPS,
    )


_BF_BEST = "list_max(list_filter(w.loads, x -> x + b.n_tokens <= {B}))"
_BF_POS = "list_position(w.loads, " + _BF_BEST + ")"
DOCS_ORACLE["pack_bestfit"] = rf"""WITH RECURSIVE lt AS (
  SELECT doc_id, CAST(doc_id % {PACK_GROUPS} AS BIGINT) AS grp,
         CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens
  FROM documents),
base AS (
  SELECT doc_id, grp, n_tokens,
         row_number() OVER (PARTITION BY grp
                            ORDER BY n_tokens DESC, doc_id) AS rn
  FROM lt),
walk AS (
  SELECT doc_id, grp, n_tokens, rn,
         CAST(0 AS BIGINT) AS seq_id, CAST(0 AS BIGINT) AS "offset",
         [n_tokens] AS loads
  FROM base WHERE rn = 1
  UNION ALL
  SELECT b.doc_id, b.grp, b.n_tokens, b.rn,
         CASE WHEN {_BF_BEST.format(B=PACK_BUDGET)} IS NULL
              THEN CAST(len(w.loads) AS BIGINT)
              ELSE CAST({_BF_POS.format(B=PACK_BUDGET)} - 1 AS BIGINT) END,
         CASE WHEN {_BF_BEST.format(B=PACK_BUDGET)} IS NULL
              THEN CAST(0 AS BIGINT)
              ELSE {_BF_BEST.format(B=PACK_BUDGET)} END,
         CASE WHEN {_BF_BEST.format(B=PACK_BUDGET)} IS NULL
              THEN list_append(w.loads, b.n_tokens)
              ELSE list_concat(list_concat(
                     list_slice(w.loads, 1, {_BF_POS.format(B=PACK_BUDGET)} - 1),
                     [{_BF_BEST.format(B=PACK_BUDGET)} + b.n_tokens]),
                     list_slice(w.loads, {_BF_POS.format(B=PACK_BUDGET)} + 1,
                                len(w.loads))) END
  FROM walk w JOIN base b ON b.grp = w.grp AND b.rn = w.rn + 1)
SELECT doc_id, grp, seq_id, "offset", n_tokens FROM walk"""
DOCS_QUERIES["pack_bestfit"] = q_pack_bestfit


# --- product-quantization ADC search ------------------------------------------

PQ_M, PQ_K, PQ_ITERS, PQ_TOPK = 2, 8, 2, 5
PQ_DIM = 64  # embeddings table dimensionality


def q_pq_ann(spark, sf_dir):
    """PQ-ADC approximate nearest neighbors: per-subspace deterministic
    Lloyd codebooks, integer micro-unit lookup-table distances, top-k per
    query (see functions/similarity.pq_ann)."""
    from .functions.similarity import pq_ann

    return pq_ann(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        m=PQ_M,
        k_codes=PQ_K,
        iters=PQ_ITERS,
        k=PQ_TOPK,
        n_queries=TOPK_QUERIES,
    )


def _pq_sub_ctes(su: int) -> list[str]:
    """Per-subspace unrolled Lloyd over dims [su*d+1, (su+1)*d] with
    prefixed CTE names — mirrors _kmeans_ctes exactly, restricted."""
    d = PQ_DIM // PQ_M
    lo, hi = su * d + 1, (su + 1) * d
    p = f"s{su}_"
    ctes = [
        f"""{p}dv AS MATERIALIZED (
  SELECT vec_id, dim, val FROM dvecs WHERE dim BETWEEN {lo} AND {hi})""",
        f"""{p}c0 AS MATERIALIZED (
  SELECT r.cl, d.dim, d.val
  FROM (SELECT vec_id, CAST(ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS INT) AS cl
        FROM embeddings ORDER BY vec_id LIMIT {PQ_K}) r
  JOIN {p}dv d ON d.vec_id = r.vec_id)""",
    ]
    for i in range(1, PQ_ITERS + 1):
        ctes.append(
            f"""{p}d{i} AS (
  SELECT v.vec_id, c.cl,
         ROUND(SUM((v.val - c.val) * (v.val - c.val)), 6) AS dist
  FROM {p}dv v JOIN {p}c{i-1} c ON c.dim = v.dim
  GROUP BY v.vec_id, c.cl),
{p}a{i} AS MATERIALIZED (
  SELECT vec_id, cl FROM (
    SELECT vec_id, cl,
           ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
    FROM {p}d{i}) t WHERE rn = 1)"""
        )
        if i < PQ_ITERS:
            ctes.append(
                f"""{p}c{i} AS MATERIALIZED (
  SELECT a.cl, v.dim, AVG(v.val) AS val
  FROM {p}a{i} a JOIN {p}dv v ON v.vec_id = a.vec_id
  GROUP BY a.cl, v.dim)"""
            )
    return ctes


def _pq_sql() -> str:
    I = PQ_ITERS
    ctes = [
        """dvecs AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) AS dim,
         CAST(unnest(embedding) AS DOUBLE) AS val
  FROM embeddings)""",
    ]
    for su in range(PQ_M):
        ctes += _pq_sub_ctes(su)
    codes = " UNION ALL ".join(
        f"SELECT vec_id, CAST({su} AS BIGINT) AS sub, CAST(cl AS BIGINT) AS code "
        f"FROM s{su}_a{I}"
        for su in range(PQ_M)
    )
    ctes.append(f"codes AS MATERIALIZED ({codes})")
    ctes.append(
        f"""qids AS (SELECT vec_id AS qid FROM embeddings
  ORDER BY vec_id LIMIT {TOPK_QUERIES})"""
    )
    lut = " UNION ALL ".join(
        f"""SELECT v.vec_id AS qid, CAST({su} AS BIGINT) AS sub,
       CAST(c.cl AS BIGINT) AS code,
       CAST(ROUND(ROUND(SUM((v.val - c.val) * (v.val - c.val)), 6)
            * 1000000.0) AS BIGINT) AS d_micro
  FROM s{su}_dv v JOIN s{su}_c{I-1} c ON c.dim = v.dim
  WHERE v.vec_id IN (SELECT qid FROM qids)
  GROUP BY v.vec_id, c.cl"""
        for su in range(PQ_M)
    )
    ctes.append(f"lut AS MATERIALIZED ({lut})")
    ctes.append(
        """pairs AS (
  SELECT l.qid, c.vec_id, SUM(l.d_micro) AS adc_micro
  FROM codes c JOIN lut l ON l.sub = c.sub AND l.code = c.code
  WHERE c.vec_id <> l.qid
  GROUP BY l.qid, c.vec_id)"""
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT qid AS query_id, vec_id AS neighbor_id,
       CAST(adc_micro AS BIGINT) AS adc_micro, CAST(rank AS BIGINT) AS rank
FROM (
  SELECT qid, vec_id, adc_micro,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY adc_micro ASC, vec_id ASC) AS rank
  FROM pairs) t
WHERE rank <= {PQ_TOPK}"""
    )


DOCS_ORACLE["pq_ann"] = _pq_sql()
DOCS_QUERIES["pq_ann"] = q_pq_ann


# --------------------------------------------------- token entropy


def q_token_entropy(spark, sf_dir):
    """Per-doc Shannon entropy of the token distribution (micro-nat
    integer quantization — order-independent, see functions/text.py)."""
    from .functions.text import token_entropy

    return token_entropy(spark.read.parquet(f"{sf_dir}/documents.parquet"))


DOCS_ORACLE["token_entropy"] = r"""WITH tok AS (
  SELECT doc_id,
         unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS tok
  FROM documents),
cnt AS (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY doc_id, tok),
tot AS (SELECT doc_id, SUM(c) AS n, COUNT(*) AS dt FROM cnt GROUP BY doc_id),
micro AS (
  SELECT c.doc_id, t.n, t.dt,
         CAST(ROUND((LN(CAST(t.n AS DOUBLE)) - LN(CAST(c.c AS DOUBLE)))
                    * CAST(c.c AS DOUBLE) * 1000000.0) AS BIGINT) AS m
  FROM cnt c JOIN tot t ON t.doc_id = c.doc_id),
per AS (
  SELECT doc_id, CAST(MAX(n) AS BIGINT) AS n_tokens,
         CAST(MAX(dt) AS BIGINT) AS distinct_tokens,
         ROUND(SUM(m) / (MAX(n) * 1000000.0), 6) AS entropy_nats
  FROM micro GROUP BY doc_id)
SELECT d.doc_id,
       COALESCE(p.n_tokens, 0) AS n_tokens,
       COALESCE(p.distinct_tokens, 0) AS distinct_tokens,
       COALESCE(p.entropy_nats, 0e0) AS entropy_nats
FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id"""
DOCS_QUERIES["token_entropy"] = q_token_entropy


# --------------------------------------------------- kmeans inertia


def q_kmeans_inertia(spark, sf_dir):
    """Per-cluster within-cluster sum of squared distances (k-means
    objective) for the gate quantizer."""
    from .functions.cluster import kmeans_inertia

    # gate operating point: 2 Lloyd iterations (the inertia math is
    # iteration-count-agnostic; the kmeans gate already pins 4-iter parity)
    return kmeans_inertia(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        k=KMEANS_SQL_K, iters=2,
    )


DOCS_ORACLE["kmeans_inertia"] = (
    "WITH "
    + ",\n".join(_kmeans_ctes(iters=2))
    + """
SELECT CAST(a.cl AS BIGINT) AS cluster,
       COUNT(*) AS n_vectors,
       ROUND(SUM(CAST(ROUND(d.dist * 1000000.0) AS BIGINT)) / 1000000.0, 6)
         AS inertia
FROM a2 a
JOIN d2 d ON d.vec_id = a.vec_id AND d.cl = a.cl
GROUP BY a.cl"""
)
DOCS_QUERIES["kmeans_inertia"] = q_kmeans_inertia


# --------------------------------------------------- token power law

ZIPF_CMIN = 4


def q_token_powerlaw(spark, sf_dir):
    """Hill estimate of the corpus token-frequency (Zipf) tail exponent."""
    from .functions.text import token_powerlaw

    return token_powerlaw(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), c_min=ZIPF_CMIN
    )


DOCS_ORACLE["token_powerlaw"] = rf"""WITH tok AS (
  SELECT unnest(list_filter(string_split_regex(lower(text), '\s+'),
                            x -> x <> '')) AS tok
  FROM documents),
cnt AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
hist AS (SELECT c, COUNT(*) AS m FROM cnt WHERE c >= {ZIPF_CMIN} GROUP BY c),
aggd AS (
  SELECT CAST(COALESCE(SUM(m), 0) AS BIGINT) AS n,
         SUM(m * ln(CAST(c AS DOUBLE) / {float(ZIPF_CMIN)!r})) AS lm
  FROM hist)
SELECT CAST({ZIPF_CMIN} AS BIGINT) AS c_min, n AS n_tail,
       CASE WHEN lm > 0e0 THEN ROUND(1e0 + CAST(n AS DOUBLE) / lm, 6) END AS alpha
FROM aggd"""
DOCS_QUERIES["token_powerlaw"] = q_token_powerlaw


# --------------------------------------------------- langid confusion


def q_langid_confusion(spark, sf_dir):
    """Marker-heuristic language-ID confusion matrix vs the labeled lang
    column."""
    from .functions.text import langid_confusion

    return langid_confusion(spark.read.parquet(f"{sf_dir}/documents.parquet"))


DOCS_ORACLE["langid_confusion"] = f"""
WITH toks AS MATERIALIZED ({TOKS_SQL}),
markers(cand_lang, marker) AS (VALUES {_lang_markers_values()}),
hits AS (
  SELECT t.doc_id, m.cand_lang, COUNT(*) AS hits
  FROM toks t JOIN markers m ON t.tok = m.marker
  GROUP BY t.doc_id, m.cand_lang),
ranked AS (
  SELECT doc_id, cand_lang,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, cand_lang ASC) AS rn
  FROM hits),
pred AS (
  SELECT d.doc_id, d.lang, COALESCE(r.cand_lang, 'und') AS lang_pred
  FROM documents d LEFT JOIN (SELECT doc_id, cand_lang FROM ranked WHERE rn = 1) r
    ON d.doc_id = r.doc_id),
grid AS (
  SELECT lang, lang_pred, COUNT(*) AS n FROM pred GROUP BY lang, lang_pred),
tot AS (SELECT lang, SUM(n) AS t FROM grid GROUP BY lang)
SELECT g.lang, g.lang_pred, CAST(g.n AS BIGINT) AS n,
       ROUND(g.n / CAST(t.t AS DOUBLE), 6) AS share
FROM grid g JOIN tot t ON t.lang = g.lang"""
DOCS_QUERIES["langid_confusion"] = q_langid_confusion


# --------------------------------------------------- random projection

RP_OUT_DIMS = 8


def q_random_projection(spark, sf_dir):
    """JL random projection 64->8 over the shared closed-form plane
    stream (long format)."""
    from .functions.similarity import random_projection

    return random_projection(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), out_dims=RP_OUT_DIMS
    )


DOCS_ORACLE["random_projection"] = """WITH vecs AS ({VECS}),
planes(dim, pw) AS (VALUES
    (0, [-0.3116302490234375, -0.005279541015625, 0.3010711669921875, -0.392578125, -0.0862274169921875, 0.220123291015625, -0.4735260009765625, -0.16717529296875, 0.1391754150390625, 0.445526123046875, -0.2481231689453125, 0.0582275390625, 0.3645782470703125, -0.329071044921875, -0.0227203369140625, 0.28363037109375, -0.4100189208984375, -0.103668212890625, 0.2026824951171875, -0.490966796875, -0.1846160888671875, 0.121734619140625, 0.4280853271484375, -0.26556396484375, 0.0407867431640625, 0.347137451171875, -0.3465118408203125, -0.0401611328125, 0.2661895751953125, -0.427459716796875, -0.1211090087890625, 0.18524169921875, 0.4915924072265625, -0.202056884765625, 0.1042938232421875, 0.41064453125, -0.2830047607421875, 0.023345947265625, 0.3296966552734375, -0.36395263671875, -0.0576019287109375, 0.248748779296875, -0.4449005126953125, -0.1385498046875, 0.1678009033203125, 0.474151611328125, -0.2194976806640625, 0.08685302734375, 0.3932037353515625, -0.300445556640625, 0.0059051513671875, 0.312255859375, -0.3813934326171875, -0.075042724609375, 0.2313079833984375, -0.46234130859375, -0.1559906005859375, 0.150360107421875, 0.4567108154296875, -0.2369384765625, 0.0694122314453125, 0.375762939453125, -0.3178863525390625, -0.01153564453125]),
    (1, [0.2948150634765625, -0.398834228515625, -0.0924835205078125, 0.2138671875, -0.4797821044921875, -0.173431396484375, 0.1329193115234375, 0.43927001953125, -0.2543792724609375, 0.051971435546875, 0.3583221435546875, -0.3353271484375, -0.0289764404296875, 0.277374267578125, -0.4162750244140625, -0.10992431640625, 0.1964263916015625, -0.497222900390625, -0.1908721923828125, 0.115478515625, 0.4218292236328125, -0.271820068359375, 0.0345306396484375, 0.34088134765625, -0.3527679443359375, -0.046417236328125, 0.2599334716796875, -0.4337158203125, -0.1273651123046875, 0.178985595703125, 0.4853363037109375, -0.20831298828125, 0.0980377197265625, 0.404388427734375, -0.2892608642578125, 0.01708984375, 0.3234405517578125, -0.370208740234375, -0.0638580322265625, 0.24249267578125, -0.4511566162109375, -0.144805908203125, 0.1615447998046875, 0.4678955078125, -0.2257537841796875, 0.080596923828125, 0.3869476318359375, -0.30670166015625, -0.0003509521484375, 0.305999755859375, -0.3876495361328125, -0.081298828125, 0.2250518798828125, -0.468597412109375, -0.1622467041015625, 0.14410400390625, 0.4504547119140625, -0.243194580078125, 0.0631561279296875, 0.3695068359375, -0.3241424560546875, -0.017791748046875, 0.2885589599609375, -0.40509033203125]),
    (2, [-0.0987396240234375, 0.207611083984375, -0.4860382080078125, -0.1796875, 0.1266632080078125, 0.433013916015625, -0.2606353759765625, 0.04571533203125, 0.3520660400390625, -0.341583251953125, -0.0352325439453125, 0.2711181640625, -0.4225311279296875, -0.116180419921875, 0.1901702880859375, 0.49652099609375, -0.1971282958984375, 0.109222412109375, 0.4155731201171875, -0.278076171875, 0.0282745361328125, 0.334625244140625, -0.3590240478515625, -0.05267333984375, 0.2536773681640625, -0.439971923828125, -0.1336212158203125, 0.1727294921875, 0.4790802001953125, -0.214569091796875, 0.0917816162109375, 0.39813232421875, -0.2955169677734375, 0.010833740234375, 0.3171844482421875, -0.37646484375, -0.0701141357421875, 0.236236572265625, -0.4574127197265625, -0.15106201171875, 0.1552886962890625, 0.461639404296875, -0.2320098876953125, 0.0743408203125, 0.3806915283203125, -0.312957763671875, -0.0066070556640625, 0.29974365234375, -0.3939056396484375, -0.087554931640625, 0.2187957763671875, -0.474853515625, -0.1685028076171875, 0.137847900390625, 0.4441986083984375, -0.24945068359375, 0.0569000244140625, 0.363250732421875, -0.3303985595703125, -0.0240478515625, 0.2823028564453125, -0.411346435546875, -0.1049957275390625, 0.20135498046875]),
    (3, [-0.4922943115234375, -0.185943603515625, 0.1204071044921875, 0.4267578125, -0.2668914794921875, 0.039459228515625, 0.3458099365234375, -0.34783935546875, -0.0414886474609375, 0.264862060546875, -0.4287872314453125, -0.1224365234375, 0.1839141845703125, 0.490264892578125, -0.2033843994140625, 0.10296630859375, 0.4093170166015625, -0.284332275390625, 0.0220184326171875, 0.328369140625, -0.3652801513671875, -0.058929443359375, 0.2474212646484375, -0.44622802734375, -0.1398773193359375, 0.166473388671875, 0.4728240966796875, -0.2208251953125, 0.0855255126953125, 0.391876220703125, -0.3017730712890625, 0.00457763671875, 0.3109283447265625, -0.382720947265625, -0.0763702392578125, 0.22998046875, -0.4636688232421875, -0.157318115234375, 0.1490325927734375, 0.45538330078125, -0.2382659912109375, 0.068084716796875, 0.3744354248046875, -0.3192138671875, -0.0128631591796875, 0.293487548828125, -0.4001617431640625, -0.09381103515625, 0.2125396728515625, -0.481109619140625, -0.1747589111328125, 0.131591796875, 0.4379425048828125, -0.255706787109375, 0.0506439208984375, 0.35699462890625, -0.3366546630859375, -0.030303955078125, 0.2760467529296875, -0.4176025390625, -0.1112518310546875, 0.195098876953125, -0.4985504150390625, -0.19219970703125]),
    (4, [0.1141510009765625, 0.420501708984375, -0.2731475830078125, 0.033203125, 0.3395538330078125, -0.354095458984375, -0.0477447509765625, 0.25860595703125, -0.4350433349609375, -0.128692626953125, 0.1776580810546875, 0.4840087890625, -0.2096405029296875, 0.096710205078125, 0.4030609130859375, -0.29058837890625, 0.0157623291015625, 0.322113037109375, -0.3715362548828125, -0.065185546875, 0.2411651611328125, -0.452484130859375, -0.1461334228515625, 0.16021728515625, 0.4665679931640625, -0.227081298828125, 0.0792694091796875, 0.3856201171875, -0.3080291748046875, -0.001678466796875, 0.3046722412109375, -0.38897705078125, -0.0826263427734375, 0.223724365234375, -0.4699249267578125, -0.16357421875, 0.1427764892578125, 0.449127197265625, -0.2445220947265625, 0.06182861328125, 0.3681793212890625, -0.325469970703125, -0.0191192626953125, 0.2872314453125, -0.4064178466796875, -0.100067138671875, 0.2062835693359375, -0.48736572265625, -0.1810150146484375, 0.125335693359375, 0.4316864013671875, -0.261962890625, 0.0443878173828125, 0.350738525390625, -0.3429107666015625, -0.03656005859375, 0.2697906494140625, -0.423858642578125, -0.1175079345703125, 0.1888427734375, 0.4951934814453125, -0.198455810546875, 0.1078948974609375, 0.41424560546875]),
    (5, [-0.2794036865234375, 0.026947021484375, 0.3332977294921875, -0.3603515625, -0.0540008544921875, 0.252349853515625, -0.4412994384765625, -0.13494873046875, 0.1714019775390625, 0.477752685546875, -0.2158966064453125, 0.0904541015625, 0.3968048095703125, -0.296844482421875, 0.0095062255859375, 0.31585693359375, -0.3777923583984375, -0.071441650390625, 0.2349090576171875, -0.458740234375, -0.1523895263671875, 0.153961181640625, 0.4603118896484375, -0.23333740234375, 0.0730133056640625, 0.379364013671875, -0.3142852783203125, -0.0079345703125, 0.2984161376953125, -0.395233154296875, -0.0888824462890625, 0.21746826171875, -0.4761810302734375, -0.169830322265625, 0.1365203857421875, 0.44287109375, -0.2507781982421875, 0.055572509765625, 0.3619232177734375, -0.33172607421875, -0.0253753662109375, 0.280975341796875, -0.4126739501953125, -0.1063232421875, 0.2000274658203125, -0.493621826171875, -0.1872711181640625, 0.11907958984375, 0.4254302978515625, -0.268218994140625, 0.0381317138671875, 0.344482421875, -0.3491668701171875, -0.042816162109375, 0.2635345458984375, -0.43011474609375, -0.1237640380859375, 0.182586669921875, 0.4889373779296875, -0.2047119140625, 0.1016387939453125, 0.407989501953125, -0.2856597900390625, 0.02069091796875]),
    (6, [0.3270416259765625, -0.366607666015625, -0.0602569580078125, 0.24609375, -0.4475555419921875, -0.141204833984375, 0.1651458740234375, 0.47149658203125, -0.2221527099609375, 0.084197998046875, 0.3905487060546875, -0.3031005859375, 0.0032501220703125, 0.309600830078125, -0.3840484619140625, -0.07769775390625, 0.2286529541015625, -0.464996337890625, -0.1586456298828125, 0.147705078125, 0.4540557861328125, -0.239593505859375, 0.0667572021484375, 0.37310791015625, -0.3205413818359375, -0.014190673828125, 0.2921600341796875, -0.4014892578125, -0.0951385498046875, 0.211212158203125, -0.4824371337890625, -0.17608642578125, 0.1302642822265625, 0.436614990234375, -0.2570343017578125, 0.04931640625, 0.3556671142578125, -0.337982177734375, -0.0316314697265625, 0.27471923828125, -0.4189300537109375, -0.112579345703125, 0.1937713623046875, -0.4998779296875, -0.1935272216796875, 0.112823486328125, 0.4191741943359375, -0.27447509765625, 0.0318756103515625, 0.338226318359375, -0.3554229736328125, -0.049072265625, 0.2572784423828125, -0.436370849609375, -0.1300201416015625, 0.17633056640625, 0.4826812744140625, -0.210968017578125, 0.0953826904296875, 0.4017333984375, -0.2919158935546875, 0.014434814453125, 0.3207855224609375, -0.37286376953125]),
    (7, [-0.0665130615234375, 0.239837646484375, -0.4538116455078125, -0.1474609375, 0.1588897705078125, 0.465240478515625, -0.2284088134765625, 0.07794189453125, 0.3842926025390625, -0.309356689453125, -0.0030059814453125, 0.3033447265625, -0.3903045654296875, -0.083953857421875, 0.2223968505859375, -0.47125244140625, -0.1649017333984375, 0.141448974609375, 0.4477996826171875, -0.245849609375, 0.0605010986328125, 0.366851806640625, -0.3267974853515625, -0.02044677734375, 0.2859039306640625, -0.407745361328125, -0.1013946533203125, 0.2049560546875, -0.4886932373046875, -0.182342529296875, 0.1240081787109375, 0.43035888671875, -0.2632904052734375, 0.043060302734375, 0.3494110107421875, -0.34423828125, -0.0378875732421875, 0.268463134765625, -0.4251861572265625, -0.11883544921875, 0.1875152587890625, 0.493865966796875, -0.1997833251953125, 0.1065673828125, 0.4129180908203125, -0.280731201171875, 0.0256195068359375, 0.33197021484375, -0.3616790771484375, -0.055328369140625, 0.2510223388671875, -0.442626953125, -0.1362762451171875, 0.170074462890625, 0.4764251708984375, -0.21722412109375, 0.0891265869140625, 0.395477294921875, -0.2981719970703125, 0.0081787109375, 0.3145294189453125, -0.379119873046875, -0.0727691650390625, 0.23358154296875])
)
SELECT v.vec_id, CAST(p.dim AS BIGINT) AS dim,
       ROUND(list_sum(list_transform(list_zip(v.v, p.pw), r -> r[1]*r[2])), 6)
         AS val
FROM vecs v CROSS JOIN planes p""".replace("{VECS}", VECS_SQL)
DOCS_QUERIES["random_projection"] = q_random_projection


# --------------------------------------------------- substring dup spans

SUBSTR_W = 8


def q_substring_dup_spans(spark, sf_dir):
    """Lee et al. ExactSubstr duplication scores at 8-token windows."""
    from .functions.dedup import substring_dup_spans

    return substring_dup_spans(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), window=SUBSTR_W
    )


def _substr_sql() -> str:
    terms = " + ".join(
        f"{3**k} * COALESCE(lead(h, {k}) OVER w, 0)" for k in range(SUBSTR_W)
    )
    return f"""WITH toks AS MATERIALIZED ({TOKS_SQL}),
h AS (SELECT doc_id, pos, {HASH.format('tok')} % {P31} AS h FROM toks),
grams AS (
  SELECT doc_id, ({terms}) % {P31} AS gh,
         lead(h, {SUBSTR_W - 1}) OVER w AS tail
  FROM h WINDOW w AS (PARTITION BY doc_id ORDER BY pos)),
full_g AS (SELECT doc_id, gh FROM grams WHERE tail IS NOT NULL),
cnt AS (SELECT gh, COUNT(*) AS c FROM full_g GROUP BY gh),
per AS (
  SELECT g.doc_id, COUNT(*) AS n_windows,
         SUM(CASE WHEN c.c > 1 THEN 1 ELSE 0 END) AS dup_windows
  FROM full_g g JOIN cnt c ON c.gh = g.gh GROUP BY g.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(p.n_windows, 0) AS BIGINT) AS n_windows,
       CAST(COALESCE(p.dup_windows, 0) AS BIGINT) AS dup_windows,
       ROUND(CASE WHEN COALESCE(p.n_windows, 0) > 0
                  THEN COALESCE(p.dup_windows, 0)
                       / CAST(p.n_windows AS DOUBLE)
                  ELSE 0e0 END, 6) AS dup_fraction
FROM documents d LEFT JOIN per p ON p.doc_id = d.doc_id"""


DOCS_ORACLE["substring_dup_spans"] = _substr_sql()
DOCS_QUERIES["substring_dup_spans"] = q_substring_dup_spans


# --------------------------------------------------- embedding stats


def q_embedding_stats(spark, sf_dir):
    """Per-dimension mean/std of the embedding corpus (micro-int exact)."""
    from .functions.cluster import embedding_stats

    return embedding_stats(spark.read.parquet(f"{sf_dir}/embeddings.parquet"))


DOCS_ORACLE["embedding_stats"] = """WITH comp AS (
  SELECT generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
  FROM embeddings),
agg AS (
  SELECT dim, COUNT(*) AS n, SUM(q) AS s, SUM(q * q) AS s2 FROM comp GROUP BY dim)
SELECT CAST(dim AS BIGINT) AS dim, CAST(n AS BIGINT) AS n,
       ROUND(s / (n * 1000000.0), 6) AS mean,
       ROUND(sqrt(CAST(n * s2 - s * s AS DOUBLE)) / (n * 1000000.0), 6) AS std
FROM agg"""
DOCS_QUERIES["embedding_stats"] = q_embedding_stats


# --------------------------------------------------- per-source profile


def q_source_profile(spark, sf_dir):
    """Per-source corpus census (doc counts, char/token means, lang
    spread, within-source exact-dup burden) — first use of the `source`
    column as a curation dimension."""
    from .functions.text import source_profile

    return source_profile(spark.read.parquet(f"{sf_dir}/documents.parquet"))


DOCS_ORACLE["source_profile"] = r"""WITH d AS (
  SELECT source, lang, CAST(n_chars AS BIGINT) AS nc,
         md5(text) AS h,
         len(list_filter(string_split_regex(lower(text), '\s+'),
                         x -> x <> '')) AS nt
  FROM documents),
dups AS (
  SELECT source,
         COALESCE(SUM(CASE WHEN c > 1 THEN c ELSE 0 END), 0) AS dup_docs
  FROM (SELECT source, h, COUNT(*) AS c FROM d GROUP BY 1, 2)
  GROUP BY source),
prof AS (
  SELECT source, COUNT(*) AS n_docs, SUM(nc) AS total_chars,
         ROUND(AVG(CAST(nc AS DOUBLE)), 4) AS avg_chars,
         COUNT(DISTINCT lang) AS n_langs,
         ROUND(AVG(CAST(nt AS DOUBLE)), 4) AS avg_tokens
  FROM d GROUP BY source)
SELECT p.source, CAST(p.n_docs AS BIGINT) AS n_docs,
       CAST(p.total_chars AS BIGINT) AS total_chars,
       p.avg_chars, CAST(p.n_langs AS BIGINT) AS n_langs, p.avg_tokens,
       CAST(dd.dup_docs AS BIGINT) AS dup_docs,
       ROUND(dd.dup_docs / CAST(p.n_docs AS DOUBLE), 6) AS dup_ratio
FROM prof p JOIN dups dd ON dd.source = p.source"""
DOCS_QUERIES["source_profile"] = q_source_profile


# --------------------------------------------------- source-weighted sample

SAMPLE_RATES_BP = {"src0": 2500, "src3": 5000, "src7": 0}
SAMPLE_DEFAULT_BP = 1000
SAMPLE_SEED = 42


def q_source_sample(spark, sf_dir):
    """Deterministic per-source acceptance sampling (source reweighting)."""
    from .functions.sample import source_weighted_sample

    return source_weighted_sample(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        rates_bp=SAMPLE_RATES_BP,
        default_bp=SAMPLE_DEFAULT_BP,
        seed=SAMPLE_SEED,
    )


def _source_sample_sql() -> str:
    vals = ", ".join(f"('{s}', {bp})" for s, bp in sorted(SAMPLE_RATES_BP.items()))
    h = HASH.format(f"d.doc_id || ':sample:{SAMPLE_SEED}'")
    return f"""WITH r(source, bp) AS (SELECT * FROM (VALUES {vals}))
SELECT d.doc_id, d.source
FROM documents d LEFT JOIN r ON r.source = d.source
WHERE {h} % 10000 < COALESCE(r.bp, {SAMPLE_DEFAULT_BP})"""


DOCS_ORACLE["source_sample"] = _source_sample_sql()
DOCS_QUERIES["source_sample"] = q_source_sample


# --------------------------------------------------- exact length quantiles

QUANTILE_BPS = (1000, 2500, 5000, 7500, 9000, 9900)


def q_length_quantiles(spark, sf_dir):
    """Exact discrete quantiles of document length via the bounded value
    histogram (never approx_percentile — engine-private merge buffers)."""
    from .functions.sketch import exact_quantiles

    return exact_quantiles(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        "n_chars",
        qs_bp=QUANTILE_BPS,
    )


DOCS_ORACLE["length_quantiles"] = f"""WITH hist AS (
  SELECT CAST(n_chars AS BIGINT) AS v, COUNT(*) AS c FROM documents GROUP BY 1),
cum AS (
  SELECT v, SUM(c) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING) AS cum FROM hist),
tot AS (SELECT SUM(c) AS n FROM hist),
qs(q_bp) AS (SELECT * FROM (VALUES {", ".join(f"({q})" for q in QUANTILE_BPS)})),
ranks AS (SELECT q_bp, (q_bp * n + 9999) // 10000 AS rank FROM qs, tot)
SELECT CAST(r.q_bp AS BIGINT) AS q_bp, CAST(r.rank AS BIGINT) AS rank,
       CAST(MIN(c.v) AS BIGINT) AS value
FROM ranks r JOIN cum c ON c.cum >= r.rank GROUP BY 1, 2"""
DOCS_QUERIES["length_quantiles"] = q_length_quantiles


# --------------------------------------------------- standardized embeddings

STD_DIMS = 16


def q_standardized_embeddings(spark, sf_dir):
    """Exact z-score whitening (micro-int algebra; the n·10⁶ factors of
    mean and std cancel, so z is exact BIGINTs → one sqrt + divide)."""
    from .functions.cluster import standardize_embeddings

    return standardize_embeddings(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), dims=STD_DIMS
    )


DOCS_ORACLE["standardized_embeddings"] = f"""WITH comp AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
  FROM embeddings),
c AS (SELECT * FROM comp WHERE dim < {STD_DIMS}),
d AS (SELECT dim, COUNT(*) AS n, SUM(q) AS s, SUM(q * q) AS s2
      FROM c GROUP BY dim)
SELECT c.vec_id, CAST(c.dim AS BIGINT) AS dim,
       CASE WHEN CAST(d.n * d.s2 - d.s * d.s AS DOUBLE) > 0
            THEN ROUND(CAST(c.q * d.n - d.s AS DOUBLE)
                       / sqrt(CAST(d.n * d.s2 - d.s * d.s AS DOUBLE)), 6)
            ELSE 0e0 END AS z
FROM c JOIN d ON d.dim = c.dim"""
DOCS_QUERIES["standardized_embeddings"] = q_standardized_embeddings


# --------------------------------------------------- embedding covariance

COV_DIMS = 16


def q_embedding_covariance(spark, sf_dir):
    """Upper-triangular covariance via per-partition numpy Gram partials
    (mapInPandas — the Arrow-vectorized scale path; partitioning-invariant
    exact int64 partials)."""
    from .functions.cluster import embedding_covariance

    return embedding_covariance(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"), dims=COV_DIMS
    )


DOCS_ORACLE["embedding_covariance"] = f"""WITH comp AS (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
  FROM embeddings),
c AS (SELECT * FROM comp WHERE dim < {COV_DIMS}),
pairs AS (
  SELECT a.dim AS i, b.dim AS j, SUM(a.q * b.q) AS sqq
  FROM c a JOIN c b ON a.vec_id = b.vec_id AND a.dim <= b.dim
  GROUP BY 1, 2),
d AS (SELECT dim, COUNT(*) AS n, SUM(q) AS s FROM c GROUP BY dim)
SELECT CAST(p.i AS BIGINT) AS i, CAST(p.j AS BIGINT) AS j,
       ROUND((p.sqq / da.n - (da.s / da.n) * (db.s / db.n))
             / 1000000000000.0, 6) AS cov
FROM pairs p JOIN d da ON da.dim = p.i JOIN d db ON db.dim = p.j"""
DOCS_QUERIES["embedding_covariance"] = q_embedding_covariance


# --------------------------------------------------- content-aware survivors


def q_dedup_survivors(spark, sf_dir):
    """Near-dup clusters with keep-the-longest survivor selection."""
    from .functions.dedup import dedup_survivors

    return dedup_survivors(spark.read.parquet(f"{sf_dir}/documents.parquet"))


_DC_SQL = DOCS_ORACLE["dedup_clusters"]
DOCS_ORACLE["dedup_survivors"] = _DC_SQL[: _DC_SQL.rindex("\nSELECT d.doc_id,")] + """,
base AS (
  SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster, d.n_chars
  FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id)
SELECT doc_id, cluster,
       ROW_NUMBER() OVER (PARTITION BY cluster
                          ORDER BY n_chars DESC, doc_id ASC) = 1 AS keep
FROM base"""
DOCS_QUERIES["dedup_survivors"] = q_dedup_survivors


# --------------------------------------------------- vocabulary growth

VOCAB_GRID_BP = (156, 625, 2500, 5000, 10000)


def q_vocab_growth(spark, sf_dir):
    """Heaps'-law vocabulary-growth curve via token first-sightings."""
    from .functions.text import vocab_growth

    return vocab_growth(
        spark.read.parquet(f"{sf_dir}/documents.parquet"), grid_bp=VOCAB_GRID_BP
    )


DOCS_ORACLE["vocab_growth"] = f"""WITH toks AS MATERIALIZED ({TOKS_SQL}),
firsts AS (SELECT tok, MIN(doc_id) AS fd FROM toks GROUP BY tok),
mx AS (SELECT MAX(doc_id) AS m FROM documents),
grid(bp) AS (SELECT * FROM (VALUES {", ".join(f"({b})" for b in VOCAB_GRID_BP)})),
ts AS (SELECT CAST(bp AS BIGINT) AS bp, CAST((m * bp) // 10000 AS BIGINT) AS t
       FROM grid, mx)
SELECT ts.bp, ts.t,
       (SELECT COUNT(*) FROM documents d WHERE d.doc_id <= ts.t) AS n_docs,
       (SELECT COUNT(*) FROM firsts f WHERE f.fd <= ts.t) AS vocab
FROM ts"""
DOCS_QUERIES["vocab_growth"] = q_vocab_growth


# --------------------------------------------------- tf-idf cosine APSS

APSS_T = 0.3


def q_tfidf_cosine_pairs(spark, sf_dir):
    """Weighted all-pairs document similarity over tf-idf vectors."""
    from .functions.text import tfidf_cosine_pairs

    return tfidf_cosine_pairs(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        threshold=APSS_T,
        max_df=NGRAM_MAX_DF,
    )


DOCS_ORACLE["tfidf_cosine_pairs"] = f"""WITH toks AS MATERIALIZED ({TOKS_SQL}),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
nd AS (SELECT COUNT(*) AS n FROM documents),
dfb AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
w AS (
  SELECT t.doc_id, t.tok,
         CAST(ROUND(ROUND(t.tf * ln((SELECT n FROM nd) / CAST(d.df AS DOUBLE)),
                          4) * 10000.0) AS BIGINT) AS q
  FROM tf t JOIN dfb d ON d.tok = t.tok
  WHERE d.df <= {NGRAM_MAX_DF}),
wz AS (SELECT * FROM w WHERE q <> 0),
nrm AS (SELECT doc_id, sqrt(CAST(SUM(q * q) AS DOUBLE)) AS nr
        FROM wz GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.q * b.q) AS dot
  FROM wz a JOIN wz b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2)
SELECT doc_a, doc_b, cos_sim FROM (
  SELECT d.doc_a, d.doc_b,
         ROUND(CAST(d.dot AS DOUBLE) / (na.nr * nb.nr), 6) AS cos_sim
  FROM dots d JOIN nrm na ON na.doc_id = d.doc_a
  JOIN nrm nb ON nb.doc_id = d.doc_b)
WHERE cos_sim >= {APSS_T}"""
DOCS_QUERIES["tfidf_cosine_pairs"] = q_tfidf_cosine_pairs


# --------------------------------------------------- PQ recall


def q_pq_recall(spark, sf_dir):
    """Recall@k of PQ-ADC search vs brute-force cosine truth — completes
    the measured ANN ladder (lsh_ann → ivf_recall → pq_recall)."""
    from .functions.similarity import ann_recall

    return ann_recall(q_cosine_topk(spark, sf_dir), q_pq_ann(spark, sf_dir))


def _pq_recall_sql() -> str:
    truth = DOCS_ORACLE["cosine_topk"]
    appr = DOCS_ORACLE["pq_ann"]
    return f"""WITH truth AS (
  SELECT query_id, neighbor_id FROM ({truth}) t),
appr AS (
  SELECT query_id, neighbor_id FROM ({appr}) a),
hit AS (SELECT CAST(COUNT(*) AS BIGINT) AS hits
        FROM truth JOIN appr USING (query_id, neighbor_id)),
tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS truth_pairs FROM truth)
SELECT t.truth_pairs, h.hits,
       ROUND(CAST(h.hits AS DOUBLE)
             / (CASE WHEN t.truth_pairs > 0 THEN t.truth_pairs END), 6)
         AS recall
FROM tot t, hit h"""


DOCS_ORACLE["pq_recall"] = _pq_recall_sql()
DOCS_QUERIES["pq_recall"] = q_pq_recall


# --------------------------------------------------- syndication matrix


def q_syndication_matrix(spark, sf_dir):
    """Cross-source exact-duplicate matrix — DataFrame[source_a,
    source_b, n_dup_pairs]: for each unordered source pair, how many
    (doc, doc) pairs share identical text across the two sources. The
    content-syndication census that tells a crawl-curation run which
    feeds mirror each other. Plan: one (md5, source) count rollup, then a
    per-hash self-join of the ≤|sources| distinct source rows — the join
    fan-out is bounded by sources², never by docs."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    hs = (
        docs.select(F.md5("text").alias("h"), "source")
        .groupBy("h", "source")
        .agg(F.count("*").alias("c"))
    )
    a, b = hs.alias("a"), hs.alias("b")
    return (
        a.join(
            b,
            (F.col("a.h") == F.col("b.h"))
            & (F.col("a.source") < F.col("b.source")),
        )
        .groupBy(
            F.col("a.source").alias("source_a"),
            F.col("b.source").alias("source_b"),
        )
        .agg(F.sum(F.col("a.c") * F.col("b.c")).cast("long").alias("n_dup_pairs"))
    )


DOCS_ORACLE["syndication_matrix"] = """WITH hs AS (
  SELECT md5(text) AS h, source, COUNT(*) AS c
  FROM documents GROUP BY 1, 2)
SELECT a.source AS source_a, b.source AS source_b,
       CAST(SUM(a.c * b.c) AS BIGINT) AS n_dup_pairs
FROM hs a JOIN hs b ON a.h = b.h AND a.source < b.source
GROUP BY 1, 2"""
DOCS_QUERIES["syndication_matrix"] = q_syndication_matrix


# --------------------------------------------------- shingle containment

CONTAIN_T = 0.5


def q_containment_pairs(spark, sf_dir):
    """Asymmetric shingle containment (Broder) — quote-inclusion dedup."""
    from .functions.dedup import containment_pairs

    return containment_pairs(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        threshold=CONTAIN_T,
        max_shingle_df=NGRAM_MAX_DF,
    )


DOCS_ORACLE["containment_pairs"] = f"""WITH toks AS MATERIALIZED ({TOKS_SQL}),
sh0 AS MATERIALIZED ({SHINGLES_SQL}),
dfb AS (SELECT shingle, COUNT(*) AS d FROM sh0 GROUP BY shingle),
sh AS (SELECT s.doc_id, s.shingle FROM sh0 s JOIN dfb ON dfb.shingle = s.shingle
       WHERE dfb.d <= {NGRAM_MAX_DF}),
sz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS u, b.doc_id AS v, COUNT(*) AS common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
bo AS (
  SELECT u, v, common FROM inter
  UNION ALL SELECT v, u, common FROM inter)
SELECT doc_a, doc_b, containment FROM (
  SELECT b.u AS doc_a, b.v AS doc_b,
         ROUND(b.common / CAST(s.sz AS DOUBLE), 6) AS containment
  FROM bo b JOIN sz s ON s.doc_id = b.u)
WHERE containment >= {CONTAIN_T}"""
DOCS_QUERIES["containment_pairs"] = q_containment_pairs


# --------------------------------------------------- per-source quantiles

SRC_Q_BPS = (2500, 5000, 9000)


def q_source_quantiles(spark, sf_dir):
    """Exact per-source document-length quantiles (grouped histogram)."""
    from .functions.sketch import grouped_quantiles

    return grouped_quantiles(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        "source",
        "n_chars",
        qs_bp=SRC_Q_BPS,
    )


DOCS_ORACLE["source_quantiles"] = f"""WITH hist AS (
  SELECT source AS grp, CAST(n_chars AS BIGINT) AS v, COUNT(*) AS c
  FROM documents GROUP BY 1, 2),
cum AS (
  SELECT grp, v,
         SUM(c) OVER (PARTITION BY grp ORDER BY v ROWS UNBOUNDED PRECEDING)
           AS cum
  FROM hist),
tot AS (SELECT grp, SUM(c) AS n FROM hist GROUP BY grp),
qs(q_bp) AS (SELECT * FROM (VALUES {", ".join(f"({q})" for q in SRC_Q_BPS)})),
ranks AS (SELECT grp, CAST(q_bp AS BIGINT) AS q_bp,
                 (q_bp * n + 9999) // 10000 AS rank FROM tot, qs)
SELECT r.grp AS source, r.q_bp, CAST(r.rank AS BIGINT) AS rank,
       CAST(MIN(c.v) AS BIGINT) AS value
FROM ranks r JOIN cum c ON c.grp = r.grp AND c.cum >= r.rank
GROUP BY 1, 2, 3"""
DOCS_QUERIES["source_quantiles"] = q_source_quantiles


# ------------------------------------------------- round-5e: gopher rules +
# top principal component


def q_gopher_quality(spark, sf_dir):
    """Published Gopher keep/drop quality screen (Rae et al. 2021 A1.1)."""
    from .functions.text import gopher_rules

    return gopher_rules(spark.read.parquet(f"{sf_dir}/documents.parquet"))


DOCS_ORACLE["gopher_quality"] = rf"""WITH lt AS (
  SELECT doc_id, text,
         list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS toks
  FROM documents),
m AS (
  SELECT doc_id,
         len(toks) AS n_words,
         CAST(list_sum(list_transform(toks, x -> length(x))) AS DOUBLE)
           / (CASE WHEN len(toks) > 0 THEN len(toks) END) AS mean_word_len,
         CAST(len(list_filter(toks, x -> regexp_matches(x, '[a-z]'))) AS DOUBLE)
           / (CASE WHEN len(toks) > 0 THEN len(toks) END) AS alpha_frac,
         CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS DOUBLE)
           / (CASE WHEN len(toks) > 0 THEN len(toks) END) AS symbol_ratio,
         len(list_distinct(list_filter(toks, x -> list_contains({_STOP_LIST}, x))))
           AS stop_hits
  FROM lt)
SELECT doc_id,
       CAST(n_words AS BIGINT) AS n_words,
       ROUND(mean_word_len, 6) AS mean_word_len,
       ROUND(alpha_frac, 6) AS alpha_frac,
       ROUND(symbol_ratio, 6) AS symbol_ratio,
       CAST(stop_hits AS BIGINT) AS stop_hits,
       COALESCE(n_words >= 50 AND n_words <= 100000
                AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                AND alpha_frac >= 0.8 AND symbol_ratio <= 0.1
                AND stop_hits >= 2, FALSE) AS keep
FROM m"""
DOCS_QUERIES["gopher_quality"] = q_gopher_quality


PCA_ITERS = 8


def q_pca_power(spark, sf_dir):
    """Top principal component of the first COV_DIMS embedding coords by
    power iteration on the distributed covariance (D×D driver iterate)."""
    from .functions.cluster import pca_top_component

    return pca_top_component(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        dims=COV_DIMS,
        iters=PCA_ITERS,
    )


def _pca_sql() -> str:
    # every iteration CTE is MATERIALIZED: m{k} is referenced twice (the
    # join and the scalar norm subquery) and v{k} feeds m{k+1}, so inlined
    # CTEs would re-evaluate the whole upstream chain 2^K times
    cov_full = f"""comp AS MATERIALIZED (
  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS dim,
         CAST(ROUND(CAST(unnest(embedding) AS DOUBLE) * 1000000.0) AS BIGINT) AS q
  FROM embeddings),
c AS MATERIALIZED (SELECT * FROM comp WHERE dim < {COV_DIMS}),
pairs AS MATERIALIZED (
  SELECT a.dim AS i, b.dim AS j, SUM(a.q * b.q) AS sqq
  FROM c a JOIN c b ON a.vec_id = b.vec_id AND a.dim <= b.dim
  GROUP BY 1, 2),
d AS (SELECT dim, COUNT(*) AS n, SUM(q) AS s FROM c GROUP BY dim),
covu AS MATERIALIZED (
  SELECT p.i, p.j,
         ROUND((p.sqq / da.n - (da.s / da.n) * (db.s / db.n))
               / 1000000000000.0, 6) AS cov
  FROM pairs p JOIN d da ON da.dim = p.i JOIN d db ON db.dim = p.j),
cov AS MATERIALIZED (SELECT i, j, cov FROM covu
        UNION ALL SELECT j, i, cov FROM covu WHERE i <> j),
v0 AS (SELECT i AS dim, 1.0 / sqrt({COV_DIMS}.0) AS v
       FROM (SELECT DISTINCT i FROM covu))"""
    ctes = [cov_full]
    for k in range(1, PCA_ITERS + 1):
        ctes.append(
            f"""m{k} AS MATERIALIZED (
  SELECT c.i AS dim, SUM(c.cov * v.v) AS m
  FROM cov c JOIN v{k - 1} v ON v.dim = c.j GROUP BY c.i),
v{k} AS MATERIALIZED (
  SELECT dim, ROUND(m / (SELECT sqrt(SUM(m * m)) FROM m{k}), 9) AS v
  FROM m{k})"""
        )
    last = f"v{PCA_ITERS}"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
lead AS (SELECT v FROM {last} ORDER BY ABS(v) DESC, dim ASC LIMIT 1)
SELECT CAST(dim AS BIGINT) AS dim,
       ROUND(CASE WHEN (SELECT v FROM lead) < 0 THEN -v ELSE v END, 6)
         AS loading
FROM {last}"""
    )


DOCS_ORACLE["pca_power"] = _pca_sql()
DOCS_QUERIES["pca_power"] = q_pca_power


def q_bloom_decontaminate(spark, sf_dir):
    """Bloom-filter decontamination: the exact screen's join side
    compressed to an 8-KiB broadcast bit array (one-sided over-flagging)."""
    from .functions.dedup import bloom_decontaminate

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return bloom_decontaminate(
        docs.filter(F.col("doc_id") % DECON_MOD != 0),
        docs.filter(F.col("doc_id") % DECON_MOD == 0),
        n=3,
        min_hits=DECON_MIN_HITS,
    )


def _bloom_decon_sql() -> str:
    def p(i: int) -> str:
        return (
            f"CAST(('0x' || substr(md5(shingle), {1 + 8 * i}, 8)) AS BIGINT)"
            f" % 65536"
        )

    probes = ", ".join(f"{p(i)} AS p{i}" for i in range(4))
    conds = "\n    AND ".join(
        f"(COALESCE(f{i}.mask, 0) & (CAST(1 AS BIGINT) << CAST(t.p{i} % 32 AS INT))) <> 0"
        for i in range(4)
    )
    joins = "\n  ".join(f"LEFT JOIN f f{i} ON f{i}.word = t.p{i} // 32" for i in range(4))
    return f"""WITH toks AS MATERIALIZED ({TOKS_SQL}),
sh AS MATERIALIZED ({SHINGLES_SQL}),
ev AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {DECON_MOD} = 0),
pos AS (SELECT unnest([{", ".join(p(i) for i in range(4))}]) AS pos FROM ev),
f AS MATERIALIZED (
  SELECT pos // 32 AS word,
         bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INT)) AS mask
  FROM pos GROUP BY 1),
tr AS (SELECT doc_id, {probes} FROM sh WHERE doc_id % {DECON_MOD} <> 0),
hits AS (
  SELECT t.doc_id, COUNT(*) AS n
  FROM tr t
  {joins}
  WHERE {conds}
  GROUP BY t.doc_id)
SELECT d.doc_id,
       CAST(COALESCE(h.n, 0) AS BIGINT) AS n_bloom_hits,
       COALESCE(h.n, 0) >= {DECON_MIN_HITS} AS contaminated
FROM (SELECT doc_id FROM documents WHERE doc_id % {DECON_MOD} <> 0) d
LEFT JOIN hits h ON h.doc_id = d.doc_id"""


DOCS_ORACLE["bloom_decontaminate"] = _bloom_decon_sql()
DOCS_QUERIES["bloom_decontaminate"] = q_bloom_decontaminate


def q_semdedup(spark, sf_dir):
    """SemDeDup: k-means partition then within-cluster cosine screen —
    the O(N^2) all-pairs cosine becomes sum-over-cells |c|^2 pair work."""
    from .functions.similarity import semdedup

    return semdedup(
        spark.read.parquet(f"{sf_dir}/embeddings.parquet"),
        k=KMEANS_SQL_K,
        iters=KMEANS_SQL_ITERS,
        threshold=NEAR_DUP_T,
    )


def _semdedup_sql() -> str:
    I = KMEANS_SQL_ITERS
    dot = "list_sum(list_transform(list_zip(a.v, b.v), p -> p[1]*p[2]))"
    ctes = _kmeans_ctes() + [
        f"vecs AS ({VECS_SQL})",
        f"normed AS MATERIALIZED ({NORMED_SQL})",
        f"""base AS MATERIALIZED (
  SELECT n.vec_id, n.v, n.nrm, asg.cl
  FROM normed n JOIN a{I} asg ON asg.vec_id = n.vec_id)""",
        f"""drp AS MATERIALIZED (
  SELECT DISTINCT b.vec_id
  FROM base a JOIN base b ON a.cl = b.cl AND a.vec_id < b.vec_id
  WHERE ROUND({dot} / (a.nrm * b.nrm), 4) >= {NEAR_DUP_T})""",
    ]
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT b.vec_id, CAST(b.cl AS BIGINT) AS cluster, d.vec_id IS NULL AS keep
FROM base b LEFT JOIN drp d ON d.vec_id = b.vec_id"""
    )


DOCS_ORACLE["semdedup"] = _semdedup_sql()
DOCS_QUERIES["semdedup"] = q_semdedup


def q_corpus_curation_gopher(spark, sf_dir):
    """Curation with the Gopher rule screen inserted between the language
    filter and the pairwise stages (reject_reason 'quality')."""
    from .functions.dedup import curate_corpus

    return curate_corpus(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        min_tokens=CURATE_MIN_TOKENS,
        langs=("en",),
        jaccard_t=0.5,
        gopher=True,
    )


DOCS_ORACLE["corpus_curation_gopher"] = f"""
WITH tc AS MATERIALIZED (SELECT doc_id, n_tokens FROM ({DOCS_ORACLE['token_counts']})),
li AS MATERIALIZED (SELECT doc_id, lang_pred FROM ({DOCS_ORACLE['language_id']})),
gq AS MATERIALIZED (SELECT doc_id, keep AS g_keep FROM ({DOCS_ORACLE['gopher_quality']})),
ed AS MATERIALIZED (SELECT doc_id, canonical_id FROM ({DOCS_ORACLE['exact_duplicates']})),
nd AS MATERIALIZED (SELECT DISTINCT doc_b AS doc_id FROM ({DOCS_ORACLE['lsh_verified_dedup']})),
r AS (
  SELECT d.doc_id,
         CASE WHEN tc.n_tokens < {CURATE_MIN_TOKENS} THEN 'too_short'
              WHEN li.lang_pred <> 'en' THEN 'lang'
              WHEN NOT gq.g_keep THEN 'quality'
              WHEN ed.canonical_id <> d.doc_id THEN 'exact_dup'
              WHEN nd.doc_id IS NOT NULL THEN 'near_dup' END AS reject_reason
  FROM documents d
  JOIN tc ON tc.doc_id = d.doc_id
  JOIN li ON li.doc_id = d.doc_id
  JOIN gq ON gq.doc_id = d.doc_id
  JOIN ed ON ed.doc_id = d.doc_id
  LEFT JOIN nd ON nd.doc_id = d.doc_id)
SELECT doc_id, reject_reason IS NULL AS keep, reject_reason FROM r"""
DOCS_QUERIES["corpus_curation_gopher"] = q_corpus_curation_gopher


# ------------------------------------------------ DSIR importance weights

DSIR_LANG = "en"


def q_dsir_weights(spark, sf_dir):
    """DSIR hashed-unigram importance weights (Xie et al. 2023): per-doc
    log-likelihood ratio of a lang='en' target bag model vs the raw corpus,
    512 md5-hash buckets, add-1 smoothing — the importance-resampling
    scorer production data-selection pipelines run before sampling."""
    from .functions.text import DSIR_BUCKETS, dsir_weights

    return dsir_weights(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        target_lang=DSIR_LANG,
        buckets=DSIR_BUCKETS,
    )


DOCS_ORACLE["dsir_weights"] = f"""
WITH toks AS MATERIALIZED ({TOKS_SQL}),
tl AS MATERIALIZED (
  SELECT t.doc_id, {HASH.format('t.tok')} % 512 AS b,
         CASE WHEN d.lang = '{DSIR_LANG}' THEN 1 ELSE 0 END AS is_t
  FROM toks t JOIN documents d ON d.doc_id = t.doc_id),
bu AS MATERIALIZED (SELECT b, COUNT(*) AS cr, SUM(is_t) AS ct FROM tl GROUP BY b),
tot AS (SELECT SUM(cr) AS nr, SUM(ct) AS nt FROM bu),
lr AS (SELECT b,
         ln((ct + 1e0) / ((SELECT nt FROM tot) + 512e0))
       - ln((cr + 1e0) / ((SELECT nr FROM tot) + 512e0)) AS lr
       FROM bu)
SELECT tl.doc_id, ROUND(SUM(lr.lr), 6) AS dsir_weight
FROM tl JOIN lr ON lr.b = tl.b GROUP BY tl.doc_id"""
DOCS_QUERIES["dsir_weights"] = q_dsir_weights


# ------------------------------------------- trained quality classifier


def q_quality_classifier(spark, sf_dir):
    """CCNet-style target-vs-crawl linear filter: full-batch logistic
    regression (8 GD steps, lr 1.0, zero init) trained as one aggregate
    per step over exact-rational token features; per-doc target
    probability + keep verdict. The oracle replays the identical training
    trajectory as unrolled scalar-CTE steps."""
    from .functions.classify import quality_classifier

    return quality_classifier(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _classifier_sql(steps: int = 8) -> str:
    from .functions.text import STOPWORDS

    stoplist = ", ".join(f"'{s}'" for s in STOPWORDS)
    zexpr = "w.b0 + w.b1*f.x1 + w.b2*f.x2 + w.b3*f.x3 + w.b4*f.x4"
    ctes = [
        f"toks AS MATERIALIZED ({TOKS_SQL})",
        f"""fe AS MATERIALIZED (
  SELECT t.doc_id,
         CAST(COUNT(*) AS DOUBLE)/100e0 AS x1,
         CAST(SUM(length(t.tok)) AS DOUBLE)/COUNT(*) AS x2,
         CAST(SUM(CASE WHEN t.tok IN ({stoplist}) THEN 1 ELSE 0 END) AS DOUBLE)
           /COUNT(*) AS x3,
         CAST(COUNT(DISTINCT t.tok) AS DOUBLE)/COUNT(*) AS x4,
         CASE WHEN MAX(d.lang) = '{DSIR_LANG}' THEN 1e0 ELSE 0e0 END AS y
  FROM toks t JOIN documents d ON d.doc_id = t.doc_id
  GROUP BY t.doc_id)""",
        "w0 AS (SELECT 0e0 AS b0, 0e0 AS b1, 0e0 AS b2, 0e0 AS b3, 0e0 AS b4)",
    ]
    for t in range(1, steps + 1):
        ctes.append(
            f"""g{t} AS (
  SELECT AVG(e) AS g0, AVG(e*x1) AS g1, AVG(e*x2) AS g2,
         AVG(e*x3) AS g3, AVG(e*x4) AS g4
  FROM (SELECT (1e0/(1e0+EXP(-({zexpr}))) - f.y) AS e, f.x1, f.x2, f.x3, f.x4
        FROM fe f CROSS JOIN w{t-1} w)),
w{t} AS (SELECT w.b0 - 1e0*g.g0 AS b0, w.b1 - 1e0*g.g1 AS b1,
                w.b2 - 1e0*g.g2 AS b2, w.b3 - 1e0*g.g3 AS b3,
                w.b4 - 1e0*g.g4 AS b4
         FROM w{t-1} w CROSS JOIN g{t} g)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT f.doc_id,
       ROUND(1e0/(1e0+EXP(-({zexpr}))), 6) AS prob,
       (1e0/(1e0+EXP(-({zexpr}))) >= 0.5e0) AS keep
FROM fe f CROSS JOIN w{steps} w"""
    )


DOCS_ORACLE["quality_classifier"] = _classifier_sql()
DOCS_QUERIES["quality_classifier"] = q_quality_classifier


# ---------------------------------------------- HyperLogLog distinct sketch


def q_hll_distinct_tokens(spark, sf_dir):
    """HLL distinct-token estimate (p=10, portable-md5 register layout,
    linear-counting small-range correction) next to the exact count —
    the gate hash-matches the full estimator arithmetic cross-engine."""
    from .functions.sketch import hll_distinct_tokens

    return hll_distinct_tokens(spark.read.parquet(f"{sf_dir}/documents.parquet"))


def _hll_sql() -> str:
    from .functions.sketch import HLL_ALPHA, HLL_P

    m = 1 << HLL_P
    am2 = repr(HLL_ALPHA * m * m)
    zmax = 60 - HLL_P + 1
    return f"""
WITH toks AS MATERIALIZED ({TOKS_SQL}),
h AS (SELECT {HASH.format('tok')} AS h FROM toks),
regs AS (
  SELECT h & {m - 1} AS b,
         MAX(CASE WHEN (h >> {HLL_P}) = 0 THEN {zmax}
                  ELSE {zmax} - length(bin(h >> {HLL_P})) END) AS M
  FROM h GROUP BY b),
agg AS (SELECT COUNT(*) AS cnt, SUM(POWER(2.0, -M)) AS s FROM regs),
est AS (
  SELECT cnt AS n_registers,
         ROUND(CASE WHEN (CAST({am2} AS DOUBLE) / (s + ({m}e0 - cnt))) <= {2.5 * m}
                         AND ({m} - cnt) > 0
                    THEN {m}e0 * ln({m}e0 / CAST({m} - cnt AS DOUBLE))
                    ELSE CAST({am2} AS DOUBLE) / (s + ({m}e0 - cnt)) END, 4)
           AS hll_est
  FROM agg),
ex AS (SELECT COUNT(DISTINCT tok) AS exact_distinct FROM toks)
SELECT n_registers, hll_est, exact_distinct,
       ROUND(ABS(hll_est - exact_distinct) / exact_distinct, 4) AS rel_err
FROM est CROSS JOIN ex"""


DOCS_ORACLE["hll_distinct_tokens"] = _hll_sql()
DOCS_QUERIES["hll_distinct_tokens"] = q_hll_distinct_tokens


# --------------------------------------------- robust winnowing (MOSS)

WINNOW_K = 3
WINNOW_W = 4
WINNOW_MIN_SHARED = 2


def q_winnowing(spark, sf_dir):
    """Robust winnowing fingerprints (Schleimer-Wilkerson-Aiken 2003):
    rightmost-min of every k-gram hash window — the positional
    partial-overlap detector (functions/dedup.py::winnowing_fingerprints)."""
    from .functions.dedup import winnowing_fingerprints

    return winnowing_fingerprints(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        k=WINNOW_K,
        window=WINNOW_W,
    )


def q_winnowing_matches(spark, sf_dir):
    """MOSS match report — doc pairs sharing >= min_shared distinct
    winnowing fingerprints. Uncapped (max_df=None) to mirror the oracle."""
    from .functions.dedup import winnowing_matches

    return winnowing_matches(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        k=WINNOW_K,
        window=WINNOW_W,
        min_shared=WINNOW_MIN_SHARED,
    )


def _winnow_fp_sql() -> str:
    k, w = WINNOW_K, WINNOW_W
    gram_terms = " + ".join(
        f"LEAD(h, {j}) OVER won * {3 ** j}" for j in range(k)
    )
    return f"""
WITH toks AS MATERIALIZED ({TOKS_SQL}),
h AS (SELECT doc_id, pos, {HASH.format('tok')} % 2147483647 AS h FROM toks),
grams AS MATERIALIZED (
  SELECT doc_id, pos, ({gram_terms}) % 2147483647 AS gh,
         LEAD(h, {k - 1}) OVER won AS _full
  FROM h
  WINDOW won AS (PARTITION BY doc_id ORDER BY pos)
  QUALIFY _full IS NOT NULL),
ng AS (SELECT doc_id, COUNT(*) AS n FROM grams GROUP BY doc_id),
cand AS (
  SELECT g.doc_id, g.pos, g.gh, g.pos - t.off AS wid,
         GREATEST(ng.n - {w - 1}, 1) AS maxw
  FROM grams g JOIN ng USING (doc_id)
  CROSS JOIN (SELECT UNNEST(range({w})) AS off) t
  WHERE g.pos - t.off >= 1 AND g.pos - t.off <= GREATEST(ng.n - {w - 1}, 1)),
sel AS (
  SELECT doc_id, pos, gh,
         ROW_NUMBER() OVER (PARTITION BY doc_id, wid
                            ORDER BY gh ASC, pos DESC) AS rn
  FROM cand)
SELECT DISTINCT doc_id, pos, CAST(gh AS BIGINT) AS fp FROM sel WHERE rn = 1"""


def _winnow_match_sql() -> str:
    return f"""
WITH fps0 AS MATERIALIZED ({_winnow_fp_sql()}),
fps AS (SELECT DISTINCT doc_id, fp FROM fps0)
SELECT a.doc_id AS a, b.doc_id AS b, CAST(COUNT(*) AS BIGINT) AS shared
FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
GROUP BY a.doc_id, b.doc_id
HAVING COUNT(*) >= {WINNOW_MIN_SHARED}"""


DOCS_ORACLE["winnowing"] = _winnow_fp_sql()
DOCS_QUERIES["winnowing"] = q_winnowing
DOCS_ORACLE["winnowing_matches"] = _winnow_match_sql()
DOCS_QUERIES["winnowing_matches"] = q_winnowing_matches


# --------------------------------------------------- TextRank

TR_ITERS = 8
TR_DAMPING = 0.85


def q_textrank(spark, sf_dir):
    """TextRank document centrality over the tf-idf cosine similarity
    graph (threshold APSS_T, df-cap NGRAM_MAX_DF) — the weighted-PageRank
    kernel on a derived similarity graph; isolated docs at the exact
    closed-form (1-d)."""
    from .operators.textrank import textrank_documents

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = textrank_documents(
        docs,
        threshold=APSS_T,
        max_df=NGRAM_MAX_DF,
        damping=TR_DAMPING,
        max_iter=TR_ITERS,
    )
    return out.select("doc_id", F.round(F.col("score"), 6).alias("score"))


def _textrank_sql() -> str:
    # the tf-idf APSS pair CTEs are the tfidf_cosine_pairs oracle verbatim;
    # the iteration CTEs mirror _weighted_pagerank_sql (same 1/N-space
    # arithmetic as the Spark kernel, scaled by N only at the end) over the
    # symmetrized pair graph.
    ctes = f"""WITH toks AS MATERIALIZED ({TOKS_SQL}),
tf AS (SELECT doc_id, tok, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
nd AS (SELECT COUNT(*) AS n FROM documents),
dfb AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
w AS (
  SELECT t.doc_id, t.tok,
         CAST(ROUND(ROUND(t.tf * ln((SELECT n FROM nd) / CAST(d.df AS DOUBLE)),
                          4) * 10000.0) AS BIGINT) AS q
  FROM tf t JOIN dfb d ON d.tok = t.tok
  WHERE d.df <= {NGRAM_MAX_DF}),
wz AS (SELECT * FROM w WHERE q <> 0),
nrm AS (SELECT doc_id, sqrt(CAST(SUM(q * q) AS DOUBLE)) AS nr
        FROM wz GROUP BY doc_id),
dots AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, SUM(a.q * b.q) AS dot
  FROM wz a JOIN wz b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2),
pr AS MATERIALIZED (
  SELECT doc_a, doc_b, cos_sim FROM (
    SELECT d.doc_a, d.doc_b,
           ROUND(CAST(d.dot AS DOUBLE) / (na.nr * nb.nr), 6) AS cos_sim
    FROM dots d JOIN nrm na ON na.doc_id = d.doc_a
    JOIN nrm nb ON nb.doc_id = d.doc_b)
  WHERE cos_sim >= {APSS_T}),
sym AS MATERIALIZED (
  SELECT doc_a AS src, doc_b AS dst, cos_sim AS wt FROM pr
  UNION ALL
  SELECT doc_b AS src, doc_a AS dst, cos_sim AS wt FROM pr),
gn AS MATERIALIZED (SELECT DISTINCT src AS id FROM sym),
nn AS (SELECT COUNT(*) AS n FROM gn),
ow AS MATERIALIZED (SELECT src AS id, SUM(wt) AS ow FROM sym GROUP BY src),
s0 AS MATERIALIZED (SELECT id, 1e0/(SELECT n FROM nn) AS rank FROM gn)"""
    base_factor = repr(1.0 - TR_DAMPING)
    for i in range(1, TR_ITERS + 1):
        ctes += f""",
s{i} AS MATERIALIZED (
  SELECT gn.id,
         CAST({base_factor} AS DOUBLE)/(SELECT n FROM nn)
         + CAST({TR_DAMPING!r} AS DOUBLE) * COALESCE(c.contrib, 0e0) AS rank
  FROM gn LEFT JOIN (
    SELECT e.dst AS id, SUM(s.rank * (e.wt / o.ow)) AS contrib
    FROM s{i-1} s JOIN sym e ON e.src = s.id JOIN ow o ON o.id = s.id
    GROUP BY e.dst
  ) c ON gn.id = c.id)"""
    return (
        ctes
        + f"""
SELECT id AS doc_id, ROUND(rank * (SELECT n FROM nn), 6) AS score FROM s{TR_ITERS}
UNION ALL
SELECT d.doc_id, ROUND(CAST({base_factor} AS DOUBLE), 6) AS score
FROM documents d WHERE d.doc_id NOT IN (SELECT id FROM gn)"""
    )


DOCS_ORACLE["textrank"] = _textrank_sql()
DOCS_QUERIES["textrank"] = q_textrank


KW_WINDOW = 2


def q_keyword_textrank(spark, sf_dir):
    """Corpus keyword salience: TextRank over the token co-occurrence
    graph (window KW_WINDOW, exact-count weights, md5-lane token ids)."""
    from .operators.textrank import keyword_textrank

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = keyword_textrank(
        docs, window=KW_WINDOW, damping=TR_DAMPING, max_iter=TR_ITERS
    )
    return out.select("tok", F.round(F.col("score"), 6).alias("score"))


def _keyword_textrank_sql() -> str:
    ctes = f"""WITH toks AS MATERIALIZED ({TOKS_SQL}),
co AS MATERIALIZED (
  SELECT LEAST(a.tok, b.tok) AS ta, GREATEST(a.tok, b.tok) AS tb
  FROM toks a
  CROSS JOIN (SELECT UNNEST(range(1, {KW_WINDOW + 1})) AS off) o
  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + o.off
  WHERE a.tok <> b.tok),
wts AS MATERIALIZED (
  SELECT {HASH.format('ta')} AS src0, {HASH.format('tb')} AS dst0,
         CAST(COUNT(*) AS DOUBLE) AS wt
  FROM co GROUP BY ta, tb),
sym AS MATERIALIZED (
  SELECT src0 AS src, dst0 AS dst, wt FROM wts
  UNION ALL
  SELECT dst0 AS src, src0 AS dst, wt FROM wts),
gn AS MATERIALIZED (SELECT DISTINCT src AS id FROM sym),
nn AS (SELECT COUNT(*) AS n FROM gn),
ow AS MATERIALIZED (SELECT src AS id, SUM(wt) AS ow FROM sym GROUP BY src),
s0 AS MATERIALIZED (SELECT id, 1e0/(SELECT n FROM nn) AS rank FROM gn)"""
    base_factor = repr(1.0 - TR_DAMPING)
    for i in range(1, TR_ITERS + 1):
        ctes += f""",
s{i} AS MATERIALIZED (
  SELECT gn.id,
         CAST({base_factor} AS DOUBLE)/(SELECT n FROM nn)
         + CAST({TR_DAMPING!r} AS DOUBLE) * COALESCE(c.contrib, 0e0) AS rank
  FROM gn LEFT JOIN (
    SELECT e.dst AS id, SUM(s.rank * (e.wt / o.ow)) AS contrib
    FROM s{i-1} s JOIN sym e ON e.src = s.id JOIN ow o ON o.id = s.id
    GROUP BY e.dst
  ) c ON gn.id = c.id)"""
    return (
        ctes
        + f""",
vocab AS (SELECT DISTINCT tok FROM toks)
SELECT v.tok,
       COALESCE(ROUND(s.rank * (SELECT n FROM nn), 6),
                ROUND(CAST({base_factor} AS DOUBLE), 6)) AS score
FROM vocab v
LEFT JOIN s{TR_ITERS} s ON s.id = {HASH.format('v.tok')}"""
    )


DOCS_ORACLE["keyword_textrank"] = _keyword_textrank_sql()
DOCS_QUERIES["keyword_textrank"] = q_keyword_textrank


DK_ITERS = 6


def q_doc_keywords(spark, sf_dir):
    """Per-document keyword extraction: TextRank at document grain
    (unnormalized 1-space recurrence, per-doc co-occurrence graphs
    fixpointed simultaneously on the (doc_id, tok) composite key)."""
    from .operators.textrank import doc_keywords

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    out = doc_keywords(
        docs, window=KW_WINDOW, damping=TR_DAMPING, max_iter=DK_ITERS
    )
    return out.select("doc_id", "tok", F.round(F.col("score"), 6).alias("score"))


def _doc_keywords_sql() -> str:
    base = repr(1.0 - TR_DAMPING)
    ctes = f"""WITH toks AS MATERIALIZED ({TOKS_SQL}),
co AS MATERIALIZED (
  SELECT a.doc_id, LEAST(a.tok, b.tok) AS ta, GREATEST(a.tok, b.tok) AS tb
  FROM toks a
  CROSS JOIN (SELECT UNNEST(range(1, {KW_WINDOW + 1})) AS off) o
  JOIN toks b ON b.doc_id = a.doc_id AND b.pos = a.pos + o.off
  WHERE a.tok <> b.tok),
wts AS MATERIALIZED (
  SELECT doc_id, ta, tb, CAST(COUNT(*) AS DOUBLE) AS w
  FROM co GROUP BY doc_id, ta, tb),
sym AS MATERIALIZED (
  SELECT doc_id, ta AS u, tb AS v, w FROM wts
  UNION ALL
  SELECT doc_id, tb AS u, ta AS v, w FROM wts),
ow AS MATERIALIZED (SELECT doc_id, u, SUM(w) AS ow FROM sym GROUP BY doc_id, u),
gn AS MATERIALIZED (SELECT DISTINCT doc_id, u FROM sym),
s0 AS MATERIALIZED (SELECT doc_id, u, 1e0 AS s FROM gn)"""
    for i in range(1, DK_ITERS + 1):
        ctes += f""",
s{i} AS MATERIALIZED (
  SELECT gn.doc_id, gn.u,
         CAST({base} AS DOUBLE)
         + CAST({TR_DAMPING!r} AS DOUBLE) * COALESCE(c.cs, 0e0) AS s
  FROM gn LEFT JOIN (
    SELECT e.doc_id, e.v AS u, SUM(s.s * (e.w / o.ow)) AS cs
    FROM s{i-1} s
    JOIN sym e ON e.doc_id = s.doc_id AND e.u = s.u
    JOIN ow o ON o.doc_id = e.doc_id AND o.u = e.u
    GROUP BY e.doc_id, e.v
  ) c ON c.doc_id = gn.doc_id AND c.u = gn.u)"""
    return (
        ctes
        + f""",
vocab AS (SELECT DISTINCT doc_id, tok FROM toks)
SELECT v.doc_id, v.tok,
       COALESCE(ROUND(s.s, 6), ROUND(CAST({base} AS DOUBLE), 6)) AS score
FROM vocab v
LEFT JOIN s{DK_ITERS} s ON s.doc_id = v.doc_id AND s.u = v.tok"""
    )


DOCS_ORACLE["doc_keywords"] = _doc_keywords_sql()
DOCS_QUERIES["doc_keywords"] = q_doc_keywords


# ------------------------------------------- anchor-text aggregation

ANCHOR_DOCS = 500  # doc_id domain (0..499 at every SF)
ANCHOR_FANOUT = 3
ANCHOR_TOPK = 3


def q_anchor_text(spark, sf_dir):
    """End-to-end html → anchors → per-target aggregation through the REAL
    extraction path (extract.py mapInPandas, input-hint html contract):
    build a deterministic pages table from documents (each doc links to 3
    modulo-derived targets, anchor text = its first 3 tokens), parse the
    html back with the pinned Arrow-batched extractor, aggregate each
    target's top anchor strings. The oracle never sees the html — it
    derives the same rows relationally, so the gate checks the whole
    construct→parse round trip."""
    from .sources.extract import anchor_text_summary, extract_anchor_texts

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    toks = F.filter(F.split(F.lower(F.col("text")), r"\s+"), lambda x: x != "")
    first3 = F.array_join(F.slice(toks, 1, 3), " ")
    frag = [F.lit("<html><body>")]
    for j in range(1, ANCHOR_FANOUT + 1):
        tgt = (F.col("doc_id") * 7 + j) % ANCHOR_DOCS
        frag += [
            F.lit('<a href="http://site/p'),
            tgt.cast("string"),
            F.lit('">'),
            first3,
            F.lit("</a>"),
        ]
    frag.append(F.lit("</body></html>"))
    pages = d.select(
        F.concat(F.lit("http://site/p"), F.col("doc_id").cast("string")).alias("url"),
        F.concat(*frag).cast("binary").alias("html"),
    )
    return anchor_text_summary(extract_anchor_texts(pages), top_k=ANCHOR_TOPK)


def _anchor_text_sql() -> str:
    return f"""WITH d AS MATERIALIZED (
  SELECT doc_id,
         array_to_string(
           list_slice(list_filter(string_split_regex(lower(text), '\\s+'),
                                  x -> x <> ''), 1, 3), ' ') AS first3
  FROM documents),
anchors AS MATERIALIZED (
  SELECT 'http://site/p' || CAST((d.doc_id * 7 + j.j) % {ANCHOR_DOCS} AS VARCHAR)
           AS dst_url,
         d.first3 AS anchor
  FROM d CROSS JOIN (VALUES (1), (2), (3)) AS j(j)),
counts AS MATERIALIZED (
  SELECT dst_url, anchor, COUNT(*) AS cnt FROM anchors GROUP BY dst_url, anchor),
inlinks AS MATERIALIZED (
  SELECT dst_url, COUNT(*) AS n_inlinks FROM anchors GROUP BY dst_url)
SELECT c.dst_url, c.anchor, c.cnt, i.n_inlinks, c.rank
FROM (
  SELECT dst_url, anchor, cnt,
         CAST(ROW_NUMBER() OVER (PARTITION BY dst_url
                                 ORDER BY cnt DESC, anchor ASC) AS INT) AS rank
  FROM counts
) c JOIN inlinks i ON i.dst_url = c.dst_url
WHERE c.rank <= {ANCHOR_TOPK}"""


DOCS_ORACLE["anchor_text"] = _anchor_text_sql()
DOCS_QUERIES["anchor_text"] = q_anchor_text


# ------------------------------------------- redirect-chain resolution

RD_DOCS = 500
RD_DOUBLINGS = 6  # resolves chains up to 2^6 = 64 hops


def q_redirect_resolution(spark, sf_dir):
    """Terminal-target resolution of a url redirect map by pointer doubling
    (operators/redirects.py): every doc whose id is not a multiple of 3
    redirects to (id*13+7) % 500; chains resolve to the first multiple of
    3 hit, cycles among non-terminals come back resolved=false."""
    from .operators.redirects import resolve_redirects

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    url = F.concat(F.lit("http://site/p"), F.col("doc_id").cast("string"))
    tgt = F.concat(
        F.lit("http://site/p"),
        ((F.col("doc_id") * 13 + 7) % RD_DOCS).cast("string"),
    )
    redirects = d.filter(F.col("doc_id") % 3 != 0).select(
        url.alias("src"), tgt.alias("dst")
    )
    return resolve_redirects(redirects, max_doublings=RD_DOUBLINGS)


def _redirect_resolution_sql() -> str:
    ctes = [
        f"""m AS MATERIALIZED (
  SELECT 'http://site/p' || CAST(doc_id AS VARCHAR) AS src,
         'http://site/p' || CAST((doc_id * 13 + 7) % {RD_DOCS} AS VARCHAR) AS dst
  FROM documents WHERE doc_id % 3 <> 0)""",
        """rnodes AS MATERIALIZED (
  SELECT DISTINCT id FROM (SELECT src AS id FROM m UNION ALL SELECT dst FROM m))""",
        """j0 AS MATERIALIZED (
  SELECT n.id, COALESCE(m.dst, n.id) AS v,
         CAST(CASE WHEN m.dst IS NULL THEN 0 ELSE 1 END AS BIGINT) AS steps
  FROM rnodes n LEFT JOIN m ON m.src = n.id)""",
    ]
    for k in range(1, RD_DOUBLINGS + 1):
        ctes.append(
            f"""j{k} AS MATERIALIZED (
  SELECT a.id, b.v, a.steps + b.steps AS steps
  FROM j{k-1} a JOIN j{k-1} b ON b.id = a.v)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f""",
term AS MATERIALIZED (SELECT DISTINCT src AS v FROM m)
SELECT j.id AS url,
       CASE WHEN t.v IS NULL THEN j.v END AS final,
       CASE WHEN t.v IS NULL THEN j.steps END AS hops,
       t.v IS NULL AS resolved
FROM j{RD_DOUBLINGS} j LEFT JOIN term t ON t.v = j.v"""
    )


DOCS_ORACLE["redirect_resolution"] = _redirect_resolution_sql()
DOCS_QUERIES["redirect_resolution"] = q_redirect_resolution


# ------------------------------------------- positional phrase search

PHRASE = "table hash"


def q_phrase_search(spark, sf_dir):
    """Exact phrase query over the positional inverted index
    (functions/search.py) — (k-1) adjacency self-joins on term-filtered
    postings, the pinned tokenizer shared with every text gate."""
    from .functions.search import phrase_search

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return phrase_search(d, PHRASE)


def _phrase_search_sql() -> str:
    words = PHRASE.lower().split()
    joins, conds = [], [f"t0.tok = '{words[0]}'"]
    for i, w in enumerate(words[1:], start=1):
        joins.append(
            f"JOIN toks t{i} ON t{i}.doc_id = t0.doc_id AND t{i}.pos = t0.pos + {i}"
        )
        conds.append(f"t{i}.tok = '{w}'")
    return f"""WITH toks AS MATERIALIZED ({TOKS_SQL}),
m AS (
  SELECT t0.doc_id, t0.pos FROM toks t0
  {' '.join(joins)}
  WHERE {' AND '.join(conds)})
SELECT doc_id, COUNT(*) AS n_matches, CAST(MIN(pos) AS BIGINT) AS first_pos
FROM m GROUP BY doc_id"""


DOCS_ORACLE["phrase_search"] = _phrase_search_sql()
DOCS_QUERIES["phrase_search"] = q_phrase_search


# ---------------------------- leakage-safe (cluster-keyed) dataset splits


def q_leakage_safe_splits(spark, sf_dir):
    """Split assignment keyed by the near-dup CLUSTER id — no verified
    near-duplicate pair ever straddles train/val/test (the dedup-before-
    split rule; composes the gated dedup_clusters + dataset_splits)."""
    from .functions.cluster import leakage_safe_splits

    return leakage_safe_splits(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        seed=SPLIT_SEED,
        threshold=0.5,
    )


DOCS_ORACLE["leakage_safe_splits"] = f"""WITH RECURSIVE pairs AS MATERIALIZED (
{DOCS_ORACLE["lsh_verified_dedup"]}
),
und AS (SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION SELECT doc_b AS a, doc_a AS b FROM pairs),
reach AS (SELECT a, b FROM und
          UNION SELECT r.a, u.b FROM reach r JOIN und u ON u.a = r.b),
comp AS (SELECT a AS doc_id, LEAST(a, MIN(b)) AS cluster FROM reach GROUP BY a),
cl AS (SELECT d.doc_id, COALESCE(c.cluster, d.doc_id) AS cluster
       FROM documents d LEFT JOIN comp c ON c.doc_id = d.doc_id),
bk AS (SELECT doc_id, cluster,
              {HASH.format(f"concat(CAST(cluster AS VARCHAR), ':split:{SPLIT_SEED}')")} % 100
                AS bucket
       FROM cl)
SELECT doc_id, cluster, bucket,
       CASE WHEN bucket < 90 THEN 'train'
            WHEN bucket < 95 THEN 'val'
            ELSE 'test' END AS split
FROM bk"""
DOCS_QUERIES["leakage_safe_splits"] = q_leakage_safe_splits


# ------------------------------------------- Count-Min sketch

CMS_D = 4
CMS_W = 512


def q_cms_token_counts(spark, sf_dir):
    """Exact top-20 tokens with their Count-Min estimates — n_est ≥ n
    (the CMS one-sided bound) is visible in the artifact."""
    from .functions.sketch import cms_token_estimates

    return cms_token_estimates(
        spark.read.parquet(f"{sf_dir}/documents.parquet"),
        depth=CMS_D,
        width=CMS_W,
        k=TOP_TOKENS_K,
    )


def _cms_sql() -> str:
    lane_cols = lambda r: HASH.format(f"tok || ':cms{r}'") + f" % {CMS_W}"
    counter_union = " UNION ALL ".join(
        f"SELECT {r} AS row, {lane_cols(r)} AS col FROM toks"
        for r in range(CMS_D)
    )
    probe_union = " UNION ALL ".join(
        f"SELECT tok, n, {r} AS row, {lane_cols(r)} AS col FROM top"
        for r in range(CMS_D)
    )
    return f"""
WITH toks AS MATERIALIZED ({TOKS_SQL}),
counters AS MATERIALIZED (
  SELECT row, col, COUNT(*) AS c FROM ({counter_union}) GROUP BY row, col),
top AS MATERIALIZED (
  SELECT tok, COUNT(*) AS n FROM toks GROUP BY tok
  ORDER BY n DESC, tok ASC LIMIT {TOP_TOKENS_K}),
probes AS ({probe_union})
SELECT q.tok, q.n, MIN(c.c) AS n_est
FROM probes q JOIN counters c ON c.row = q.row AND c.col = q.col
GROUP BY q.tok, q.n"""


DOCS_ORACLE["cms_token_counts"] = _cms_sql()
DOCS_QUERIES["cms_token_counts"] = q_cms_token_counts


# ---------------------------------------------- temperature mixture

MIX_S = 0.7


def q_temperature_mixture(spark, sf_dir):
    """mBERT/XLM-R exponent-smoothed sampling mixture over languages
    (q_i ∝ p_i^S, S=0.7) — the corpus-mixing sampler configuration."""
    from .functions.sample import temperature_mixture

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return temperature_mixture(docs, by="lang", smoothing=MIX_S)


DOCS_ORACLE["temperature_mixture"] = f"""WITH g AS (
  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(n_chars) AS BIGINT) AS n_chars
  FROM documents GROUP BY lang),
t AS (SELECT SUM(n_docs) AS t FROM g),
s AS (SELECT g.*, ROUND(CAST(n_docs AS DOUBLE) / (SELECT t FROM t), 6) AS share
      FROM g),
p AS (SELECT s.*, POWER(share, CAST({MIX_S!r} AS DOUBLE)) AS pw FROM s),
z AS (SELECT SUM(pw) AS z FROM p)
SELECT lang, n_docs, n_chars, share,
       ROUND(pw / (SELECT z FROM z), 6) AS weight
FROM p"""
DOCS_QUERIES["temperature_mixture"] = q_temperature_mixture


# ---------------------------------------------- URL canonicalization


def q_url_normalize(spark, sf_dir):
    """RFC 3986 §6 syntax-based URL normalization over deterministically
    messy synthetic URLs (one of six messiness shapes per doc_id) — the
    crawl-frontier / URL-dedup canonicalization stage."""
    from .functions.search import normalize_urls

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    d = F.col("doc_id").cast("string")
    url = (
        F.when(F.col("doc_id") % 6 == 0,
               F.concat(F.lit("HTTP://Example.COM/a/b/c?x="), d))
        .when(F.col("doc_id") % 6 == 1,
              F.concat(F.lit("http://example.com:80/a/./b/../c#frag"), d))
        .when(F.col("doc_id") % 6 == 2,
              F.concat(F.lit("HTTPS://Sub.Example.Com.:443/p/"), d, F.lit("/../q")))
        .when(F.col("doc_id") % 6 == 3, F.lit("http://Example.com"))
        .when(F.col("doc_id") % 6 == 4,
              F.concat(F.lit("http://EXAMPLE.com//a/b/./c/../d?q="), d, F.lit("#z")))
        .otherwise(F.concat(F.lit("not a url "), d))
    )
    return normalize_urls(docs.withColumn("url", url)).select(
        "doc_id", "url", "canonical"
    )


DOCS_ORACLE["url_normalize"] = r"""WITH raw AS (
  SELECT doc_id,
         CASE doc_id % 6
           WHEN 0 THEN 'HTTP://Example.COM/a/b/c?x=' || doc_id
           WHEN 1 THEN 'http://example.com:80/a/./b/../c#frag' || doc_id
           WHEN 2 THEN 'HTTPS://Sub.Example.Com.:443/p/' || doc_id || '/../q'
           WHEN 3 THEN 'http://Example.com'
           WHEN 4 THEN 'http://EXAMPLE.com//a/b/./c/../d?q=' || doc_id || '#z'
           ELSE 'not a url ' || doc_id
         END AS url
  FROM documents),
parts AS (
  SELECT doc_id, url,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(.*)$', 1)) AS scheme,
         lower(regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(.*)$', 2)) AS host0,
         regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(.*)$', 3) AS path0,
         regexp_extract(url, '^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(.*)$', 4) AS tail0
  FROM raw),
hostfix AS (
  SELECT doc_id, url, scheme,
         CASE WHEN scheme = 'http'
                THEN regexp_replace(regexp_replace(host0, ':80$', ''), '\.$', '')
              WHEN scheme = 'https'
                THEN regexp_replace(regexp_replace(host0, ':443$', ''), '\.$', '')
              ELSE regexp_replace(host0, '\.$', '') END AS host,
         regexp_replace(path0, '/{2,}', '/', 'g') AS p0, tail0
  FROM parts),
pathfix AS (
  SELECT doc_id, url, scheme, host,
         regexp_replace(
           regexp_replace(
             regexp_replace(
               regexp_replace(
                 regexp_replace(
                   regexp_replace(
                     regexp_replace(
                       regexp_replace(p0,
                         '/\./', '/', 'g'), '/[^/.][^/]*/\.\./', '/', 'g'),
                     '/\./', '/', 'g'), '/[^/.][^/]*/\.\./', '/', 'g'),
                 '/\./', '/', 'g'), '/[^/.][^/]*/\.\./', '/', 'g'),
             '/\./', '/', 'g'), '/[^/.][^/]*/\.\./', '/', 'g') AS p1,
         tail0
  FROM hostfix),
fin AS (
  SELECT doc_id, url, scheme, host,
         CASE WHEN regexp_replace(p1, '/\.$', '/', 'g') = ''
              THEN '/' ELSE regexp_replace(p1, '/\.$', '/', 'g') END AS path,
         regexp_replace(regexp_replace(tail0, '#.*$', '', 'g'), '^\?$', '', 'g') AS query
  FROM pathfix)
SELECT doc_id, url,
       CASE WHEN scheme = '' OR scheme IS NULL THEN url
            ELSE scheme || '://' || host || path || query END AS canonical
FROM fin"""
DOCS_QUERIES["url_normalize"] = q_url_normalize
