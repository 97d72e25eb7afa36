"""Text analysis for training-data pipelines — token stats, quality,
language-ID, fingerprints.

Everything here is built from JVM-side ``pyspark.sql.functions`` only (no
Python UDFs): tokenization, hashing and window arithmetic are all Catalyst
expressions, so these run inside whole-stage codegen at 100 TB. Every
operator has an exact DuckDB oracle (entry_queries_docs.py) — hence the
deliberately portable primitives:

- tokens: ``split(lower(text), '\\s+')`` with empties filtered
- token→int hash: first 15 hex chars of md5 → 60-bit integer (identical in
  Spark ``conv`` and DuckDB hex-cast)
- rolling fingerprints: base-3 polynomial over a lag window mod 2^31-1

Sole exception: ``pack_sequences`` — greedy packing is sequential per
stream by definition, so it runs as one Arrow ``applyInPandas`` over
(doc_id, n_tokens) pairs (never text), one bounded batch per stream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

P31 = 2147483647  # 2^31 - 1

STOPWORDS = ["the", "a", "of", "and", "to", "in", "is", "on", "for", "with"]

LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "das", "ist", "nicht"],
    "en": ["the", "and", "of", "is", "to", "that"],
    "es": ["el", "los", "y", "que", "de", "no"],
    "fr": ["le", "la", "et", "les", "des", "est"],
}


def tokens_col(text_col: str = "text"):
    """array<string> of lowercase whitespace tokens, empties removed."""
    return F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != F.lit("")
    )


def token_hash(col):
    """60-bit integer hash of a string — md5 prefix, portable to DuckDB."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def tokenize(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """DataFrame[id_col, pos (1-based), tok]."""
    return df.select(
        id_col, F.posexplode(tokens_col(text_col)).alias("pos0", "tok")
    ).select(id_col, (F.col("pos0") + 1).alias("pos"), "tok")


def token_counts(documents: DataFrame) -> DataFrame:
    """Per-doc token count + distinct count (whitespace tokenization)."""
    return documents.select(
        "doc_id",
        F.size(tokens_col()).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(tokens_col())).cast("long").alias("n_distinct_tokens"),
    )


def quality_scores(documents: DataFrame) -> DataFrame:
    """Per-doc quality heuristics: length, mean token length, stopword
    ratio, punctuation ratio — the standard cheap pre-filters for corpus
    curation. All ratios rounded to 6dp for cross-engine stability."""
    toks = tokens_col()
    n_tokens = F.size(toks)
    char_len = F.length("text")
    punct = char_len - F.length(F.regexp_replace(F.col("text"), r"[.,!?;:]", ""))
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    return documents.select(
        "doc_id",
        char_len.cast("long").alias("n_chars_measured"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(tok_chars / F.when(n_tokens > 0, n_tokens), 6).alias("avg_token_len"),
        F.round(n_stop / F.when(n_tokens > 0, n_tokens), 6).alias("stopword_ratio"),
        F.round(punct / F.when(char_len > 0, char_len), 6).alias("punct_ratio"),
    )


def language_id(documents: DataFrame) -> DataFrame:
    """Marker-word language heuristic → DataFrame[doc_id, lang_pred].

    Count marker hits per language among the doc's tokens; argmax with
    deterministic tie-break (higher count, then lexicographically smaller
    language code; zero hits → 'und')."""
    spark = documents.sparkSession
    markers = spark.createDataFrame(
        [(lang, w) for lang, ws in LANG_MARKERS.items() for w in ws],
        "cand_lang string, marker string",
    )
    toks = tokenize(documents)
    hits = (
        toks.join(F.broadcast(markers), toks["tok"] == markers["marker"])
        .groupBy("doc_id", "cand_lang")
        .agg(F.count("*").alias("hits"))
    )
    ranked = (
        hits.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("doc_id").orderBy(F.desc("hits"), F.asc("cand_lang"))
            ),
        )
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cand_lang").alias("lang_pred"))
    )
    return (
        documents.select("doc_id")
        .join(ranked, "doc_id", "left")
        .select("doc_id", F.coalesce("lang_pred", F.lit("und")).alias("lang_pred"))
    )


def fingerprints(documents: DataFrame, window: int = 4) -> DataFrame:
    """Rolling-hash document fingerprint (Karp-Rabin over token hashes).

    h_gram(j) = (Σ_{k=0..w-1} 3^k · h(tok_{j+k})) mod (2^31-1); the doc
    fingerprint is the minimum gram hash (winnowing-lite, 1 per doc).
    Docs shorter than the window get fingerprint of the partial gram."""
    toks = tokenize(documents).withColumn("h", token_hash(F.col("tok")) % P31)
    w = Window.partitionBy("doc_id").orderBy("pos")
    gram = F.lit(0)
    for k in range(window):
        term = F.coalesce(F.lead("h", k).over(w), F.lit(0)) * (3**k)
        gram = gram + term
    grams = toks.select("doc_id", (gram % P31).alias("gram_hash"))
    return grams.groupBy("doc_id").agg(F.min("gram_hash").alias("fingerprint"))


def tfidf_top_terms(documents: DataFrame, top_k: int = 3) -> DataFrame:
    """DataFrame[doc_id, tok, tf, score] — each doc's ``top_k`` terms by
    tf·idf, idf = ln(N / df) (plain ratio — N and df both ≥ 1, so the
    log is total; ties broken by token text for a deterministic top-k).

    Plan: one tokenize → (doc, tok) count (map-side combinable), a
    vocab-level df aggregate off the same frame, and a hash join tf⨝df —
    vocab scales with corpus size, so no broadcast. The per-doc top-k
    window partitions by doc_id: bounded by the doc's distinct-token
    count, never by vocab or corpus size.
    """
    tf = (
        tokenize(documents)
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    n_docs = documents.count()
    df_tbl = tf.groupBy("tok").agg(F.count("*").alias("df"))
    scored = tf.join(df_tbl, "tok").select(
        "doc_id",
        "tok",
        "tf",
        (F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df"))).alias("s"),
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("s"), F.asc("tok"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select("doc_id", "tok", "tf", F.round("s", 6).alias("score"))
    )


def bm25_scores(
    documents: DataFrame,
    query_terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
    top_k: int = 20,
) -> DataFrame:
    """DataFrame[doc_id, score] — BM25 relevance of each doc for a bag of
    query terms, top_k docs by (score desc, doc_id).

        idf(t)    = ln(1 + (N - df + 0.5)/(df + 0.5))     (Robertson)
        score(d)  = Σ_t idf·tf·(k1+1) / (tf + k1·(1-b+b·|d|/avg|d|))

    The tf table is filtered to the query terms FIRST (an isin over a
    few literals — pushed into the scan), so the join and window touch
    |query|·N rows, not the full posting list.
    """
    toks = tokenize(documents)
    lens = toks.groupBy("doc_id").agg(F.count("*").alias("dl"))
    # exact-integer sum / count, not avg(): both engines divide the same
    # exact BIGINT sum, so the literal is bit-identical to the oracle's
    avgdl = float(
        lens.agg((F.sum("dl").cast("double") / F.count("*")).alias("a"))
        .collect()[0]["a"]
        or 0.0
    )
    n_docs = documents.count()
    qtf = (
        toks.filter(F.col("tok").isin(query_terms))
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("tf"))
    )
    qdf = qtf.groupBy("tok").agg(F.count("*").alias("df"))
    idf = qdf.select(
        "tok",
        F.log(
            F.lit(1.0)
            + (F.lit(float(n_docs)) - F.col("df") + 0.5) / (F.col("df") + 0.5)
        ).alias("idf"),
    )
    contrib = (
        qtf.join(F.broadcast(idf), "tok")
        .join(lens, "doc_id")
        .select(
            "doc_id",
            (
                F.col("idf")
                * F.col("tf")
                * (k1 + 1.0)
                / (F.col("tf") + k1 * (1.0 - b + b * F.col("dl") / F.lit(avgdl)))
            ).alias("c"),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.round(F.sum("c"), 6).alias("score"))
        .orderBy(F.desc("score"), F.asc("doc_id"))
        .limit(top_k)
    )


def repetition_ratios(documents: DataFrame, ns: tuple[int, ...] = (2, 3)) -> DataFrame:
    """Per-doc duplicate/top n-gram fractions — the Gopher repetition
    filters (Rae et al. 2021, §A1.1), the standard signal for boilerplate
    and degenerate machine-generated text. For each n in ``ns``:

      dup_{n}gram_frac = 1 − distinct_n / total_n  (mass in repeated n-grams)
      top_{n}gram_frac = max_count_n / total_n     (mass of the single most
                                                    frequent n-gram)

    where total_n = token_count − n + 1 full n-grams; docs too short for
    any full n-gram report 0.0. Token-count basis (the character-mass
    variant weighs by n-gram length; same signal, simpler portability).

    Plan: one tokenize pass, per-n lead-window n-grams (windows partition
    by doc_id and are bounded by DOC length, never corpus size), then two
    map-side-combinable aggregates. Floats only in the final per-doc
    divisions, rounded to 6 dp identically on both engines."""
    t = tokenize(documents)
    out = documents.select("doc_id")
    for n in ns:
        w = Window.partitionBy("doc_id").orderBy("pos")
        parts = [F.col("tok")] + [F.lead("tok", i).over(w) for i in range(1, n)]
        grams = t.select(
            "doc_id",
            F.concat_ws(" ", *parts).alias("gram"),
            (F.lead("tok", n - 1).over(w).isNotNull() if n > 1 else F.lit(True)).alias(
                "_full"
            ),
        ).filter(F.col("_full"))
        per = grams.groupBy("doc_id", "gram").agg(F.count("*").alias("c"))
        aggd = per.groupBy("doc_id").agg(
            F.sum("c").alias("tot"), F.count("*").alias("dis"), F.max("c").alias("mx")
        ).select(
            "doc_id",
            F.round(F.lit(1.0) - F.col("dis") / F.col("tot"), 6).alias(
                f"dup_{n}gram_frac"
            ),
            F.round(F.col("mx") / F.col("tot"), 6).alias(f"top_{n}gram_frac"),
        )
        out = out.join(aggd, "doc_id", "left")
    fracs = [c for c in out.columns if c != "doc_id"]
    return out.select(
        "doc_id", *[F.coalesce(F.col(c), F.lit(0.0)).alias(c) for c in fracs]
    )


def unigram_logprob(documents: DataFrame) -> DataFrame:
    """Per-doc unigram negative log-likelihood — the deterministic stand-in
    for the CCNet/Wikipedia-LM perplexity filter: score each document by
    how surprising its tokens are under the CORPUS unigram distribution,
    avg_nll = (1/n) Σ_tok −ln(count(tok)/total). High = rare-token text
    (specialist or gibberish), low = stopword soup; pipelines keep a
    middle band.

    **Order-independent float trick**: a per-doc Σ of doubles depends on
    aggregation order (Spark's partial aggregates vs a SQL engine's hash
    order would drift in the last ulp). Each token's cost is therefore
    quantized ONCE to integer micro-nats — round((ln(total) − ln(cnt))·1e6)
    as BIGINT, a pure function of the token's corpus count — then per-doc
    sums are exact integer arithmetic in any order and any engine; the
    single float division per doc rounds to 6 dp. Quantization error is
    ≤ 5e-7 per token, bounded and deterministic.

    Plan: one tokenize pass, one vocab-sized count aggregate, one hash
    join of tokens against the vocab costs, one per-doc sum — all
    map-side combinable; the 1-row corpus total folds in as a cross join.
    """
    t = tokenize(documents).persist()
    freq = t.groupBy("tok").agg(F.count("*").alias("cnt"))
    total = t.groupBy().agg(F.count("*").cast("long").alias("total"))
    costs = freq.crossJoin(F.broadcast(total)).select(
        "tok",
        F.round(
            (F.log(F.col("total").cast("double")) - F.log(F.col("cnt").cast("double")))
            * F.lit(1000000.0)
        )
        .cast("long")
        .alias("micro_nll"),
    )
    per_doc = (
        t.join(costs, "tok")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("micro_nll").cast("long").alias("nll_micro"),
        )
    )
    out = documents.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_tokens", F.lit(0)).alias("n_tokens"),
        F.coalesce("nll_micro", F.lit(0)).alias("nll_micro"),
        F.when(
            F.coalesce("n_tokens", F.lit(0)) > 0,
            F.round(F.col("nll_micro") / (F.col("n_tokens") * F.lit(1000000.0)), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("avg_nll"),
    )
    t.unpersist()
    return out


def content_flags(documents: DataFrame) -> DataFrame:
    """Per-doc safety/PII screening flags — the filter stage every
    production corpus pipeline runs before near-dup/quality stages:

      has_email      something@something.tld shaped substring
      has_long_digits  a run of ≥ 9 digits (phone/SSN/card shapes)
      has_url        http(s):// or www. substring
      flagged        any of the above

    Patterns are deliberately in the common regex subset that Java regex
    (Spark) and RE2 (DuckDB) evaluate identically — no lookaround, no
    backreferences — so the gate proves cross-engine parity of the regex
    SEMANTICS, not just the counts. Pure map-side expressions, no shuffle;
    at 100 TB this is a free rider on the first scan of the text column.
    """
    email = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    digits = r"[0-9]{9,}"
    url = r"(https?://|www\.)"
    e = F.col("text").rlike(email)
    d = F.col("text").rlike(digits)
    u = F.col("text").rlike(url)
    return documents.select(
        "doc_id",
        e.alias("has_email"),
        d.alias("has_long_digits"),
        u.alias("has_url"),
        (e | d | u).alias("flagged"),
    )


def pack_sequences(
    documents: DataFrame, budget: int = 256, n_groups: int = 8
) -> DataFrame:
    """Greedy fixed-budget sequence packing — the training-data op that
    turns a document corpus into dense fixed-length model inputs (the
    "packing" step of every LLM pretraining pipeline; see T5/GPT-style
    example packing). Returns one row per doc:

        DataFrame[doc_id, grp, seq_id, offset, n_tokens]

    where docs are deterministically sharded into ``n_groups`` streams
    (grp = doc_id % n_groups), each stream is walked in doc_id order, and
    a doc is appended to the current sequence unless that would exceed
    ``budget`` tokens — then a new sequence starts. A doc longer than the
    budget occupies a sequence alone (truncation is the tokenizer's
    concern, not the packer's). ``offset`` is the doc's start position
    inside its sequence; ``seq_id`` restarts at 0 per group.

    Scale: greedy packing is inherently sequential IN ITS STREAM, so the
    parallel unit is the stream — ``n_groups`` scales with the corpus
    (100 TB → tens of thousands of groups, each a bounded pandas batch in
    one ``applyInPandas`` task); only the (doc_id, n_tokens) PAIRS move,
    never text. The per-group loop is O(docs in group) numpy, no Python
    per-row in the token path (token counts come from the shared Catalyst
    tokenizer).
    """
    tc = documents.select(
        "doc_id",
        (F.col("doc_id") % n_groups).cast("long").alias("grp"),
        F.size(tokens_col()).cast("long").alias("n_tokens"),
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("doc_id").reset_index(drop=True)
        seqs, offs = [], []
        seq, acc = 0, 0
        for i, t in enumerate(pdf["n_tokens"]):
            t = int(t)
            if i > 0 and acc + t > budget:
                seq += 1
                acc = 0
            offs.append(acc)
            seqs.append(seq)
            acc += t
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "grp": pdf["grp"],
                "seq_id": pd.Series(seqs, dtype="int64"),
                "offset": pd.Series(offs, dtype="int64"),
                "n_tokens": pdf["n_tokens"],
            }
        )

    return tc.groupBy("grp").applyInPandas(
        pack,
        schema="doc_id long, grp long, seq_id long, `offset` long, n_tokens long",
    )


def bigram_logprob(documents: DataFrame) -> DataFrame:
    """Per-doc bigram conditional NLL — the second-order companion to
    :func:`unigram_logprob`: score each document by how surprising its
    token TRANSITIONS are under the corpus bigram model,
    avg_nll = (1/(n−1)) Σ −ln p(w₂|w₁) with p(w₂|w₁) = cnt(w₁w₂)/ctx(w₁)
    where ctx(w₁) counts w₁'s occurrences as a bigram left-hand side.
    Every observed bigram has cnt ≥ 1, so the MLE is well-defined with no
    smoothing; repetitive/templated text scores near 0, incoherent
    word-salad scores high — the CCNet-style LM-perplexity filter band.

    Same order-independent float trick as the unigram scorer: each
    bigram's cost is quantized ONCE to integer micro-nats
    round((ln ctx − ln cnt)·1e6), a pure function of corpus counts, so
    per-doc sums are exact integer arithmetic in any aggregation order on
    any engine; one float division per doc, rounded to 6 dp.

    Plan: tokenize once; bigrams via a lead() window partitioned by doc
    (a partition is ONE document — bounded by max doc length, never by
    corpus size); one bigram-vocab count aggregate (map-side combined);
    ctx derived from the counts (vocab-sized re-agg, not a second corpus
    pass); one hash join of bigrams against the cost table; one per-doc
    sum. Documents with < 2 tokens surface with n_bigrams = 0.
    """
    w = Window.partitionBy("doc_id").orderBy("pos")
    bi = (
        tokenize(documents)
        .select("doc_id", F.col("tok").alias("w1"), F.lead("tok").over(w).alias("w2"))
        .filter(F.col("w2").isNotNull())
        .persist()
    )
    cnt = bi.groupBy("w1", "w2").agg(F.count("*").alias("cnt"))
    ctx = cnt.groupBy("w1").agg(F.sum("cnt").alias("ctx"))
    costs = cnt.join(ctx, "w1").select(
        "w1",
        "w2",
        F.round(
            (F.log(F.col("ctx").cast("double")) - F.log(F.col("cnt").cast("double")))
            * F.lit(1000000.0)
        )
        .cast("long")
        .alias("micro_nll"),
    )
    per_doc = (
        bi.join(costs, ["w1", "w2"])
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("micro_nll").cast("long").alias("nll_micro"),
        )
    )
    out = documents.select("doc_id").join(per_doc, "doc_id", "left").select(
        "doc_id",
        F.coalesce("n_bigrams", F.lit(0)).alias("n_bigrams"),
        F.coalesce("nll_micro", F.lit(0)).alias("nll_micro"),
        F.when(
            F.coalesce("n_bigrams", F.lit(0)) > 0,
            F.round(F.col("nll_micro") / (F.col("n_bigrams") * F.lit(1000000.0)), 6),
        )
        .otherwise(F.lit(0.0))
        .alias("avg_nll"),
    ).localCheckpoint(eager=True)
    bi.unpersist()
    return out


def pack_sequences_bestfit(
    documents: DataFrame, budget: int = 256, n_groups: int = 8
) -> DataFrame:
    """Best-fit-decreasing sequence packing — the tighter offline variant
    of :func:`pack_sequences`: within each stream, docs are placed
    LONGEST-FIRST and each doc goes into the FULLEST already-open
    sequence it still fits (ties → lowest sequence id), else opens a new
    sequence. BFD wastes ≤ 11/9·OPT + 4 bins (Johnson's bound) vs
    first-fit-arrival's 1.7·OPT — fewer padded tokens per batch at the
    cost of losing arrival order inside the stream.

    Same contract and scale shape as ``pack_sequences``: one row per doc
    [doc_id, grp, seq_id, offset, n_tokens]; streams (grp = doc_id %
    n_groups) are the parallel unit, each packed by one bounded
    ``applyInPandas`` task over (doc_id, n_tokens) pairs only.
    """
    tc = documents.select(
        "doc_id",
        (F.col("doc_id") % n_groups).cast("long").alias("grp"),
        F.size(tokens_col()).cast("long").alias("n_tokens"),
    )

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        loads: list[int] = []
        seqs, offs = [], []
        for t in pdf["n_tokens"]:
            t = int(t)
            best_idx, best_load = -1, -1
            for i, l in enumerate(loads):
                # strict > keeps the FIRST maximum → lowest seq id on ties
                if l + t <= budget and l > best_load:
                    best_idx, best_load = i, l
            if best_idx < 0:
                seqs.append(len(loads))
                offs.append(0)
                loads.append(t)
            else:
                seqs.append(best_idx)
                offs.append(loads[best_idx])
                loads[best_idx] += t
        return pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "grp": pdf["grp"],
                "seq_id": pd.Series(seqs, dtype="int64"),
                "offset": pd.Series(offs, dtype="int64"),
                "n_tokens": pdf["n_tokens"],
            }
        )

    return tc.groupBy("grp").applyInPandas(
        pack,
        schema="doc_id long, grp long, seq_id long, `offset` long, n_tokens long",
    )


def token_entropy(documents: DataFrame) -> DataFrame:
    """Per-doc Shannon entropy of the token distribution —
    DataFrame[doc_id, n_tokens, distinct_tokens, entropy_nats]:
    H = Σ_t (c_t/n)·ln(n/c_t) over the doc's token counts. The classic
    gibberish/boilerplate detector band: templated or single-phrase spam
    scores near 0, natural prose near ln(distinct); used alongside
    ``repetition_ratios`` in every web-corpus quality stack (Gopher /
    CCNet style rules).

    Order-independent float contract (the unigram/bigram-logprob trick):
    each distinct token's contribution c·(ln n − ln c) is quantized ONCE
    to integer micro-nats — a pure function of the two ints (c, n) — so
    the per-doc sum is exact integer arithmetic in any aggregation order
    on any engine; one float division per doc at the end, rounded to
    6 dp. Docs with zero tokens surface with entropy 0.

    Plan: tokenize → (doc, token) count aggregate (map-side combined) →
    per-doc n via a second aggregate reused from the counts (no second
    corpus pass) → integer sum per doc. A partition never holds more
    than one doc's distinct-token rows for the window-free aggregates;
    everything is JVM expressions.
    """
    cnt = (
        tokenize(documents)
        .groupBy("doc_id", "tok")
        .agg(F.count("*").alias("c"))
    )
    totals = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n"), F.count("*").alias("distinct_tokens")
    )
    per_doc = (
        cnt.join(totals, "doc_id")
        .select(
            "doc_id",
            "n",
            "distinct_tokens",
            F.round(
                (F.log(F.col("n").cast("double")) - F.log(F.col("c").cast("double")))
                * F.col("c").cast("double")
                * F.lit(1_000_000.0)
            )
            .cast("long")
            .alias("micro"),
        )
        .groupBy("doc_id", "n", "distinct_tokens")
        .agg(F.sum("micro").alias("s"))
        .select(
            "doc_id",
            F.col("n").cast("long").alias("n_tokens"),
            F.col("distinct_tokens").cast("long").alias("distinct_tokens"),
            F.round(F.col("s") / (F.col("n") * F.lit(1_000_000.0)), 6).alias(
                "entropy_nats"
            ),
        )
    )
    return (
        documents.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.coalesce("distinct_tokens", F.lit(0)).cast("long").alias(
                "distinct_tokens"
            ),
            F.coalesce("entropy_nats", F.lit(0.0)).alias("entropy_nats"),
        )
    )


def token_powerlaw(documents: DataFrame, c_min: int = 4) -> DataFrame:
    """ONE row [c_min, n_tail, alpha] — Hill maximum-likelihood power-law
    exponent of the corpus token-frequency tail (the Zipf-law diagnostic
    for web text, same estimator as graph.degree_powerlaw pointed at the
    vocabulary):

        α = 1 + n / Σ_{c_t ≥ c_min} ln(c_t / c_min)

    Natural prose sits near the Zipf α ≈ 2; template/boilerplate corpora
    deviate hard — a cheap corpus-level health metric next to the per-doc
    entropy/repetition scores.

    Plan: one corpus token-count aggregate, collapsed to the
    DISTINCT-frequency histogram before any float enters (ln once per
    distinct count, weighted by an exact BIGINT), exactly the
    degree_powerlaw shape. α is NULL when the tail has zero log-mass."""
    cnt = tokenize(documents).groupBy("tok").agg(F.count("*").alias("c"))
    hist = cnt.filter(F.col("c") >= c_min).groupBy("c").agg(
        F.count("*").alias("m")
    )
    return (
        hist.agg(
            F.coalesce(F.sum("m"), F.lit(0)).cast("long").alias("_n"),
            F.sum(
                F.col("m") * F.log(F.col("c").cast("double") / F.lit(float(c_min)))
            ).alias("_lm"),
        )
        .select(
            F.lit(c_min).cast("long").alias("c_min"),
            F.col("_n").alias("n_tail"),
            F.round(
                F.when(
                    F.col("_lm") > 0.0,
                    F.lit(1.0) + F.col("_n").cast("double") / F.col("_lm"),
                ),
                6,
            ).alias("alpha"),
        )
    )


def langid_confusion(documents: DataFrame) -> DataFrame:
    """Confusion matrix of the marker-word language heuristic against the
    corpus's labeled ``lang`` column — DataFrame[lang, lang_pred, n,
    share]: per true label, how the classifier's predictions distribute
    (share = n / label total, 6 dp from exact counts). The evaluation
    gate for :func:`language_id` — classifier quality becomes a measured
    number like ann_recall / kmeans_inertia, not a docstring claim.

    Plan: the language_id plan plus one (lang, pred) count aggregate and
    a per-label total join — both over V-row tables."""
    pred = language_id(documents)
    truth = documents.select("doc_id", "lang")
    grid = (
        truth.join(pred, "doc_id")
        .groupBy("lang", "lang_pred")
        .agg(F.count("*").cast("long").alias("n"))
    )
    tot = grid.groupBy("lang").agg(F.sum("n").alias("_t"))
    return grid.join(tot, "lang").select(
        "lang",
        "lang_pred",
        "n",
        F.round(F.col("n") / F.col("_t").cast("double"), 6).alias("share"),
    )


def source_profile(documents: DataFrame) -> DataFrame:
    """Per-SOURCE corpus profile — the first-look table a curation run
    prints before deciding per-source sampling weights (the C4/RefinedWeb
    "where does my corpus come from" census):

        DataFrame[source, n_docs, total_chars, avg_chars, n_langs,
                  avg_tokens, dup_docs, dup_ratio]

    - avg_chars / avg_tokens rounded to 4dp (cross-engine mean stability);
    - dup_docs counts documents whose EXACT text (md5) appears ≥2 times
      within the same source — the within-source duplicate burden that
      decides which sources need the expensive near-dup pass;
    - dup_ratio = dup_docs / n_docs, rounded to 6dp.

    Scale shape: one (source, md5) groupBy (map-side combinable; the hash
    spreads every source's docs across partitions, so a giant source is
    not a skewed reduce key), one source-level rollup of that, one
    source-level rollup of the doc table, and a broadcast-sized join of
    the two profiles (#sources rows). No windows, no UDFs."""
    d = documents.select(
        "source",
        "lang",
        F.col("n_chars").cast("long").alias("nc"),
        F.md5(F.col("text")).alias("h"),
        F.size(tokens_col()).cast("long").alias("nt"),
    )
    dups = (
        d.groupBy("source", "h")
        .agg(F.count("*").alias("c"))
        .groupBy("source")
        .agg(
            F.sum(F.when(F.col("c") > 1, F.col("c")).otherwise(F.lit(0)))
            .cast("long")
            .alias("dup_docs")
        )
    )
    prof = d.groupBy("source").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("nc").alias("total_chars"),
        F.round(F.avg(F.col("nc").cast("double")), 4).alias("avg_chars"),
        F.countDistinct("lang").cast("long").alias("n_langs"),
        F.round(F.avg(F.col("nt").cast("double")), 4).alias("avg_tokens"),
    )
    return prof.join(dups, "source").select(
        "source",
        "n_docs",
        "total_chars",
        "avg_chars",
        "n_langs",
        "avg_tokens",
        "dup_docs",
        F.round(F.col("dup_docs") / F.col("n_docs").cast("double"), 6).alias(
            "dup_ratio"
        ),
    )


def vocab_growth(
    documents: DataFrame, grid_bp: tuple[int, ...] = (156, 625, 2500, 5000, 10000)
) -> DataFrame:
    """Heaps'-law vocabulary-growth curve — DataFrame[bp, t, n_docs,
    vocab]: for each corpus-prefix threshold t (``bp`` basis points of
    max doc_id), how many documents the prefix holds and how many
    DISTINCT tokens it has introduced. The readout that decides tokenizer
    vocab budgets and detects corpus-composition drift (sublinear growth
    V ∝ n^β is the healthy-corpus signature).

    Scale shape: the sequential "scan docs in order, watch the vocabulary
    grow" definition is re-expressed as token FIRST-SIGHTINGS — one
    map-side-combinable min(doc_id) per token — so vocab(t) = |{tokens :
    first_doc ≤ t}|: two counting joins of V-row/D-row tables against the
    broadcast |grid|-row threshold table. No sequential pass exists
    anywhere; thresholds derive from max(doc_id) in-plan (no collect)."""
    toks = tokenize(documents)
    firsts = toks.groupBy("tok").agg(F.min("doc_id").alias("fd"))
    mx = documents.agg(F.max("doc_id").alias("m"))
    spark = documents.sparkSession
    grid = spark.createDataFrame([(int(b),) for b in sorted(grid_bp)], "bp long")
    ts = grid.crossJoin(mx).select(
        "bp", F.expr("(m * bp) DIV 10000").cast("long").alias("t")
    )
    nd = (
        F.broadcast(ts)
        .join(documents.select("doc_id"), F.col("doc_id") <= F.col("t"), "left")
        .groupBy("bp", "t")
        .agg(F.count("doc_id").cast("long").alias("n_docs"))
    )
    vb = (
        F.broadcast(ts)
        .join(firsts, F.col("fd") <= F.col("t"), "left")
        .groupBy("bp", "t")
        .agg(F.count("fd").cast("long").alias("vocab"))
    )
    return nd.join(vb, ["bp", "t"]).select("bp", "t", "n_docs", "vocab")


def tfidf_cosine_pairs(
    documents: DataFrame,
    threshold: float = 0.3,
    max_df: int = 256,
) -> DataFrame:
    """All-pairs document similarity (APSS — Bayardo et al., WWW 2007) in
    the tf-idf vector space: DataFrame[doc_a, doc_b, cos_sim] for pairs
    with cosine ≥ threshold. The WEIGHTED companion of ngram_jaccard
    (set overlap there, vector angle here) — the dedup/recommendation
    primitive for "same story, different words".

    Scale shape — the inverted-index join: weights self-join on TOKEN, so
    per-token work is df², and tokens with df > ``max_df`` are dropped
    BEFORE the join (the hot-shingle bound ngram_jaccard uses; stopwords
    carry ~zero idf weight anyway, so the cap trades no real signal).
    Exactness: weights are tf·ln(N/df) rounded to 4 dp and carried as
    1e4-unit BIGINTs — dots and norm² are exact integer sums in any
    partitioning; one sqrt + one divide at the end. Zero-weight terms are
    dropped so no document can reach the join with a zero norm (kills the
    NaN-cosine edge case in both engines)."""
    tf = tokenize(documents).groupBy("doc_id", "tok").agg(F.count("*").alias("tf"))
    n_docs = documents.count()
    df_tbl = tf.groupBy("tok").agg(F.count("*").alias("df"))
    w = (
        tf.join(df_tbl, "tok")
        .filter(F.col("df") <= max_df)
        .select(
            "doc_id",
            "tok",
            F.round(
                F.round(
                    F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 4
                )
                * 10000.0
            )
            .cast("long")
            .alias("q"),
        )
        .filter(F.col("q") != 0)
    )
    nrm = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("q") * F.col("q")).cast("double")).alias("nr")
    )
    a, b = w.alias("a"), w.alias("b")
    dots = (
        a.join(
            b,
            (F.col("a.tok") == F.col("b.tok"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .groupBy(
            F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b")
        )
        .agg(F.sum(F.col("a.q") * F.col("b.q")).alias("dot"))
    )
    na = nrm.select(F.col("doc_id").alias("doc_a"), F.col("nr").alias("na"))
    nb = nrm.select(F.col("doc_id").alias("doc_b"), F.col("nr").alias("nb"))
    return (
        dots.join(na, "doc_a")
        .join(nb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("dot").cast("double") / (F.col("na") * F.col("nb")), 6
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def gopher_rules(documents: DataFrame) -> DataFrame:
    """Per-doc Gopher quality-rule verdict (Rae et al. 2021, §A1.1) — the
    published keep/drop screen production corpora run between the cheap
    stats above and the dedup stages:

      n_words          whitespace-token count, bounds [min_words, max_words]
      mean_word_len    bounds [3, 10]
      alpha_frac       fraction of words containing ≥1 ascii letter, ≥ 0.8
      symbol_ratio     (# of '#' or '...' occurrences) / n_words, ≤ 0.1
      stop_hits        DISTINCT stopwords present, ≥ 2
      keep             AND of the five rules

    All ratios rounded 6 dp; pure Catalyst expressions (the regex sits in
    the Java-regex ∩ RE2 common subset like content_flags)."""
    toks = tokens_col()
    n_words = F.size(toks)
    tok_chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    mean_len = tok_chars / F.when(n_words > 0, n_words)
    alpha = F.size(F.filter(toks, lambda t: t.rlike("[a-z]")))
    alpha_frac = alpha / F.when(n_words > 0, n_words)
    symbols = F.size(F.regexp_extract_all(F.col("text"), F.lit(r"#|\.\.\."), 0))
    symbol_ratio = symbols / F.when(n_words > 0, n_words)
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    stop_hits = F.size(
        F.array_distinct(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))
    )
    min_words, max_words = 50, 100_000
    keep = (
        (n_words >= min_words)
        & (n_words <= max_words)
        & (mean_len >= 3.0)
        & (mean_len <= 10.0)
        & (alpha_frac >= 0.8)
        & (symbol_ratio <= 0.1)
        & (stop_hits >= 2)
    )
    return documents.select(
        "doc_id",
        n_words.cast("long").alias("n_words"),
        F.round(mean_len, 6).alias("mean_word_len"),
        F.round(alpha_frac, 6).alias("alpha_frac"),
        F.round(symbol_ratio, 6).alias("symbol_ratio"),
        stop_hits.cast("long").alias("stop_hits"),
        F.coalesce(keep, F.lit(False)).alias("keep"),
    )


DSIR_BUCKETS = 512


def dsir_weights(
    documents: DataFrame, target_lang: str = "en", buckets: int = DSIR_BUCKETS
) -> DataFrame:
    """Per-doc DSIR importance weight (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): the log-likelihood
    ratio of the document under hashed-unigram bag models of a TARGET
    corpus (here: ``lang = target_lang``) versus the RAW corpus,

        w(doc) = Σ_tok [ ln p̂_t(b(tok)) − ln p̂_r(b(tok)) ]

    with ``b(tok) = md5-hash(tok) mod buckets`` (the portable 60-bit hash
    every dedup path uses) and add-1 smoothing over the bucket vocabulary.
    Production pipelines resample docs ∝ exp(w); compose with
    ``sample.weighted_sample`` for that step.

    Plan shape at 100 TB: one token explode → one ``buckets``-row
    aggregate (map-side combined; both corpus counts in the same pass) →
    broadcast the tiny log-ratio table back onto the token stream → one
    per-doc sum. No shuffle wider than the doc-id groupBy the explode
    already implies."""
    toks = tokenize(documents).join(
        documents.select("doc_id", "lang"), "doc_id"
    )
    tl = toks.select(
        "doc_id",
        (token_hash(F.col("tok")) % F.lit(buckets)).alias("b"),
        (F.col("lang") == F.lit(target_lang)).cast("long").alias("is_t"),
    )
    bu = tl.groupBy("b").agg(
        F.count("*").alias("cr"), F.sum("is_t").alias("ct")
    )
    tot = bu.agg(F.sum("cr").alias("nr"), F.sum("ct").alias("nt"))
    bf = float(buckets)
    lr = bu.crossJoin(F.broadcast(tot)).select(
        "b",
        (
            F.log((F.col("ct") + F.lit(1.0)) / (F.col("nt") + F.lit(bf)))
            - F.log((F.col("cr") + F.lit(1.0)) / (F.col("nr") + F.lit(bf)))
        ).alias("lr"),
    )
    return (
        tl.join(F.broadcast(lr), "b")
        .groupBy("doc_id")
        .agg(F.round(F.sum("lr"), 6).alias("dsir_weight"))
    )


PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4 = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE = r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"


def pii_scrub(documents: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-doc PII redaction — the scrub stage every released training
    corpus runs (emails / IPv4 / NANP-style phone numbers replaced by
    typed placeholder tokens), as pure Catalyst ``regexp_replace`` /
    ``regexp_count`` expressions (Java-regex ∩ RE2 subset: no backrefs,
    no lookaround — portable to any SQL engine and to RE2-based scrubbers).

    Returns DataFrame[doc_id, n_emails, n_ips, n_phones, scrubbed] where
    ``scrubbed`` is the redacted text. Order matters: IPv4 before phone
    (a dotted IP would otherwise half-match the dotted phone form after
    partial rewriting); email first (its local part may contain digits)."""
    t = F.col(text_col)
    n_emails = F.regexp_count(t, F.lit(PII_EMAIL))
    n_ips = F.regexp_count(t, F.lit(PII_IPV4))
    n_phones = F.regexp_count(t, F.lit(PII_PHONE))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(t, PII_EMAIL, "<EMAIL>"), PII_IPV4, "<IP>"
        ),
        PII_PHONE,
        "<PHONE>",
    )
    return documents.select(
        "doc_id",
        n_emails.cast("long").alias("n_emails"),
        n_ips.cast("long").alias("n_ips"),
        n_phones.cast("long").alias("n_phones"),
        scrubbed.alias("scrubbed"),
    )
