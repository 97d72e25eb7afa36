"""TextRank (Mihalcea & Tarau, EMNLP 2004) — unsupervised importance
ranking over a SIMILARITY graph, the corpus-curation consumer of the
weighted-PageRank kernel: rank documents (or sentences/terms) by how
central they sit in the "similar content" graph, the classic extractive
summarization / representative-sampling primitive a training-data
pipeline uses to pick which near-duplicate cluster member to keep.

TextRank's recurrence is

    s_i = (1-d) + d * SUM_{j in In(i)} w_ji / SUM_k w_jk * s_j,  s0 = 1

which is exactly N x weighted PageRank (teleport (1-d)/N, init 1/N):
with s = N*r the PageRank update maps term-for-term onto the TextRank
one, so the audited weighted kernel (operators/pagerank.py, per-edge
w/Sigma-w factor precomputed once, cached hash(src) edge table, only the
rank vector shuffling per iteration) executes it unchanged and the score
is N-independent. Reference parity: the same vertex-centric gather the
reference's pagerank benchmark runs (benchmark/benchmarks/pagerank.h),
here over a derived similarity graph rather than the link graph.

Scale shape: the similarity graph comes from tfidf_cosine_pairs (APSS
with df-capped inverted index — per-token join work bounded by max_df^2)
and the iteration is the weighted-PageRank plan audited for 100-TB runs.
Isolated documents (no similarity edge >= threshold) never enter the
fixpoint; their exact closed-form score is (1-d) — appended after the
loop, not iterated."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from ..graph import DST, SRC, materialize
from .pagerank import pagerank_result


def textrank_from_pairs(
    pairs: DataFrame,
    a_col: str = "doc_a",
    b_col: str = "doc_b",
    weight_col: str = "cos_sim",
    damping: float = 0.85,
    max_iter: int = 10,
    all_ids: DataFrame | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """DataFrame[id, score] — TextRank over an undirected weighted pair
    list (each pair becomes two directed edges). ``all_ids`` (one id
    column named ``id_col``) appends members with NO qualifying pair at
    the closed-form isolated score (1-damping); without it only nodes
    that appear in ``pairs`` are returned."""
    e = pairs.select(
        F.col(a_col).cast("long").alias(SRC),
        F.col(b_col).cast("long").alias(DST),
        F.col(weight_col).cast("double").alias("_w"),
    )
    edges = e.unionByName(
        e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST), "_w")
    )
    # cut the (possibly expensive) pair-derivation lineage ONCE — the kernel
    # consumes edges from three actions (node count, factor build, iso
    # anti-join) and would otherwise re-run the upstream APSS join each time
    edges = edges.localCheckpoint(eager=True)
    res = pagerank_result(
        edges, damping=damping, max_iter=max_iter, weight_col="_w"
    )
    scored = res.state.select(
        "id", (F.col("rank") * F.lit(float(res.n_nodes))).alias("score")
    )
    if all_ids is not None:
        iso = (
            all_ids.select(F.col(id_col).cast("long").alias("id"))
            .distinct()
            .join(scored.select("id"), "id", "left_anti")
            .select("id", F.lit(1.0 - damping).alias("score"))
        )
        scored = scored.unionByName(iso)
    return scored


def _window_pairs(toks: DataFrame, window: int) -> DataFrame:
    """DataFrame[doc_id, ta, tb] — one row per co-occurrence of two
    DISTINCT tokens within ``window`` positions of each other in a
    document (ta < tb canonical). Pure EQUI-join on (doc_id, pos+off)
    with ``off`` exploded from 1..window — no theta range join, no
    per-doc list materialization; skew is bounded by doc length."""
    left = toks.select(
        "doc_id",
        "tok",
        F.explode(F.array(*[F.lit(i) for i in range(1, window + 1)])).alias("_off"),
        F.col("pos").alias("_p"),
    ).select("doc_id", "tok", (F.col("_p") + F.col("_off")).alias("pos2"))
    right = toks.select("doc_id", F.col("pos").alias("pos2"), F.col("tok").alias("tok2"))
    return (
        left.join(right, ["doc_id", "pos2"])
        .filter(F.col("tok") != F.col("tok2"))
        .select(
            "doc_id",
            F.least("tok", "tok2").alias("ta"),
            F.greatest("tok", "tok2").alias("tb"),
        )
    )


def keyword_textrank(
    documents: DataFrame,
    window: int = 2,
    damping: float = 0.85,
    max_iter: int = 10,
) -> DataFrame:
    """Corpus keyword salience — DataFrame[tok, score]: TextRank's second
    classic application (Mihalcea & Tarau 2004 §3.1), here at corpus
    grain: tokens are nodes, edge weight = how often two DISTINCT tokens
    co-occur within ``window`` positions anywhere in the corpus, score =
    the weighted fixpoint. Tokens that never co-occur (single-token docs)
    score the closed-form isolated (1-damping).

    Scale shape: the co-occurrence join is the equi-join of
    ``_window_pairs``; weights are exact BIGINT counts
    (engine-reproducible); token ids are the portable 60-bit md5
    lane (functions/text.token_hash), so the fixpoint runs on longs and
    the vocabulary joins back at the end."""
    from ..functions.text import token_hash, tokenize

    toks = tokenize(documents)  # doc_id, pos, tok
    co = _window_pairs(toks, window)
    wts = co.groupBy("ta", "tb").agg(F.count("*").cast("double").alias("w"))
    pairs = wts.select(
        token_hash(F.col("ta")).alias("ia"),
        token_hash(F.col("tb")).alias("ib"),
        "w",
    )
    scores = textrank_from_pairs(
        pairs, a_col="ia", b_col="ib", weight_col="w",
        damping=damping, max_iter=max_iter,
    )
    vocab = toks.select("tok").distinct().withColumn("id", token_hash(F.col("tok")))
    return vocab.join(scores, "id", "left").select(
        "tok", F.coalesce("score", F.lit(1.0 - damping)).alias("score")
    )


def doc_keywords(
    documents: DataFrame,
    window: int = 2,
    damping: float = 0.85,
    max_iter: int = 8,
    top_k: int | None = None,
) -> DataFrame:
    """Per-document keyword extraction — DataFrame[doc_id, tok, score]:
    TextRank's ORIGINAL use case (Mihalcea & Tarau 2004 §3.1) at document
    grain. Each document gets its own token co-occurrence graph (edge
    weight = within-window co-occurrence count inside THAT document); the
    recurrence runs in unnormalized 1-space

        s_{k+1}(v) = (1-d) + d · Σ_u (w_uv / Σ_x w_ux) · s_k(u),  s_0 = 1

    which is per-component independent and needs NO per-document N — the
    one TextRank form that fixpoints all documents simultaneously as a
    single DataFrame keyed by (doc_id, tok). Tokens with no within-window
    distinct neighbor score the closed-form isolated (1-damping).
    ``top_k`` keeps the K best keywords per doc (score desc, tok asc),
    adding a 1-based ``rank`` column — the per-doc window is bounded by
    document vocabulary, never corpus size.

    Scale shape: pairs from the ``_window_pairs`` equi-join (skew bounded
    by doc length); the per-edge w/Σw factor table is built once,
    persisted hash-partitioned on the gather key (doc_id, u); the loop
    runs through plans/fixpoint.iterate, one job per iteration, only the
    (doc_id, tok) state shuffling. Reference parity: the same
    vertex-centric gather as benchmark/benchmarks/pagerank.h, here over
    a forest of per-document graphs (node id = composite key)."""
    from ..functions.text import tokenize
    from ..plans.fixpoint import iterate

    spark = documents.sparkSession
    p = int(spark.conf.get("spark.sql.shuffle.partitions"))
    toks = tokenize(documents)  # doc_id, pos, tok
    wts = (
        _window_pairs(toks, window)
        .groupBy("doc_id", "ta", "tb")
        .agg(F.count("*").cast("double").alias("w"))
    )
    sym = wts.select(
        "doc_id", F.col("ta").alias("u"), F.col("tb").alias("v"), "w"
    ).unionByName(
        wts.select("doc_id", F.col("tb").alias("u"), F.col("ta").alias("v"), "w")
    )
    ow = sym.groupBy("doc_id", "u").agg(F.sum("w").alias("ow"))
    # per-edge factor w/Σw, partitioned on the per-iteration gather key so
    # the big side never re-exchanges; (s · (w/ow)) multiplies bit-identically
    # to the oracle's s · (w/ow) — IEEE multiplication is commutative
    ef = (
        sym.join(ow, ["doc_id", "u"])
        .select("doc_id", "u", "v", (F.col("w") / F.col("ow")).alias("f"))
        .repartition(p, "doc_id", "u")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    ef.count()
    nodes = (
        ef.select("doc_id", "u")
        .distinct()
        .repartition(p, "doc_id", "u")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )

    def step(s: DataFrame, _i: int) -> DataFrame:
        contrib = (
            s.hint("shuffle_hash")
            .join(ef, ["doc_id", "u"])
            .select("doc_id", F.col("v").alias("u"), (F.col("f") * F.col("s")).alias("c"))
            .groupBy("doc_id", "u")
            .agg(F.sum("c").alias("cs"))
        )
        return nodes.join(contrib.hint("shuffle_hash"), ["doc_id", "u"], "left").select(
            "doc_id",
            "u",
            (
                F.lit(1.0 - damping)
                + F.lit(damping) * F.coalesce("cs", F.lit(0.0))
            ).alias("s"),
        )

    result = iterate(
        nodes.select("doc_id", "u", F.lit(1.0).alias("s")),
        step,
        max_iter=max_iter,
        name="doc_keywords",
    )
    scored = materialize(result.state)
    ef.unpersist()
    nodes.unpersist()
    out = (
        toks.select("doc_id", "tok")
        .distinct()
        .join(scored.withColumnRenamed("u", "tok"), ["doc_id", "tok"], "left")
        .select(
            "doc_id", "tok", F.coalesce("s", F.lit(1.0 - damping)).alias("score")
        )
    )
    if top_k is not None:
        from pyspark.sql import Window

        w_rank = Window.partitionBy("doc_id").orderBy(
            F.desc("score"), F.asc("tok")
        )
        out = (
            out.withColumn("rank", F.row_number().over(w_rank))
            .filter(F.col("rank") <= top_k)
        )
    return out


def textrank_documents(
    documents: DataFrame,
    threshold: float = 0.3,
    max_df: int = 256,
    damping: float = 0.85,
    max_iter: int = 10,
    include_isolated: bool = True,
) -> DataFrame:
    """End-to-end document TextRank — DataFrame[doc_id, score] over the
    tf-idf cosine similarity graph (edges = document pairs with cosine >=
    ``threshold``, weights = the 6-dp-rounded cosine). The composition a
    curation pipeline runs: APSS similarity graph -> weighted fixpoint ->
    per-document centrality score."""
    from ..functions.text import tfidf_cosine_pairs

    pairs = tfidf_cosine_pairs(documents, threshold=threshold, max_df=max_df)
    out = textrank_from_pairs(
        pairs,
        damping=damping,
        max_iter=max_iter,
        all_ids=documents if include_isolated else None,
    )
    return out.select(F.col("id").alias("doc_id"), "score")
