"""Round-5 batch: TextRank over weighted similarity pairs."""

from __future__ import annotations


def _model_textrank(pairs, damping, iters):
    """Direct dense TextRank recurrence (Mihalcea & Tarau 2004, eq. 2):
    s_i = (1-d) + d * sum_{j~i} w_ji / sum_k w_jk * s_j, init 1.0, over
    the symmetrized pair list — the independent model the operator's
    N x weighted-PageRank reduction must reproduce."""
    adj = {}
    for a, b, w in pairs:
        adj.setdefault(a, []).append((b, w))
        adj.setdefault(b, []).append((a, w))
    ow = {v: sum(w for _, w in nbrs) for v, nbrs in adj.items()}
    s = {v: 1.0 for v in adj}
    for _ in range(iters):
        nxt = {}
        for v in adj:
            tot = sum(s[u] * w / ow[u] for u, w in adj[v])
            nxt[v] = (1.0 - damping) + damping * tot
        s = nxt
    return s


def test_textrank_matches_dense_model(spark):
    pairs = [
        (0, 1, 0.9),
        (0, 2, 0.5),
        (1, 2, 0.4),
        (2, 3, 0.8),
        (3, 4, 0.3),
        (1, 4, 0.2),
    ]
    from llama_spark.operators.textrank import textrank_from_pairs

    df = spark.createDataFrame(pairs, "doc_a long, doc_b long, cos_sim double")
    got = {
        r["id"]: r["score"]
        for r in textrank_from_pairs(df, damping=0.85, max_iter=6).collect()
    }
    want = _model_textrank(pairs, 0.85, 6)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


def test_textrank_isolated_ids_closed_form(spark):
    """all_ids members with no qualifying pair score exactly (1-d), and
    connected nodes' scores are unchanged by appending them (the TextRank
    recurrence has no N term)."""
    pairs = [(0, 1, 0.7), (1, 2, 0.6)]
    from llama_spark.operators.textrank import textrank_from_pairs

    df = spark.createDataFrame(pairs, "doc_a long, doc_b long, cos_sim double")
    ids = spark.createDataFrame([(i,) for i in range(5)], "doc_id long")
    base = {
        r["id"]: r["score"]
        for r in textrank_from_pairs(df, damping=0.85, max_iter=4).collect()
    }
    full = {
        r["id"]: r["score"]
        for r in textrank_from_pairs(
            df, damping=0.85, max_iter=4, all_ids=ids
        ).collect()
    }
    assert set(full) == {0, 1, 2, 3, 4}
    for v, s in base.items():
        assert abs(full[v] - s) < 1e-12
    for v in (3, 4):
        assert abs(full[v] - 0.15) < 1e-12


def test_textrank_documents_end_to_end(spark):
    """Composition smoke over a tiny corpus: near-duplicate docs form the
    similarity component and outrank the isolated one; every doc scored."""
    rows = [
        (0, "the quick brown fox jumps over the lazy dog", "en", "a", 43),
        (1, "the quick brown fox jumps over a lazy dog", "en", "a", 41),
        (2, "the quick brown fox leaps over the lazy dog", "en", "b", 43),
        (3, "entirely unrelated text about spark clusters", "en", "b", 44),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    from llama_spark.operators.textrank import textrank_documents

    got = {
        r["doc_id"]: r["score"]
        for r in textrank_documents(docs, threshold=0.2, max_iter=4).collect()
    }
    assert set(got) == {0, 1, 2, 3}
    assert got[3] == 0.15 or abs(got[3] - 0.15) < 1e-12
    assert min(got[0], got[1], got[2]) > got[3]
