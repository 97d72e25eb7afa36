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


def _model_keyword_textrank(texts, window, damping, iters):
    """Independent dense model: corpus co-occurrence counts -> TextRank."""
    w = {}
    for text in texts:
        toks = text.lower().split()
        for i, a in enumerate(toks):
            for off in range(1, window + 1):
                if i + off >= len(toks):
                    break
                b = toks[i + off]
                if a == b:
                    continue
                key = (min(a, b), max(a, b))
                w[key] = w.get(key, 0) + 1
    pairs = [(a, b, float(c)) for (a, b), c in w.items()]
    scores = _model_textrank(pairs, damping, iters)
    vocab = {t for text in texts for t in text.lower().split()}
    return {t: scores.get(t, 1.0 - damping) for t in vocab}


def test_keyword_textrank_matches_dense_model(spark):
    texts = [
        "graph ranking keyword graph extraction via graph ranking",
        "keyword extraction with ranking",
        "solo",
    ]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    from llama_spark.operators.textrank import keyword_textrank

    got = {
        r["tok"]: r["score"]
        for r in keyword_textrank(docs, window=2, max_iter=6).collect()
    }
    want = _model_keyword_textrank(texts, 2, 0.85, 6)
    assert set(got) == set(want)
    for t in want:
        assert abs(got[t] - want[t]) < 1e-9, (t, got[t], want[t])
    # the isolated single-token doc scores the closed form
    assert abs(got["solo"] - 0.15) < 1e-12
    # the most connected token dominates
    assert max(want, key=want.get) == "graph"


def _model_hitting(edges, seeds, horizon):
    """Dense truncated-hitting-time recursion: g_k = E[min(first-hit, k)]."""
    nodes = sorted({x for e in edges for x in e})
    out = {v: [d for s, d in edges if s == v] for v in nodes}
    g = {v: 0.0 for v in nodes}
    for _ in range(horizon):
        ng = {}
        for v in nodes:
            if v in seeds:
                ng[v] = 0.0
            elif out[v]:
                ng[v] = 1.0 + sum(g[u] for u in out[v]) / len(out[v])
            else:
                ng[v] = 1.0 + g[v]
        g = ng
    return g


def test_hitting_time_matches_dense_model(spark):
    """Probabilistic loop + dangling node vs the dense model; the v-node
    value is the hand-computed E[min(tau,4)] = 2.25 (the value-level-cap
    formulation would wrongly give 3.0)."""
    from .conftest import edges_df
    from llama_spark.operators.diffusion import truncated_hitting_time

    edges = [(0, 2), (0, 1), (1, 0), (3, 0), (4, 4)]  # 2=seed; 4=self-loop
    df = edges_df(spark, edges)
    got = {
        r["id"]: r["hitting"]
        for r in truncated_hitting_time(df, seeds=[2], horizon=4).collect()
    }
    want = _model_hitting(edges, {2}, 4)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])
    assert abs(got[0] - 2.25) < 1e-12
    assert got[2] == 0.0
    # the self-loop node never arrives: exactly the horizon
    assert abs(got[4] - 4.0) < 1e-12


def test_hitting_time_dangling_counts_horizon(spark):
    """A node with no out-edges is a stuck walk: hitting == horizon."""
    from .conftest import edges_df
    from llama_spark.operators.diffusion import truncated_hitting_time

    df = edges_df(spark, [(0, 1)])  # 1 is dangling, seed is 0
    got = {
        r["id"]: r["hitting"]
        for r in truncated_hitting_time(df, seeds=[0], horizon=6).collect()
    }
    assert got[0] == 0.0 and abs(got[1] - 6.0) < 1e-12


def _model_doc_keywords(texts, window, damping, iters):
    """Independent dense model: per-document co-occurrence graph ->
    per-document TextRank (1-space), isolated tokens at (1-d)."""
    out = {}
    for doc_id, text in enumerate(texts):
        toks = text.lower().split()
        w = {}
        for i, a in enumerate(toks):
            for off in range(1, window + 1):
                if i + off >= len(toks):
                    break
                b = toks[i + off]
                if a == b:
                    continue
                key = (min(a, b), max(a, b))
                w[key] = w.get(key, 0) + 1
        pairs = [(a, b, float(c)) for (a, b), c in w.items()]
        scores = _model_textrank(pairs, damping, iters)
        for t in set(toks):
            out[(doc_id, t)] = scores.get(t, 1.0 - damping)
    return out


def test_doc_keywords_matches_dense_model(spark):
    """Per-doc grain: the same token must be allowed DIFFERENT scores in
    different documents (the corpus-grain operator cannot express this)."""
    texts = [
        "graph ranking keyword graph extraction via graph ranking",
        "keyword extraction with ranking keyword",
        "solo",
    ]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    from llama_spark.operators.textrank import doc_keywords

    got = {
        (r["doc_id"], r["tok"]): r["score"]
        for r in doc_keywords(docs, window=2, max_iter=6).collect()
    }
    want = _model_doc_keywords(texts, 2, 0.85, 6)
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9, (k, got[k], want[k])
    # the isolated doc's only token scores the closed form
    assert abs(got[(2, "solo")] - 0.15) < 1e-12
    # same token, different docs, different scores (per-doc grain is real)
    assert abs(got[(0, "keyword")] - got[(1, "keyword")]) > 1e-6


def test_doc_keywords_top_k(spark):
    texts = ["a b c a b c a b", "x y"]
    rows = [(i, t, "en", "s", len(t)) for i, t in enumerate(texts)]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    from llama_spark.operators.textrank import doc_keywords

    top = doc_keywords(docs, window=2, max_iter=4, top_k=2).collect()
    by_doc = {}
    for r in top:
        by_doc.setdefault(r["doc_id"], []).append((r["rank"], r["tok"], r["score"]))
    assert len(by_doc[0]) == 2 and len(by_doc[1]) == 2
    for doc_id, rows_ in by_doc.items():
        rows_.sort()
        assert [r[0] for r in rows_] == [1, 2]
        assert rows_[0][2] >= rows_[1][2]


def test_bipartite_check_shapes(spark):
    """Even cycle + star bipartite; triangle and self-loop not; component
    ids are min member ids and sizes are exact."""
    from .conftest import edges_df
    from llama_spark.operators.components import bipartite_check

    edges = [
        (0, 1), (1, 2), (2, 3), (3, 0),   # 4-cycle: bipartite
        (10, 11), (10, 12), (10, 13),     # star: bipartite
        (20, 21), (21, 22), (22, 20),     # triangle: odd cycle
        (30, 30),                         # self-loop: odd cycle of length 1
    ]
    got = {
        r["component"]: (r["n_nodes"], r["is_bipartite"])
        for r in bipartite_check(edges_df(spark, edges)).collect()
    }
    assert got == {
        0: (4, True),
        10: (4, True),
        20: (3, False),
        30: (1, False),
    }


def test_bipartite_check_odd_even_paths(spark):
    """A long even cycle stays bipartite; adding one chord of the wrong
    parity flips exactly that component."""
    from .conftest import edges_df
    from llama_spark.operators.components import bipartite_check

    cyc = [(i, (i + 1) % 8) for i in range(8)]
    got = {r["component"]: r["is_bipartite"]
           for r in bipartite_check(edges_df(spark, cyc)).collect()}
    assert got == {0: True}
    # chord (0,3) spans odd distance: every new cycle is even -> still OK
    got2 = {r["component"]: r["is_bipartite"]
            for r in bipartite_check(edges_df(spark, cyc + [(0, 3)])).collect()}
    assert got2 == {0: True}
    # same-parity chord (0,2) closes a 3-cycle -> flips the component
    got3 = {r["component"]: r["is_bipartite"]
            for r in bipartite_check(edges_df(spark, cyc + [(0, 2)])).collect()}
    assert got3 == {0: False}


def _model_trophic(edges_w, iters, omega=0.5):
    """Dense damped-Jacobi on the MacKay-Johnson-Jones normal equations
    (diag(in_w+out_w) - A - A^T) h = in_w - out_w, h0 = 0."""
    nodes = sorted({x for s, d, _ in edges_w for x in (s, d)})
    iw = {v: 0.0 for v in nodes}
    ow = {v: 0.0 for v in nodes}
    nbr = {v: [] for v in nodes}
    for s, d, w in edges_w:
        iw[d] += w
        ow[s] += w
        nbr[d].append((s, w))
        nbr[s].append((d, w))
    h = {v: 0.0 for v in nodes}
    for _ in range(iters):
        nh = {}
        for v in nodes:
            s = sum(w * h[u] for u, w in nbr[v])
            nh[v] = (1 - omega) * h[v] + omega * (iw[v] - ow[v] + s) / (iw[v] + ow[v])
        h = nh
    return h


def test_trophic_levels_matches_dense_model(spark):
    from pyspark.sql import functions as F

    from .conftest import edges_df
    from llama_spark.operators.diffusion import trophic_levels

    raw = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 1), (4, 0)]
    df = edges_df(spark, raw).withColumn(
        "weight", (F.lit(1.0) + (F.col("src") * 31 + F.col("dst")) % 100 / 100.0)
    )
    edges_w = [(s, d, 1.0 + ((s * 31 + d) % 100) / 100.0) for s, d in raw]
    got = {
        r["id"]: r["level"]
        for r in trophic_levels(df, weight_col="weight", max_iter=8).collect()
    }
    want = _model_trophic(edges_w, 8)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-9, (v, got[v], want[v])


def test_trophic_levels_orders_a_path(spark):
    """On a directed path the converged heights step by exactly +1; the
    damped-Jacobi iterate must already be strictly increasing along the
    edges (differences, not absolutes — h is defined up to a constant)."""
    from .conftest import edges_df
    from llama_spark.operators.diffusion import trophic_levels

    df = edges_df(spark, [(0, 1), (1, 2), (2, 3)])
    got = {
        r["id"]: r["level"] for r in trophic_levels(df, max_iter=12).collect()
    }
    assert got[0] < got[1] < got[2] < got[3]
    # converged dense model: unit steps up to the free constant
    want = _model_trophic([(0, 1, 1.0), (1, 2, 1.0), (2, 3, 1.0)], 4000)
    for a, b in [(0, 1), (1, 2), (2, 3)]:
        assert abs((want[b] - want[a]) - 1.0) < 1e-6


def test_trophic_incoherence_bounds(spark):
    """A pure chain is near-coherent (F0 -> 0 as the iterate converges);
    a 2-cycle is maximally incoherent (converged F0 = 1: h_u = h_v, every
    edge misses its +1 by exactly 1). Exact values vs the dense model."""
    from .conftest import edges_df
    from llama_spark.operators.diffusion import trophic_incoherence

    def model_f0(raw, iters):
        h = _model_trophic([(s, d, 1.0) for s, d in raw], iters)
        num = sum((h[d] - h[s] - 1.0) ** 2 for s, d in raw)
        return num / len(raw)

    chain = [(0, 1), (1, 2), (2, 3)]
    got = trophic_incoherence(edges_df(spark, chain), max_iter=12).collect()[0]["f0"]
    assert abs(got - model_f0(chain, 12)) < 1e-9
    assert got < 0.2  # already close to coherent at iterate 12

    cyc2 = [(0, 1), (1, 0)]
    got2 = trophic_incoherence(edges_df(spark, cyc2), max_iter=12).collect()[0]["f0"]
    assert abs(got2 - 1.0) < 1e-9  # symmetric pair: h equal from sweep 1


def _model_nbc(edges, iters):
    """Dense Hashimoto power iteration: x'_(u,v) = sum_{(w,u), w!=v} x_(w,u);
    node score = sum of incoming edge states."""
    es = sorted(set(edges))
    x = {e: 1 for e in es}
    for _ in range(iters):
        nx = {}
        for (u, v) in es:
            nx[(u, v)] = sum(xv for (w, t), xv in x.items() if t == u and w != v)
        x = nx
    out = {}
    for (u, v), xv in x.items():
        out[v] = out.get(v, 0) + xv
    return out


def test_nonbacktracking_matches_dense_model(spark):
    from .conftest import edges_df
    from llama_spark.operators.centrality import nonbacktracking_centrality

    edges = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 0), (0, 2), (2, 3), (3, 4)]
    got = {
        r["id"]: r["nbc"]
        for r in nonbacktracking_centrality(edges_df(spark, edges), max_iter=5).collect()
    }
    want = _model_nbc(edges, 5)
    assert got == want, (got, want)
    # exact integers end to end
    assert all(isinstance(v, int) for v in got.values())


def test_nonbacktracking_tree_nilpotent_cycle_invariant(spark):
    """A tree has NO non-backtracking walk longer than its diameter, so the
    Hashimoto power hits exactly 0; a directed cycle has exactly one NB
    successor per edge, so the state stays exactly 1."""
    from .conftest import edges_df
    from llama_spark.operators.centrality import nonbacktracking_centrality

    # undirected path 0-1-2 (both directions): nilpotent by iteration 2
    path = [(0, 1), (1, 0), (1, 2), (2, 1)]
    got = {
        r["id"]: r["nbc"]
        for r in nonbacktracking_centrality(edges_df(spark, path), max_iter=3).collect()
    }
    assert set(got.values()) == {0}
    # directed triangle: invariant at 1 per edge
    tri = [(0, 1), (1, 2), (2, 0)]
    got2 = {
        r["id"]: r["nbc"]
        for r in nonbacktracking_centrality(edges_df(spark, tri), max_iter=7).collect()
    }
    assert got2 == {0: 1, 1: 1, 2: 1}


def _model_sybilrank(edges, seeds, iters):
    """Dense early-terminated trust propagation over the undirected
    simple graph; returns (trust, degree) per node."""
    und = set()
    for s, d in edges:
        if s != d:
            und.add((s, d))
            und.add((d, s))
    nodes = sorted({x for e in und for x in e})
    nbrs = {v: [d for s, d in und if s == v] for v in nodes}
    t = {v: (1.0 / len(seeds) if v in seeds else 0.0) for v in nodes}
    for _ in range(iters):
        nt = {v: 0.0 for v in nodes}
        for u in nodes:
            share = t[u] / len(nbrs[u])
            for v in nbrs[u]:
                nt[v] += share
        t = nt
    return t, {v: len(nbrs[v]) for v in nodes}


def test_sybilrank_matches_dense_model(spark):
    from .conftest import edges_df
    from llama_spark.operators.trust import sybilrank

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (5, 0)]
    got = {
        r["id"]: (r["trust_scaled"], r["rank"])
        for r in sybilrank(edges_df(spark, edges), seeds=[0, 2], max_iter=5).collect()
    }
    from decimal import ROUND_HALF_UP, Decimal

    def r6(x):  # Spark/DuckDB ROUND is half-up; python round is half-even
        return float(Decimal(repr(x)).quantize(Decimal("1e-6"), ROUND_HALF_UP))

    t, deg = _model_sybilrank(edges, {0, 2}, 5)
    n = len(t)
    for v in t:
        ts = r6(t[v] * n)
        assert abs(got[v][0] - ts) < 1e-9, (v, got[v], ts)
        assert abs(got[v][1] - r6(ts / deg[v])) < 1e-9


def test_sybilrank_separates_sybil_region(spark):
    """Two 4-cliques joined by ONE attack edge, seeds in the honest one:
    at the O(log n) early stop every honest node outranks every sybil."""
    from .conftest import edges_df
    from llama_spark.operators.trust import sybilrank

    honest = [(a, b) for a in range(4) for b in range(4) if a < b]
    sybil = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
    attack = [(3, 10)]
    got = {
        r["id"]: r["rank"]
        for r in sybilrank(
            edges_df(spark, honest + sybil + attack), seeds=[0, 1], max_iter=3
        ).collect()
    }
    assert min(got[v] for v in range(4)) > max(got[v] for v in range(10, 14))


def test_hitting_time_weighted_matches_dense_model(spark):
    """Weight-proportional step distribution: the heavier edge toward the
    seed shortens the expected hit."""
    from pyspark.sql import functions as F

    from .conftest import edges_df
    from llama_spark.operators.diffusion import truncated_hitting_time

    raw = [(0, 1), (0, 2), (1, 2), (2, 1)]
    wts = {(0, 1): 3.0, (0, 2): 1.0, (1, 2): 2.0, (2, 1): 1.0}
    df = edges_df(spark, raw).withColumn(
        "weight",
        F.when((F.col("src") == 0) & (F.col("dst") == 1), 3.0)
        .when((F.col("src") == 1) & (F.col("dst") == 2), 2.0)
        .otherwise(1.0),
    )
    got = {
        r["id"]: r["hitting"]
        for r in truncated_hitting_time(
            df, seeds=[2], horizon=5, weight_col="weight"
        ).collect()
    }

    nodes = sorted({x for e in raw for x in e})
    out = {v: [(d, wts[(s, d)]) for s, d in raw if s == v] for v in nodes}
    g = {v: 0.0 for v in nodes}
    for _ in range(5):
        ng = {}
        for v in nodes:
            if v == 2:
                ng[v] = 0.0
            elif out[v]:
                tw = sum(w for _, w in out[v])
                ng[v] = 1.0 + sum(g[d] * w / tw for d, w in out[v])
            else:
                ng[v] = 1.0 + g[v]
        g = ng
    for v in g:
        assert abs(got[v] - g[v]) < 1e-9, (v, got[v], g[v])
    # node 0 routes 3/4 of its mass straight at the seed's neighbor graph:
    # heavier path -> strictly shorter expected hit than uniform would give
    assert got[0] < 2.0


def test_collective_influence_hand_graph(spark):
    """Barbell: two triangles joined by a bridge. The bridge endpoints see
    the OTHER side through the distance-2 shell and outrank the triangle
    tips — the Morone-Makse 'weak bridging hub beats raw degree' effect.
    Values hand-computed."""
    from .conftest import edges_df
    from llama_spark.operators.centrality import collective_influence

    # triangles {0,1,2} and {3,4,5}, bridge 2-3
    edges = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
    got = {
        r["id"]: r["ci"]
        for r in collective_influence(edges_df(spark, edges), radius=2).collect()
    }
    # degrees: 0,1:2  2,3:3  4,5:2
    # node 0: shell(2)={3}, ci=(2-1)*(3-1)=2 ; symmetric for 1,4,5
    # node 2: shell(2)={4,5}, ci=(3-1)*((2-1)+(2-1))=4 ; symmetric for 3
    assert got == {0: 2, 1: 2, 2: 4, 3: 4, 4: 2, 5: 2}


def test_collective_influence_radius_one(spark):
    from .conftest import edges_df
    from llama_spark.operators.centrality import collective_influence

    # star 0-{1,2,3}: CI_1(0) = (3-1)*sum over leaves (1-1) = 0;
    # CI_1(leaf) = (1-1)*... = 0 — stars are percolation-trivial
    got = {
        r["id"]: r["ci"]
        for r in collective_influence(
            edges_df(spark, [(0, 1), (0, 2), (0, 3)]), radius=1
        ).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 0}
    # path 0-1-2-3: CI_1(1) = (2-1)*((1-1)+(2-1)) = 1; endpoints have
    # deg-1 = 0 so their CI is 0 regardless of the shell
    got2 = {
        r["id"]: r["ci"]
        for r in collective_influence(
            edges_df(spark, [(0, 1), (1, 2), (2, 3)]), radius=1
        ).collect()
    }
    assert got2 == {0: 0, 1: 1, 2: 1, 3: 0}


def test_who_to_follow_recommends_friends_consensus(spark):
    """u follows a and b; both follow c; d is an unrelated account with
    followers outside u's circle. The #1 recommendation must be c (the
    circle-of-trust consensus), u and already-followed accounts excluded."""
    from .conftest import edges_df
    from llama_spark.operators.trust import who_to_follow

    u, a, b, c, d, e_ = 0, 1, 2, 3, 4, 5
    edges = [
        (u, a), (u, b),
        (a, c), (b, c),          # consensus target
        (a, d),                  # single vote
        (e_, d), (e_, 5),        # outside the circle (self-loop dropped)
        (c, a),
    ]
    got = who_to_follow(
        edges_df(spark, edges), user=u, k_trust=4, ppr_iters=6,
        salsa_iters=6, top_n=5,
    ).collect()
    ids = [r["id"] for r in sorted(got, key=lambda r: r["rec_rank"])]
    assert u not in ids and a not in ids and b not in ids  # new accounts only
    assert ids[0] == c, ids
    # ranks are 1..k contiguous and scores non-increasing
    ranks = [r["rec_rank"] for r in sorted(got, key=lambda r: r["rec_rank"])]
    assert ranks == list(range(1, len(ranks) + 1))
    scores = [r["auth_scaled"] for r in sorted(got, key=lambda r: r["rec_rank"])]
    assert all(x >= y for x, y in zip(scores, scores[1:]))
