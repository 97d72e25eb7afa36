"""Round-5 continuation batch: scan statistic, weighted clustering,
heat-kernel PageRank, degree Gini, Gopher rules, top principal component."""

from __future__ import annotations

import math

from tests.conftest import edges_df


# ---- Priebe scan statistic ----


def test_scan_statistic_k4_plus_pendant(spark):
    from llama_spark.operators.linkpred import scan_statistic

    # K4 on {0,1,2,3} plus pendant 3-4
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    rows = {
        r["id"]: r
        for r in scan_statistic(edges_df(spark, k4 + [(3, 4)])).collect()
    }
    # node 0: deg 3, triangles C(3,2)=3 → Γ=6, ego = K4 = 6/C(4,2)=1.0
    assert rows[0]["degree"] == 3 and rows[0]["triangles"] == 3
    assert rows[0]["scan_stat"] == 6 and rows[0]["ego_density"] == 1.0
    # node 3: deg 4, triangles 3 (pendant adds none) → Γ=7, possible C(5,2)=10
    assert rows[3]["scan_stat"] == 7
    assert rows[3]["ego_density"] == round(7 / 10.0, 6)
    # pendant 4: deg 1, Γ=1, closed ego = single edge / C(2,2 choose)=1
    assert rows[4]["triangles"] == 0 and rows[4]["ego_density"] == 1.0


def test_scan_statistic_triangle_free(spark):
    from llama_spark.operators.linkpred import scan_statistic

    rows = scan_statistic(edges_df(spark, [(i, i + 1) for i in range(4)])).collect()
    assert all(r["triangles"] == 0 for r in rows)
    assert all(r["scan_stat"] == r["degree"] for r in rows)


# ---- Onnela weighted clustering ----


def test_weighted_clustering_triangle_formula(spark):
    from llama_spark.operators.linkpred import weighted_clustering

    # one triangle, distinct weights; wmax = 4.0
    e = [(0, 1, 1.0), (1, 2, 2.0), (2, 0, 4.0)]
    rows = {
        r["id"]: r["w_clustering"]
        for r in weighted_clustering(edges_df(spark, e, weight=True)).collect()
    }
    term = ((1.0 / 4) * (2.0 / 4) * (4.0 / 4)) ** (1.0 / 3)
    # every corner: deg 2 → C_w = 2·term/(2·1) = term
    for v in (0, 1, 2):
        assert abs(rows[v] - term) < 2e-6


def test_weighted_clustering_uniform_weights_match_unweighted(spark):
    from llama_spark.operators.linkpred import weighted_clustering

    # uniform weights ⇒ ŵ-products are 1 ⇒ C_w = classic C (triangle count
    # over possible wedges). Square + one diagonal: nodes 0,2 have deg 3.
    sq = [(0, 1, 3.0), (1, 2, 3.0), (2, 3, 3.0), (3, 0, 3.0), (0, 2, 3.0)]
    rows = {
        r["id"]: r
        for r in weighted_clustering(edges_df(spark, sq, weight=True)).collect()
    }
    # node 1: deg 2, in 1 triangle (0,1,2) → C = 1.0
    assert abs(rows[1]["w_clustering"] - 1.0) < 2e-6
    # node 0: deg 3, 2 triangles of 3 possible wedges → 2/3
    assert abs(rows[0]["w_clustering"] - 2.0 / 3) < 2e-6


def test_weighted_clustering_symmetric_max_and_dedup(spark):
    from llama_spark.operators.linkpred import weighted_clustering

    # both directions with different weights → undirected weight is the max
    e = [(0, 1, 1.0), (1, 0, 8.0), (1, 2, 8.0), (2, 0, 8.0)]
    rows = {
        r["id"]: r["w_clustering"]
        for r in weighted_clustering(edges_df(spark, e, weight=True)).collect()
    }
    assert abs(rows[0] - 1.0) < 2e-6  # all ŵ = 1 after the max convention


# ---- heat-kernel pagerank ----


def _heat_model(edges, t, K):
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    idx = {v: i for i, v in enumerate(nodes)}
    od = {}
    for u, _ in edges:
        od[u] = od.get(u, 0) + 1
    x = [1.0 / n] * n
    coef = [math.exp(-t) * t**k / math.factorial(k) for k in range(K + 1)]
    h = [coef[0] * xi for xi in x]
    for k in range(1, K + 1):
        nx = [0.0] * n
        for u, v in edges:
            nx[idx[v]] += x[idx[u]] / od[u]
        x = nx
        for i in range(n):
            h[i] += coef[k] * x[i]
    return {v: round(h[idx[v]] * n, 6) for v in nodes}


def test_heat_kernel_matches_python_model(spark):
    from llama_spark.operators.diffusion import heat_kernel_pagerank

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 0), (1, 3), (4, 0)]
    want = _heat_model(edges, t=3.0, K=6)
    got = {
        r["id"]: r["heat_scaled"]
        for r in heat_kernel_pagerank(edges_df(spark, edges), t=3.0, taylor_k=6).collect()
    }
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 2e-6, v


def test_heat_kernel_mass_bounded(spark):
    from llama_spark.operators.diffusion import heat_kernel_pagerank

    # no dangling nodes → Σh = Σcoef ≤ 1 (×N scaling → mean ≤ 1·N/N)
    ring = [(i, (i + 1) % 6) for i in range(6)]
    rows = heat_kernel_pagerank(edges_df(spark, ring), t=2.0, taylor_k=8).collect()
    total = sum(r["heat_scaled"] for r in rows) / 6.0
    assert total <= 1.0 + 1e-9
    # ring is vertex-transitive: all equal
    assert max(r["heat_scaled"] for r in rows) - min(
        r["heat_scaled"] for r in rows
    ) < 2e-6


# ---- degree Gini ----


def _gini(degs):
    d = sorted(degs)
    n = len(d)
    s = sum(d)
    return 2.0 * sum((i + 1) * x for i, x in enumerate(d)) / (n * s) - (n + 1.0) / n


def test_degree_gini_regular_graph_zero(spark):
    from llama_spark.graph import degree_gini

    ring = [(i, (i + 1) % 8) for i in range(8)]
    row = degree_gini(edges_df(spark, ring)).collect()[0]
    assert row["n_nodes"] == 8 and row["total_degree"] == 16
    assert row["gini"] == 0.0


def test_degree_gini_star_matches_model(spark):
    from llama_spark.graph import degree_gini

    star = [(0, i) for i in range(1, 11)]
    row = degree_gini(edges_df(spark, star)).collect()[0]
    want = _gini([10] + [1] * 10)
    assert abs(row["gini"] - round(want, 6)) < 1e-9


def test_degree_gini_tie_blocks_match_full_sort(spark):
    from llama_spark.graph import degree_gini

    # mixed degrees with heavy ties — the histogram shortcut must equal
    # the full-sort definition
    edges = [(0, i) for i in range(1, 6)] + [(1, 2), (3, 4), (6, 7)]
    und = set()
    for u, v in edges:
        und.add((min(u, v), max(u, v)))
    degs = {}
    for u, v in und:
        degs[u] = degs.get(u, 0) + 1
        degs[v] = degs.get(v, 0) + 1
    row = degree_gini(edges_df(spark, edges)).collect()[0]
    assert abs(row["gini"] - round(_gini(list(degs.values())), 6)) < 1e-9


# ---- Gopher quality rules ----


def _doc(doc_id, text):
    return (doc_id, text)


def test_gopher_rules_boundaries(spark):
    from llama_spark.functions.text import gopher_rules

    good = "the quick brown fox jumps over a lazy dog " * 6  # 54 words, stopwords
    short = "the of and is to that"  # < 50 words
    symbols = ("the of " + "# " * 20) + "word " * 50  # symbol_ratio > 0.1
    no_alpha = "the of " + "123 456 " * 30  # alpha_frac < 0.8
    docs = spark.createDataFrame(
        [
            _doc(1, good),
            _doc(2, short),
            _doc(3, symbols),
            _doc(4, no_alpha),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert rows[1]["keep"] is True
    assert rows[1]["n_words"] == 54
    assert rows[1]["stop_hits"] >= 2
    assert rows[2]["keep"] is False and rows[2]["n_words"] < 50
    assert rows[3]["keep"] is False and rows[3]["symbol_ratio"] > 0.1
    assert rows[4]["keep"] is False and rows[4]["alpha_frac"] < 0.8


def test_gopher_rules_mean_word_len_and_empty(spark):
    from llama_spark.functions.text import gopher_rules

    long_words = ("pneumonoultramicroscopic " * 60) + "the of"  # mean len > 10
    docs = spark.createDataFrame(
        [_doc(1, long_words), _doc(2, "")], "doc_id long, text string"
    )
    rows = {r["doc_id"]: r for r in gopher_rules(docs).collect()}
    assert rows[1]["keep"] is False and rows[1]["mean_word_len"] > 10
    assert rows[2]["keep"] is False and rows[2]["n_words"] == 0
    assert rows[2]["mean_word_len"] is None  # guarded division


# ---- top principal component ----


def test_pca_top_component_dominant_direction(spark):
    import numpy as np

    from llama_spark.functions.cluster import pca_top_component

    rng = np.random.RandomState(3)
    direction = np.array([3.0, 1.0, 0.0, -1.0])
    direction /= np.linalg.norm(direction)
    rows = []
    for i in range(200):
        v = float(rng.randn()) * 5.0 * direction + rng.randn(4) * 0.05
        rows.append((i, [float(x) for x in v]))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["dim"]: r["loading"] for r in pca_top_component(emb, dims=4).collect()}
    vec = np.array([got[i] for i in range(4)])
    # unit norm, sign fixed so the largest-|loading| dim is positive
    assert abs(np.linalg.norm(vec) - 1.0) < 1e-4
    assert vec[int(np.argmax(np.abs(vec)))] > 0
    cos = abs(float(vec @ direction))
    assert cos > 0.999


def test_pca_top_component_deterministic(spark):
    import numpy as np

    from llama_spark.functions.cluster import pca_top_component

    rng = np.random.RandomState(11)
    rows = [(i, [float(x) for x in rng.randn(4)]) for i in range(60)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = sorted(pca_top_component(emb.repartition(7), dims=4).collect())
    b = sorted(pca_top_component(emb.repartition(2), dims=4).collect())
    assert a == b  # partitioning-invariant (exact int64 Gram partials)


# ---- GraphSession API surface for the batch ----


def test_graphsession_round5g_methods(spark):
    from llama_spark.api import GraphSession
    from llama_spark.graph import with_synthetic_weights

    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    g = GraphSession(spark).from_edges(edges_df(spark, edges))
    assert g.scan_statistic().count() == 4
    assert g.heat_kernel_pagerank(taylor_k=3).count() == 4
    assert g.degree_gini().collect()[0]["n_nodes"] == 4
    gw = GraphSession(spark).from_edges(
        with_synthetic_weights(edges_df(spark, edges))
    )
    assert gw.weighted_clustering().count() == 4
