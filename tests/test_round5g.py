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


# ---- landmark distance sketches ----


def test_landmark_distances_path_exact_between_landmarks(spark):
    from llama_spark.operators.traversal import landmark_distances

    # path 0-1-2-3-4; landmarks = {1, 3} (top-degree after 1,2,3 tie → low id)
    path = [(i, i + 1) for i in range(4)]
    rows = {
        (r["u"], r["v"]): r
        for r in landmark_distances(
            edges_df(spark, path), landmarks=[1, 3], query_ids=[0, 2, 4]
        ).collect()
    }
    # d(0,2)=2: via L=1 upper=1+1=2, lower=|1-1|=0; via L=3 upper=3+1=4, lower=2
    assert rows[(0, 2)]["upper"] == 2 and rows[(0, 2)]["lower"] == 2
    # d(0,4)=4: via L=1 1+3=4; via L=3 3+1=4; lower max(|1-3|,|3-1|)=2
    assert rows[(0, 4)]["upper"] == 4 and rows[(0, 4)]["lower"] == 2
    assert rows[(0, 4)]["n_landmarks"] == 2


def test_landmark_distances_bounds_sandwich_truth(spark):
    import itertools

    from llama_spark.operators.traversal import landmark_distances, pick_landmarks

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (1, 5), (5, 6), (2, 6)]
    # true undirected distances by Floyd-Warshall
    nodes = sorted({u for e in edges for u in e})
    inf = 99
    d = {(a, b): (0 if a == b else inf) for a in nodes for b in nodes}
    for u, v in edges:
        d[(u, v)] = d[(v, u)] = 1
    for k, i, j in itertools.product(nodes, nodes, nodes):
        if d[(i, k)] + d[(k, j)] < d[(i, j)]:
            d[(i, j)] = d[(i, k)] + d[(k, j)]
    lmk = pick_landmarks(edges_df(spark, edges), k=3)
    rows = landmark_distances(
        edges_df(spark, edges), landmarks=lmk, query_ids=nodes
    ).collect()
    assert len(rows) == len(nodes) * (len(nodes) - 1) // 2  # connected graph
    for r in rows:
        truth = d[(r["u"], r["v"])]
        assert r["lower"] <= truth <= r["upper"], (r, truth)


def test_pick_landmarks_degree_order(spark):
    from llama_spark.operators.traversal import pick_landmarks

    star = [(0, i) for i in range(1, 6)] + [(1, 2)]
    assert pick_landmarks(edges_df(spark, star), k=3) == [0, 1, 2]


# ---- k=3 clique percolation ----


def test_clique_percolation_two_chained_triangles(spark):
    from llama_spark.operators.components import clique_percolation

    # triangles (0,1,2) and (1,2,3) share edge (1,2) → ONE community
    e = [(0, 1), (1, 2), (0, 2), (1, 3), (2, 3)]
    rows = clique_percolation(edges_df(spark, e)).collect()
    comms = {}
    for r in rows:
        comms.setdefault(r["community"], set()).add(r["id"])
    assert len(comms) == 1
    assert set(next(iter(comms.values()))) == {0, 1, 2, 3}


def test_clique_percolation_vertex_shared_communities_stay_separate(spark):
    from llama_spark.operators.components import clique_percolation

    # two triangles sharing ONLY node 0 (no edge) → two communities; node 0
    # is a member of both (the overlapping-communities contract)
    e = [(0, 1), (1, 2), (0, 2), (0, 3), (3, 4), (0, 4)]
    rows = clique_percolation(edges_df(spark, e)).collect()
    comms = {}
    for r in rows:
        comms.setdefault(r["community"], set()).add(r["id"])
    assert len(comms) == 2
    assert sorted(map(sorted, comms.values())) == [[0, 1, 2], [0, 3, 4]]


def test_clique_percolation_excludes_triangle_free_edges(spark):
    from llama_spark.operators.components import clique_percolation

    # triangle + tail 2-3-4: tail edges are in no community
    e = [(0, 1), (1, 2), (0, 2), (2, 3), (3, 4)]
    rows = clique_percolation(edges_df(spark, e)).collect()
    assert sorted(r["id"] for r in rows) == [0, 1, 2]


# ---- Bloom decontamination ----


def test_bloom_decontaminate_superset_of_exact(spark):
    from llama_spark.functions.dedup import bloom_decontaminate, decontaminate

    texts = [
        "alpha beta gamma delta epsilon zeta eta theta",
        "one two three four five six seven eight nine",
        "alpha beta gamma delta epsilon other tail words",
        "totally different content with no overlap here",
    ]
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    ev = docs.filter("doc_id = 0")
    tr = docs.filter("doc_id <> 0")
    exact = {r["doc_id"]: r["n_hits"] for r in decontaminate(tr, ev, min_hits=2).collect()}
    bloom = {
        r["doc_id"]: r["n_bloom_hits"]
        for r in bloom_decontaminate(tr, ev, min_hits=2).collect()
    }
    assert set(bloom) == set(exact)
    for d in exact:
        assert bloom[d] >= exact[d]  # one-sided: Bloom never misses a hit
    # doc 2 shares 3-gram shingles with doc 0; doc 3 shares none (w.h.p. at
    # 8 KiB / a handful of eval shingles, FPR ~ 1e-12 — deterministic here)
    assert exact[2] >= 2 and bloom[2] >= exact[2]
    assert bloom[3] == 0


def test_bloom_decontaminate_flags_verbatim_leak(spark):
    from llama_spark.functions.dedup import bloom_decontaminate

    leak = "the quick brown fox jumps over the lazy dog again and again"
    docs = spark.createDataFrame(
        [(0, leak), (1, leak), (2, "clean text entirely unrelated words")],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in bloom_decontaminate(
            docs.filter("doc_id <> 0"), docs.filter("doc_id = 0"), min_hits=5
        ).collect()
    }
    assert rows[1]["contaminated"] is True
    assert rows[2]["contaminated"] is False


def test_graphsession_landmark_and_cpm(spark):
    from llama_spark.api import GraphSession

    e = [(0, 1), (1, 2), (0, 2), (2, 3)]
    g = GraphSession(spark).from_edges(edges_df(spark, e))
    assert g.clique_percolation().count() == 3
    assert g.landmark_distances(k_landmarks=2, query_ids=[0, 1, 3]).count() == 3


# ---- SemDeDup ----


def test_semdedup_drops_within_cluster_near_dups(spark):
    from llama_spark.functions.similarity import semdedup

    # two well-separated cells; ids 0/1 near-identical, 2 orthogonal-ish,
    # 10/11 near-identical in the other cell
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.999, 0.01, 0.0, 0.0]),
        (2, [0.0, 1.0, 0.0, 0.0]),
        (10, [0.0, 0.0, 1.0, 0.0]),
        (11, [0.0, 0.0, 0.999, 0.01]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r for r in semdedup(emb, k=2, iters=4, threshold=0.9).collect()}
    assert got[0]["keep"] is True and got[1]["keep"] is False  # keep-lowest-id
    assert got[10]["keep"] is True and got[11]["keep"] is False
    assert got[2]["keep"] is True


def test_semdedup_is_cluster_local(spark):
    from llama_spark.functions.similarity import semdedup

    # identical vectors but k-means (init = two smallest ids as centroids)
    # puts them in different cells → the screen never compares them: the
    # documented recall trade of cluster-partitioned dedup
    rows = [
        (0, [1.0, 0.0]),
        (1, [-1.0, 0.05]),
        (2, [-1.0, 0.05]),
        (3, [1.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["vec_id"]: r for r in semdedup(emb, k=2, iters=2, threshold=0.99).collect()}
    # 0,3 share a cell (dup found); 1,2 share the other (dup found)
    assert got[3]["keep"] is False and got[2]["keep"] is False
    assert got[0]["keep"] is True and got[1]["keep"] is True
    assert got[0]["cluster"] != got[1]["cluster"]


# ---- partition NMI ----


def _nmi_model(x, y):
    import math
    from collections import Counter

    n = len(x)
    jc = Counter(zip(x, y))
    xc, yc = Counter(x), Counter(y)
    mi = sum(
        c / n * math.log(n * c / (xc[a] * yc[b])) for (a, b), c in jc.items()
    )
    hx = -sum(c / n * math.log(c / n) for c in xc.values())
    hy = -sum(c / n * math.log(c / n) for c in yc.values())
    return 2 * mi / (hx + hy) if hx + hy > 0 else 1.0


def _labels_df(spark, pairs, col):
    return spark.createDataFrame(pairs, f"id long, {col} long")


def test_partition_nmi_identical_is_one(spark):
    from llama_spark.operators.components import partition_nmi

    lab = [(i, i % 3) for i in range(9)]
    row = partition_nmi(
        _labels_df(spark, lab, "component"), _labels_df(spark, lab, "label")
    ).collect()[0]
    assert row["nmi"] == 1.0 and row["n_nodes"] == 9


def test_partition_nmi_independent_is_zero(spark):
    from llama_spark.operators.components import partition_nmi

    x = [(0, 0), (1, 0), (2, 1), (3, 1)]
    y = [(0, 0), (1, 1), (2, 0), (3, 1)]
    row = partition_nmi(
        _labels_df(spark, x, "component"), _labels_df(spark, y, "label")
    ).collect()[0]
    # micro-nat quantization leaves ±1e-6-scale residue; the determinism
    # contract is cross-engine identity, not absolute zero
    assert abs(row["nmi"]) <= 2e-6 and abs(row["mutual_info"]) <= 2e-6


def test_partition_nmi_matches_python_model(spark):
    from llama_spark.operators.components import partition_nmi

    xs = [0, 0, 0, 1, 1, 2, 2, 2, 2, 3]
    ys = [0, 0, 1, 1, 1, 2, 2, 3, 3, 3]
    row = partition_nmi(
        _labels_df(spark, list(enumerate(xs)), "component"),
        _labels_df(spark, list(enumerate(ys)), "label"),
    ).collect()[0]
    assert abs(row["nmi"] - _nmi_model(xs, ys)) < 2e-6


# ---- Gopher-composed curation ----


def test_curate_corpus_gopher_stage_order(spark):
    from llama_spark.functions.dedup import curate_corpus

    good = ("the quick brown fox jumps over a lazy dog " * 6).strip()
    docs = spark.createDataFrame(
        [
            (0, good),                         # keeps
            (1, good),                         # exact dup of 0
            (2, "the of and " * 40),           # gopher: mean len fine, but
                                               # stop-heavy short words pass?
            # passes lang-ID (en markers) but mean word length > 10 → quality
            (3, "the and is of " + "pneumonoultramicroscopicsilicovolcano " * 60),
            (4, "short text"),                 # too_short fires FIRST
        ],
        "doc_id long, text string",
    )
    rows = {
        r["doc_id"]: r
        for r in curate_corpus(docs, min_tokens=20, gopher=True).collect()
    }
    assert rows[0]["keep"] is True
    assert rows[1]["reject_reason"] == "exact_dup"
    assert rows[3]["reject_reason"] == "quality"
    assert rows[4]["reject_reason"] == "too_short"  # ahead of quality
