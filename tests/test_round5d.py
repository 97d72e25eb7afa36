"""Round-5 continuation ops #3: PPR sweep cut, edge embeddedness +
local sparsification, bigram NLL scoring. Spark results are checked
against independent pure-Python models on micro fixtures (the oracle
gates cover the sf0.01 scale)."""

from __future__ import annotations

import math
from collections import defaultdict

import pytest

from tests.conftest import edges_df

# two 4-cliques bridged by one edge — the canonical sweep-cut fixture:
# the bridge is the unique conductance minimum
CLIQUE_A = [(a, b) for a in range(4) for b in range(4) if a < b]
CLIQUE_B = [(a, b) for a in range(10, 14) for b in range(10, 14) if a < b]
BRIDGE = [(3, 10)]
TWO_CLIQUES = CLIQUE_A + CLIQUE_B + BRIDGE


def _und(edges):
    s = set()
    for a, b in edges:
        if a != b:
            s.add((a, b))
            s.add((b, a))
    return s


def _deg(und):
    d = defaultdict(int)
    for a, _ in und:
        d[a] += 1
    return d


def test_ppr_sweep_cut_and_volume_exact(spark):
    """Per-prefix cut/volume/conductance recomputed brute-force in Python
    from the operator's own node ordering must match exactly."""
    from llama_spark.operators.sweep import ppr_sweep

    rows = (
        ppr_sweep(edges_df(spark, TWO_CLIQUES), sources=[0], max_iter=10, top_r=8)
        .orderBy("rank")
        .collect()
    )
    assert [r["rank"] for r in rows] == list(range(1, 9))
    und = _und(TWO_CLIQUES)
    deg = _deg(und)
    total_vol = len(und)
    prefix = set()
    for r in rows:
        prefix.add(r["id"])
        vol = sum(deg[v] for v in prefix)
        cut = sum(1 for (a, b) in und if a < b and ((a in prefix) != (b in prefix)))
        assert r["volume"] == vol
        assert r["cut_edges"] == cut
        denom = min(vol, total_vol - vol)
        if denom > 0:
            assert r["conductance"] == pytest.approx(cut / denom, abs=1e-6)
        else:
            assert r["conductance"] is None


def test_ppr_sweep_finds_the_bridge(spark):
    """Seeded in clique A, the minimum-conductance prefix is clique A
    itself (cut = the single bridge edge)."""
    from llama_spark.operators.sweep import ppr_sweep

    rows = (
        ppr_sweep(edges_df(spark, TWO_CLIQUES), sources=[0], max_iter=20, top_r=8)
        .orderBy("rank")
        .collect()
    )
    best = min((r for r in rows if r["conductance"] is not None),
               key=lambda r: r["conductance"])
    assert best["rank"] == 4  # the 4 nodes of clique A
    assert best["cut_edges"] == 1
    assert {r["id"] for r in rows[:4]} == {0, 1, 2, 3}


def test_edge_overlap_matches_model(spark):
    from llama_spark.operators.sparsify import edge_overlap

    rows = edge_overlap(edges_df(spark, TWO_CLIQUES)).collect()
    und = _und(TWO_CLIQUES)
    nbr = defaultdict(set)
    for a, b in und:
        nbr[a].add(b)
    assert len(rows) == len([1 for (a, b) in und if a < b])
    for r in rows:
        u, v = r["src"], r["dst"]
        cn = len(nbr[u] & nbr[v])
        den = len(nbr[u]) + len(nbr[v]) - 2 - cn
        assert r["cn"] == cn
        assert r["overlap"] == pytest.approx(cn / den if den > 0 else 0.0, abs=1e-6)
    # the bridge edge has zero overlap; in-clique edges have 2/4
    by_pair = {(r["src"], r["dst"]): r for r in rows}
    assert by_pair[(3, 10)]["overlap"] == 0.0
    assert by_pair[(0, 1)]["cn"] == 2


def test_sparsify_keeps_every_node_connected_and_drops_bridge_last(spark):
    from llama_spark.operators.sparsify import sparsify_top_overlap

    kept = {
        (r["src"], r["dst"])
        for r in sparsify_top_overlap(edges_df(spark, TWO_CLIQUES), k=2).collect()
    }
    # union-form guarantee: every node keeps >= min(k, degree) edges
    incident = defaultdict(int)
    for a, b in kept:
        incident[a] += 1
        incident[b] += 1
    for v in {x for e in TWO_CLIQUES for x in e}:
        assert incident[v] >= 1
    # the zero-overlap bridge still survives: it is BOTH endpoints' only
    # inter-cluster edge but ranks below their k=2 in-clique edges — yet
    # node 3 and 10 each have 3 in-clique edges of equal overlap, so the
    # bridge is dropped; cliques stay internally connected
    assert (3, 10) not in kept
    assert all((a, b) in kept or (b, a) in kept for a, b in [(0, 1), (10, 11)])


def test_sparsify_matches_model_ranking(spark):
    """Exact kept-set equality vs a Python model using the same
    (6dp-rounded overlap desc, cn desc, neighbor asc) ranking."""
    from llama_spark.operators.sparsify import edge_overlap, sparsify_top_overlap

    pairs = TWO_CLIQUES + [(2, 20), (20, 21), (21, 2), (13, 30)]
    k = 2
    ov = {
        (r["src"], r["dst"]): (r["overlap"], r["cn"])
        for r in edge_overlap(edges_df(spark, pairs)).collect()
    }
    per_node = defaultdict(list)
    for (u, v), (o, c) in ov.items():
        per_node[u].append((-o, -c, v, (u, v)))
        per_node[v].append((-o, -c, u, (u, v)))
    expect = set()
    for node, lst in per_node.items():
        for item in sorted(lst)[:k]:
            expect.add(item[3])
    kept = {
        (r["src"], r["dst"])
        for r in sparsify_top_overlap(edges_df(spark, pairs), k=k).collect()
    }
    assert kept == expect


def test_bigram_logprob_matches_model(spark):
    from llama_spark.functions.text import bigram_logprob

    docs = [
        (1, "a b a b a"),
        (2, "a b c"),
        (3, "c c c c"),
        (4, "x"),          # single token: no bigrams
        (5, ""),           # empty
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    rows = {r["doc_id"]: r for r in bigram_logprob(df).collect()}

    toks = {d: t.split() for d, t in docs}
    bis = defaultdict(int)
    ctx = defaultdict(int)
    per_doc = defaultdict(list)
    for d, ts in toks.items():
        for w1, w2 in zip(ts, ts[1:]):
            bis[(w1, w2)] += 1
            ctx[w1] += 1
            per_doc[d].append((w1, w2))
    for d, _t in docs:
        expect_n = len(per_doc[d])
        assert rows[d]["n_bigrams"] == expect_n
        if expect_n == 0:
            assert rows[d]["nll_micro"] == 0
            assert rows[d]["avg_nll"] == 0.0
        else:
            micro = sum(
                round((math.log(ctx[w1]) - math.log(bis[(w1, w2)])) * 1e6)
                for w1, w2 in per_doc[d]
            )
            assert rows[d]["nll_micro"] == micro
            assert rows[d]["avg_nll"] == pytest.approx(micro / (expect_n * 1e6),
                                                       abs=1e-6)
    # deterministic text ("c c c c") transitions cost exactly 0 nats
    assert rows[3]["nll_micro"] == 0


# 6-clique (density 2.5) plus a 10-edge path tail hanging off one corner —
# long enough that whole-graph density (25/16) falls under the round-0
# peel threshold for the clique's degree-5 corners (3·25/16 < 5)
K6 = [(a, b) for a in range(6) for b in range(6) if a < b]
TAIL = [(5, 100)] + [(100 + i, 101 + i) for i in range(9)]
CLIQUE_TAIL = K6 + TAIL


def test_densest_subgraph_isolates_the_clique(spark):
    from llama_spark.operators.densest import densest_subgraph_trace

    trace, nodes = densest_subgraph_trace(edges_df(spark, CLIQUE_TAIL), eps=0.5)
    rows = trace.orderBy("round").collect()
    # round 0 = whole graph (16 nodes, 25 edges)
    assert (rows[0]["n_nodes"], rows[0]["n_edges"]) == (16, 25)
    # the best round's survivors are exactly the clique
    assert {r["id"] for r in nodes.collect()} == set(range(6))
    best = [r for r in rows if r["is_best"]]
    assert len(best) == 1
    assert best[0]["density"] == pytest.approx(2.5, abs=1e-6)
    # peeling trace invariants: node count strictly decreases, exactly one
    # best marker, density = e/s on every row
    ns = [r["n_nodes"] for r in rows]
    assert ns == sorted(ns, reverse=True) and len(set(ns)) == len(ns)
    for r in rows:
        assert r["density"] == pytest.approx(r["n_edges"] / r["n_nodes"], abs=1e-6)


def test_densest_subgraph_empty_graph(spark):
    from llama_spark.operators.densest import densest_subgraph_trace

    empty = edges_df(spark, [(1, 1)])  # only a self-loop -> empty und graph
    trace, nodes = densest_subgraph_trace(empty)
    assert trace.count() == 0
    assert nodes.count() == 0


def test_coreness_incremental_triangle_completion(spark):
    """Path a-b-c + insert (a,c): ALL THREE nodes rise 1 -> 2, including b
    which has no incident inserted edge — the case that invalidates any
    per-node local bound; the global +B warm start must still converge to
    the exact new decomposition."""
    from llama_spark.operators.kcore import coreness, coreness_incremental

    base = edges_df(spark, [(1, 2), (2, 3)])
    full = edges_df(spark, [(1, 2), (2, 3), (1, 3)])
    prior = coreness(base)
    got = {r["id"]: r["coreness"] for r in
           coreness_incremental(full, prior, n_inserted=1).collect()}
    assert got == {1: 2, 2: 2, 3: 2}


def test_coreness_incremental_new_nodes_and_big_batch(spark):
    """Nodes absent from the prior fall back to the degree bound; an
    overcounted batch size (B far above the core spread) still converges
    to the exact cold answer."""
    from llama_spark.operators.kcore import coreness, coreness_incremental

    base = edges_df(spark, TWO_CLIQUES)
    extra = [(20, 21), (21, 22), (22, 20), (0, 20)]
    full = edges_df(spark, TWO_CLIQUES + extra)
    prior = coreness(base)
    got = {r["id"]: r["coreness"] for r in
           coreness_incremental(full, prior, n_inserted=999).collect()}
    cold = {r["id"]: r["coreness"] for r in coreness(full).collect()}
    assert got == cold
    assert got[20] == 2  # the new triangle


def test_pack_bestfit_tighter_than_first_fit(spark):
    """Classic BFD win: arrival lengths 3,3,4,4,4,3 at budget 7 cost
    first-fit-arrival 4 bins (it never revisits earlier bins: 6|4|4|7)
    while best-fit-decreasing packs the optimum 3 (4+3 each). Also: no
    bin overflows, every doc appears exactly once, offsets tile each bin
    contiguously."""
    from llama_spark.functions.text import pack_sequences, pack_sequences_bestfit

    docs = [
        (0, "a " * 3), (8, "b " * 3), (16, "c " * 4),
        (24, "d " * 4), (32, "e " * 4), (40, "f " * 3),
    ]
    df = spark.createDataFrame([(i, t.strip()) for i, t in docs],
                               "doc_id long, text string")
    bf = pack_sequences_bestfit(df, budget=7, n_groups=8).collect()
    ff = pack_sequences(df, budget=7, n_groups=8).collect()
    assert all(r["grp"] == 0 for r in bf)  # all ids % 8 == 0 -> one stream
    assert len({r["doc_id"] for r in bf}) == 6
    n_bins_bf = len({r["seq_id"] for r in bf})
    n_bins_ff = len({r["seq_id"] for r in ff})
    assert n_bins_bf == 3 and n_bins_ff == 4
    # per-bin integrity: loads fit and offsets tile contiguously
    from collections import defaultdict as dd
    bins = dd(list)
    for r in bf:
        bins[r["seq_id"]].append((r["offset"], r["n_tokens"]))
    for parts in bins.values():
        parts.sort()
        pos = 0
        for off, t in parts:
            assert off == pos
            pos += t
        assert pos <= 7


def test_weighted_label_propagation_weights_flip_the_vote(spark):
    """Node 9 has TWO light edges into clique-ish label 1 and ONE heavy
    edge to label 2 — unweighted LP follows the count, weighted LP must
    follow the weight."""
    from llama_spark.operators.components import (
        label_propagation,
        label_propagation_weighted,
    )

    pairs = [(1, 9, 1.0), (2, 9, 1.0), (3, 9, 5.0)]
    wdf = edges_df(spark, pairs, weight=True)
    seeds = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2), (9, 9)], "id long, label long"
    )
    unw = {r["id"]: r["label"] for r in
           label_propagation(wdf.select("src", "dst"), max_iter=1,
                             initial_labels=seeds).collect()}
    wgt = {r["id"]: r["label"] for r in
           label_propagation_weighted(wdf, max_iter=1,
                                      initial_labels=seeds).collect()}
    assert unw[9] == 1   # two votes beat one
    assert wgt[9] == 2   # 5.0 beats 1.0 + 1.0


def test_reciprocity_counts_mutual_pairs(spark):
    from llama_spark.graph import reciprocity

    # 2 mutual pairs (4 directed edges) + 2 one-way + self-loop + dup row
    pairs = [(1, 2), (2, 1), (3, 4), (4, 3), (5, 6), (7, 8), (9, 9), (5, 6)]
    row = reciprocity(edges_df(spark, pairs)).collect()[0]
    assert row["n_directed"] == 6
    assert row["n_mutual"] == 4
    assert row["reciprocity"] == pytest.approx(4 / 6, abs=1e-6)


def test_edge_betweenness_path_exact(spark):
    """Directed path 0->1->2->3, all nodes as roots: edge (v,w) carries
    the number of (root, target) shortest paths through it — 3/4/3."""
    from llama_spark.operators.bc import edge_betweenness

    rows = edge_betweenness(
        edges_df(spark, [(0, 1), (1, 2), (2, 3)]), roots=[0, 1, 2, 3]
    ).collect()
    got = {(r["src"], r["dst"]): r["ebc"] for r in rows}
    assert got == {(0, 1): 3.0, (1, 2): 4.0, (2, 3): 3.0}


def test_edge_betweenness_bridge_dominates(spark):
    """In the two-clique fixture (symmetrized) the bridge edge carries all
    inter-clique shortest paths — it must outscore every in-clique edge,
    and node/edge scores must be mutually consistent per Brandes:
    sum_edges ebc = sum over roots of sum_v sigma_v-weighted path counts =
    sum of (node bc) + (paths-to-target count)."""
    from llama_spark.operators.bc import betweenness_centrality, edge_betweenness

    und = TWO_CLIQUES + [(b, a) for a, b in TWO_CLIQUES]
    roots = sorted({x for e in TWO_CLIQUES for x in e})
    rows = edge_betweenness(edges_df(spark, und), roots=roots).collect()
    scores = {(r["src"], r["dst"]): r["ebc"] for r in rows}
    bridge = max(scores[(3, 10)], scores[(10, 3)])
    others = [v for k, v in scores.items() if k not in {(3, 10), (10, 3)}]
    assert bridge > max(others)


def test_pq_ann_recovers_tight_clusters(spark):
    """Two well-separated clusters: every query's nearest ADC neighbors
    are its own cluster mates, and same-cluster ADC distances are far
    below cross-cluster ones."""
    from llama_spark.functions.similarity import pq_ann, pq_fit_codes

    A = [[0.0, 0.1, 0.0, 0.2], [0.1, 0.0, 0.1, 0.0], [0.2, 0.1, 0.0, 0.1]]
    B = [[10.0, 9.9, 10.1, 10.0], [9.8, 10.0, 10.0, 10.2], [10.1, 10.1, 9.9, 10.0]]
    rows = [(i, v) for i, v in enumerate(A + B)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    codes, books = pq_fit_codes(df, m=2, k=2, iters=2)
    got_codes = codes.collect()
    assert len(got_codes) == 12  # 6 vectors x 2 subspaces
    # each subspace's codebook separates the clusters
    by_sub = {}
    for r in got_codes:
        by_sub.setdefault(r["sub"], {})[r["vec_id"]] = r["code"]
    for sub_codes in by_sub.values():
        assert len({sub_codes[i] for i in range(3)}) == 1
        assert len({sub_codes[i] for i in range(3, 6)}) == 1
        assert sub_codes[0] != sub_codes[3]

    out = pq_ann(df, m=2, k_codes=2, iters=2, k=2, n_queries=6).collect()
    for r in out:
        same = (r["query_id"] < 3) == (r["neighbor_id"] < 3)
        assert same, (r["query_id"], r["neighbor_id"])
