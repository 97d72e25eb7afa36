"""Round-5 continuation batch 2: bow-tie census, condensation levels,
spam mass, maximal matching, 4-cliques, token entropy."""

from __future__ import annotations

import itertools
import math

from tests.conftest import edges_df


# ---- bow-tie decomposition ----

# core SCC {10,11,12}; IN: 1→10, 0→1; OUT: 12→20, 20→21;
# tendril: 30 (edge 1→30: hangs off IN, never reaches core);
# disconnected: 40↔41
BOWTIE_EDGES = [
    (10, 11), (11, 12), (12, 10),          # CORE cycle
    (0, 1), (1, 10),                        # IN chain
    (12, 20), (20, 21),                     # OUT chain
    (1, 30),                                # TENDRIL off IN
    (40, 41), (41, 40),                     # DISCONNECTED 2-cycle
]


def test_bowtie_regions(spark):
    from llama_spark.operators.bowtie import bowtie_decomposition

    got = {
        r["id"]: r["region"]
        for r in bowtie_decomposition(edges_df(spark, BOWTIE_EDGES)).collect()
    }
    assert got == {
        10: "CORE", 11: "CORE", 12: "CORE",
        0: "IN", 1: "IN",
        20: "OUT", 21: "OUT",
        30: "TENDRIL",
        40: "DISCONNECTED", 41: "DISCONNECTED",
    }


def test_bowtie_census_shares(spark):
    from llama_spark.operators.bowtie import bowtie_census

    rows = {r["region"]: r for r in bowtie_census(edges_df(spark, BOWTIE_EDGES)).collect()}
    assert rows["CORE"]["n_nodes"] == 3
    assert abs(rows["CORE"]["share"] - 0.3) < 1e-9
    assert sum(r["n_nodes"] for r in rows.values()) == 10


# ---- condensation levels ----


def test_condensation_levels_chain_of_sccs(spark):
    from llama_spark.operators.scc import condensation_levels

    # SCC A={0,1}, B={2,3}, C={4}; A→B→C plus shortcut A→C
    edges = [(0, 1), (1, 0), (2, 3), (3, 2), (1, 2), (3, 4), (0, 4)]
    got = {r["comp"]: r["level"] for r in condensation_levels(edges_df(spark, edges)).collect()}
    assert got == {0: 0, 2: 1, 4: 2}  # longest path wins over the shortcut


def test_condensation_levels_isolated_scc(spark):
    from llama_spark.operators.scc import condensation_levels

    got = {r["comp"]: r["level"] for r in condensation_levels(
        edges_df(spark, [(7, 8), (8, 7), (1, 2)])
    ).collect()}
    assert got == {7: 0, 1: 0, 2: 1}


# ---- spam mass ----


def _py_pagerank(edges, teleport, damping=0.85, iters=10):
    nodes = sorted({u for e in edges for u in e})
    out = {}
    for u, v in edges:
        out.setdefault(u, []).append(v)
    rank = dict(teleport)
    for _ in range(iters):
        contrib = {v: 0.0 for v in nodes}
        for u, vs in out.items():
            share = rank[u] / len(vs)
            for v in vs:
                contrib[v] += share
        rank = {
            v: (1 - damping) * teleport[v] + damping * contrib[v] for v in nodes
        }
    return rank


def test_spam_mass_matches_python_model(spark):
    from llama_spark.operators.trust import spam_mass

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 3), (5, 3)]
    nodes = sorted({u for e in edges for u in e})
    n = len(nodes)
    seeds = [0]
    pr = _py_pagerank(edges, {v: 1.0 / n for v in nodes})
    tr = _py_pagerank(edges, {v: (1.0 if v in seeds else 0.0) for v in nodes})
    got = {r["id"]: r for r in spam_mass(edges_df(spark, edges), seeds=seeds).collect()}
    for v in nodes:
        p = round(pr[v] * n, 6)
        t = round(tr[v] * n, 6)
        assert abs(got[v]["pr_scaled"] - p) < 1e-9, v
        assert abs(got[v]["trust_scaled"] - t) < 1e-9, v
        assert abs(got[v]["rel_mass"] - round((p - t) / p, 6)) < 1e-9, v
    # the seed is trust-rich (mass well below the spam-farm pair 3/4)
    assert got[0]["rel_mass"] < got[3]["rel_mass"]


# ---- maximal matching ----


def _assert_maximal_matching(edge_pairs, matched):
    und = {tuple(sorted(e)) for e in edge_pairs if e[0] != e[1]}
    mset = {tuple(sorted(e)) for e in matched}
    assert mset <= und
    ends = [v for e in mset for v in e]
    assert len(ends) == len(set(ends)), "matched edges share a vertex"
    covered = set(ends)
    for a, b in und:
        assert a in covered or b in covered, f"unmatched edge {(a, b)} uncovered"


def test_matching_path_and_star(spark):
    from llama_spark.operators.matching import maximal_matching

    path = [(i, i + 1) for i in range(9)]
    got = [(r["src"], r["dst"]) for r in maximal_matching(edges_df(spark, path)).collect()]
    _assert_maximal_matching(path, got)
    star = [(0, i) for i in range(1, 8)]
    got = [(r["src"], r["dst"]) for r in maximal_matching(edges_df(spark, star)).collect()]
    _assert_maximal_matching(star, got)
    assert len(got) == 1  # a star admits exactly one matched edge


def test_matching_random_graph_valid_and_deterministic(spark):
    from llama_spark.operators.matching import maximal_matching

    edges = [((i * 37) % 50, (i * 53 + 11) % 50) for i in range(180)]
    edges = [e for e in edges if e[0] != e[1]]
    a = sorted(
        (r["src"], r["dst"]) for r in maximal_matching(edges_df(spark, edges)).collect()
    )
    _assert_maximal_matching(edges, a)
    b = sorted(
        (r["src"], r["dst"]) for r in maximal_matching(edges_df(spark, edges)).collect()
    )
    assert a == b


# ---- four-cliques ----


def _brute_four_cliques(edge_pairs):
    und = {tuple(sorted(e)) for e in edge_pairs if e[0] != e[1]}
    nodes = sorted({v for e in und for v in e})
    cnt = 0
    for quad in itertools.combinations(nodes, 4):
        if all(tuple(sorted(p)) in und for p in itertools.combinations(quad, 2)):
            cnt += 1
    return cnt


def test_four_cliques_vs_bruteforce(spark):
    from llama_spark.operators.triangles import four_clique_count

    # K5 plus noise: K5 has C(5,4)=5 four-cliques
    k5 = list(itertools.combinations(range(5), 2))
    noise = [(5, 6), (6, 7), (5, 7), (7, 8), (2, 9), (9, 3)]
    edges = k5 + noise
    want = _brute_four_cliques(edges)
    assert want == 5
    for orient in ("id", "degree"):
        got = four_clique_count(edges_df(spark, edges), orient=orient).collect()[0]
        assert got["four_cliques"] == want, orient


def test_four_cliques_random_graph(spark):
    from llama_spark.operators.triangles import four_clique_count

    edges = [((i * 13) % 24, (i * 7 + 5) % 24) for i in range(140)]
    edges = [e for e in edges if e[0] != e[1]]
    want = _brute_four_cliques(edges)
    got = four_clique_count(edges_df(spark, edges)).collect()[0]
    assert got["four_cliques"] == want


# ---- token entropy ----


def test_token_entropy_manual(spark):
    from llama_spark.functions.text import token_entropy

    docs = spark.createDataFrame(
        [
            (1, "a a a a"),          # zero entropy
            (2, "a b c d"),          # ln(4)
            (3, "a a b b b c"),      # mixed
            (4, ""),                 # empty → 0
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in token_entropy(docs).collect()}
    assert got[1]["entropy_nats"] == 0.0 and got[1]["n_tokens"] == 4
    assert abs(got[2]["entropy_nats"] - round(math.log(4), 6)) < 2e-6
    counts = {"a": 2, "b": 3, "c": 1}
    n = 6
    h = sum(round((math.log(n) - math.log(c)) * c * 1e6) for c in counts.values()) / (
        n * 1e6
    )
    assert abs(got[3]["entropy_nats"] - round(h, 6)) < 1e-9
    assert got[4]["n_tokens"] == 0 and got[4]["entropy_nats"] == 0.0
    assert got[3]["distinct_tokens"] == 3


# ---- weighted matching ----


def test_weighted_matching_valid_and_heavy(spark):
    from llama_spark.operators.matching import maximal_weight_matching

    # path 0-1-2-3 with a heavy middle edge: greedy must take (1,2) alone
    edges = [(0, 1, 1.0), (1, 2, 9.0), (2, 3, 1.0)]
    got = sorted(
        (r["src"], r["dst"], r["wq"])
        for r in maximal_weight_matching(
            edges_df(spark, edges, weight=True)
        ).collect()
    )
    assert got == [(1, 2, 900)]


def test_weighted_matching_random_valid(spark):
    from llama_spark.operators.matching import maximal_weight_matching

    pairs = [((i * 37) % 40, (i * 53 + 11) % 40) for i in range(120)]
    edges = [(a, b, 1.0 + ((a * 31 + b) % 100) / 100.0) for a, b in pairs if a != b]
    got = [
        (r["src"], r["dst"])
        for r in maximal_weight_matching(
            edges_df(spark, edges, weight=True)
        ).collect()
    ]
    _assert_maximal_matching([(a, b) for a, b, _ in edges], got)


def test_weighted_matching_rejects_oversized_weights(spark):
    import pytest

    from llama_spark.operators.matching import maximal_weight_matching

    with pytest.raises(ValueError):
        maximal_weight_matching(
            edges_df(spark, [(0, 1, 5000.0)], weight=True)
        ).collect()


# ---- funnel / retention ----


def test_funnel_counts_strict_order(spark):
    from llama_spark.functions.funnel import funnel_counts

    rows = [
        # user 1 completes view→click→purchase in order
        (1, 1, "2024-01-01 10:00:00", "view"),
        (2, 1, "2024-01-01 10:01:00", "click"),
        (3, 1, "2024-01-01 10:02:00", "purchase"),
        # user 2 clicks BEFORE viewing — stops at step 1
        (4, 2, "2024-01-01 09:00:00", "click"),
        (5, 2, "2024-01-01 09:30:00", "view"),
        # user 3 views and clicks, never purchases
        (6, 3, "2024-01-01 08:00:00", "view"),
        (7, 3, "2024-01-01 08:10:00", "click"),
        # user 4 purchase only — no funnel entry
        (8, 4, "2024-01-01 07:00:00", "purchase"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    )
    got = {
        r["step_no"]: (r["step"], r["n_users"])
        for r in funnel_counts(ev, ["view", "click", "purchase"]).collect()
    }
    assert got == {1: ("view", 3), 2: ("click", 2), 3: ("purchase", 1)}


def test_daily_retention_triangle(spark):
    from llama_spark.functions.funnel import daily_retention

    rows = [
        (1, 10, "2024-01-01 12:00:00"),
        (2, 10, "2024-01-02 12:00:00"),
        (3, 10, "2024-01-03 12:00:00"),
        (4, 11, "2024-01-01 01:00:00"),
        (5, 11, "2024-01-03 23:00:00"),
        (6, 12, "2024-01-02 00:00:00"),
    ]
    ev = spark.createDataFrame(rows, "event_id long, user_id long, ts string")
    ev = ev.withColumn("event_type", ev.event_id.cast("string"))
    got = {
        (r["cohort_day"] % 100000, r["day_offset"]): (r["n_users"], r["retention"])
        for r in daily_retention(ev).collect()
    }
    d0 = 19723  # 2024-01-01 epoch day
    assert got[(d0 % 100000, 0)] == (2, 1.0)
    assert got[(d0 % 100000, 1)] == (1, 0.5)
    assert got[(d0 % 100000, 2)] == (2, 1.0)
    assert got[((d0 + 1) % 100000, 0)] == (1, 1.0)


# ---- kmeans inertia / token powerlaw ----


def test_kmeans_inertia_manual(spark):
    from llama_spark.functions.cluster import kmeans_inertia

    # two tight blobs: k=2, 1 iter → seeds are the two smallest ids (one
    # per blob by construction); inertia = sum of squared dists to seeds
    rows = [
        (0, [0.0, 0.0]), (2, [0.1, 0.0]), (4, [0.0, 0.2]),
        (1, [5.0, 5.0]), (3, [5.3, 5.0]), (5, [5.0, 5.4]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {r["cluster"]: r for r in kmeans_inertia(emb, k=2, iters=1).collect()}
    # seeds: vec 0 -> cluster 0 at (0,0); vec 1 -> cluster 1 at (5,5)
    assert got[0]["n_vectors"] == 3 and got[1]["n_vectors"] == 3
    assert abs(got[0]["inertia"] - (0.0 + 0.01 + 0.04)) < 1e-9
    assert abs(got[1]["inertia"] - (0.0 + 0.09 + 0.16)) < 1e-9


def test_token_powerlaw_hill(spark):
    import math

    from llama_spark.functions.text import token_powerlaw

    # corpus where token frequencies are known: a x8, b x4, c x2, d x1
    docs = spark.createDataFrame(
        [(1, "a a a a a a a a b b"), (2, "b b c c d")],
        "doc_id long, text string",
    )
    row = token_powerlaw(docs, c_min=4).collect()[0]
    # tail = {a: 8, b: 4}; alpha = 1 + 2 / (ln(8/4) + ln(4/4))
    assert row["n_tail"] == 2
    assert abs(row["alpha"] - round(1 + 2 / math.log(2.0), 6)) < 1e-9


# ---- attack percolation ----


def test_attack_percolation_star_plus_path(spark):
    from llama_spark.operators.percolation import attack_percolation

    # hub 0 with 10 spokes, plus a separate path 20-21-22; V=14, 5% → k=0
    edges = [(0, i) for i in range(1, 11)] + [(20, 21), (21, 22)]
    row = attack_percolation(edges_df(spark, edges), frac=0.05).collect()[0]
    assert row["n_removed"] == 0
    assert row["giant_size"] == 11 and row["n_components"] == 2
    # 20% → k=2: hub 0 and node 21 (both degree-heavy) removed; the star
    # shatters into 10 singletons and the path into {20}, {22}
    row = attack_percolation(edges_df(spark, edges), frac=0.2).collect()[0]
    assert row["n_removed"] == 2
    assert row["n_remaining"] == 12
    assert row["giant_size"] == 1 and row["n_components"] == 12


# ---- pagerank trace ----


def test_pagerank_trace_geometric_decay(spark):
    from llama_spark.operators.pagerank import pagerank_trace

    # NOT a permutation graph (a 1-regular graph has uniform PageRank
    # and identically-zero residuals): quadratic dst skews in-degrees
    edges = [((i * 7 + 1) % 25, (i * i + 3) % 25) for i in range(200)]
    edges = [e for e in edges if e[0] != e[1]]
    rows = {r["iter"]: r["l1_residual"] for r in pagerank_trace(
        edges_df(spark, edges), iters=6
    ).collect()}
    assert set(rows) == set(range(1, 7))
    # residual decays and is bounded by damping-rate contraction overall
    assert rows[6] < rows[1]
    assert rows[6] < rows[3] < rows[1]


# ---- random projection ----


def test_random_projection_manual(spark):
    from llama_spark.functions.similarity import plane_weights, random_projection

    emb = spark.createDataFrame(
        [(7, [1.0, 0.0, 2.0, 0.0])], "vec_id long, embedding array<double>"
    )
    w = plane_weights(4, 3)
    got = {r["dim"]: r["val"] for r in random_projection(emb, out_dims=3).collect()}
    for p in range(3):
        want = round(1.0 * w[p][0] + 2.0 * w[p][2], 6)
        assert abs(got[p] - want) < 1e-9


# ---- facade round-trip for the batch-2 surface ----


def test_graphsession_batch2_facade(spark):
    from llama_spark.api import GraphSession

    g = GraphSession(spark).from_edges(
        edges_df(spark, BOWTIE_EDGES)
    )
    regions = {r["region"] for r in g.bowtie().collect()}
    assert "CORE" in regions
    assert g.triad_census().count() == 16
    assert g.matching().count() >= 1
    assert g.attack_percolation(frac=0.1).count() == 1
    assert g.condensation_levels().count() >= 1
    assert g.spam_mass(seeds=[0]).count() >= 1
    lab = g.label_propagation(max_iter=2)
    assert set(g.conductance(lab).columns) == {
        "community", "n_nodes", "cut", "vol", "conductance",
    }
    tr = {r["iter"] for r in g.pagerank_trace(iters=3).collect()}
    assert tr == {1, 2, 3}


# ---- substring dup spans / transitions / embedding stats ----


def test_substring_dup_spans_planted(spark):
    from llama_spark.functions.dedup import substring_dup_spans

    shared = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    docs = spark.createDataFrame(
        [
            (1, shared + " unique one two three"),
            (2, "prefix words here " + shared),
            (3, "totally different text with no overlap at all ok"),
            (4, "short doc"),  # < window → 0 windows
        ],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in substring_dup_spans(docs, window=8).collect()}
    # docs 1 and 2 share the 8-token run → each has ≥1 dup window
    assert got[1]["dup_windows"] >= 1 and got[2]["dup_windows"] >= 1
    assert got[3]["dup_windows"] == 0 and got[3]["n_windows"] > 0
    assert got[4]["n_windows"] == 0 and got[4]["dup_fraction"] == 0.0
    assert got[1]["n_windows"] == 12 - 8 + 1  # 12 tokens → 5 full windows


def test_event_transitions_manual(spark):
    from llama_spark.functions.funnel import event_transitions

    rows = [
        (1, 1, "2024-01-01 10:00:00", "a"),
        (2, 1, "2024-01-01 10:01:00", "b"),
        (3, 1, "2024-01-01 10:02:00", "a"),
        (4, 2, "2024-01-01 09:00:00", "a"),
        (5, 2, "2024-01-01 09:01:00", "b"),
    ]
    ev = spark.createDataFrame(
        rows, "event_id long, user_id long, ts string, event_type string"
    )
    got = {(r["from_type"], r["to_type"]): (r["n"], r["prob"])
           for r in event_transitions(ev).collect()}
    assert got[("a", "b")] == (2, round(2 / 2, 6))
    assert got[("b", "a")] == (1, 1.0)


def test_embedding_stats_manual(spark):
    from llama_spark.functions.cluster import embedding_stats

    emb = spark.createDataFrame(
        [(1, [1.0, 10.0]), (2, [3.0, 10.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r["dim"]: r for r in embedding_stats(emb).collect()}
    assert got[0]["mean"] == 2.0 and abs(got[0]["std"] - 1.0) < 1e-9
    assert got[1]["mean"] == 10.0 and got[1]["std"] == 0.0
