"""Round-5 continuation ops: co-citation / bibliographic coupling,
segment-level dedup, weighted modularity, power-law fit, sequence packing.
Each test checks the Spark result against an independent pure-Python model
on a micro fixture (the oracle gates cover the sf0.01 scale)."""

from __future__ import annotations

import math
from collections import Counter, defaultdict

import pytest

from tests.conftest import edges_df


# --------------------------------------------------------- co-citation

# directed: 0→{2,3,4}, 1→{2,3}, 5→{2}
COCIT_EDGES = [(0, 2), (0, 3), (0, 4), (1, 2), (1, 3), (5, 2)]


def test_cocitation_pairs(spark):
    from llama_spark.operators.linkpred import cocitation_pairs

    e = edges_df(spark, COCIT_EDGES)
    got = {
        (r["a"], r["b"]): r["strength"]
        for r in cocitation_pairs(e, mode="cocitation", top_k=None).collect()
    }
    # pairs cited together: (2,3) by 0 and 1; (2,4),(3,4) by 0
    assert got == {(2, 3): 2, (2, 4): 1, (3, 4): 1}


def test_bib_coupling_pairs(spark):
    from llama_spark.operators.linkpred import cocitation_pairs

    e = edges_df(spark, COCIT_EDGES)
    got = {
        (r["a"], r["b"]): r["strength"]
        for r in cocitation_pairs(e, mode="coupling", top_k=None).collect()
    }
    # sources sharing targets: (0,1) share {2,3}; (0,5),(1,5) share {2}
    assert got == {(0, 1): 2, (0, 5): 1, (1, 5): 1}


def test_cocitation_hub_cap(spark):
    from llama_spark.operators.linkpred import cocitation_pairs

    e = edges_df(spark, COCIT_EDGES)
    got = {
        (r["a"], r["b"]): r["strength"]
        for r in cocitation_pairs(
            e, mode="cocitation", top_k=None, hub_cap=2
        ).collect()
    }
    # pivot 0 (out-fan 3) dropped: only pivot 1's pair survives
    assert got == {(2, 3): 1}


def test_cocitation_topk_order(spark):
    from llama_spark.operators.linkpred import cocitation_pairs

    e = edges_df(spark, COCIT_EDGES)
    rows = cocitation_pairs(e, mode="cocitation", top_k=2).collect()
    assert [(r["a"], r["b"], r["strength"]) for r in rows] == [
        (2, 3, 2),
        (2, 4, 1),
    ]


# ------------------------------------------------------- segment dedup

SEG_DOCS = [
    (0, "a b c d e f g h"),   # two 4-token segments
    (1, "a b c d x y z w"),   # first segment duplicates doc 0's
    (2, "a b c d e f g h"),   # full dup of doc 0
    (3, ""),                  # empty
]


def _seg_model(docs, width):
    segs = {}
    for did, text in docs:
        toks = [t for t in text.lower().split() if t]
        for s in range(0, (len(toks) + width - 1) // width):
            segs[(did, s)] = " ".join(toks[s * width : (s + 1) * width])
    first = {}
    for (did, s), st in sorted(segs.items()):
        first.setdefault(st, (did, s))
    kept = {k: v for k, v in segs.items() if first[v] == k}
    out = {}
    for did, _ in docs:
        mine = sorted(s for (d, s) in kept if d == did)
        out[did] = (
            sum(1 for (d, _) in segs if d == did),
            len(mine),
            " ".join(kept[(did, s)] for s in mine),
        )
    return out


def test_segment_dedup(spark):
    from llama_spark.functions.dedup import segment_dedup

    docs = spark.createDataFrame(
        [(i, t, "en", "src", len(t)) for i, t in SEG_DOCS],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        r["doc_id"]: (r["n_segs"], r["n_kept"], r["text_dedup"])
        for r in segment_dedup(docs, width=4).collect()
    }
    assert got == _seg_model(SEG_DOCS, 4)
    # doc 2 (full dup) must be emptied, doc 1 keeps only its tail segment
    assert got[2] == (2, 0, "")
    assert got[1] == (2, 1, "x y z w")


# -------------------------------------------------- weighted modularity

# two weighted triangles joined by a light bridge
WMOD_EDGES = [
    (0, 1, 2.0), (1, 2, 2.0), (2, 0, 2.0),
    (3, 4, 2.0), (4, 5, 2.0), (5, 3, 2.0),
    (2, 3, 0.25),
]


def _wmod_model(edges, labels, res=128):
    q = {}
    for a, b, w in edges:
        a, b = min(a, b), max(a, b)
        iw = math.floor(w * res) + 1
        q[(a, b)] = max(q.get((a, b), 0), iw)
    und = [(a, b, w) for (a, b), w in q.items()]
    und += [(b, a, w) for (a, b), w in q.items()]
    w2 = sum(w for _, _, w in und)
    k = Counter()
    for a, _, w in und:
        k[a] += w
    intra = Counter()
    for a, b, w in und:
        if labels[a] == labels[b]:
            intra[labels[a]] += w
    sc = Counter()
    for v, kv in k.items():
        sc[labels[v]] += kv
    return round(
        sum(intra[c] / w2 - (sc[c] / w2) ** 2 for c in sc), 6
    )


def test_modularity_weighted(spark):
    from llama_spark.operators.components import modularity_weighted

    e = edges_df(spark, WMOD_EDGES, weight=True)
    labels = {0: 0, 1: 0, 2: 0, 3: 1, 4: 1, 5: 1}
    comm = spark.createDataFrame(
        sorted(labels.items()), "id long, label long"
    )
    got = modularity_weighted(e, comm).collect()[0]["modularity"]
    assert got == pytest.approx(_wmod_model(WMOD_EDGES, labels), abs=1e-6)


def test_modularity_weighted_unit_weights_matches_unweighted(spark):
    """With all weights in [0, 1/128) the quantized masses are all 1 —
    Q_w must equal plain modularity on the same assignment."""
    from llama_spark.operators.components import modularity, modularity_weighted

    pairs = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3)]
    ew = edges_df(spark, [(a, b, 0.0) for a, b in pairs], weight=True)
    e = edges_df(spark, pairs)
    comm = spark.createDataFrame(
        [(i, i // 3) for i in range(6)], "id long, label long"
    )
    qw = modularity_weighted(ew, comm).collect()[0]["modularity"]
    q = modularity(e, comm).collect()[0]["modularity"]
    assert qw == pytest.approx(q, abs=1e-6)


# ------------------------------------------------------- power-law fit

def test_degree_powerlaw(spark):
    from llama_spark.graph import degree_powerlaw

    # star(0; 1..6) + path 1-2-3: degrees 0:6, 1:2, 2:3, 3:2, 4..6:1
    pairs = [(0, i) for i in range(1, 7)] + [(1, 2), (2, 3)]
    e = edges_df(spark, pairs)
    row = degree_powerlaw(e, d_min=2).collect()[0]
    tail = [6, 2, 3, 2]
    lm = sum(math.log(d / 2.0) for d in tail)
    assert row["d_min"] == 2
    assert row["n_tail"] == 4
    assert row["alpha"] == pytest.approx(round(1 + 4 / lm, 6), abs=1e-6)


def test_degree_powerlaw_degenerate_tail(spark):
    from llama_spark.graph import degree_powerlaw

    # all tail degrees == d_min → zero log-mass → alpha NULL
    e = edges_df(spark, [(0, 1), (2, 3)])
    row = degree_powerlaw(e, d_min=1).collect()[0]
    assert row["n_tail"] == 4 and row["alpha"] is None


# ----------------------------------------------------- sequence packing

def _pack_model(items, budget, n_groups):
    by_grp = defaultdict(list)
    for did, t in sorted(items):
        by_grp[did % n_groups].append((did, t))
    out = {}
    for g, docs in by_grp.items():
        seq, acc = 0, 0
        for i, (did, t) in enumerate(docs):
            if i > 0 and acc + t > budget:
                seq, acc = seq + 1, 0
            out[did] = (g, seq, acc, t)
            acc += t
    return out


def test_pack_sequences(spark):
    from llama_spark.functions.text import pack_sequences

    texts = {
        0: "a b c",          # 3 tokens, grp 0
        1: "a b c d",        # 4 tokens, grp 1
        2: "a b c d e",      # 5, grp 0
        3: "a b c d e f g h i j k l",  # 12 > budget, grp 1
        4: "a",              # 1, grp 0
        5: "a b",            # 2, grp 1
        6: "",               # 0 tokens, grp 0
    }
    docs = spark.createDataFrame(
        [(i, t, "en", "s", len(t)) for i, t in sorted(texts.items())],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {
        r["doc_id"]: (r["grp"], r["seq_id"], r["offset"], r["n_tokens"])
        for r in pack_sequences(docs, budget=8, n_groups=2).collect()
    }
    model = _pack_model(
        [(i, len(t.split())) for i, t in texts.items()], 8, 2
    )
    assert got == model
    # doc 3 exceeds the budget → it sits alone at offset 0 of its sequence
    assert got[3][2] == 0


# ------------------------------------------- neighbor feature aggregation

def test_neighbor_mean_embeddings(spark):
    from llama_spark.functions.similarity import neighbor_mean_embeddings

    edges = edges_df(spark, [(0, 1), (0, 2), (1, 2), (2, 9)])  # 9 has no emb
    emb = spark.createDataFrame(
        [
            (1, [1.0, 2.0, 3.0]),
            (2, [3.0, 4.0, 5.0]),
            (0, [9.0, 9.0, 9.0]),  # nobody points at 0 → unused
        ],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["id"], r["dim"]): r["mean_val"]
        for r in neighbor_mean_embeddings(edges, emb, dims=2).collect()
    }
    # node 0 averages emb(1), emb(2); node 1 sees emb(2); node 2's only
    # neighbor (9) has no embedding → absent
    assert got == {
        (0, 0): 2.0, (0, 1): 3.0,
        (1, 0): 3.0, (1, 1): 4.0,
    }


# --------------------------------------------------- decremental coreness

def test_coreness_decremental_warm_start(spark):
    from llama_spark.operators.kcore import coreness

    # K5 (coreness 4) + pendant path; delete two K5 edges → inner core drops
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    extra = [(4, 5), (5, 6)]
    full = edges_df(spark, k5 + extra)
    kept = edges_df(spark, [e for e in k5 if e not in [(0, 1), (2, 3)]] + extra)

    prior = coreness(full, rounds=3)
    warm = {r["id"]: r["coreness"] for r in coreness(kept, initial=prior).collect()}
    cold = {r["id"]: r["coreness"] for r in coreness(kept).collect()}
    assert warm == cold


def test_coreness_initial_ignores_understated_nodes_via_degree_cap(spark):
    """A prior that OVERSHOOTS (e.g. stale values way above the new
    degrees) must still converge to the exact decomposition — the degree
    cap and the first h-round pull it down."""
    from llama_spark.operators.kcore import coreness

    tri = edges_df(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])
    stale = spark.createDataFrame(
        [(0, 99), (1, 99), (2, 99), (3, 99)], "id long, coreness long"
    )
    warm = {r["id"]: r["coreness"] for r in coreness(tri, initial=stale).collect()}
    assert warm == {0: 2, 1: 2, 2: 2, 3: 1}


# -------------------------------------------------- truss decomposition

def _trussness_model(pairs):
    """Brute force: peel for k = 3, 4, ... ; trussness = last k survived."""
    edges = {tuple(sorted(p)) for p in pairs if p[0] != p[1]}
    truss = {e: 2 for e in edges}
    k = 3
    cur = set(edges)
    while cur:
        changed = True
        sub = set(cur)
        while changed:
            changed = False
            adj = defaultdict(set)
            for a, b in sub:
                adj[a].add(b)
                adj[b].add(a)
            drop = {
                (a, b)
                for a, b in sub
                if len(adj[a] & adj[b]) < k - 2
            }
            if drop:
                sub -= drop
                changed = True
        for e in sub:
            truss[e] = k
        cur = sub
        k += 1
    return truss


TRUSS_GRAPHS = [
    # K5 + pendant triangle sharing one vertex + a chain
    [(a, b) for a in range(5) for b in range(a + 1, 5)]
    + [(4, 5), (4, 6), (5, 6), (6, 7), (7, 8)],
    # two K4s sharing an edge
    [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
     (2, 4), (2, 5), (3, 4), (3, 5), (4, 5)],
    # triangle-free: star + path
    [(0, i) for i in range(1, 5)] + [(5, 6), (6, 7)],
]


@pytest.mark.parametrize("pairs", TRUSS_GRAPHS)
def test_trussness_matches_bruteforce(spark, pairs):
    from llama_spark.operators.truss import trussness

    got = {
        (r["src"], r["dst"]): r["trussness"]
        for r in trussness(edges_df(spark, pairs)).collect()
    }
    assert got == _trussness_model(pairs)


def test_trussness_consistent_with_k_truss(spark):
    """Edges with trussness ≥ k must be exactly the k-truss edge set."""
    from llama_spark.operators.truss import k_truss, trussness

    pairs = TRUSS_GRAPHS[0]
    t = trussness(edges_df(spark, pairs))
    for k in (3, 4):
        via_t = {
            (r["src"], r["dst"])
            for r in t.filter(f"trussness >= {k}").collect()
        }
        direct = {
            (r["src"], r["dst"])
            for r in k_truss(edges_df(spark, pairs), k=k).collect()
        }
        assert via_t == direct


# ------------------------------------------------------ decremental CC

def test_cc_decremental_split_and_untouched(spark):
    from llama_spark.operators.components import (
        connected_components,
        connected_components_decremental,
    )

    # component A: chain 0-1-2-3 (deleting 1-2 splits it);
    # component B: triangle 10-11-12 (untouched);
    # node 20-21 edge fully deleted → 20,21 leave the node set
    full = edges_df(
        spark, [(0, 1), (1, 2), (2, 3), (10, 11), (11, 12), (12, 10), (20, 21)]
    )
    kept = edges_df(spark, [(0, 1), (2, 3), (10, 11), (11, 12), (12, 10)])
    deleted = edges_df(spark, [(1, 2), (20, 21)])

    prior = connected_components(full)
    got = {
        r["id"]: r["component"]
        for r in connected_components_decremental(kept, deleted, prior).collect()
    }
    cold = {
        r["id"]: r["component"] for r in connected_components(kept).collect()
    }
    assert got == cold
    assert got == {0: 0, 1: 0, 2: 2, 3: 2, 10: 10, 11: 10, 12: 10}


def test_neighbor_mean_embeddings_2hop(spark):
    from llama_spark.functions.similarity import neighbor_mean_embeddings

    # 0→1→2, 1→2: h1(1)=emb(2); h1(0)=mean(emb(1),emb(2)); h2(0)=h1(1)
    edges = edges_df(spark, [(0, 1), (0, 2), (1, 2)])
    emb = spark.createDataFrame(
        [(1, [2.0, 4.0]), (2, [6.0, 8.0])],
        "vec_id long, embedding array<float>",
    )
    got = {
        (r["id"], r["dim"]): r["mean_val"]
        for r in neighbor_mean_embeddings(edges, emb, dims=2, hops=2).collect()
    }
    # h2(0) = mean over {h1(1), h1(2)} — but node 2 has no out-neighbors
    # so it has no h1 row → h2(0) averages h1(1) alone = emb(2)
    assert got == {(0, 0): 6.0, (0, 1): 8.0}


# ---------------------------------------------- weighted multi-root SSSP

def test_multi_source_sssp_matches_single(spark):
    from llama_spark.operators.traversal import multi_source_sssp

    # weighted diamond + tail: 0→1 (w .5), 0→2 (w 3), 1→2 (w .5), 2→3 (w 1)
    e = edges_df(
        spark, [(0, 1, 0.5), (0, 2, 3.0), (1, 2, 0.5), (2, 3, 1.0)], weight=True
    )
    got = {
        (r["root"], r["id"]): r["dist"]
        for r in multi_source_sssp(e, roots=[0, 2]).collect()
    }
    # quantized: w=.5→65, 3.0→385, 1.0→129; 0→2 via 1 = 130 < 385
    assert got == {
        (0, 0): 0, (0, 1): 65, (0, 2): 130, (0, 3): 259,
        (2, 2): 0, (2, 3): 129,
    }


def test_weighted_closeness_values(spark):
    from llama_spark.operators.traversal import weighted_closeness_centrality

    e = edges_df(
        spark, [(0, 1, 0.5), (0, 2, 3.0), (1, 2, 0.5), (2, 3, 1.0)], weight=True
    )
    got = {
        r["id"]: (r["n_reached"], r["closeness"])
        for r in weighted_closeness_centrality(e, roots=[0, 3]).collect()
    }
    assert got[0] == (3, round(3 / (65 + 130 + 259), 6))
    assert got[3] == (0, 0.0)  # sink root: no out-reach
