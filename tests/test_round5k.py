"""Continuation-4 operators: bridges / 2-edge-connected components."""

from __future__ import annotations

from tests.conftest import edges_df


def _ncomp(es, nodes):
    par = {n: n for n in nodes}

    def find(x):
        while par[x] != x:
            par[x] = par[par[x]]
            x = par[x]
        return x

    for a, b in es:
        ra, rb = find(a), find(b)
        if ra != rb:
            par[ra] = rb
    return len({find(n) for n in nodes})


def _brute_bridges(es, nodes):
    base = _ncomp(es, nodes)
    return sorted(e for e in es if _ncomp([x for x in es if x != e], nodes) > base)


# barbell: two triangles joined by a 2-path through node 6 — bridges are
# exactly the path edges (2,6) and (6,3); plus a pendant leaf 7 off node 0.
BARBELL = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 6), (6, 3), (0, 7)]


def test_bridges_barbell(spark):
    from llama_spark.operators.bridges import bridges, two_edge_components

    df = edges_df(spark, BARBELL)
    got = sorted((r.u, r.v) for r in bridges(df).collect())
    assert got == [(0, 7), (2, 6), (3, 6)]

    comp = {r.id: r.component for r in two_edge_components(df).collect()}
    # triangles collapse to their min id; cut vertices/leaves stay singletons
    assert comp == {0: 0, 1: 0, 2: 0, 3: 3, 4: 3, 5: 3, 6: 6, 7: 7}


def test_bridges_matches_brute_force(spark):
    from llama_spark.operators.bridges import bridges

    import random

    rng = random.Random(13)
    n, m = 18, 22
    es = set()
    while len(es) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            es.add((min(a, b), max(a, b)))
    es = sorted(es)
    nodes = sorted({x for e in es for x in e})
    df = edges_df(spark, es)
    got = sorted((r.u, r.v) for r in bridges(df).collect())
    assert got == _brute_bridges(es, nodes)


def test_bfs_forest_is_deterministic_tree(spark):
    from llama_spark.operators.bridges import bfs_forest

    df = edges_df(spark, BARBELL)
    rows = {r.id: r for r in bfs_forest(df).collect()}
    # one root per component (min id), parent NULL exactly there
    assert rows[0].parent is None and rows[0].depth == 0 and rows[0].root == 0
    assert all(r.parent is not None for i, r in rows.items() if i != 0)
    # parent = MIN neighbour one level up: node 2's parent is 0 (not 1)
    assert rows[2].parent == 0 and rows[2].depth == 1
    # depth increases by exactly 1 along parent links
    assert all(i == 0 or rows[i].depth == rows[r.parent].depth + 1 for i, r in rows.items())


def test_temporal_reachability_respects_time(spark):
    from llama_spark.operators.temporal import temporal_reachability

    # 0 -(t=10)-> 1 -(t=5)-> 2 : the t=5 contact happened BEFORE arrival at
    # 1, so 2 is only reachable via the later t=20 contact; 3 never is.
    contacts = spark.createDataFrame(
        [(0, 1, 10), (1, 2, 5), (1, 2, 20), (2, 3, 15)],
        "src long, dst long, t long",
    )
    got = {r.id: r.arrival for r in temporal_reachability(contacts, [0]).collect()}
    assert got == {0: 0, 1: 10, 2: 20}


def test_temporal_reachability_matches_brute_force(spark):
    import random

    from llama_spark.operators.temporal import temporal_reachability

    rng = random.Random(5)
    n, m = 12, 40
    cs = [
        (rng.randrange(n), rng.randrange(n), rng.randrange(1, 100))
        for _ in range(m)
    ]
    cs = [(a, b, t) for a, b, t in cs if a != b]
    sources = [0, 3]

    arr = {s: 0 for s in sources}
    changed = True
    while changed:
        changed = False
        for a, b, t in cs:
            if a in arr and t >= arr[a] and (b not in arr or t < arr[b]):
                arr[b] = t
                changed = True

    df = spark.createDataFrame(cs, "src long, dst long, t long")
    got = {r.id: r.arrival for r in temporal_reachability(df, sources).collect()}
    assert got == arr


def test_influence_max_matches_brute_force(spark):
    import random

    from llama_spark.operators.influence import influence_max

    rng = random.Random(11)
    n = 30
    es = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(50)})
    es = [(a, b) for a, b in es if a != b]
    df = edges_df(spark, es)

    # brute-force bounded-IC greedy: reach within H hops, exact marginal
    H, POOL, K = 3, 6, 3
    adj = {}
    for a, b in es:
        adj.setdefault(a, set()).add(b)
    outdeg = {a: len(v) for a, v in adj.items()}
    cands = sorted(outdeg, key=lambda x: (-outdeg[x], x))[:POOL]

    def reach(s):
        seen, frontier = {s}, {s}
        for _ in range(H):
            frontier = {w for u in frontier for w in adj.get(u, ())} - seen
            seen |= frontier
        return seen

    covered, want = set(), []
    for step in range(1, K + 1):
        remaining = [c for c in cands if c not in {s for s, _, _ in want}]
        best = max(remaining, key=lambda c: (len(reach(c) - covered), -c))
        want.append((best, step, len(reach(best) - covered)))
        covered |= reach(best)

    got = sorted(
        (r.seed, r.step, r.gain)
        for r in influence_max(df, k=K, pool=POOL, horizon=H).collect()
    )
    assert got == sorted(want)


def test_resolve_redirects_chains_and_cycles(spark):
    from llama_spark.operators.redirects import resolve_redirects

    # a→b→c (c terminal), d→e→d (2-cycle), f→f would be a self-cycle but
    # the map is functional so test a long chain instead: g→h→i→c
    m = spark.createDataFrame(
        [("a", "b"), ("b", "c"), ("d", "e"), ("e", "d"), ("g", "h"), ("h", "i"), ("i", "c")],
        "src string, dst string",
    )
    rows = {r.url: (r.final, r.hops, r.resolved) for r in resolve_redirects(m).collect()}
    assert rows["a"] == ("c", 2, True)
    assert rows["b"] == ("c", 1, True)
    assert rows["c"] == ("c", 0, True)
    assert rows["g"] == ("c", 3, True)
    assert rows["d"] == (None, None, False)
    assert rows["e"] == (None, None, False)


def test_resolve_redirects_chain_longer_than_horizon(spark):
    from llama_spark.operators.redirects import resolve_redirects

    chain = [(f"u{i}", f"u{i+1}") for i in range(10)]  # 10 hops
    m = spark.createDataFrame(chain, "src string, dst string")
    # 2^2 = 4 < 10 → the head cannot resolve within the horizon
    rows = {r.url: r.resolved for r in resolve_redirects(m, max_doublings=2).collect()}
    assert rows["u0"] is False and rows["u9"] is True
    # 2^4 = 16 ≥ 10 → everything resolves
    rows = {r.url: (r.final, r.hops) for r in resolve_redirects(m, max_doublings=4).collect()}
    assert rows["u0"] == ("u10", 10)


def test_phrase_search_exact_positions(spark):
    from llama_spark.functions.search import phrase_search

    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox the quick brown dog"),
            (2, "quick brown"),
            (3, "the quick red fox"),
            (4, "brown quick the"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(docs, "quick brown").collect()
    }
    assert got == {1: (2, 2), 2: (1, 1)}
    # 3-word phrase spans the repeat boundary only once
    got = {
        r.doc_id: (r.n_matches, r.first_pos)
        for r in phrase_search(docs, "quick brown fox").collect()
    }
    assert got == {1: (1, 2)}


def test_articulation_points_barbell_and_bowtie(spark):
    from llama_spark.operators.bridges import articulation_points, biconnected_blocks

    got = sorted(r.id for r in articulation_points(edges_df(spark, BARBELL)).collect())
    assert got == [0, 2, 3, 6]

    # bowtie: two triangles sharing vertex 0 — 0 is the only cut vertex,
    # and the blocks are exactly the two triangles
    bowtie = [(0, 1), (1, 2), (2, 0), (0, 3), (3, 4), (4, 0)]
    df = edges_df(spark, bowtie)
    assert sorted(r.id for r in articulation_points(df).collect()) == [0]
    blocks = {}
    for r in biconnected_blocks(df).collect():
        blocks.setdefault(r.block, set()).add((r.u, r.v))
    assert len(blocks) == 2
    assert {frozenset(b) for b in blocks.values()} == {
        frozenset({(0, 1), (1, 2), (0, 2)}),
        frozenset({(0, 3), (3, 4), (0, 4)}),
    }


def test_articulation_points_matches_brute_force(spark):
    import random

    from llama_spark.operators.bridges import articulation_points

    def ncomp(es, nodes):
        par = {n: n for n in nodes}

        def find(x):
            while par[x] != x:
                par[x] = par[par[x]]
                x = par[x]
            return x

        for a, b in es:
            ra, rb = find(a), find(b)
            if ra != rb:
                par[ra] = rb
        return len({find(n) for n in nodes})

    rng = random.Random(29)
    n, m = 16, 20
    es = set()
    while len(es) < m:
        a, b = rng.randrange(n), rng.randrange(n)
        if a != b:
            es.add((min(a, b), max(a, b)))
    es = sorted(es)
    nodes = sorted({x for e in es for x in e})
    base = ncomp(es, nodes)
    want = sorted(
        v
        for v in nodes
        if ncomp([e for e in es if v not in e], [x for x in nodes if x != v]) > base
    )
    got = sorted(r.id for r in articulation_points(edges_df(spark, es)).collect())
    assert got == want


def test_weighted_betweenness_matches_model(spark):
    import heapq
    import math

    from llama_spark.operators.bc import weighted_betweenness_centrality

    # direct edge (0,3,w=2) beats 0→1→2→3? quantized: route choice depends
    # on exact integer weights — the model replays the same quantization
    edges = [
        (0, 1, 1.0), (1, 2, 1.0), (0, 2, 3.0), (2, 3, 1.0),
        (0, 3, 2.0), (3, 4, 1.0), (1, 4, 5.0),
    ]
    roots = [0, 1]
    res = 128
    adj: dict = {}
    for a, b, w in edges:
        adj.setdefault(a, []).append((b, math.floor(w * res) + 1))

    def brandes(root):
        dist = {root: 0}
        pq = [(0, root)]
        while pq:
            d, u = heapq.heappop(pq)
            if d > dist.get(u, 10**18):
                continue
            for v, w in adj.get(u, ()):
                if d + w < dist.get(v, 10**18):
                    dist[v] = d + w
                    heapq.heappush(pq, (d + w, v))
        dag: dict = {}
        for u in dist:
            for v, w in adj.get(u, ()):
                if v in dist and dist[u] + w == dist[v]:
                    dag.setdefault(u, []).append(v)
        sigma = {v: 0 for v in dist}
        sigma[root] = 1
        order = sorted(dist, key=lambda v: dist[v])
        for u in order:
            for v in dag.get(u, ()):
                sigma[v] += sigma[u]
        delta = {v: 0.0 for v in dist}
        for u in reversed(order):
            for v in dag.get(u, ()):
                delta[u] += sigma[u] / sigma[v] * (1 + delta[v])
        return delta

    want: dict = {}
    for r in roots:
        for v, x in brandes(r).items():
            if v != r:
                want[v] = want.get(v, 0.0) + x
    df = edges_df(spark, edges, weight=True)
    got = {
        r.id: round(r.bc, 9)
        for r in weighted_betweenness_centrality(df, roots).collect()
    }
    nodes = sorted({x for a, b, _ in edges for x in (a, b)})
    assert got == {v: round(want.get(v, 0.0), 9) for v in nodes}


def test_leakage_safe_splits_cluster_coherent(spark):
    from llama_spark.functions.cluster import leakage_safe_splits

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = spark.createDataFrame(
        [
            (0, base),                      # near-dup cluster {0,1,2}
            (1, base + " lambda"),
            (2, base + " mu"),
            (10, "completely different words here about spark engines"),
            (11, "another unrelated document mentioning graphs and joins"),
        ],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in leakage_safe_splits(docs, threshold=0.3).collect()}
    assert len(rows) == 5
    # the near-dup trio shares a cluster AND therefore a split
    assert rows[0].cluster == rows[1].cluster == rows[2].cluster == 0
    assert rows[0].split == rows[1].split == rows[2].split
    # singletons cluster to themselves
    assert rows[10].cluster == 10 and rows[11].cluster == 11
    # split is a pure function of the cluster id (stability contract)
    from llama_spark.functions.cluster import dataset_splits

    ref = {
        r.doc_id: r.split
        for r in dataset_splits(
            spark.createDataFrame([(0,), (10,), (11,)], "doc_id long")
        ).collect()
    }
    assert rows[0].split == ref[0]
    assert rows[10].split == ref[10] and rows[11].split == ref[11]
