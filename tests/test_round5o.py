"""Round-5 continuation-9: Gonzalez k-center, dK-2 joint degree matrix,
c(k) clustering-by-degree — exact in-test models + sf0.001 oracle checks."""

from __future__ import annotations

import duckdb
import pytest

from llama_spark.entry_queries import ORACLE, QUERIES
from llama_spark.operators.kcenter import k_center

from .conftest import edges_df

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


# --------------------------------------------------------------- k-center


def _model_k_center(pairs, k):
    und = {(min(u, v), max(u, v)) for u, v in pairs if u != v}
    nodes = sorted({x for e in und for x in e})
    nbr = {v: set() for v in nodes}
    for u, v in und:
        nbr[u].add(v)
        nbr[v].add(u)

    def bfs(s):
        d = {s: 0}
        frontier = [s]
        while frontier:
            nxt = []
            for u in frontier:
                for w in nbr[u]:
                    if w not in d:
                        d[w] = d[u] + 1
                        nxt.append(w)
            frontier = nxt
        return d

    centers = [nodes[0]]
    dists = {centers[0]: bfs(centers[0])}
    while len(centers) < k:
        best = None  # (reached, -dist, id)
        for v in nodes:
            dv = min(
                (dists[c].get(v) for c in centers if v in dists[c]),
                default=None,
            )
            key = (dv is not None, -(dv if dv is not None else 0), v)
            if best is None or key < best:
                best = key
                pick = v
        if pick in centers:
            break
        centers.append(pick)
        dists[pick] = bfs(pick)

    out = {}
    for v in nodes:
        cands = [(dists[c][v], c) for c in centers if v in dists[c]]
        if cands:
            d, c = min(cands)
            out[v] = (c, d)
    return out


def test_k_center_matches_bruteforce(spark):
    import random

    rng = random.Random(21)
    pairs = [
        (u, v)
        for u, v in {(rng.randrange(40), rng.randrange(40)) for _ in range(70)}
        if u != v
    ]
    got = {r.id: (r.center, r.dist) for r in k_center(edges_df(spark, pairs), k=3).collect()}
    want = _model_k_center(pairs, 3)
    assert got == want
    assert len({c for c, _ in got.values()}) == 3


def test_k_center_two_cliques_picks_far_side(spark):
    # two triangles joined by a long path: the 2nd center lands at the far
    # end (max hop distance from center 0), and assignment splits at the
    # path midpoint by (dist, center-id) tie-break
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 6), (6, 7), (7, 5)]
    got = {r.id: (r.center, r.dist) for r in k_center(edges_df(spark, pairs), k=2).collect()}
    centers = {c for c, _ in got.values()}
    assert centers == {0, 6} or centers == {0, 7}
    assert got[0] == (0, 0)
    assert got[4][0] != 0 or got[4][1] <= 3


def test_k_center_k_exceeding_nodes_stops(spark):
    got = {r.id: (r.center, r.dist) for r in k_center(edges_df(spark, [(0, 1)]), k=5).collect()}
    assert got == {0: (0, 0), 1: (1, 0)}


def test_k_center_disconnected_prefers_unreached(spark):
    # second center must jump to the other component (min id there)
    pairs = [(0, 1), (10, 11), (11, 12)]
    got = {r.id: (r.center, r.dist) for r in k_center(edges_df(spark, pairs), k=2).collect()}
    assert got[10] == (10, 0)
    assert got[0] == (0, 0) and got[1] == (0, 1)
    assert got[12] == (10, 2)


def test_k_center_matches_oracle_sf0001(spark):
    got = sorted(tuple(r) for r in QUERIES["k_center"](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE["k_center"]).fetchall())
    assert got == want and len(got) > 0


# ------------------------------------------------------ joint degree matrix


def test_joint_degree_matrix_matches_bruteforce(spark):
    import random

    from llama_spark.graph import joint_degree_matrix

    rng = random.Random(2)
    pairs = [
        (u, v)
        for u, v in {(rng.randrange(30), rng.randrange(30)) for _ in range(120)}
        if u != v
    ]
    und = {(min(u, v), max(u, v)) for u, v in pairs}
    deg = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    want = {}
    for u, v in und:
        key = (min(deg[u], deg[v]), max(deg[u], deg[v]))
        want[key] = want.get(key, 0) + 1
    got = {
        (r.deg_lo, r.deg_hi): r.n_edges
        for r in joint_degree_matrix(edges_df(spark, pairs)).collect()
    }
    assert got == want
    assert sum(got.values()) == len(und)


def test_joint_degree_matrix_matches_oracle_sf0001(spark):
    got = sorted(tuple(r) for r in QUERIES["joint_degree_matrix"](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE["joint_degree_matrix"]).fetchall())
    assert got == want and len(got) > 0


# ---------------------------------------------------------- c(k) curve


def test_clustering_by_degree_closed_forms(spark):
    from llama_spark.graph import clustering_by_degree

    # triangle + pendant: node 2 has degree 3 (cc = 1/3), nodes 0,1 degree 2
    # (cc = 1), node 3 degree 1 (cc = 0)
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3)]
    got = {
        r.degree: (r.n_nodes, r.avg_coefficient)
        for r in clustering_by_degree(edges_df(spark, pairs)).collect()
    }
    assert got == {1: (1, 0.0), 2: (2, 1.0), 3: (1, 0.333333)}


def test_clustering_by_degree_consistent_with_local_clustering(spark):
    import random

    from llama_spark.graph import clustering_by_degree
    from llama_spark.operators.linkpred import local_clustering

    rng = random.Random(17)
    pairs = [
        (u, v)
        for u, v in {(rng.randrange(25), rng.randrange(25)) for _ in range(100)}
        if u != v
    ]
    per_node = local_clustering(edges_df(spark, pairs)).collect()
    by_deg = {}
    for r in per_node:
        by_deg.setdefault(r.degree, []).append(r.coefficient)
    want = {
        d: (len(v), round(sum(v) / len(v), 6)) for d, v in by_deg.items()
    }
    got = {
        r.degree: (r.n_nodes, r.avg_coefficient)
        for r in clustering_by_degree(edges_df(spark, pairs)).collect()
    }
    assert got == want


def test_clustering_by_degree_matches_oracle_sf0001(spark):
    got = sorted(tuple(r) for r in QUERIES["clustering_by_degree"](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE["clustering_by_degree"]).fetchall())
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1]
        assert g[2] == pytest.approx(w[2], abs=2e-6)


# ---- GraphSession API surface for continuation-7/8/9 operators ----


def test_graphsession_continuation_789_methods(spark):
    from llama_spark.api import GraphSession

    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    g = GraphSession(spark).from_edges(edges_df(spark, edges))
    assert g.lt_cascade(seed_mod=1000, rounds=3).count() >= 1
    assert g.cheirank(max_iter=3).count() == 4
    assert g.balance_census().count() == 1
    assert g.burt_constraint().count() == 4
    assert g.truncated_pagerank(max_iter=4).count() == 4
    assert g.eulerian_census().collect()[0].n_odd == 2
    assert g.k_center(k=2).count() == 4
    assert g.joint_degree_matrix().count() == 3
    assert g.clustering_by_degree().count() == 3
    contacts = spark.createDataFrame(
        [(0, 1, 5), (1, 2, 6), (2, 0, 7)], "src long, dst long, t long"
    )
    got = {r.motif: r.n for r in g.temporal_motifs(contacts, delta=10).collect()}
    assert got == {"cycle": 1}
