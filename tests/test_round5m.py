"""Round-5 continuation-7: Linear Threshold cascade (KKT 2003 model #2)
vs an exact in-test synchronous model, plus the sf0.001 oracle cross-check."""

from __future__ import annotations

import duckdb
import pytest

from llama_spark.entry_queries import ORACLE, QUERIES
from llama_spark.operators.influence import lt_cascade

from .conftest import edges_df

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _model_lt(pairs, seed_mod, rounds, mod):
    """Exact synchronous LT reference: uniform 1/indeg weights,
    theta_num(v) = 1 + (v*131) % mod, integer activation test."""
    edges = {(u, v) for u, v in pairs if u != v}
    nodes = {u for u, _ in edges} | {v for _, v in edges}
    ind = {v: 0 for v in nodes}
    for _, v in edges:
        ind[v] += 1
    active = {v: 0 for v in nodes if v % seed_mod == 0}
    for r in range(1, rounds + 1):
        newly = {}
        for v in nodes:
            if v in active or ind[v] == 0:
                continue
            mass = sum(1 for (u, w) in edges if w == v and u in active)
            if mass * (mod + 1) >= ind[v] * (1 + (v * 131) % mod):
                newly[v] = r
        if not newly:
            break
        active.update(newly)
    return active


def test_lt_cascade_matches_bruteforce_model(spark):
    import random

    rng = random.Random(7)
    pairs = {(rng.randrange(40), rng.randrange(40)) for _ in range(160)}
    pairs = [(u, v) for u, v in pairs if u != v]
    got = {
        (r.id, r["round"])
        for r in lt_cascade(
            edges_df(spark, pairs), seed_mod=8, rounds=12, threshold_mod=10
        ).collect()
    }
    want = set(_model_lt(pairs, seed_mod=8, rounds=12, mod=10).items())
    assert got == want
    assert any(step > 0 for _, step in got), "cascade must actually spread"


def test_lt_cascade_chain_spreads_one_hop_per_round(spark):
    # chain 0→1→…→5, every indeg = 1 so any positive threshold fires at
    # one active in-neighbor; seed 0 ⇒ node i activates exactly at round i
    pairs = [(i, i + 1) for i in range(5)]
    got = {
        (r.id, r["round"])
        for r in lt_cascade(
            edges_df(spark, pairs), seed_mod=1000, rounds=8, threshold_mod=100
        ).collect()
    }
    assert got == {(i, i) for i in range(6)}


def test_lt_cascade_isolated_in_nodes_never_fire(spark):
    # nodes {5, 6, 1}: seed 5 (id%5==0); node 1 has indeg 0 and must stay
    # inactive despite the degenerate 0 ≥ 0 integer test; node 6 needs both
    # in-neighbors active (θ_num(6)=87, indeg 2) so it never fires either
    pairs = [(5, 6), (1, 6)]
    got = {
        (r.id, r["round"])
        for r in lt_cascade(
            edges_df(spark, pairs), seed_mod=5, rounds=4, threshold_mod=100
        ).collect()
    }
    ids = {i for i, _ in got}
    assert 5 in ids and 1 not in ids


def test_lt_cascade_matches_oracle_sf0001(spark):
    got = sorted(tuple(r) for r in QUERIES["lt_cascade"](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE["lt_cascade"]).fetchall())
    assert got == want
    assert len(got) > 0


# ----------------------------------------------------------------- cheirank


def _model_pagerank(pairs, damping=0.85, iters=10, reverse=False):
    """Dense numpy power iteration, dangling mass lost (pagerank.h:287-288)."""
    edges = {(u, v) for u, v in pairs if u != v}
    if reverse:
        edges = {(v, u) for u, v in edges}
    nodes = sorted({u for u, _ in edges} | {v for _, v in edges})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = [0] * n
    for u, _ in edges:
        out[idx[u]] += 1
    rank = [1.0 / n] * n
    for _ in range(iters):
        nxt = [(1.0 - damping) / n] * n
        for u, v in edges:
            nxt[idx[v]] += damping * rank[idx[u]] / out[idx[u]]
        rank = nxt
    return {v: rank[idx[v]] * n for v in nodes}


def test_cheirank_plane_matches_numpy_model(spark):
    import random

    from llama_spark.operators.pagerank import cheirank_plane

    rng = random.Random(11)
    pairs = [(u, v) for u, v in {(rng.randrange(25), rng.randrange(25)) for _ in range(90)} if u != v]
    got = {r.id: (r.pagerank, r.cheirank) for r in cheirank_plane(edges_df(spark, pairs), max_iter=8).collect()}
    pr = _model_pagerank(pairs, iters=8)
    cr = _model_pagerank(pairs, iters=8, reverse=True)
    assert set(got) == set(pr)
    for v in pr:
        assert got[v][0] == pytest.approx(pr[v], abs=1e-9)
        assert got[v][1] == pytest.approx(cr[v], abs=1e-9)


def test_cheirank_star_separates_hubs_from_authorities(spark):
    # 0 -> {1..6}: node 0 is the pure hub (high CheiRank, floor PageRank);
    # every leaf is a pure authority relative to it.
    from llama_spark.operators.pagerank import cheirank_plane

    pairs = [(0, i) for i in range(1, 7)]
    got = {r.id: (r.pagerank, r.cheirank) for r in cheirank_plane(edges_df(spark, pairs), max_iter=6).collect()}
    assert got[0][1] > got[1][1], "hub must out-rank leaves on CheiRank"
    assert got[1][0] > got[0][0], "leaf must out-rank hub on PageRank"
    assert got[1] == got[3], "leaves are symmetric"


def test_cheirank_matches_oracle_sf0001(spark):
    got = sorted(tuple(r) for r in QUERIES["cheirank"](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE["cheirank"]).fetchall())
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g[0] == w[0]
        assert g[1] == pytest.approx(w[1], abs=1e-6)
        assert g[2] == pytest.approx(w[2], abs=1e-6)


# ----------------------------------------------------------- balance census


def _model_balance(pairs):
    und = {(min(u, v), max(u, v)) for u, v in pairs if u != v}
    nodes = sorted({x for e in und for x in e})
    census = {}
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) not in und:
                continue
            for c in nodes[nodes.index(b) + 1:]:
                if (b, c) in und and (a, c) in und:
                    n_neg = sum(
                        (min(x, y) * 31 + max(x, y)) % 7 < 3
                        for x, y in ((a, b), (b, c), (a, c))
                    )
                    census[n_neg] = census.get(n_neg, 0) + 1
    return census


def test_balance_census_matches_bruteforce(spark):
    import random

    from llama_spark.operators.triangles import balance_census

    rng = random.Random(3)
    pairs = [(u, v) for u, v in {(rng.randrange(30), rng.randrange(30)) for _ in range(160)} if u != v]
    got = {r.n_neg: (r.n_triangles, r.balanced) for r in balance_census(edges_df(spark, pairs)).collect()}
    want = _model_balance(pairs)
    assert {k: v[0] for k, v in got.items()} == want
    for k, (_, bal) in got.items():
        assert bal == (k % 2 == 0)
    assert sum(want.values()) > 0, "need triangles for the test to bite"


def test_balance_census_matches_oracle_sf0001(spark):
    got = sorted(tuple(r) for r in QUERIES["balance_census"](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE["balance_census"]).fetchall())
    assert got == want and len(got) > 0
