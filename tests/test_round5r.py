"""Round-5 continuation-12: small-world sigma and URL canonicalization."""

from __future__ import annotations

import math

import duckdb
import pytest

from llama_spark.entry_queries import ORACLE, QUERIES

from .conftest import edges_df

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


# ------------------------------------------------------ small-world sigma


def _model_sigma(pairs, roots):
    und = {(min(u, v), max(u, v)) for u, v in pairs if u != v}
    nbr = {}
    for u, v in und:
        nbr.setdefault(u, set()).add(v)
        nbr.setdefault(v, set()).add(u)
    n, m = len(nbr), len(und)
    tri = sum(
        1
        for a, b in und
        for c in nbr[a] & nbr[b]
        if c > b
    )
    wed = sum(d * (d - 1) for d in map(len, nbr.values())) // 2
    c = round(3.0 * tri / wed, 6)
    sd = np = 0
    for r in roots:
        if r not in nbr:
            continue
        dist = {r: 0}
        frontier = [r]
        while frontier:
            nxt = []
            for u in frontier:
                for w in nbr[u]:
                    if w not in dist:
                        dist[w] = dist[u] + 1
                        nxt.append(w)
            frontier = nxt
        sd += sum(d for d in dist.values() if d > 0)
        np += sum(1 for d in dist.values() if d > 0)
    kbar = 2.0 * m / n
    c_rand = kbar / (n - 1)
    l_hat = sd / np
    l_rand = math.log(n) / math.log(kbar)
    return {
        "n_nodes": n,
        "n_edges": m,
        "c": c,
        "c_rand": round(c_rand, 6),
        "l_hat": round(l_hat, 6),
        "l_rand": round(l_rand, 6),
        "sigma": round((c / c_rand) / (l_hat / l_rand), 6),
    }


def test_small_world_sigma_matches_model(spark):
    import random

    from llama_spark.operators.traversal import small_world_sigma

    rng = random.Random(71)
    pairs = [
        (u, v)
        for u, v in {(rng.randrange(30), rng.randrange(30)) for _ in range(140)}
        if u != v
    ]
    got = small_world_sigma(edges_df(spark, pairs), roots=[0, 5, 999]).collect()[0]
    want = _model_sigma(pairs, [0, 5, 999])
    for k, v in want.items():
        if isinstance(v, int):
            assert got[k] == v, k
        else:
            assert got[k] == pytest.approx(v, abs=2e-6), k


def test_small_world_ring_lattice_is_small_worldless(spark):
    from llama_spark.operators.traversal import small_world_sigma

    # Watts-Strogatz k=4 ring lattice, n=20: clustered (C=0.5) but long
    # paths; a clique is maximally clustered with L=1
    n = 20
    ring = [(i, (i + 1) % n) for i in range(n)] + [(i, (i + 2) % n) for i in range(n)]
    r = small_world_sigma(edges_df(spark, ring), roots=[0, 7]).collect()[0]
    assert r.c == 0.5
    assert r.l_hat > 2.0
    clique = [(i, j) for i in range(8) for j in range(i + 1, 8)]
    rc = small_world_sigma(edges_df(spark, clique), roots=[0]).collect()[0]
    assert rc.c == 1.0 and rc.l_hat == 1.0


def test_small_world_matches_oracle_sf0001(spark):
    got = sorted(tuple(r) for r in QUERIES["small_world"](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE["small_world"]).fetchall())
    assert len(got) == len(want) == 1
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1]
        for a, b in zip(g[2:], w[2:]):
            assert a == pytest.approx(b, abs=2e-6)


# --------------------------------------------------- URL normalization


CASES = [
    # (input, canonical)
    ("HTTP://Example.COM/a/b/c?x=1", "http://example.com/a/b/c?x=1"),
    ("http://example.com:80/a/./b/../c#frag", "http://example.com/a/c"),
    ("HTTPS://Sub.Example.Com.:443/p/7/../q", "https://sub.example.com/p/q"),
    ("http://Example.com", "http://example.com/"),
    ("http://EXAMPLE.com//a/b/./c/../d?q=1#z", "http://example.com/a/b/d?q=1"),
    ("not a url 9", "not a url 9"),
    ("http://h/x/y/../../z", "http://h/z"),            # nested dot-dots
    ("https://h:8080/Keep/Case?A=b", "https://h:8080/Keep/Case?A=b"),  # non-default port kept
    ("http://h/p?", "http://h/p"),                      # bare '?' dropped
    ("http://h/p/.", "http://h/p/"),                    # trailing '/.'
]


def test_normalize_urls_cases(spark):
    from llama_spark.functions.search import normalize_urls

    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CASES)], "doc_id long, url string"
    )
    got = {r.doc_id: r.canonical for r in normalize_urls(df).collect()}
    for i, (u, want) in enumerate(CASES):
        assert got[i] == want, f"{u!r} -> {got[i]!r} != {want!r}"


def test_normalize_urls_idempotent(spark):
    from llama_spark.functions.search import normalize_urls

    df = spark.createDataFrame(
        [(i, c) for i, (_, c) in enumerate(CASES)], "doc_id long, url string"
    )
    got = {r.doc_id: r.canonical for r in normalize_urls(df).collect()}
    for i, (_, c) in enumerate(CASES):
        assert got[i] == c, "canonical form must be a fixed point"


def test_url_normalize_matches_oracle_sf0001(spark):
    from llama_spark.entry_queries_docs import DOCS_ORACLE, DOCS_QUERIES

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    got = sorted(tuple(r) for r in DOCS_QUERIES["url_normalize"](spark, SF).collect())
    want = sorted(tuple(r) for r in con.execute(DOCS_ORACLE["url_normalize"]).fetchall())
    assert got == want and len(got) > 0


# ------------------------------------------------ global efficiency


def test_global_efficiency_closed_forms(spark):
    from llama_spark.operators.traversal import global_efficiency

    # path 0-1-2-3, roots = all: Σ 1/d over ordered pairs =
    # 2·(3·1 + 2·1/2 + 1·1/3) = 26/3; E = (26/3)/(4·3)
    path = [(0, 1), (1, 2), (2, 3)]
    r = global_efficiency(edges_df(spark, path), roots=[0, 1, 2, 3]).collect()[0]
    assert (r.n_nodes, r.n_roots) == (4, 4)
    assert r.efficiency == pytest.approx(round((26 / 3) / 12, 6), abs=1e-9)
    # clique: every pair at distance 1 → E = 1
    clique = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    rc = global_efficiency(edges_df(spark, clique), roots=list(range(5))).collect()[0]
    assert rc.efficiency == 1.0


def test_global_efficiency_disconnection_lowers_it(spark):
    from llama_spark.operators.traversal import global_efficiency

    # two components: cross pairs contribute 0 (absent rows), same formula
    pairs = [(0, 1), (10, 11)]
    r = global_efficiency(edges_df(spark, pairs), roots=[0, 1, 10, 11]).collect()[0]
    # each root reaches exactly 1 other at distance 1: Σ = 4; denom 4·3
    assert r.efficiency == pytest.approx(round(4 / 12, 6), abs=1e-9)
    # absent root ignored in the denominator
    r2 = global_efficiency(edges_df(spark, pairs), roots=[0, 999]).collect()[0]
    assert r2.n_roots == 1
    assert r2.efficiency == pytest.approx(round(1 / 3, 6), abs=1e-9)


def test_global_efficiency_matches_oracle_sf0001(spark):
    got = sorted(tuple(r) for r in QUERIES["global_efficiency"](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE["global_efficiency"]).fetchall())
    assert len(got) == len(want) == 1
    assert got[0][:2] == want[0][:2]
    assert got[0][2] == pytest.approx(want[0][2], abs=2e-6)
