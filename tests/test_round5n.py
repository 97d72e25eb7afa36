"""Round-5 continuation-8: temporal triangle motifs, Burt constraint,
truncated PageRank, Eulerian census — each vs an exact in-test model,
plus sf0.001 oracle cross-checks."""

from __future__ import annotations

import duckdb
import pytest

from llama_spark.entry_queries import ORACLE, QUERIES

from .conftest import edges_df

SF = "/root/testdata/sf0.001"
TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events",
)


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


# ------------------------------------------------- temporal motifs


def _model_motifs(contacts, delta):
    cs = sorted({(u, v, t) for u, v, t in contacts if u != v})
    out = {"cycle": 0, "ffl": 0}
    for a, b, t1 in cs:
        for b2, c, t2 in cs:
            if b2 != b or c == a or not (t1 < t2 <= t1 + delta):
                continue
            for x, y, t3 in cs:
                if not (t2 < t3 <= t1 + delta):
                    continue
                if x == c and y == a:
                    out["cycle"] += 1
                elif x == a and y == c:
                    out["ffl"] += 1
    return {k: v for k, v in out.items() if v}


def _contacts_df(spark, rows):
    return spark.createDataFrame(rows, "src long, dst long, t long")


def test_temporal_motifs_matches_bruteforce(spark):
    import random

    from llama_spark.operators.temporal import temporal_triangle_motifs

    rng = random.Random(5)
    rows = [
        (rng.randrange(12), rng.randrange(12), rng.randrange(200))
        for _ in range(150)
    ]
    got = {
        r.motif: r.n
        for r in temporal_triangle_motifs(_contacts_df(spark, rows), delta=40).collect()
    }
    want = _model_motifs(rows, 40)
    assert got == want
    assert want, "model must find at least one motif for the test to bite"


def test_temporal_motifs_window_and_order_bite(spark):
    from llama_spark.operators.temporal import temporal_triangle_motifs

    # a→b @0, b→c @5, c→a @9: cycle within δ=10; the reverse-closure a→c
    # @9 would be ffl. Tight δ=8 kills it (span 9 > 8).
    rows = [(1, 2, 0), (2, 3, 5), (3, 1, 9)]
    got = {r.motif: r.n for r in temporal_triangle_motifs(_contacts_df(spark, rows), delta=10).collect()}
    assert got == {"cycle": 1}
    got = {r.motif: r.n for r in temporal_triangle_motifs(_contacts_df(spark, rows), delta=8).collect()}
    assert got == {}
    # out-of-order closing edge (t3 < t2) never counts
    rows = [(1, 2, 0), (2, 3, 5), (1, 3, 3)]
    got = {r.motif: r.n for r in temporal_triangle_motifs(_contacts_df(spark, rows), delta=10).collect()}
    assert got == {}


def test_temporal_motifs_bucket_boundary(spark):
    from llama_spark.operators.temporal import temporal_triangle_motifs

    # successor lands exactly one δ after: t2 = t1 + δ is INSIDE the
    # window (≤) but in bucket b1+1 — the exploded second bucket must
    # catch it
    rows = [(1, 2, 0), (2, 3, 10), (1, 3, 10)]  # t3 == t2 → excluded
    got = {r.motif: r.n for r in temporal_triangle_motifs(_contacts_df(spark, rows), delta=10).collect()}
    assert got == {}
    rows = [(1, 2, 3), (2, 3, 13), (3, 1, 13)]  # t3 == t2 again → excluded
    got = {r.motif: r.n for r in temporal_triangle_motifs(_contacts_df(spark, rows), delta=10).collect()}
    assert got == {}
    rows = [(1, 2, 4), (2, 3, 13), (3, 1, 14)]  # spans buckets 0,1,1; within δ
    got = {r.motif: r.n for r in temporal_triangle_motifs(_contacts_df(spark, rows), delta=10).collect()}
    assert got == {"cycle": 1}


def test_temporal_motifs_matches_oracle_sf0001(spark):
    got = sorted(tuple(r) for r in QUERIES["temporal_motifs"](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE["temporal_motifs"]).fetchall())
    assert got == want


# ------------------------------------------------- Burt constraint


def _model_burt(pairs):
    und = {(min(u, v), max(u, v)) for u, v in pairs if u != v}
    nbr: dict[int, set[int]] = {}
    for u, v in und:
        nbr.setdefault(u, set()).add(v)
        nbr.setdefault(v, set()).add(u)
    out = {}
    for i, ni in nbr.items():
        p_i = 1.0 / len(ni)
        total = 0.0
        for j in ni:
            ind = sum(
                p_i * (1.0 / len(nbr[q])) for q in ni & nbr[j] if q not in (i, j)
            )
            total += (p_i + ind) ** 2
        out[i] = round(total, 6)
    return out


def test_burt_constraint_matches_bruteforce(spark):
    import random

    from llama_spark.operators.triangles import burt_constraint

    rng = random.Random(9)
    pairs = [
        (u, v)
        for u, v in {(rng.randrange(25), rng.randrange(25)) for _ in range(110)}
        if u != v
    ]
    got = {r.id: r.constraint for r in burt_constraint(edges_df(spark, pairs)).collect()}
    want = _model_burt(pairs)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6)


def test_burt_constraint_closed_triad_vs_star(spark):
    from llama_spark.operators.triangles import burt_constraint

    # closed triangle: every vertex fully constrained
    # (p=1/2, indirect=1/4 → (3/4)²·2 = 1.125)
    tri = [(1, 2), (2, 3), (1, 3)]
    got = {r.id: r.constraint for r in burt_constraint(edges_df(spark, tri)).collect()}
    assert got == {1: 1.125, 2: 1.125, 3: 1.125}
    # star center brokers three disconnected alters: constraint 3·(1/3)² = 1/3
    star = [(0, 1), (0, 2), (0, 3)]
    got = {r.id: r.constraint for r in burt_constraint(edges_df(spark, star)).collect()}
    assert got[0] == pytest.approx(1.0 / 3.0, abs=1e-6)
    assert got[1] == 1.0  # pendant: single tie, p=1, no indirect


def test_burt_constraint_matches_oracle_sf0001(spark):
    got = sorted(tuple(r) for r in QUERIES["burt_constraint"](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE["burt_constraint"]).fetchall())
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g[0] == w[0]
        assert g[1] == pytest.approx(w[1], abs=2e-6)


# ---------------------------------------------- truncated PageRank


def _model_truncated(pairs, damping=0.85, truncate=2, iters=8):
    edges = {(u, v) for u, v in pairs if u != v}
    nodes = sorted({x for e in edges for x in e})
    idx = {v: i for i, v in enumerate(nodes)}
    n = len(nodes)
    out = [0] * n
    for u, _ in edges:
        out[idx[u]] += 1
    x = [1.0 / n] * n
    acc = [0.0] * n
    for t in range(1, iters + 1):
        nx = [0.0] * n
        for u, v in edges:
            nx[idx[v]] += x[idx[u]] / out[idx[u]]
        x = nx
        if t > truncate:
            coef = ((1.0 - damping) / n) * damping**t
            acc = [a + coef * xx for a, xx in zip(acc, x)]
    return {v: round(acc[idx[v]] * n, 6) for v in nodes}


def test_truncated_pagerank_matches_model(spark):
    import random

    from llama_spark.operators.pagerank import truncated_pagerank

    rng = random.Random(13)
    pairs = [
        (u, v)
        for u, v in {(rng.randrange(20), rng.randrange(20)) for _ in range(70)}
        if u != v
    ]
    got = {r.id: r.trunc_rank for r in truncated_pagerank(edges_df(spark, pairs)).collect()}
    want = _model_truncated(pairs)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=2e-6)


def test_truncated_pagerank_zeroes_close_support(spark):
    from llama_spark.operators.pagerank import truncated_pagerank

    # 0→1: node 1's only supporter is 1 hop away; with truncate ≥ diameter
    # every path-mass term is dropped and all scores are 0
    got = {
        r.id: r.trunc_rank
        for r in truncated_pagerank(edges_df(spark, [(0, 1)]), truncate=8, max_iter=8).collect()
    }
    assert got == {0: 0.0, 1: 0.0}
    # with truncate=0 the t=1 term survives: node 1 gets mass, node 0 none
    got = {
        r.id: r.trunc_rank
        for r in truncated_pagerank(edges_df(spark, [(0, 1)]), truncate=0, max_iter=8).collect()
    }
    assert got[1] > 0.0 == got[0]


def test_truncated_pagerank_matches_oracle_sf0001(spark):
    got = sorted(tuple(r) for r in QUERIES["truncated_pagerank"](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE["truncated_pagerank"]).fetchall())
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g[0] == w[0]
        assert g[1] == pytest.approx(w[1], abs=2e-6)


# ------------------------------------------------- Eulerian census


def _census(spark, pairs):
    from llama_spark.operators.components import eulerian_census

    return eulerian_census(edges_df(spark, pairs)).collect()[0]


def test_eulerian_cycle_graph_has_circuit(spark):
    r = _census(spark, [(0, 1), (1, 2), (2, 3), (3, 0)])
    assert (r.n_odd, r.n_components, r.has_circuit, r.has_path) == (0, 1, True, True)


def test_eulerian_path_graph_has_path_not_circuit(spark):
    r = _census(spark, [(0, 1), (1, 2), (2, 3)])
    assert (r.n_odd, r.has_circuit, r.has_path) == (2, False, True)


def test_eulerian_koenigsberg_has_neither(spark):
    # the 1736 multigraph collapses to a simple graph here; this K4-minus
    # variant keeps 4 odd vertices: star + path
    r = _census(spark, [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (0, 4)])
    assert r.n_odd == 4 and not r.has_circuit and not r.has_path


def test_eulerian_two_components_blocks_even_graph(spark):
    r = _census(spark, [(0, 1), (1, 2), (2, 0), (10, 11), (11, 12), (12, 10)])
    assert (r.n_odd, r.n_components, r.has_circuit, r.has_path) == (0, 2, False, False)


def test_eulerian_matches_oracle_sf0001(spark):
    got = sorted(tuple(r) for r in QUERIES["eulerian"](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE["eulerian"]).fetchall())
    assert got == want
