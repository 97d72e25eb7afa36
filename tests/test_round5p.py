"""Round-5 continuation-10: 3-node graphlet orbits, edge dispersion —
exact in-test models + sf0.001 oracle checks."""

from __future__ import annotations

import duckdb

from llama_spark.entry_queries import ORACLE, QUERIES

from .conftest import edges_df

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


def _und(pairs):
    und = {(min(u, v), max(u, v)) for u, v in pairs if u != v}
    nbr = {}
    for u, v in und:
        nbr.setdefault(u, set()).add(v)
        nbr.setdefault(v, set()).add(u)
    return und, nbr


# ---------------------------------------------------------- orbit counts


def _model_orbits(pairs):
    und, nbr = _und(pairs)
    out = {}
    for v, nv in nbr.items():
        o0 = len(nv)
        o3 = sum(
            1
            for s in nv
            for t in nv
            if s < t and (min(s, t), max(s, t)) in und
        )
        # wedge ends: v–u–w with w ∉ N(v) ∪ {v}
        o1 = sum(
            1
            for u in nv
            for w in nbr[u]
            if w != v and w not in nv
        )
        o2 = o0 * (o0 - 1) // 2 - o3
        out[v] = (o0, o1, o2, o3)
    return out


def test_orbit_counts_matches_bruteforce(spark):
    import random

    from llama_spark.operators.linkpred import orbit_counts

    rng = random.Random(31)
    pairs = [
        (u, v)
        for u, v in {(rng.randrange(25), rng.randrange(25)) for _ in range(100)}
        if u != v
    ]
    got = {
        r.id: (r.orbit0, r.orbit1, r.orbit2, r.orbit3)
        for r in orbit_counts(edges_df(spark, pairs)).collect()
    }
    assert got == _model_orbits(pairs)


def test_orbit_counts_closed_forms(spark):
    from llama_spark.operators.linkpred import orbit_counts

    # triangle + pendant at 2: node 2 (deg 3): 3 wedge-pairs − 1 triangle
    # = 2 centered wedges; its wedge-end count comes only via node 3's
    # neighbors... verified by hand below
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3)]
    got = {
        r.id: (r.orbit0, r.orbit1, r.orbit2, r.orbit3)
        for r in orbit_counts(edges_df(spark, pairs)).collect()
    }
    assert got[3] == (1, 2, 0, 0)   # 3–2–0 and 3–2–1 wedge ends
    assert got[2] == (3, 0, 2, 1)   # center of 2 open wedges (0–2–3, 1–2–3)
    assert got[0] == (2, 1, 0, 1)   # end of 0–2–3 only
    # orbit identities: Σorbit1 = 2·Σorbit2 (each open wedge has 2 ends,
    # 1 center); Σorbit3 = 3·T
    s1 = sum(v[1] for v in got.values())
    s2 = sum(v[2] for v in got.values())
    assert s1 == 2 * s2
    assert sum(v[3] for v in got.values()) == 3


def test_orbit_counts_matches_oracle_sf0001(spark):
    got = sorted(tuple(r) for r in QUERIES["orbit_counts"](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE["orbit_counts"]).fetchall())
    assert got == want and len(got) > 0


# -------------------------------------------------------- edge dispersion


def _model_dispersion(pairs):
    und, nbr = _und(pairs)
    out = {}
    for u, v in und:
        cn = (nbr[u] & nbr[v]) - {u, v}
        linked = sum(
            1
            for s in cn
            for t in cn
            if s < t and (s, t) in und
        )
        n = len(cn)
        out[(u, v)] = (n, n * (n - 1) // 2 - linked)
    return out


def test_edge_dispersion_matches_bruteforce(spark):
    import random

    from llama_spark.operators.linkpred import edge_dispersion

    rng = random.Random(41)
    pairs = [
        (u, v)
        for u, v in {(rng.randrange(20), rng.randrange(20)) for _ in range(90)}
        if u != v
    ]
    got = {
        (r.src, r.dst): (r.n_common, r.dispersion)
        for r in edge_dispersion(edges_df(spark, pairs)).collect()
    }
    want = _model_dispersion(pairs)
    assert got == want
    assert any(d > 0 for _, d in got.values()), "need dispersion to bite"


def test_edge_dispersion_embedded_vs_dispersed(spark):
    from llama_spark.operators.linkpred import edge_dispersion

    # (0,1) has CN {2,3}: in graph A 2-3 are linked (embedded, disp 0);
    # in graph B they are not (dispersed, disp 1)
    base = [(0, 1), (0, 2), (1, 2), (0, 3), (1, 3)]
    got_b = {
        (r.src, r.dst): r.dispersion
        for r in edge_dispersion(edges_df(spark, base)).collect()
    }
    assert got_b[(0, 1)] == 1
    got_a = {
        (r.src, r.dst): r.dispersion
        for r in edge_dispersion(edges_df(spark, base + [(2, 3)])).collect()
    }
    assert got_a[(0, 1)] == 0


def test_edge_dispersion_matches_oracle_sf0001(spark):
    got = sorted(tuple(r) for r in QUERIES["edge_dispersion"](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE["edge_dispersion"]).fetchall())
    assert got == want and len(got) > 0


def test_edge_dispersion_cap_truncates_deterministically(spark):
    from llama_spark.operators.linkpred import edge_dispersion

    # (0,1) has CN {2,3,4,5}, none adjacent: uncapped disp = C(4,2) = 6;
    # cap=2 keeps the two smallest ids {2,3} → disp = C(2,2) = 1
    pairs = [(0, 1)] + [(0, s) for s in (2, 3, 4, 5)] + [(1, s) for s in (2, 3, 4, 5)]
    full = {(r.src, r.dst): (r.n_common, r.dispersion)
            for r in edge_dispersion(edges_df(spark, pairs)).collect()}
    assert full[(0, 1)] == (4, 6)
    capped = {(r.src, r.dst): (r.n_common, r.dispersion)
              for r in edge_dispersion(edges_df(spark, pairs), max_common=2).collect()}
    assert capped[(0, 1)] == (2, 1)
    # adjacency among the KEPT pair still subtracts
    capped2 = {(r.src, r.dst): (r.n_common, r.dispersion)
               for r in edge_dispersion(edges_df(spark, pairs + [(2, 3)]),
                                        max_common=2).collect()}
    assert capped2[(0, 1)] == (2, 0)
