"""Round-5 continuation-5: the nine TPC-H completion gates (q2 q7 q8 q9
q11 q15 q16 q20 q21) cross-checked against their DuckDB oracles at
sf0.001, plus semantic spot-checks of the adapted predicates."""

from __future__ import annotations

import duckdb
import pytest

from llama_spark.entry_queries import ORACLE, QUERIES

SF = "/root/testdata/sf0.001"
TABLES = ("region", "nation", "customer", "supplier", "part", "orders", "lineitem")
NEW_TPCH = (
    "tpch_q2", "tpch_q7", "tpch_q8", "tpch_q9", "tpch_q11",
    "tpch_q15", "tpch_q16", "tpch_q20", "tpch_q21",
)


def _duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("key", NEW_TPCH)
def test_tpch_completion_matches_oracle_sf0001(spark, key):
    got = sorted(tuple(r) for r in QUERIES[key](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE[key]).fetchall())
    assert got, f"{key} returned no rows at sf0.001"
    assert got == want


def test_tpch_q21_sole_late_supplier_semantics(spark):
    """Every reported supplier line must be on a finished order with at
    least one OTHER supplier, none of whom also shipped late."""
    rows = QUERIES["tpch_q21"](spark, SF).collect()
    con = _duck()
    # recompute the waited set row-by-row in plain SQL and compare totals
    total = con.execute(
        """
        SELECT COUNT(*) FROM lineitem l1
        JOIN orders o ON l1.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
          AND EXISTS (SELECT 1 FROM lineitem l2
                      WHERE l2.l_orderkey = l1.l_orderkey
                        AND l2.l_suppkey <> l1.l_suppkey)
          AND NOT EXISTS (SELECT 1 FROM lineitem l3
                          WHERE l3.l_orderkey = l1.l_orderkey
                            AND l3.l_suppkey <> l1.l_suppkey
                            AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
        """
    ).fetchone()[0]
    assert sum(r["numwait"] for r in rows) == total


def test_tpch_q15_max_revenue_equality(spark):
    """The returned supplier(s) carry exactly the quarter's max revenue —
    the decimal-exact equality the gate relies on."""
    rows = QUERIES["tpch_q15"](spark, SF).collect()
    assert len({round(r["total_revenue"], 4) for r in rows}) == 1


# ---- ANF average distance + vertex cover composes ----


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src long, dst long")


def test_average_distance_composes_from_neighborhood_function(spark):
    """avg_distance must equal the hand-computed Σ t·gain / Σ gain over
    the neighborhood_function rows (same graph, same sketch params)."""
    from llama_spark.operators.anf import average_distance, neighborhood_function

    pairs = [(i, i + 1) for i in range(12)] + [(3, 9), (0, 6)]
    nf = sorted(
        (r["t"], r["avg_reach"])
        for r in neighborhood_function(_edges(spark, pairs), max_t=5).collect()
    )
    gains = [(t, nf[i + 1][1] - nf[i][1]) for i, (t, _) in enumerate(nf[:-1])]
    want = round(
        sum((t + 1) * g for t, g in gains) / sum(g for _, g in gains), 6
    )
    got = average_distance(_edges(spark, pairs), max_t=5).collect()[0][
        "avg_distance"
    ]
    assert got == pytest.approx(want, abs=1e-9)
    assert 1.0 <= got <= 5.0  # a path's mean distance is within hop range


def test_vertex_cover_covers_every_edge_and_is_2x_matching(spark):
    from llama_spark.operators.matching import maximal_matching, vertex_cover

    pairs = [(0, 1), (1, 2), (2, 3), (3, 4), (4, 0), (2, 5), (6, 7)]
    cover = {r["id"] for r in vertex_cover(_edges(spark, pairs)).collect()}
    m = maximal_matching(_edges(spark, pairs)).collect()
    assert len(cover) == 2 * len(m)
    for u, v in pairs:
        assert u in cover or v in cover, f"edge ({u},{v}) uncovered"


# ---- Count-Min sketch ----


def test_cms_estimates_match_model_and_overestimate(spark):
    """Exact replay of the md5 lanes in python; n_est ≥ n always, and
    with a wide sketch (no collisions among these tokens) n_est == n."""
    import hashlib
    from collections import Counter

    from llama_spark.functions.sketch import cms_token_estimates

    docs = [
        (0, "alpha beta gamma alpha"),
        (1, "beta beta delta"),
        (2, "alpha epsilon zeta beta"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")

    def lane(tok, r, w):
        return int(hashlib.md5(f"{tok}:cms{r}".encode()).hexdigest()[:15], 16) % w

    toks = [t for _, s in docs for t in s.lower().split()]
    exact = Counter(toks)

    for width in (4, 4096):  # tiny → collisions; wide → exact
        counters = Counter()
        for t in toks:
            for r in range(4):
                counters[(r, lane(t, r, width))] += 1
        got = {
            r["tok"]: (r["n"], r["n_est"])
            for r in cms_token_estimates(df, depth=4, width=width, k=10).collect()
        }
        assert set(got) == set(exact)
        for t, (n, n_est) in got.items():
            assert n == exact[t]
            want_est = min(counters[(r, lane(t, r, width))] for r in range(4))
            assert n_est == want_est
            assert n_est >= n  # CMS one-sided guarantee
        if width == 4096:
            assert all(n_est == n for n, n_est in got.values())


# ---- temporal (windowed-decay) PageRank ----


def _tpr_model(contacts, windows=3, d=0.85):
    tmin = min(t for *_ , t in contacts)
    den = max(t for *_, t in contacts) - tmin + 1
    nodes = sorted({u for u, v, t in contacts} | {v for u, v, t in contacts})
    ew = {}
    for u, v, t in contacts:
        if u != v:
            ew.setdefault(((t - tmin) * windows) // den, set()).add((u, v))
    r = {x: 1.0 / len(nodes) for x in nodes}
    for w in range(windows):
        deg = {}
        for u, v in ew.get(w, ()):
            deg[u] = deg.get(u, 0) + 1
        g = {x: 0.0 for x in nodes}
        for u, v in ew.get(w, ()):
            g[v] += r[u] / deg[u]
        r = {x: (1 - d) / len(nodes) + d * g[x] for x in nodes}
    return r


def test_temporal_pagerank_matches_model_and_is_order_sensitive(spark):
    from llama_spark.operators.temporal import temporal_pagerank

    # early window: 1->2 heavily; late window: 3->4
    contacts = [
        (1, 2, 0), (1, 2, 5), (5, 2, 10), (2, 3, 40), (3, 4, 80), (5, 4, 95),
    ]
    df = spark.createDataFrame(contacts, "src long, dst long, t long")
    got = {
        r["id"]: r["rank"]
        for r in temporal_pagerank(df, windows=3).collect()
    }
    want = _tpr_model(contacts, windows=3)
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], abs=1e-12)

    # reversing time must change the answer (recency decay is real):
    rev = [(u, v, 95 - t) for u, v, t in contacts]
    got_rev = {
        r["id"]: r["rank"]
        for r in temporal_pagerank(
            spark.createDataFrame(rev, "src long, dst long, t long"), windows=3
        ).collect()
    }
    assert any(abs(got_rev[k] - got[k]) > 1e-9 for k in got)
    # late-window target 4 outranks early-window target 2 in forward time
    assert got[4] > got[2]


# ---- GraphSession facade for the continuation-6 operators ----


def test_graphsession_continuation6_surface(spark):
    from llama_spark.api import GraphSession

    pairs = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    g = GraphSession(spark).from_edges(
        spark.createDataFrame(pairs, "src long, dst long")
    )
    r = g.max_flow(0, 3)
    assert r.flow == 2 and r.converged
    assert g.vertex_cover().count() > 0
    assert g.average_distance(max_t=4).count() == 1
    contacts = spark.createDataFrame(
        [(0, 1, 10), (1, 2, 20)], "src long, dst long, t long"
    )
    assert g.temporal_pagerank(contacts, windows=2).count() == 3
