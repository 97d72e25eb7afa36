"""Round-5 continuation-11: motif (triangle) spectral embedding and
temperature-flattened mixture weights."""

from __future__ import annotations

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


# ------------------------------------------------------ motif adjacency


def test_motif_adjacency_counts_triangles_per_edge(spark):
    import random

    from llama_spark.operators.truss import motif_adjacency

    rng = random.Random(51)
    pairs = [
        (u, v)
        for u, v in {(rng.randrange(18), rng.randrange(18)) for _ in range(80)}
        if u != v
    ]
    und = {(min(u, v), max(u, v)) for u, v in pairs}
    nbr = {}
    for u, v in und:
        nbr.setdefault(u, set()).add(v)
        nbr.setdefault(v, set()).add(u)
    want = {}
    for u, v in und:
        t = len((nbr[u] & nbr[v]) - {u, v})
        if t:
            want[(u, v)] = t
            want[(v, u)] = t
    got = {
        (r.src, r.dst): r.w
        for r in motif_adjacency(edges_df(spark, pairs)).collect()
    }
    assert got == want
    assert want, "need triangles for the test to bite"


# ------------------------------------------------------- motif fiedler


def _model_motif_fiedler(pairs, iters=16):
    """Exact replication of the weighted deflated power iteration."""
    und = {(min(u, v), max(u, v)) for u, v in pairs if u != v}
    nbr = {}
    for u, v in und:
        nbr.setdefault(u, set()).add(v)
        nbr.setdefault(v, set()).add(u)
    w = {}
    for u, v in und:
        t = len((nbr[u] & nbr[v]) - {u, v})
        if t:
            w[(u, v)] = float(t)
            w[(v, u)] = float(t)
    nodes = sorted({x for e in w for x in e})
    d = {v: sum(w[(v, u)] for u in nodes if (v, u) in w) for v in nodes}
    sd = {v: d[v] ** 0.5 for v in nodes}
    s2 = sum(d.values())
    x = {
        v: ((v * 2654435761) % 1048576) / 1048576.0 - 0.5
        for v in nodes
    }
    for _ in range(iters):
        g = {
            v: sum(w[(u, v)] * (x[u] / sd[u]) for u in nodes if (u, v) in w)
            for v in nodes
        }
        y = {v: x[v] + g[v] / sd[v] for v in nodes}
        syd = sum(y[v] * sd[v] for v in nodes)
        syy = sum(y[v] * y[v] for v in nodes)
        pr = syd / s2
        nrm = (syy - 2 * pr * syd + pr * pr * s2) ** 0.5
        x = {v: (y[v] - pr * sd[v]) / nrm for v in nodes}
    top = max(nodes, key=lambda v: (abs(x[v]), -v))
    sign = 1.0 if x[top] >= 0 else -1.0
    return {v: (int(d[v]), x[v] * sign) for v in nodes}


def test_motif_fiedler_matches_model(spark):
    import random

    from llama_spark.operators.spectral import fiedler_vector_normalized
    from llama_spark.operators.truss import motif_adjacency

    rng = random.Random(61)
    pairs = [
        (u, v)
        for u, v in {(rng.randrange(16), rng.randrange(16)) for _ in range(70)}
        if u != v
    ]
    e = edges_df(spark, pairs)
    got = {
        r.id: (int(r.d), r.nfiedler)
        for r in fiedler_vector_normalized(
            e, max_iter=16, weighted_adj=motif_adjacency(e)
        ).collect()
    }
    want = _model_motif_fiedler(pairs)
    assert set(got) == set(want)
    for v in want:
        assert got[v][0] == want[v][0]
        assert got[v][1] == pytest.approx(want[v][1], abs=1e-8)


def test_motif_fiedler_splits_triangle_clusters(spark):
    from llama_spark.operators.spectral import fiedler_vector_normalized
    from llama_spark.operators.truss import motif_adjacency

    # two triangles joined by a bridge: the bridge closes no triangle, so
    # it vanishes from the motif graph and the embedding must separate
    # the clusters by sign (the Science-paper toy case)
    pairs = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3)]
    e = edges_df(spark, pairs)
    got = {
        r.id: r.nfiedler
        for r in fiedler_vector_normalized(
            e, max_iter=16, weighted_adj=motif_adjacency(e)
        ).collect()
    }
    assert set(got) == {0, 1, 2, 3, 4, 5}
    a = {got[0] > 0, got[1] > 0, got[2] > 0}
    b = {got[3] > 0, got[4] > 0, got[5] > 0}
    assert len(a) == 1 and len(b) == 1 and a != b


def test_motif_fiedler_matches_oracle_sf0001(spark):
    got = sorted(tuple(r) for r in QUERIES["motif_fiedler"](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE["motif_fiedler"]).fetchall())
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g[0] == w[0] and g[1] == w[1]
        assert g[2] == pytest.approx(w[2], abs=2e-6)


# -------------------------------------------------- temperature mixture


def test_temperature_mixture_model(spark):
    from llama_spark.functions.sample import temperature_mixture

    docs = spark.createDataFrame(
        [(i, "en" if i < 80 else ("fr" if i < 95 else "sw"), 100 + i) for i in range(100)],
        "doc_id long, lang string, n_chars long",
    )
    got = {
        r.lang: (r.n_docs, r.n_chars, r.share, r.weight)
        for r in temperature_mixture(docs, smoothing=0.7).collect()
    }
    shares = {"en": 0.8, "fr": 0.15, "sw": 0.05}
    alpha = 0.7
    z = sum(s**alpha for s in shares.values())
    for lang, s in shares.items():
        assert got[lang][2] == pytest.approx(s, abs=1e-9)
        assert got[lang][3] == pytest.approx(s**alpha / z, abs=2e-6)
    # T<1 flattens: tail gains weight over its natural share, head loses
    assert got["sw"][3] > shares["sw"]
    assert got["en"][3] < shares["en"]
    assert got["en"][1] == sum(100 + i for i in range(80))


def test_temperature_mixture_t1_is_proportional(spark):
    from llama_spark.functions.sample import temperature_mixture

    docs = spark.createDataFrame(
        [(i, "a" if i % 4 else "b", 10) for i in range(40)],
        "doc_id long, lang string, n_chars long",
    )
    got = {
        r.lang: (r.share, r.weight)
        for r in temperature_mixture(docs, smoothing=1.0).collect()
    }
    for lang, (share, weight) in got.items():
        assert weight == pytest.approx(share, abs=2e-6)


def test_temperature_mixture_matches_oracle_sf0001(spark):
    from llama_spark.entry_queries_docs import DOCS_ORACLE, DOCS_QUERIES

    con = duckdb.connect()
    con.execute(f"CREATE VIEW documents AS SELECT * FROM '{SF}/documents.parquet'")
    got = sorted(tuple(r) for r in DOCS_QUERIES["temperature_mixture"](spark, SF).collect())
    want = sorted(tuple(r) for r in con.execute(DOCS_ORACLE["temperature_mixture"]).fetchall())
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        assert g[3] == pytest.approx(w[3], abs=2e-6)
        assert g[4] == pytest.approx(w[4], abs=2e-6)
