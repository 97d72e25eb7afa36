"""Batched property tests for the round-5 continuation operators.

Per-example Spark jobs make classic hypothesis loops prohibitively slow,
so each property generates MANY seeded-random cases into ONE DataFrame
(or one pair of runs) and asserts the invariant over all of them — the
same adversarial coverage at one job's cost (the house pattern;
classic hypothesis drives the pure-python store model in
test_store_properties.py).
"""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from .conftest import edges_df


# ------------------------------------------------ URL normalization


def _messy_urls(n: int, seed: int) -> list[str]:
    rng = random.Random(seed)
    out = []
    for i in range(n):
        scheme = rng.choice(["http", "HTTP", "Http", "https", "HTTPS"])
        host = rng.choice(
            ["Example.COM", "sub.Example.com", "A.B.C", "x.y", "HOST"]
        ) + rng.choice(["", "."])
        port = rng.choice(["", ":80", ":443", ":8080"])
        segs = [
            rng.choice(["a", "b", "seg", ".", "..", "Case"])
            for _ in range(rng.randrange(0, 5))
        ]
        path = "/" + "/".join(segs) if segs else rng.choice(["", "/"])
        if rng.random() < 0.3:
            path = path.replace("/a", "//a", 1)
        query = rng.choice(["", "?", "?q=1", "?A=b&c=D"])
        frag = rng.choice(["", "#f", "#x/y?z"])
        out.append(f"{scheme}://{host}{port}{path}{query}{frag}")
    out += ["not a url", "ftp://H.o.St.:21/x/../y#f", "http://h"]
    return out


def test_normalize_urls_idempotent_and_invariant_bulk(spark):
    from llama_spark.functions.search import normalize_urls

    urls = _messy_urls(300, seed=5)
    df = spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )
    once = normalize_urls(df).select(
        "doc_id", F.col("canonical").alias("url")
    )
    twice = {r.doc_id: r.canonical for r in normalize_urls(once).collect()}
    first = {r.doc_id: r.canonical for r in normalize_urls(df).collect()}
    assert first == twice, "canonicalization must be idempotent"
    for i, u in enumerate(urls):
        c = first[i]
        if "://" not in u or not u.split("://")[0].isalpha():
            continue  # passthrough rows
        assert "#" not in c, (u, c)
        assert "/./" not in c, (u, c)
        assert not c.endswith("?"), (u, c)
        scheme, rest = c.split("://", 1)
        assert scheme == scheme.lower()
        hostpart = rest.split("/", 1)[0]
        assert hostpart == hostpart.lower()
        if scheme == "http":
            assert not hostpart.endswith(":80"), (u, c)
        if scheme == "https":
            assert not hostpart.endswith(":443"), (u, c)
        assert not hostpart.endswith("."), (u, c)


# ---------------------------------------------- LT cascade monotonicity


def test_lt_cascade_monotone_in_seed_set(spark):
    from llama_spark.operators.influence import lt_cascade

    rng = random.Random(205)
    pairs = [
        (u, v)
        for u, v in {(rng.randrange(48), rng.randrange(48)) for _ in range(220)}
        if u != v
    ]
    e = edges_df(spark, pairs)
    # seeds(id%8==0) ⊂ seeds(id%4==0): the LT model is monotone, so the
    # smaller seed set's activation set must be contained in the larger's,
    # and each shared activation can only happen EARLIER with more seeds
    small = {r.id: r["round"] for r in lt_cascade(e, seed_mod=8, rounds=10).collect()}
    big = {r.id: r["round"] for r in lt_cascade(e, seed_mod=4, rounds=10).collect()}
    assert set(small) <= set(big)
    for v, r_small in small.items():
        assert big[v] <= r_small, (v, big[v], r_small)


# ------------------------------------------- balance census mass identity


def test_balance_census_mass_equals_triangle_count(spark):
    from llama_spark.operators.triangles import balance_census, triangle_count

    rng = random.Random(215)
    pairs = [
        (u, v)
        for u, v in {(rng.randrange(35), rng.randrange(35)) for _ in range(240)}
        if u != v
    ]
    e = edges_df(spark, pairs)
    census = balance_census(e).collect()
    assert sum(r.n_triangles for r in census) == triangle_count(e)


# --------------------------------------------- dispersion upper bound


def test_edge_dispersion_bounded_by_cn_pairs(spark):
    from llama_spark.operators.linkpred import edge_dispersion

    rng = random.Random(225)
    pairs = [
        (u, v)
        for u, v in {(rng.randrange(25), rng.randrange(25)) for _ in range(170)}
        if u != v
    ]
    rows = edge_dispersion(edges_df(spark, pairs)).collect()
    assert rows
    for r in rows:
        assert 0 <= r.dispersion <= r.n_common * (r.n_common - 1) // 2


# ------------------------------------------ k-center radius 2-approx


def test_k_center_covers_within_double_optimum_bound(spark):
    from llama_spark.operators.kcenter import k_center

    rng = random.Random(235)
    pairs = [
        (u, v)
        for u, v in {(rng.randrange(40), rng.randrange(40)) for _ in range(90)}
        if u != v
    ]
    rows = k_center(edges_df(spark, pairs), k=4).collect()
    # Gonzalez guarantee: the greedy radius equals the LAST farthest
    # distance picked, and every assignment distance is ≤ that radius
    # (on each center's component); plus basic assignment sanity
    by_center = {}
    for r in rows:
        by_center.setdefault(r.center, []).append(r.dist)
    assert all(0 in d for d in by_center.values()), "center must self-assign at 0"
    radius = max(r.dist for r in rows)
    for r in rows:
        assert r.dist <= radius
