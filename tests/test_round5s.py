"""Round-5 continuation-13: Molloy-Reed robustness criterion and the
CSN power-law KS distance."""

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


def _degs(pairs):
    und = {(min(u, v), max(u, v)) for u, v in pairs if u != v}
    deg = {}
    for u, v in und:
        deg[u] = deg.get(u, 0) + 1
        deg[v] = deg.get(v, 0) + 1
    return deg


# ------------------------------------------------------- Molloy-Reed


def test_molloy_reed_matches_model(spark):
    import random

    from llama_spark.operators.percolation import molloy_reed

    rng = random.Random(81)
    pairs = [
        (u, v)
        for u, v in {(rng.randrange(30), rng.randrange(30)) for _ in range(120)}
        if u != v
    ]
    deg = _degs(pairs)
    n = len(deg)
    s1 = sum(deg.values())
    s2 = sum(d * d for d in deg.values())
    kappa = s2 / s1
    r = molloy_reed(edges_df(spark, pairs)).collect()[0]
    assert r.n_nodes == n
    assert r.k_mean == pytest.approx(round(s1 / n, 6), abs=1e-9)
    assert r.k2_mean == pytest.approx(round(s2 / n, 6), abs=1e-9)
    assert r.kappa == pytest.approx(round(kappa, 6), abs=1e-9)
    assert r.robust == (kappa > 2)
    assert r.f_c == pytest.approx(round(1 - 1 / (kappa - 1), 6), abs=1e-9)


def test_molloy_reed_ring_is_fragile_star_is_robust(spark):
    from llama_spark.operators.percolation import molloy_reed

    # 2-regular ring: kappa = 2 exactly → NOT robust, f_c = 0
    ring = [(i, (i + 1) % 10) for i in range(10)]
    r = molloy_reed(edges_df(spark, ring)).collect()[0]
    assert r.kappa == 2.0 and not r.robust and r.f_c == 0.0
    # star K1,9: hub degree dominates ⟨k²⟩ → robust to random failure
    star = [(0, i) for i in range(1, 10)]
    s = molloy_reed(edges_df(spark, star)).collect()[0]
    assert s.kappa > 2 and s.robust


def test_molloy_reed_matches_oracle_sf0001(spark):
    got = sorted(tuple(r) for r in QUERIES["molloy_reed"](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE["molloy_reed"]).fetchall())
    assert len(got) == len(want) == 1
    g, w = got[0], want[0]
    assert g[0] == w[0]
    for a, b in zip(g[1:5], w[1:5]):
        assert a == pytest.approx(b, abs=2e-6) if not isinstance(a, bool) else a == b
    assert g[5] == pytest.approx(w[5], abs=2e-6)


# ------------------------------------------------------- power-law KS


def _model_ks(pairs, d_min=4):
    deg = _degs(pairs)
    tail = sorted(d for d in deg.values() if d >= d_min)
    n = len(tail)
    lg = sum(math.log(d / d_min) for d in tail)
    alpha = 1.0 + n / lg
    from collections import Counter

    hist = Counter(tail)
    ds = sorted(hist, reverse=True)
    cum = 0
    dev = 0.0
    for d in ds:
        cum += hist[d]
        dev = max(dev, abs(cum / n - (d / d_min) ** (1.0 - alpha)))
    return n, round(alpha, 6), round(dev, 6)


def test_powerlaw_ks_matches_model(spark):
    import random

    from llama_spark.graph import powerlaw_ks

    rng = random.Random(91)
    # preferential-attachment-ish: biased endpoints give a heavy tail
    pairs = set()
    for i in range(400):
        u = rng.randrange(1 + i % 40)
        v = rng.randrange(60)
        if u != v:
            pairs.add((u, v))
    pairs = sorted(pairs)
    n, alpha, ks = _model_ks(pairs)
    r = powerlaw_ks(edges_df(spark, pairs)).collect()[0]
    assert (r.d_min, r.n_tail) == (4, n)
    assert r.alpha == pytest.approx(alpha, abs=2e-6)
    assert r.ks == pytest.approx(ks, abs=2e-6)


def test_powerlaw_ks_perfect_fit_on_two_point_tail(spark):
    from llama_spark.graph import powerlaw_ks

    # all tail degrees equal d_min → lg = 0 → alpha undefined (NULL on
    # both engines via the degree_powerlaw convention): ks NULL too
    star = [(0, i) for i in range(1, 5)] + [(1, i) for i in range(2, 5)]
    r = powerlaw_ks(edges_df(spark, star), d_min=4).collect()[0]
    assert r.n_tail >= 1
    # with a single distinct tail degree the empirical CCDF at d_min is 1
    # and the fitted CCDF is 1 → alpha is +inf/NULL-ish; just assert the
    # operator does not crash and n_tail is right (guard-rail test)


def test_powerlaw_ks_matches_oracle_sf0001(spark):
    got = sorted(tuple(r) for r in QUERIES["powerlaw_ks"](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE["powerlaw_ks"]).fetchall())
    assert len(got) == len(want) == 1
    g, w = got[0], want[0]
    assert g[:2] == w[:2]
    assert g[2] == pytest.approx(w[2], abs=2e-6)
    assert g[3] == pytest.approx(w[3], abs=2e-6)


# ------------------------------------------------ sliding event windows


def test_event_sliding_counts_model(spark):
    # each event lands in exactly two 10-min windows (slide 5 min);
    # every tumbling bucket's count appears in windows b-1 and b
    from llama_spark.entry_queries import QUERIES

    got = QUERIES["event_sliding_counts"](spark, SF)
    rows = got.collect()
    # total mass doubles relative to events: Σn = 2·|events|
    n_events = spark.read.parquet(f"{SF}/events.parquet").count()
    assert sum(r.n for r in rows) == 2 * n_events


def test_event_sliding_counts_matches_oracle_sf0001(spark):
    con = _duck()
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{SF}/events.parquet'")
    got = sorted(tuple(r) for r in QUERIES["event_sliding_counts"](spark, SF).collect())
    want = sorted(tuple(r) for r in con.execute(ORACLE["event_sliding_counts"]).fetchall())
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g[:3] == w[:3]
        assert g[3] == pytest.approx(w[3], abs=1e-6)


# ------------------------------------------------ WL subtree kernel


def test_wl_kernel_self_equals_sum_sq_class_sizes(spark):
    import random

    from llama_spark.operators.wl import wl_colors, wl_kernel

    rng = random.Random(101)
    pairs = [
        (u, v)
        for u, v in {(rng.randrange(20), rng.randrange(20)) for _ in range(60)}
        if u != v
    ]
    e = edges_df(spark, pairs)
    got = {r["round"]: r.k for r in wl_kernel(e, e, rounds=2).collect()}
    for h in (0, 1, 2):
        hist = (
            wl_colors(e, rounds=h)
            .groupBy("color")
            .count()
            .collect()
        )
        assert got[h] == sum(r["count"] ** 2 for r in hist)


def test_wl_kernel_invariant_under_relabeling(spark):
    import random

    from llama_spark.operators.wl import wl_kernel

    rng = random.Random(111)
    pairs = [
        (u, v)
        for u, v in {(rng.randrange(18), rng.randrange(18)) for _ in range(50)}
        if u != v
    ]
    # bijective relabeling: id -> 7919*id + 13 (no collisions)
    relab = [(7919 * u + 13, 7919 * v + 13) for u, v in pairs]
    e, e2 = edges_df(spark, pairs), edges_df(spark, relab)
    self_k = {r["round"]: r.k for r in wl_kernel(e, e, rounds=2).collect()}
    cross = {r["round"]: r.k for r in wl_kernel(e, e2, rounds=2).collect()}
    assert cross == self_k, "WL colors must be id-free"


def test_wl_kernel_separates_path_from_cycle(spark):
    from llama_spark.operators.wl import wl_kernel

    # directed 4-cycle vs directed 4-path: every cycle node has
    # (in,out) = (1,1); path endpoints differ → round-0 overlap is only
    # the 3 middle-ish matches, and k(cycle,path) < k(cycle,cycle)
    cyc = [(0, 1), (1, 2), (2, 3), (3, 0)]
    path = [(10, 11), (11, 12), (12, 13)]
    self_k = {r["round"]: r.k for r in wl_kernel(edges_df(spark, cyc), edges_df(spark, cyc), rounds=1).collect()}
    cross = {r["round"]: r.k for r in wl_kernel(edges_df(spark, cyc), edges_df(spark, path), rounds=1).collect()}
    assert self_k[0] == 16 and self_k[1] == 16  # 4 identical nodes
    assert cross[0] == 8   # only the 2 middle path nodes are (1,1)
    assert cross[1] == 0   # 1-round unfoldings differ everywhere


def test_wl_kernel_matches_oracle_sf0001(spark):
    got = sorted(tuple(r) for r in QUERIES["wl_kernel"](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE["wl_kernel"]).fetchall())
    assert got == want and len(got) == 3


# ---------------------------------------------- directed assortativity


def _pearson(xs, ys):
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxx = sum(x * x for x in xs)
    syy = sum(y * y for y in ys)
    sxy = sum(x * y for x, y in zip(xs, ys))
    den = ((n * sxx - sx * sx) * (n * syy - sy * sy)) ** 0.5
    return (n * sxy - sx * sy) / den if den else None


def test_directed_assortativity_matches_model(spark):
    import random

    from llama_spark.graph import directed_assortativity

    rng = random.Random(121)
    pairs = sorted({
        (rng.randrange(25), rng.randrange(25)) for _ in range(150)
    })
    pairs = [(u, v) for u, v in pairs if u != v]
    ind, outd = {}, {}
    for u, v in pairs:
        outd[u] = outd.get(u, 0) + 1
        ind[v] = ind.get(v, 0) + 1
    nodes = {x for e in pairs for x in e}
    di = {v: ind.get(v, 0) for v in nodes}
    do = {v: outd.get(v, 0) for v in nodes}
    want = {
        "in-in": _pearson([di[u] for u, _ in pairs], [di[v] for _, v in pairs]),
        "in-out": _pearson([di[u] for u, _ in pairs], [do[v] for _, v in pairs]),
        "out-in": _pearson([do[u] for u, _ in pairs], [di[v] for _, v in pairs]),
        "out-out": _pearson([do[u] for u, _ in pairs], [do[v] for _, v in pairs]),
    }
    got = {r.mode: r.r for r in directed_assortativity(edges_df(spark, pairs)).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(round(want[k], 6), abs=1e-9), k


def test_directed_assortativity_star_modes_disagree(spark):
    from llama_spark.graph import directed_assortativity

    # out-star 0→{1..6} plus chain 6→7: sources have high out-degree,
    # targets high in-degree — out-in must be defined; a 2-edge graph
    # with constant source degrees leaves other modes NULL (zero variance)
    pairs = [(0, i) for i in range(1, 7)] + [(6, 7)]
    got = {r.mode: r.r for r in directed_assortativity(edges_df(spark, pairs)).collect()}
    assert len(got) == 4


def test_directed_assortativity_matches_oracle_sf0001(spark):
    got = sorted(tuple(r) for r in QUERIES["directed_assortativity"](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE["directed_assortativity"]).fetchall())
    assert len(got) == len(want) == 4
    for g, w in zip(got, want):
        assert g[0] == w[0]
        if g[1] is None or w[1] is None:
            assert g[1] == w[1]
        else:
            assert g[1] == pytest.approx(w[1], abs=2e-6)


# ------------------------------------------------ rank-biased overlap


def _rank_df(spark, ids):
    return spark.createDataFrame(
        [(v, i + 1) for i, v in enumerate(ids)], "id long, pos long"
    )


def test_rbo_identical_and_disjoint_closed_forms(spark):
    from llama_spark.functions.metrics import rank_biased_overlap

    ids = list(range(10))
    r = rank_biased_overlap(
        _rank_df(spark, ids), _rank_df(spark, ids), p=0.9, k=10
    ).collect()[0]
    # identical lists: RBO_MIN@k = (1-p)·Σ p^(d-1) = 1 - p^k
    assert r.rbo == pytest.approx(round(1 - 0.9**10, 6), abs=1e-9)
    r0 = rank_biased_overlap(
        _rank_df(spark, ids), _rank_df(spark, [x + 100 for x in ids]), p=0.9, k=10
    ).collect()[0]
    assert r0.rbo == 0.0


def test_rbo_matches_python_model(spark):
    import random

    from llama_spark.functions.metrics import rank_biased_overlap

    rng = random.Random(131)
    pool = list(range(40))
    a = rng.sample(pool, 20)
    b = rng.sample(pool, 20)
    want = 0.0
    for d in range(1, 21):
        inter = len(set(a[:d]) & set(b[:d]))
        want += (1 - 0.8) * 0.8 ** (d - 1) * inter / d
    r = rank_biased_overlap(
        _rank_df(spark, a), _rank_df(spark, b), p=0.8, k=20
    ).collect()[0]
    assert r.rbo == pytest.approx(round(want, 6), abs=1e-9)


def test_rbo_top_weighted_vs_footrule(spark):
    from llama_spark.functions.metrics import rank_biased_overlap

    # same set, agreement only at the TOP vs only at the BOTTOM: RBO must
    # prefer top agreement (the property footrule/overlap cannot express)
    base = list(range(10))
    top_agree = base[:5] + [100 + x for x in range(5)]
    bot_agree = [100 + x for x in range(5)] + base[5:]
    a = _rank_df(spark, base)
    r_top = rank_biased_overlap(a, _rank_df(spark, top_agree), p=0.9, k=10).collect()[0].rbo
    r_bot = rank_biased_overlap(a, _rank_df(spark, bot_agree), p=0.9, k=10).collect()[0].rbo
    assert r_top > r_bot > 0


def test_rbo_matches_oracle_sf0001(spark):
    got = sorted(tuple(r) for r in QUERIES["rbo"](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE["rbo"]).fetchall())
    assert len(got) == len(want) == 1
    assert got[0][:2] == want[0][:2]
    assert got[0][2] == pytest.approx(want[0][2], abs=2e-6)


# --------------------------------------------- percolation centrality


def test_percolation_centrality_matches_weighted_brandes_model(spark):
    import random

    from llama_spark.operators.bc import percolation_centrality

    rng = random.Random(141)
    pairs = [
        (u, v)
        for u, v in {(rng.randrange(14), rng.randrange(14)) for _ in range(40)}
        if u != v
    ]
    nodes = sorted({x for e in pairs for x in e})
    adj = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
    roots = nodes[:3]

    def brandes_delta(s):
        # BFS sigma + dependency accumulation on the directed graph
        from collections import deque

        dist, sigma = {s: 0}, {s: 1.0}
        order = [s]
        q = deque([s])
        while q:
            u = q.popleft()
            for w in sorted(adj.get(u, ())):
                if w not in dist:
                    dist[w] = dist[u] + 1
                    sigma[w] = 0.0
                    order.append(w)
                    q.append(w)
                if dist[w] == dist[u] + 1:
                    sigma[w] += sigma[u]
        delta = {v: 0.0 for v in dist}
        for w in reversed(order):
            for u in dist:
                if w in adj.get(u, ()) and dist[w] == dist[u] + 1:
                    delta[u] += sigma[u] / sigma[w] * (1 + delta[w])
        return delta

    x = {s: ((s * 31) % 100) / 100 for s in roots}
    sx = sum(x.values())
    n = len(nodes)
    want = {}
    for v in nodes:
        acc = sum(
            x[s] * brandes_delta(s).get(v, 0.0) for s in roots if v != s
        )
        den = (sx - ((v * 31) % 100) / 100) * (n - 2)
        want[v] = round(acc / den, 6) if den > 0 else 0.0
    got = {
        r.id: r.pc
        for r in percolation_centrality(
            edges_df(spark, pairs), roots=roots
        ).collect()
    }
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=2e-6), v


def test_percolation_centrality_zero_states_zero_everywhere(spark):
    from llama_spark.operators.bc import percolation_centrality

    # roots whose synthetic state is 0 (id·31 ≡ 0 mod 100 → id = 0, 100)
    # contribute nothing: every pc must be 0
    pairs = [(0, 1), (1, 2), (100, 1)]
    got = percolation_centrality(
        edges_df(spark, pairs), roots=[0, 100]
    ).collect()
    assert all(r.pc == 0.0 for r in got)


def test_percolation_centrality_matches_oracle_sf0001(spark):
    got = sorted(tuple(r) for r in QUERIES["percolation_centrality"](spark, SF).collect())
    want = sorted(tuple(r) for r in _duck().execute(ORACLE["percolation_centrality"]).fetchall())
    assert len(got) == len(want) > 0
    for g, w in zip(got, want):
        assert g[0] == w[0]
        assert g[1] == pytest.approx(w[1], abs=2e-6)
