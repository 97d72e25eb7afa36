"""Round-5 continuation batch 3: random-failure percolation, TPC-H Q18,
per-source corpus profile."""

from __future__ import annotations

from tests.conftest import edges_df


# ---- random-failure percolation ----


def _lcg(i: int, seed: int = 0) -> int:
    return (1103515245 * (i + seed) + 12345) % 65536


def test_random_percolation_matches_model(spark):
    from llama_spark.operators.percolation import random_percolation

    # path 0-1-2-...-9 plus isolated-ish pair (20,21)
    edges = [(i, i + 1) for i in range(9)] + [(20, 21)]
    nodes = sorted({u for e in edges for u in e})
    frac = 0.25
    k = int(len(nodes) * frac)
    removed = set(sorted(nodes, key=lambda i: (_lcg(i), i))[:k])
    # python model of the census
    survivors = [n for n in nodes if n not in removed]
    kept = [(u, v) for u, v in edges if u not in removed and v not in removed]
    # union-find
    parent = {n: n for n in survivors}
    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x
    for u, v in kept:
        parent[find(u)] = find(v)
    comps = {}
    for n in survivors:
        comps.setdefault(find(n), []).append(n)
    sizes = sorted((len(v) for v in comps.values()), reverse=True)

    row = random_percolation(edges_df(spark, edges), frac=frac).collect()[0]
    assert row["n_removed"] == k
    assert row["n_remaining"] == len(survivors)
    assert row["giant_size"] == (sizes[0] if sizes else 0)
    assert row["n_components"] == len(comps)


def test_random_vs_attack_contrast_on_star(spark):
    """The AJB contrast: on a hub-and-spokes star, removing ONE node by
    degree (the hub) shatters the graph; removing one at random almost
    surely leaves the giant component intact."""
    from llama_spark.operators.percolation import (
        attack_percolation,
        random_percolation,
    )

    star = [(0, i) for i in range(1, 41)]  # hub 0, 40 spokes
    df = edges_df(spark, star)
    atk = attack_percolation(df, frac=0.03).collect()[0]  # k=1 → the hub
    assert atk["n_removed"] == 1 and atk["giant_size"] == 1

    rnd = random_percolation(df, frac=0.03).collect()[0]  # k=1, LCG pick
    removed = sorted(range(41), key=lambda i: (_lcg(i), i))[0]
    expect_giant = 40 if removed != 0 else 1
    assert rnd["n_removed"] == 1 and rnd["giant_size"] == expect_giant


# ---- TPC-H Q18 ----


def test_tpch_q18_sf0001(spark):
    """Cross-checked against a duckdb run of the oracle SQL at sf0.001."""
    import duckdb

    from llama_spark.entry_queries import ORACLE, QUERIES

    sf = "/root/testdata/sf0.001"
    got = QUERIES["tpch_q18"](spark, sf).collect()
    con = duckdb.connect()
    for t in ("lineitem", "orders", "customer"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'"
        )
    want = con.execute(ORACLE["tpch_q18"]).fetchall()
    assert [tuple(r) for r in got] == [tuple(r) for r in want]
    # every returned order genuinely exceeds the threshold
    assert all(r["total_qty"] > 300 for r in got)


# ---- per-source corpus profile ----


def test_source_profile_counts_and_dups(spark):
    from llama_spark.functions.text import source_profile

    rows = [
        # source A: 3 docs, one exact-dup pair
        (0, "hello world", "en", "A", 11),
        (1, "hello world", "en", "A", 11),
        (2, "unique text here", "en", "A", 16),
        # source B: 2 docs, two langs, no dups
        (3, "bonjour le monde", "fr", "B", 16),
        (4, "one two three four", "en", "B", 18),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["source"]: r for r in source_profile(docs).collect()}
    a, b = got["A"], got["B"]
    assert a["n_docs"] == 3 and a["dup_docs"] == 2 and a["n_langs"] == 1
    assert abs(a["dup_ratio"] - round(2 / 3, 6)) < 1e-9
    assert a["total_chars"] == 38
    assert a["avg_tokens"] == round((2 + 2 + 3) / 3, 4)
    assert b["n_docs"] == 2 and b["dup_docs"] == 0 and b["n_langs"] == 2
    assert b["avg_chars"] == 17.0


# ---- TPC-H Q13 ----


def test_tpch_q13_left_join_zero_bucket(spark):
    """Customers with no (non-urgent) orders must land in the c_count=0
    bucket — the left-join semantic Q13 exists to test."""
    import duckdb

    from llama_spark.entry_queries import ORACLE, QUERIES

    sf = "/root/testdata/sf0.001"
    got = {r["c_count"]: r["custdist"] for r in QUERIES["tpch_q13"](spark, sf).collect()}
    con = duckdb.connect()
    for t in ("orders", "customer"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    want = dict(con.execute(ORACLE["tpch_q13"]).fetchall())
    assert got == want
    n_cust = con.execute("SELECT COUNT(*) FROM customer").fetchone()[0]
    assert sum(got.values()) == n_cust  # every customer in exactly one bucket


# ---- degree correlation knn(k) ----


def test_avg_neighbor_degree_star(spark):
    from llama_spark.graph import avg_neighbor_degree

    star = [(0, i) for i in range(1, 5)]  # hub deg 4, spokes deg 1
    got = {r["k"]: (r["n_nodes"], r["knn"]) for r in
           avg_neighbor_degree(edges_df(spark, star)).collect()}
    # hub's neighbors all have degree 1; each spoke's neighbor (hub) has 4
    assert got == {4: (1, 1.0), 1: (4, 4.0)}


def test_avg_neighbor_degree_path(spark):
    from llama_spark.graph import avg_neighbor_degree

    path = [(0, 1), (1, 2), (2, 3)]  # degrees 1,2,2,1
    got = {r["k"]: (r["n_nodes"], r["knn"]) for r in
           avg_neighbor_degree(edges_df(spark, path)).collect()}
    # deg-1 nodes (0,3): neighbor mean 2.0 each → knn(1)=2.0
    # deg-2 nodes: node1 nbrs deg (1,2) → 1.5; node2 nbrs deg (2,1) → 1.5
    assert got == {1: (2, 2.0), 2: (2, 1.5)}


# ---- source-weighted sampling ----


def test_source_weighted_sample_rates_and_determinism(spark):
    from llama_spark.functions.sample import source_weighted_sample

    rows = [(i, "A" if i % 2 == 0 else "B") for i in range(2000)]
    docs = spark.createDataFrame(rows, "doc_id long, source string")
    out = source_weighted_sample(
        docs, rates_bp={"A": 5000, "B": 0}, default_bp=10000
    )
    got = out.collect()
    assert all(r["source"] == "A" for r in got)  # B rate 0 → none kept
    # ~50% of the 1000 A docs (hash-uniform; generous tolerance)
    assert 400 < len(got) < 600
    # pure function of the id: rerun is identical
    again = source_weighted_sample(
        docs, rates_bp={"A": 5000, "B": 0}, default_bp=10000
    ).collect()
    assert sorted(r["doc_id"] for r in got) == sorted(r["doc_id"] for r in again)
    # appending docs never reselects existing ones
    more = spark.createDataFrame(
        rows + [(i, "A") for i in range(2000, 2500)],
        "doc_id long, source string",
    )
    sup = source_weighted_sample(
        more, rates_bp={"A": 5000, "B": 0}, default_bp=10000
    ).collect()
    kept_old = {r["doc_id"] for r in sup if r["doc_id"] < 2000}
    assert kept_old == {r["doc_id"] for r in got}


def test_source_weighted_sample_validates(spark):
    import pytest

    from llama_spark.functions.sample import source_weighted_sample

    docs = spark.createDataFrame([(0, "A")], "doc_id long, source string")
    with pytest.raises(ValueError):
        source_weighted_sample(docs, rates_bp={"A": 10001})
    with pytest.raises(ValueError):
        source_weighted_sample(docs, rates_bp={}, default_bp=-1)


# ---- exact quantiles ----


def test_exact_quantiles_matches_sorted_cut(spark):
    from llama_spark.functions.sketch import exact_quantiles

    vals = [5, 1, 9, 3, 3, 7, 7, 7, 2, 10]  # n=10
    df = spark.createDataFrame([(v,) for v in vals], "x long")
    got = {r["q_bp"]: (r["rank"], r["value"]) for r in
           exact_quantiles(df, "x", qs_bp=(1000, 5000, 9000, 10000)).collect()}
    s = sorted(vals)
    for bp, (rank, value) in got.items():
        want_rank = (bp * len(vals) + 9999) // 10000
        assert rank == want_rank
        assert value == s[want_rank - 1]
    assert got[10000] == (10, 10)  # the max
    assert got[5000] == (5, 5)     # the lower median


# ---- embedding whitening ----


def test_standardize_embeddings_exact(spark):
    from llama_spark.functions.cluster import standardize_embeddings

    rows = [(0, [0.0, 5.0]), (1, [2.0, 5.0]), (2, [4.0, 5.0])]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["vec_id"], r["dim"]): r["z"] for r in
           standardize_embeddings(emb).collect()}
    # dim 0: mean 2, pop-std sqrt(8/3)... z = (x-2)/sqrt(8/3)
    import math
    s = math.sqrt(8 / 3)
    assert got[(0, 0)] == round(-2 / s, 6)
    assert got[(1, 0)] == 0.0
    assert got[(2, 0)] == round(2 / s, 6)
    # dim 1 is constant → zero variance → z = 0 convention
    assert got[(0, 1)] == got[(1, 1)] == got[(2, 1)] == 0.0


def test_embedding_covariance_partition_invariant(spark):
    """The numpy Gram partials must sum to the same exact integers no
    matter how rows are partitioned — the partitioning-invariance the
    int64 contract guarantees."""
    import random

    from llama_spark.functions.cluster import embedding_covariance

    rng = random.Random(7)
    rows = [(i, [rng.uniform(-1, 1) for _ in range(4)]) for i in range(200)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = {(r["i"], r["j"]): r["cov"]
         for r in embedding_covariance(emb, dims=4).collect()}
    b = {(r["i"], r["j"]): r["cov"]
         for r in embedding_covariance(emb.repartition(13), dims=4).collect()}
    assert a == b
    assert len(a) == 10  # 4*5/2 triangular entries
    # diagonal of a uniform(-1,1) sample sits near 1/3
    for i in range(4):
        assert 0.2 < a[(i, i)] < 0.5
    # cross-check one entry against plain python (micro-int replica)
    q = [[round(v * 1e6) for v in vec] for _, vec in rows]
    n = len(q)
    sqq = sum(r[0] * r[1] for r in q)
    s0 = sum(r[0] for r in q)
    s1 = sum(r[1] for r in q)
    want = round((sqq / n - (s0 / n) * (s1 / n)) / 1e12, 6)
    assert a[(0, 1)] == want


# ---- widest (max-bottleneck) paths ----


def test_widest_paths_picks_fat_route(spark):
    from llama_spark.operators.traversal import widest_paths

    # two routes 0→3: thin direct chain (min cap 1) vs fat detour (min 5)
    rows = [
        (0, 1, 10.0), (1, 3, 1.0),          # thin: width 1
        (0, 2, 6.0), (2, 3, 5.0),           # fat: width 5
        (3, 4, 2.0),                         # extends the best route
    ]
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    got = {r["id"]: r["width"] for r in
           widest_paths(edges, root=0, weight_col="weight").collect()}
    assert got[0] == 999.0  # source sentinel
    assert got[1] == 10.0
    assert got[2] == 6.0
    assert got[3] == 5.0    # max over {min(10,1)=1, min(6,5)=5}
    assert got[4] == 2.0    # min(5, 2)
    # unreachable node stays NULL
    rows2 = rows + [(9, 8, 7.0)]
    edges2 = spark.createDataFrame(rows2, "src long, dst long, weight double")
    got2 = {r["id"]: r["width"] for r in
            widest_paths(edges2, root=0, weight_col="weight").collect()}
    assert got2[8] == 7.0 or got2[8] is None  # 8 only reachable from 9
    assert got2[9] is None
    assert got2[8] is None  # 0 cannot reach 9→8


# ---- sampled eccentricity ----


def test_eccentricity_sample_path(spark):
    from llama_spark.operators.traversal import eccentricity_sample

    # path 0-1-2-3-4 (directed both ways so BFS works undirected-like)
    edges = [(i, i + 1) for i in range(4)] + [(i + 1, i) for i in range(4)]
    got = {r["id"]: (r["ecc"], r["n_reached"]) for r in
           eccentricity_sample(edges_df(spark, edges), roots=[0, 2]).collect()}
    assert got[0] == (4, 5)  # end of the path sees depth 4
    assert got[2] == (2, 5)  # center sees depth 2


# ---- DOULION triangle estimator ----


def test_doulion_full_sample_is_exact(spark):
    from llama_spark.operators.triangles import (
        doulion_triangle_estimate,
        triangle_count,
    )

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 2), (5, 6)]
    df = edges_df(spark, edges)
    row = doulion_triangle_estimate(df, p_bp=10000).collect()[0]
    exact = triangle_count(df)
    assert row["triangles_sampled"] == exact == 2
    assert row["triangle_estimate"] == float(exact)
    assert row["n_sampled_edges"] == 7


def test_doulion_subsample_counts_sampled_graph(spark):
    from llama_spark.functions.text import token_hash
    from llama_spark.operators.triangles import doulion_triangle_estimate

    from pyspark.sql import functions as F

    edges = [(a, b) for a in range(12) for b in range(a + 1, 12)]  # K12
    df = edges_df(spark, edges)
    row = doulion_triangle_estimate(df, p_bp=5000).collect()[0]
    # python replica of the deterministic sample
    import hashlib

    def h(a, b):
        return int(hashlib.md5(f"{a}:{b}:doulion".encode()).hexdigest()[:15], 16)

    kept = [(a, b) for a, b in edges if h(a, b) % 10000 < 5000]
    assert row["n_sampled_edges"] == len(kept)
    ks = set(kept)
    tri = sum(
        1
        for a in range(12)
        for b in range(a + 1, 12)
        for c in range(b + 1, 12)
        if (a, b) in ks and (b, c) in ks and (a, c) in ks
    )
    assert row["triangles_sampled"] == tri
    assert row["triangle_estimate"] == round(tri * 1e12 / 5000.0**3, 4)


# ---- co-occurrence lift ----


def test_cooccurrence_lift_independence_baseline(spark):
    from llama_spark.operators.walks import cooccurrence_lift

    pairs = spark.createDataFrame(
        [(1, 2, 4), (1, 3, 4), (9, 2, 4), (9, 3, 4)],
        "center long, context long, cnt long",
    )
    got = {(r["center"], r["context"]): r["lift"]
           for r in cooccurrence_lift(pairs).collect()}
    # perfectly independent table → lift 1 everywhere (T=16, na=8, nb=8)
    assert all(v == 1.0 for v in got.values()) and len(got) == 4

    skew = spark.createDataFrame(
        [(1, 2, 9), (1, 3, 1), (9, 2, 1), (9, 3, 9)],
        "center long, context long, cnt long",
    )
    g2 = {(r["center"], r["context"]): r["lift"]
          for r in cooccurrence_lift(skew).collect()}
    assert g2[(1, 2)] == 1.8 and g2[(1, 3)] == 0.2  # 9·20/(10·10), 1·20/(10·10)


# ---- content-aware dedup survivors ----


def test_dedup_survivors_keeps_longest(spark):
    from llama_spark.functions.dedup import dedup_clusters, dedup_survivors

    # docs 0,1,2 near-identical (1 is the longest; J(0,1) = 38/39 so the
    # 4x4 minhash banding hit is near-certain); 3 unique
    base = " ".join(f"w{i}" for i in range(40))
    rows = [
        (0, base, "en", "A", len(base)),
        (1, base + " extra", "en", "A", len(base) + 6),
        (2, base, "en", "A", len(base)),
        (3, "totally different words entirely here now", "en", "A", 41),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    cl = {r["doc_id"]: r for r in dedup_clusters(docs, threshold=0.5).collect()}
    sv = {r["doc_id"]: r for r in dedup_survivors(docs, threshold=0.5).collect()}
    # same clustering, different survivor rule
    assert {d: r["cluster"] for d, r in cl.items()} == {
        d: r["cluster"] for d, r in sv.items()
    }
    assert cl[0]["keep"] and not cl[1]["keep"]       # min-id rule keeps 0
    assert sv[1]["keep"] and not sv[0]["keep"] and not sv[2]["keep"]  # longest
    assert sv[3]["keep"]                              # singleton survives
    # exactly one survivor per cluster
    from collections import Counter
    per = Counter(r["cluster"] for r in sv.values() if r["keep"])
    assert all(v == 1 for v in per.values())


# ---- vocabulary growth ----


def test_vocab_growth_monotone_and_exact(spark):
    from llama_spark.functions.text import vocab_growth

    rows = [
        (10, "a b c", "en", "A", 5),
        (20, "a b d", "en", "A", 5),
        (40, "e f", "en", "A", 3),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {r["bp"]: (r["t"], r["n_docs"], r["vocab"]) for r in
           vocab_growth(docs, grid_bp=(2500, 5000, 10000)).collect()}
    # max doc_id 40 → thresholds 10, 20, 40
    assert got[2500] == (10, 1, 3)   # doc 10 introduces a,b,c
    assert got[5000] == (20, 2, 4)   # doc 20 adds d
    assert got[10000] == (40, 3, 6)  # doc 40 adds e,f


# ---- GraphSession API surface for the round's new operators ----


def test_graphsession_round5f_methods(spark):
    from llama_spark.api import GraphSession
    from llama_spark.graph import with_synthetic_weights

    edges = [(0, 1), (1, 2), (2, 0), (2, 3)]
    g = GraphSession(spark).from_edges(edges_df(spark, edges))
    assert g.random_percolation(frac=0.25).count() == 1
    assert g.avg_neighbor_degree().count() >= 2
    assert g.doulion_triangles(p_bp=10000).collect()[0]["triangles_sampled"] == 1
    assert g.eccentricity(roots=[0]).collect()[0]["ecc"] == 3  # 0→1→2→3
    assert g.cooccurrence_lift(walk_length=3).count() > 0
    gw = GraphSession(spark).from_edges(
        with_synthetic_weights(edges_df(spark, edges))
    )
    widths = {r["id"]: r["width"] for r in gw.widest_paths(root=0).collect()}
    assert widths[0] == 999.0 and widths[3] is not None


# ---- tf-idf cosine APSS ----


def test_tfidf_cosine_pairs_model(spark):
    import math

    from llama_spark.functions.text import tfidf_cosine_pairs

    rows = [
        (0, "apple banana cherry", "en", "A", 19),
        (1, "apple banana cherry", "en", "A", 19),   # identical → cos 1
        (2, "apple dog elephant", "en", "A", 18),    # shares 'apple'
        (3, "zebra yak xylophone", "en", "A", 19),   # disjoint
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    got = {(r["doc_a"], r["doc_b"]): r["cos_sim"]
           for r in tfidf_cosine_pairs(docs, threshold=0.03).collect()}
    assert got[(0, 1)] == 1.0
    # python replica for the (0,2) pair: only 'apple' shared
    n = 4
    def q(tf, df):
        return round(round(tf * math.log(n / df), 4) * 1e4)
    qa = q(1, 3)                    # apple df=3 (docs 0,1,2)
    qo = q(1, 1)                    # each doc's two unique tokens... df=1
    # wait: banana/cherry df=2 (docs 0 and 1)
    qb = q(1, 2)
    n0 = math.sqrt(qa * qa + 2 * qb * qb)
    n2 = math.sqrt(qa * qa + 2 * qo * qo)
    want = round(qa * qa / (n0 * n2), 6)
    assert got[(0, 2)] == want
    assert (0, 3) not in got and (2, 3) not in got  # disjoint pairs absent


# ---- TPC-H Q4 (EXISTS shape) ----


def test_tpch_q4_semijoin(spark):
    import duckdb

    from llama_spark.entry_queries import ORACLE, QUERIES

    sf = "/root/testdata/sf0.001"
    got = dict(
        (r["o_orderpriority"], r["order_count"])
        for r in QUERIES["tpch_q4"](spark, sf).collect()
    )
    con = duckdb.connect()
    for t in ("orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    want = dict(con.execute(ORACLE["tpch_q4"]).fetchall())
    assert got == want and len(got) > 0


# ---- configuration-model null graph ----


def test_configuration_model_preserves_degrees(spark):
    from llama_spark.graph import symmetrize
    from llama_spark.operators.rewire import configuration_model

    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (2, 3), (4, 0)]
    df = edges_df(spark, edges)
    null = configuration_model(df, seed=7)
    rows = null.collect()
    assert len(rows) == 6  # exactly E pairs
    # degree multiset preserved exactly (self-loops count twice)
    from collections import Counter
    want = Counter()
    for u, v in edges:
        want[u] += 1
        want[v] += 1
    got = Counter()
    for r in rows:
        got[r["src"]] += 1
        got[r["dst"]] += 1
    assert got == want
    # deterministic: same seed → identical pairing; different seed → valid too
    again = sorted((r["src"], r["dst"]) for r in configuration_model(df, seed=7).collect())
    assert again == sorted((r["src"], r["dst"]) for r in rows)
    other = configuration_model(df, seed=8).collect()
    got8 = Counter()
    for r in other:
        got8[r["src"]] += 1
        got8[r["dst"]] += 1
    assert got8 == want


# ---- triangle significance / rollup / moving average ----


def test_triangle_significance_clique_vs_null(spark):
    from llama_spark.entry_queries import QUERIES  # reuse shapes only

    from llama_spark.operators.rewire import configuration_model
    from llama_spark.operators.triangles import triangles_df

    # K5 has 10 triangles; its null rewiring keeps degrees (all 4) but
    # typically loses some triangles — just assert both counts compute
    k5 = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    df = edges_df(spark, k5)
    real = triangles_df(df).collect()[0]["triangles"]
    null = triangles_df(configuration_model(df)).collect()[0]["triangles"]
    assert real == 10 and 0 <= null <= 10


def test_orders_rollup_shapes(spark):
    from llama_spark.entry_queries import QUERIES

    rows = QUERIES["orders_rollup"](spark, "/root/testdata/sf0.001").collect()
    got = {(r["priority"], r["status"]): r["n_orders"] for r in rows}
    grand = got[("ALL", "ALL")]
    # subtotals nest: per-priority ALL rows sum to the grand total
    per_pri = sum(v for (p, s), v in got.items() if s == "ALL" and p != "ALL")
    leaf = sum(v for (p, s), v in got.items() if s != "ALL" and p != "ALL")
    assert per_pri == grand == leaf


def test_event_movavg_first_rows(spark):
    from pyspark.sql import functions as F

    from llama_spark.entry_queries import QUERIES

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    out = QUERIES["event_movavg"](spark, "/root/testdata/sf0.001")
    # for each user the FIRST event's movavg equals its own value
    first = (
        ev.withColumn("ts_s", F.col("ts").cast("timestamp").cast("long"))
        .groupBy("user_id")
        .agg(F.min(F.struct("ts_s", "event_id", "value")).alias("f"))
        .select("user_id", F.col("f.event_id").alias("event_id"),
                F.round(F.col("f.value"), 6).alias("want"))
    )
    j = out.join(first, ["user_id", "event_id"])
    assert j.filter(F.col("movavg4") != F.col("want")).count() == 0
    assert j.count() == first.count() > 0


# ---- local bridges / core sizes / trending events ----


def test_local_bridges_weak_ties(spark):
    from llama_spark.operators.truss import local_bridges

    # two triangles joined by one bridge edge (2,3); pendant (5,6)... wait 5 in tri
    edges = [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (5, 3), (2, 3), (0, 9)]
    got = sorted(
        (r["src"], r["dst"]) for r in local_bridges(edges_df(spark, edges)).collect()
    )
    # triangle edges have common neighbors; (2,3) and (0,9) do not
    assert got == [(0, 9), (2, 3)]


def test_core_sizes_curve(spark):
    from llama_spark.operators.kcore import core_sizes

    # K4 (coreness 3) plus a pendant chain 3-10-11
    edges = [(a, b) for a in range(4) for b in range(a + 1, 4)] + [(3, 10), (10, 11)]
    got = {r["k"]: r["n_nodes"] for r in
           core_sizes(edges_df(spark, edges)).collect()}
    assert got[3] == 4       # the K4
    assert got[1] == 6       # everyone
    # monotone non-increasing in k
    ks = sorted(got)
    assert all(got[ks[i]] >= got[ks[i + 1]] for i in range(len(ks) - 1))


def test_trending_events_topk(spark):
    from pyspark.sql import functions as F

    from llama_spark.entry_queries import QUERIES

    out = QUERIES["trending_events"](spark, "/root/testdata/sf0.001")
    rows = out.collect()
    assert rows and all(r["rn"] in (1, 2) for r in rows)
    # per bucket: rank-1 count >= rank-2 count
    byb = {}
    for r in rows:
        byb.setdefault(r["bucket"], {})[r["rn"]] = r["n"]
    assert all(d[1] >= d.get(2, 0) for d in byb.values())


# ---- friend recommendations / bond percolation ----


def test_friend_recommendations_closure(spark):
    from llama_spark.operators.linkpred import friend_recommendations

    # path 0-1-2-3: 0's only 2-hop candidate is 2; 1's is 3
    edges = [(0, 1), (1, 2), (2, 3)]
    got = {(r["id"], r["candidate"]): (r["common"], r["rank"]) for r in
           friend_recommendations(edges_df(spark, edges), top_k=2).collect()}
    assert got[(0, 2)] == (1, 1) and got[(1, 3)] == (1, 1)
    assert (0, 1) not in got          # existing edges never recommended
    # triangle closure strength: 4 and 5 share two common neighbors
    tri = [(4, 6), (4, 7), (5, 6), (5, 7)]
    g2 = {(r["id"], r["candidate"]): r["common"] for r in
          friend_recommendations(edges_df(spark, tri), top_k=1).collect()}
    assert g2[(4, 5)] == 2 and g2[(5, 4)] == 2


def test_bond_percolation_full_keep_is_cc_census(spark):
    from llama_spark.operators.percolation import bond_percolation

    edges = [(0, 1), (1, 2), (3, 4)]
    row = bond_percolation(edges_df(spark, edges), keep_bp=10000).collect()[0]
    assert row["n_edges_kept"] == 3
    assert row["giant_size"] == 3 and row["n_components"] == 2
    none = bond_percolation(edges_df(spark, edges), keep_bp=0).collect()[0]
    assert none["n_edges_kept"] == 0
    assert none["giant_size"] == 1 and none["n_components"] == 5  # all isolated


# ---- 4-node graphlet census ----


def test_graphlet_census_known_graphs(spark):
    import itertools

    from llama_spark.operators.triangles import graphlet_census

    # brute-force via direct subgraph counting (no external libs)
    def count_all(edge_list):
        nodes = sorted({u for e in edge_list for u in e})
        adj = {n: set() for n in nodes}
        for u, v in edge_list:
            adj[u].add(v)
            adj[v].add(u)
        E = {frozenset(e) for e in edge_list}
        claws = sum(
            len(list(itertools.combinations(adj[v], 3))) for v in nodes
        )
        paths3 = 0
        tailed = 0
        diamonds = 0
        c4 = 0
        k4 = 0
        for quad in itertools.combinations(nodes, 4):
            sub = [frozenset(p) for p in itertools.combinations(quad, 2)
                   if frozenset(p) in E]
            k = len(sub)
            degs = sorted(
                sum(1 for e in sub if n in e) for n in quad
            )
            # count NON-induced occurrences inside this 4-set
            # P4 paths: enumerate vertex orderings
            for perm in itertools.permutations(quad):
                a, b, c, d = perm
                if (frozenset((a, b)) in E and frozenset((b, c)) in E
                        and frozenset((c, d)) in E):
                    paths3 += 1
            # tailed triangle: triangle on 3 of them + edge to 4th
            for tri3 in itertools.combinations(quad, 3):
                x = [n for n in quad if n not in tri3][0]
                if all(frozenset(p) in E for p in itertools.combinations(tri3, 2)):
                    for corner in tri3:
                        if frozenset((corner, x)) in E:
                            tailed += 1
            # 4-cycles: cyclic orderings
            for perm in itertools.permutations(quad):
                a, b, c, d = perm
                if (frozenset((a, b)) in E and frozenset((b, c)) in E
                        and frozenset((c, d)) in E and frozenset((d, a)) in E):
                    c4 += 1
            if k == 6:
                k4 += 1
            # diamonds: pairs of triangles sharing an edge within quad
            for shared in itertools.combinations(quad, 2):
                if frozenset(shared) not in E:
                    continue
                others = [n for n in quad if n not in shared]
                if (all(frozenset((o, shared[0])) in E and
                        frozenset((o, shared[1])) in E for o in others)):
                    diamonds += 1
        # each P4 counted twice (two directions), each C4 counted 8× (4
        # rotations × 2 directions)
        return {
            "claws": claws, "paths3": paths3 // 2, "tailed_triangles": tailed,
            "diamonds": diamonds, "four_cycles": c4 // 8, "four_cliques": k4,
        }

    for name, edges in {
        "K4": [(a, b) for a in range(4) for b in range(a + 1, 4)],
        "K5": [(a, b) for a in range(5) for b in range(a + 1, 5)],
        "path5": [(i, i + 1) for i in range(4)],
        "star5": [(0, i) for i in range(1, 6)],
        "tadpole": [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)],
        "cube-ish": [(0, 1), (1, 2), (2, 3), (3, 0), (0, 4), (2, 4), (1, 5), (3, 5)],
    }.items():
        got = graphlet_census(edges_df(spark, edges)).collect()[0].asDict()
        want = count_all(edges)
        assert got == want, f"{name}: {got} != {want}"


# ---- pivot / syndication / pq recall ----


def test_event_pivot_row_sums(spark):
    from pyspark.sql import functions as F

    from llama_spark.entry_queries import QUERIES

    out = QUERIES["event_pivot"](spark, "/root/testdata/sf0.001").collect()
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    total = ev.count()
    assert sum(
        r["n_click"] + r["n_error"] + r["n_purchase"] + r["n_signup"] + r["n_view"]
        for r in out
    ) == total
    assert len(out) <= 16


def test_syndication_matrix_counts_cross_source_dups(spark):
    rows = [
        (0, "same text", "en", "A", 9),
        (1, "same text", "en", "B", 9),   # A↔B pair
        (2, "same text", "en", "B", 9),   # second B copy → 2 A↔B pairs
        (3, "same text", "en", "A", 9),   # second A copy → 4 A↔B pairs
        (4, "other text", "en", "C", 10),
        (5, "other text", "en", "A", 10),  # A↔C pair
        (6, "lonely", "en", "C", 6),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    # replicate the gate's plan directly on the crafted docs
    from pyspark.sql import functions as F
    hs = (docs.select(F.md5("text").alias("h"), "source")
              .groupBy("h", "source").agg(F.count("*").alias("c")))
    a, b = hs.alias("a"), hs.alias("b")
    out = (a.join(b, (F.col("a.h") == F.col("b.h"))
                  & (F.col("a.source") < F.col("b.source")))
             .groupBy(F.col("a.source").alias("source_a"),
                      F.col("b.source").alias("source_b"))
             .agg(F.sum(F.col("a.c") * F.col("b.c")).cast("long")
                  .alias("n_dup_pairs")))
    got = {(r["source_a"], r["source_b"]): r["n_dup_pairs"] for r in out.collect()}
    assert got == {("A", "B"): 4, ("A", "C"): 1}


def test_pq_recall_bounds(spark):
    from llama_spark.entry_queries_docs import DOCS_QUERIES

    row = DOCS_QUERIES["pq_recall"](spark, "/root/testdata/sf0.001").collect()[0]
    assert row["truth_pairs"] > 0
    assert 0.0 <= row["recall"] <= 1.0
    assert row["hits"] <= row["truth_pairs"]


# ---- attribute assortativity ----


def test_attribute_assortativity_extremes(spark):
    from llama_spark.graph import attribute_assortativity

    # perfectly assortative: edges only within class (ids ≡ same mod 2)
    same = [(0, 2), (2, 4), (1, 3), (3, 5)]
    r1 = attribute_assortativity(edges_df(spark, same), classes=2).collect()[0]
    assert r1["r"] == 1.0
    # perfectly DISassortative: bipartite even↔odd
    cross = [(0, 1), (2, 3), (4, 5), (0, 3)]
    r2 = attribute_assortativity(edges_df(spark, cross), classes=2).collect()[0]
    assert r2["r"] == -1.0


def test_graphsession_batch4_methods(spark):
    from llama_spark.api import GraphSession

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)]
    g = GraphSession(spark).from_edges(edges_df(spark, edges))
    assert sorted(
        (r["src"], r["dst"]) for r in g.local_bridges().collect()
    ) == [(2, 3), (3, 4)]
    assert g.core_sizes().count() >= 1
    assert g.friend_recommendations().count() > 0
    assert g.bond_percolation(keep_bp=10000).collect()[0]["n_edges_kept"] == 5
    assert g.graphlet_census().collect()[0]["four_cliques"] == 0
    assert g.configuration_model().count() == 5
    assert -1.0 <= g.attribute_assortativity(classes=2).collect()[0]["r"] <= 1.0


# ---- containment / anomalies ----


def test_containment_asymmetric_quote_inclusion(spark):
    from llama_spark.functions.dedup import containment_pairs, ngram_jaccard_pairs

    short = " ".join(f"w{i}" for i in range(6))          # 4 shingles
    long_ = short + " " + " ".join(f"x{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(0, short, "en", "A", len(short)), (1, long_, "en", "A", len(long_))],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    got = {(r["doc_a"], r["doc_b"]): r["containment"]
           for r in containment_pairs(docs, threshold=0.5).collect()}
    assert got[(0, 1)] == 1.0            # every shingle of the short doc is in the long one
    assert (1, 0) not in got             # reverse direction far below threshold
    # symmetric Jaccard misses this pair entirely at the same threshold
    assert ngram_jaccard_pairs(docs, threshold=0.5).count() == 0


def test_event_anomalies_flags_burst(spark):
    from llama_spark.entry_queries import QUERIES

    rows = QUERIES["event_anomalies"](spark, "/root/testdata/sf0.001").collect()
    assert all(abs(r["z"]) >= 2.0 for r in rows)


# ---- rank agreement ----


def test_rank_agreement_identical_rankings(spark):
    """On a star the hub dominates both rankings; on a graph where PR and
    in-degree order identically, footrule is 0 and overlap is full."""
    from llama_spark.entry_queries import QUERIES

    row = QUERIES["rank_agreement"](spark, "/root/testdata/sf0.001").collect()[0]
    assert row["k"] == 100
    assert 0 < row["overlap"] <= 100
    # footrule bounded by k²/2 (max total displacement over k positions)
    assert 0 <= row["footrule"] <= 100 * 100 // 2


# ---- grouped quantiles ----


def test_grouped_quantiles_per_group_cuts(spark):
    from llama_spark.functions.sketch import grouped_quantiles

    rows = [("A", v) for v in [1, 2, 3, 4]] + [("B", v) for v in [10, 20]]
    df = spark.createDataFrame(rows, "source string, n_chars long")
    got = {(r["source"], r["q_bp"]): (r["rank"], r["value"]) for r in
           grouped_quantiles(df, "source", "n_chars", qs_bp=(5000, 10000)).collect()}
    assert got[("A", 5000)] == (2, 2) and got[("A", 10000)] == (4, 4)
    assert got[("B", 5000)] == (1, 10) and got[("B", 10000)] == (2, 20)


# ---- degree relabeling ----


def test_relabel_by_degree_dense_hubs_first(spark):
    from llama_spark.graph import relabel_by_degree

    star = [(0, i) for i in range(1, 5)] + [(1, 2)]
    got = {r["id"]: r["new_id"] for r in
           relabel_by_degree(edges_df(spark, star)).collect()}
    # hub 0 (deg 4) → 0; then 1, 2 (deg 2, id asc); then 3, 4 (deg 1)
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 4}
    shifted = [(10 * u + 7, 10 * v + 7) for u, v in star]
    g2 = relabel_by_degree(edges_df(spark, shifted)).collect()
    assert sorted(r["new_id"] for r in g2) == list(range(5))  # dense 0..V-1


def test_graphlet_census_induced_brute_force(spark):
    """Induced counts cross-checked by direct induced-subgraph
    classification on 4-vertex sets."""
    import itertools

    from llama_spark.operators.triangles import graphlet_census_induced

    def induced_counts(edge_list):
        nodes = sorted({u for e in edge_list for u in e})
        E = {frozenset(e) for e in edge_list}
        out = {"claws_ind": 0, "paths3_ind": 0, "tailed_ind": 0,
               "cycles4_ind": 0, "diamonds_ind": 0, "cliques4_ind": 0}
        for quad in itertools.combinations(nodes, 4):
            sub = [p for p in itertools.combinations(quad, 2)
                   if frozenset(p) in E]
            k = len(sub)
            degs = sorted(
                sum(1 for e in sub if n in e) for n in quad
            )
            if k == 3 and degs == [1, 1, 1, 3]:
                out["claws_ind"] += 1
            elif k == 3 and degs == [1, 1, 2, 2]:
                out["paths3_ind"] += 1
            elif k == 4 and degs == [1, 2, 2, 3]:
                out["tailed_ind"] += 1
            elif k == 4 and degs == [2, 2, 2, 2]:
                out["cycles4_ind"] += 1
            elif k == 5:
                out["diamonds_ind"] += 1
            elif k == 6:
                out["cliques4_ind"] += 1
        return out

    for name, edges in {
        "K5": [(a, b) for a in range(5) for b in range(a + 1, 5)],
        "path5": [(i, i + 1) for i in range(4)],
        "tadpole": [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4)],
        "wheel": [(0, i) for i in range(1, 6)] + [(1, 2), (2, 3), (3, 4), (4, 5), (5, 1)],
    }.items():
        got = graphlet_census_induced(edges_df(spark, edges)).collect()[0].asDict()
        want = induced_counts(edges)
        assert got == want, f"{name}: {got} != {want}"


def test_tpch_q17_threshold_semantics(spark):
    import duckdb

    from llama_spark.entry_queries import ORACLE, QUERIES

    sf = "/root/testdata/sf0.001"
    got = QUERIES["tpch_q17"](spark, sf).collect()[0]
    con = duckdb.connect()
    for t in ("lineitem", "part"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    want = con.execute(ORACLE["tpch_q17"]).fetchone()
    assert (got["n_items"], got["avg_yearly"]) == want


def test_dirichlet_energy_constant_signal_is_zero(spark):
    """A constant signal has zero Dirichlet energy; the gate formula is
    replicated on a crafted 2-node embedding table."""
    from llama_spark.entry_queries import QUERIES

    row = QUERIES["dirichlet_energy"](spark, "/root/testdata/sf0.001").collect()[0]
    assert row["n_edges"] > 0 and row["energy"] >= 0.0
