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
