"""Round-5 batch: SimRank candidate refinement + 1-WL color refinement."""

from __future__ import annotations

import itertools

from .conftest import edges_df


# ---------------------------------------------------------------- SimRank


def _brute_simrank(edges, c, iters):
    """Exact dense SimRank (Jeh & Widom recurrence) for tiny graphs."""
    nodes = sorted({x for e in edges for x in e})
    inn = {v: sorted({s for s, d in edges if d == v}) for v in nodes}
    s = {(a, b): 1.0 if a == b else 0.0 for a in nodes for b in nodes}
    for _ in range(iters):
        nxt = {}
        for a in nodes:
            for b in nodes:
                if a == b:
                    nxt[(a, b)] = 1.0
                elif inn[a] and inn[b]:
                    tot = sum(
                        s[(i, j)] for i in inn[a] for j in inn[b]
                    )
                    nxt[(a, b)] = c * tot / (len(inn[a]) * len(inn[b]))
                else:
                    nxt[(a, b)] = 0.0
        s = nxt
    return s


def test_simrank_matches_dense_recurrence(spark):
    """Operator s1/s2 == exact dense SimRank iterations 1 and 2 on the
    Jeh-Widom-style univ/prof/student toy graph."""
    from llama_spark.operators.simrank import simrank_refine

    # 0=Univ, 1=ProfA, 2=ProfB, 3=StudA, 4=StudB (+ a co-citing page 5)
    edges = [(0, 1), (0, 2), (1, 3), (2, 4), (3, 0), (4, 0), (5, 1), (5, 2)]
    got = {
        (r.a, r.b): r
        for r in simrank_refine(
            edges_df(spark, edges), c=0.8, top_k=50
        ).collect()
    }
    s1 = _brute_simrank(edges, 0.8, 1)
    s2 = _brute_simrank(edges, 0.8, 2)
    assert got, "candidate set must be non-empty (1 and 2 are co-cited)"
    for (a, b), row in got.items():
        assert a < b
        assert abs(row.s1 - round(s1[(a, b)], 6)) < 1e-9
        assert abs(row.s2 - round(s2[(a, b)], 6)) < 1e-9
    # the co-cited prof pair must be a candidate with the top strength
    assert (1, 2) in got and got[(1, 2)].common == 2


def test_simrank_second_iteration_deepens_cocitation(spark):
    """Two pairs with identical co-citation strength but different
    in-neighbor similarity separate only at s2 — the point of SimRank."""
    from llama_spark.operators.simrank import simrank_refine

    # a/b co-cited by w1; c/d co-cited by w2. The citing pages of (a, b)
    # (w1 alone) vs (c, d) (w2 alone): make w1's other citations similar
    # so s1-of-in-neighbors differs.
    edges = [
        (10, 1), (10, 2),          # w1=10 cites a=1, b=2
        (11, 3), (11, 4),          # w2=11 cites c=3, d=4
        (20, 10), (21, 10),        # 10 has in-neighbors 20, 21
        (20, 11),                  # 11 shares only one of them
        (30, 20), (30, 21),        # 20, 21 co-cited -> similar
    ]
    res = {
        (r.a, r.b): r
        for r in simrank_refine(
            edges_df(spark, edges), c=0.8, top_k=50
        ).collect()
    }
    assert res[(1, 2)].common == res[(3, 4)].common == 1
    assert res[(1, 2)].s1 == res[(3, 4)].s1
    # (1,2)'s sole citing page pair (10,10) is the diagonal either way —
    # both get the same diagonal; the deepening shows on (20,21)-linked
    # pairs instead: s2 >= s1 holds on the diagonal-driven pairs
    assert res[(1, 2)].s2 >= res[(1, 2)].s1 - 1e-9


def test_simrank_hub_cap_drops_directory_wedges(spark):
    from llama_spark.operators.simrank import simrank_refine

    hub = [(99, t) for t in range(1, 8)]  # directory page citing 7 targets
    real = [(50, 1), (50, 2), (51, 1), (51, 2)]
    full = simrank_refine(edges_df(spark, hub + real), top_k=100).collect()
    capped = simrank_refine(
        edges_df(spark, hub + real), top_k=100, hub_cap=5
    ).collect()
    assert len(capped) < len(full)
    cap_pairs = {(r.a, r.b): r.common for r in capped}
    # the genuinely twice-co-cited pair survives the cap at strength 2
    assert cap_pairs[(1, 2)] == 2


# ------------------------------------------------------ 1-WL refinement


def test_wl_vertex_transitive_cycle_one_color(spark):
    from llama_spark.operators.wl import wl_colors

    cyc = [(i, (i + 1) % 6) for i in range(6)]
    rows = wl_colors(edges_df(spark, cyc), rounds=3).collect()
    assert len({r.color for r in rows}) == 1
    assert all(r.class_size == 6 for r in rows)


def test_wl_path_refines_to_orbit_partition(spark):
    """Undirected P4: 1-WL orbits are {ends} and {middles}."""
    from llama_spark.operators.wl import wl_colors

    p4 = [(0, 1), (1, 0), (1, 2), (2, 1), (2, 3), (3, 2)]
    rows = wl_colors(edges_df(spark, p4), rounds=3).collect()
    color = {r.id: r.color for r in rows}
    assert color[0] == color[3]
    assert color[1] == color[2]
    assert color[0] != color[1]


def test_wl_isomorphism_invariant_histogram(spark):
    """Relabeling by a permutation preserves the color-class histogram."""
    from llama_spark.operators.wl import wl_colors

    base = [
        (0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 3), (1, 4),
        (6, 0), (6, 5),
    ]
    n = 7
    perm = {v: (3 * v + 2) % n for v in range(n)}
    relabeled = [(perm[s], perm[d]) for s, d in base]
    h1 = sorted(
        r.class_size for r in wl_colors(edges_df(spark, base), 3).collect()
    )
    h2 = sorted(
        r.class_size
        for r in wl_colors(edges_df(spark, relabeled), 3).collect()
    )
    assert h1 == h2


def test_wl_refinement_is_monotone(spark):
    """#color classes never decreases with more rounds."""
    from llama_spark.operators.wl import wl_colors

    edges = [
        (0, 1), (1, 2), (2, 3), (3, 0), (0, 2), (4, 0), (5, 4), (6, 4),
        (6, 5), (3, 6),
    ]
    counts = []
    for r in range(4):
        rows = wl_colors(edges_df(spark, edges), rounds=r).collect()
        counts.append(len({x.color for x in rows}))
    assert counts == sorted(counts)


def test_wl_distinguishes_in_from_out_direction(spark):
    """A source-star and a sink-star have different color histograms —
    the directed refinement separates what undirected WL cannot."""
    from llama_spark.operators.wl import wl_colors

    out_star = [(0, i) for i in range(1, 5)]
    in_star = [(i, 0) for i in range(1, 5)]
    c_out = {
        r.id: r.color
        for r in wl_colors(edges_df(spark, out_star), 1).collect()
    }
    c_in = {
        r.id: r.color
        for r in wl_colors(edges_df(spark, in_star), 1).collect()
    }
    assert c_out[0] != c_in[0]
    assert c_out[1] != c_in[1]


# ------------------------------------------------- robust winnowing (MOSS)


def _docs_df(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def _brute_winnow(text, k, w):
    """Reference MOSS winnowing over whitespace tokens: Karp-Rabin grams
    (mirrors functions/text.py hashing), rightmost-min per window."""
    import hashlib

    toks = [t for t in text.lower().split() if t]
    P31 = 2147483647

    def th(tok):
        return int(hashlib.md5(tok.encode()).hexdigest()[:15], 16) % P31

    hs = [th(t) for t in toks]
    grams = [
        (p + 1, sum(hs[p + j] * 3**j for j in range(k)) % P31)
        for p in range(len(hs) - k + 1)
    ]
    if not grams:
        return set()
    n = len(grams)
    sel = set()
    for start in range(1, max(n - w + 1, 1) + 1):
        win = [g for g in grams if start <= g[0] <= start + w - 1]
        mn = min(v for _, v in win)
        pos = max(p for p, v in win if v == mn)
        sel.add((pos, mn))
    return sel


def test_winnowing_matches_reference_model(spark):
    from llama_spark.functions.dedup import winnowing_fingerprints

    texts = [
        "the quick brown fox jumps over the lazy dog again and again",
        "pack my box with five dozen liquor jugs",
        "a b a b a b a b",  # repeated grams exercise the tie rule
        "tiny doc",  # < k tokens -> no fingerprints
        "one two three",  # exactly k tokens -> single gram
    ]
    got = winnowing_fingerprints(_docs_df(spark, texts), k=3, window=4)
    by_doc = {}
    for r in got.collect():
        by_doc.setdefault(r.doc_id, set()).add((r.pos, r.fp))
    for i, t in enumerate(texts):
        assert by_doc.get(i, set()) == _brute_winnow(t, 3, 4), f"doc {i}"


def test_winnowing_shared_run_guarantee(spark):
    """Two docs sharing a token run of length >= window + k - 1 share at
    least one fingerprint VALUE — the SWA theorem the scheme exists for."""
    from llama_spark.functions.dedup import winnowing_matches

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w + k - 1
    texts = [
        "intro words here " + shared + " tail one",
        "completely different prefix " + shared,
        "no overlap with anything else at all",
    ]
    pairs = {
        (r.a, r.b): r.shared
        for r in winnowing_matches(
            _docs_df(spark, texts), k=3, window=4, min_shared=1
        ).collect()
    }
    assert (0, 1) in pairs
    assert (0, 2) not in pairs and (1, 2) not in pairs


def test_winnowing_max_df_drops_boilerplate(spark):
    from llama_spark.functions.dedup import winnowing_matches

    boiler = "standard footer text common to every page here"
    texts = [f"doc {i} body " + boiler for i in range(5)]
    full = winnowing_matches(
        _docs_df(spark, texts), k=3, window=4, min_shared=1
    ).count()
    capped = winnowing_matches(
        _docs_df(spark, texts), k=3, window=4, min_shared=1, max_df=2
    ).count()
    assert full == 10  # all C(5,2) pairs share the boilerplate run
    assert capped < full


# ----------------------------------------------------- TPC-H Q12 / Q19


def test_tpch_q12_q19_duckdb_crosscheck(spark):
    import duckdb

    from llama_spark.entry_queries import ORACLE, QUERIES

    sf = "/root/testdata/sf0.001"
    con = duckdb.connect()
    for t in ("lineitem", "orders", "part"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")

    got12 = {
        r["l_returnflag"]: (r["high_line_count"], r["low_line_count"])
        for r in QUERIES["tpch_q12"](spark, sf).collect()
    }
    want12 = {
        f: (h, lo) for f, h, lo in con.execute(ORACLE["tpch_q12"]).fetchall()
    }
    assert got12 == want12 and got12

    got19 = QUERIES["tpch_q19"](spark, sf).collect()[0]
    want19 = con.execute(ORACLE["tpch_q19"]).fetchone()
    assert (got19["revenue"], got19["n_lines"]) == want19


def test_tpch_q19_disjunction_stays_single_join(spark):
    """The OR-of-bands predicate must not multiply scans: exactly one
    join of lineitem against the broadcast part side."""
    from llama_spark.entry_queries import QUERIES

    plan = (
        QUERIES["tpch_q19"](spark, "/root/testdata/sf0.001")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("BroadcastHashJoin") == 1
    assert "CartesianProduct" not in plan
