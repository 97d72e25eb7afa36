"""Triad census vs a brute-force O(V^3) Python classifier."""

from __future__ import annotations

import itertools

from tests.conftest import edges_df


def _classify(arcs, t):
    a, b, c = t
    def dy(u, v):
        return (u, v) in arcs, (v, u) in arcs
    pairs = [(a, b), (b, c), (a, c)]
    codes = {p: dy(*p) for p in pairs}
    m = sum(1 for f, r in codes.values() if f and r)
    asym = sum(1 for f, r in codes.values() if f != r)
    null = 3 - m - asym
    if null == 3:
        return "003"
    if m == 0 and asym == 1:
        return "012"
    if m == 1 and null == 2:
        return "102"
    if m == 0 and asym == 2:
        # center = node in both asym dyads
        linked = [p for p, (f, r) in codes.items() if f or r]
        (p1, p2) = linked
        center = (set(p1) & set(p2)).pop()
        out = 0
        for (u, v), (f, r) in codes.items():
            if f != r:
                src = u if f else v
                if src == center:
                    out += 1
        return {2: "021D", 0: "021U"}.get(out, "021C")
    if m == 1 and asym == 1:
        mpair = next(p for p, (f, r) in codes.items() if f and r)
        (u, v), (f, r) = next(
            (p, cd) for p, cd in codes.items() if cd[0] != cd[1]
        )
        head = v if f else u
        return "111D" if head in mpair else "111U"
    if m == 0 and asym == 3:
        outd = {a: 0, b: 0, c: 0}
        for (u, v), (f, r) in codes.items():
            outd[u if f else v] += 1
        return "030T" if max(outd.values()) == 2 else "030C"
    if m == 2 and null == 1:
        return "201"
    if m == 1 and asym == 2:
        mpair = next(p for p, (f, r) in codes.items() if f and r)
        third = (set(t) - set(mpair)).pop()
        tout = 0
        for (u, v), (f, r) in codes.items():
            if f != r:
                src = u if f else v
                if src == third:
                    tout += 1
        return {2: "120D", 0: "120U"}.get(tout, "120C")
    if m == 2 and asym == 1:
        return "210"
    return "300"


def _brute_census(arcs):
    nodes = sorted({v for e in arcs for v in e})
    cnt = dict.fromkeys(
        ["003", "012", "102", "021D", "021U", "021C", "111D", "111U",
         "030T", "030C", "201", "120D", "120U", "120C", "210", "300"], 0)
    for t in itertools.combinations(nodes, 3):
        cnt[_classify(arcs, t)] += 1
    return cnt


def _check(spark, arcs):
    from llama_spark.operators.triads import triad_census

    want = _brute_census(arcs)
    got = {
        r["triad_type"]: r["n"]
        for r in triad_census(edges_df(spark, sorted(arcs))).collect()
    }
    assert got == want


def test_triads_hand_patterns(spark):
    # transitive triangle + a cycle + a mutual pair with a spoke
    _check(spark, {(0, 1), (1, 2), (0, 2),          # 030T
                   (3, 4), (4, 5), (5, 3),          # 030C
                   (6, 7), (7, 6), (7, 8)})         # 111U family


def test_triads_random_digraph(spark):
    arcs = {((i * 13 + 3) % 14, (i * 5 + 1) % 14) for i in range(45)}
    arcs = {e for e in arcs if e[0] != e[1]}
    _check(spark, arcs)


def test_triads_with_mutuals(spark):
    arcs = set()
    for i in range(40):
        u, v = (i * 11 + 2) % 12, (i * 7 + 5) % 12
        if u != v:
            arcs.add((u, v))
            if i % 3 == 0:
                arcs.add((v, u))
    _check(spark, arcs)
