"""Distributed FW-BW-coloring SCC vs sequential Kosaraju oracle."""

from __future__ import annotations

import numpy as np

from tests import oracle
from tests.conftest import K3, SELF_LOOPS_DUPS, edges_df, rmat_edges


def random_digraph(n, m, seed):
    rng = np.random.RandomState(seed)
    return list(zip(rng.randint(0, n, m).tolist(), rng.randint(0, n, m).tolist()))


def test_scc(spark):
    from llama_spark.operators.scc import strongly_connected_components

    cases = {
        "k3": K3,                                   # one 3-cycle SCC
        "self_loops_dups": SELF_LOOPS_DUPS,
        "chain_rev": [(i + 1, i) for i in range(8)],  # worst case: all singletons
        "two_cycles": [(0, 1), (1, 2), (2, 0), (3, 4), (4, 3), (2, 3)],
        "rand_dense": random_digraph(30, 120, 7),   # few big SCCs
        "rmat": rmat_edges(scale=6, avg_degree=3),
    }
    for name, pairs in cases.items():
        got = {
            r["id"]: r["scc"]
            for r in strongly_connected_components(edges_df(spark, pairs)).collect()
        }
        want = oracle.kosaraju_scc(pairs)
        assert got == want, (name, {k: (got[k], want[k]) for k in want if got.get(k) != want[k]})


def test_scc_on_gate_edges(spark):
    """Gate-adjacent: SCC on the ACTUAL sf0.01 gate edge table vs the
    sequential Kosaraju oracle (SCC has no SQL-expressible DuckDB oracle —
    documented in SURVEY §2.1 — so this is its correctness anchor at the
    gate's own data)."""
    from llama_spark.entry_queries import load_edges
    from llama_spark.operators.scc import strongly_connected_components

    edges = load_edges(spark, "/root/testdata/sf0.01")
    pairs = [(r["src"], r["dst"]) for r in edges.collect()]
    got = {
        r["id"]: r["scc"]
        for r in strongly_connected_components(edges).collect()
    }
    want = oracle.kosaraju_scc(pairs)
    assert got == want


def test_scc_trim_chain(spark):
    """FW-BW-Trim: a reversed chain of singleton SCCs feeding a cycle is
    settled almost entirely by the Trim degree-peel — the expensive
    forward-coloring fixpoint runs ONCE (for the cycle), where plain FW-BW
    pays one coloring per chain node (max-id coloring finds a single root
    per round on a descending-id chain)."""
    from llama_spark.operators.scc import strongly_connected_components

    tail = [(i + 1, i) for i in range(3, 10)]  # 10→9→…→4→3, descending ids
    cycle = [(0, 1), (1, 2), (2, 0), (3, 0)]
    pairs = tail + cycle
    stats: dict = {}
    got = {
        r["id"]: r["scc"]
        for r in strongly_connected_components(
            edges_df(spark, pairs), stats=stats
        ).collect()
    }
    want = oracle.kosaraju_scc(pairs)
    assert got == want
    assert stats["colorings"] == 1, stats   # plain FW-BW would pay ~8
    assert stats["trimmed"] == 8, stats     # every chain node settled by Trim
