import math
from tests import oracle
from tests.conftest import edges_df, rmat_edges, two_islands, CHAIN10

def test_bc_k100_reference_default(spark):
    """K=100 sampled roots — the reference's default operating point
    (bc_random.h, benchmark.cc:1474) — vs python Brandes on those roots."""
    from llama_spark.operators.bc import betweenness_centrality, pick_roots

    pairs = rmat_edges(scale=7, avg_degree=4)
    df = edges_df(spark, pairs)
    roots = pick_roots(df, k=100, seed=7)
    assert len(roots) == 100 and len(set(roots)) == 100
    got = {r["id"]: r["bc"] for r in betweenness_centrality(df, roots=roots).collect()}
    want = oracle.brandes_bc(pairs, roots)
    assert set(got) == set(want)
    for k in want:
        assert math.isclose(got[k], want[k], rel_tol=1e-9, abs_tol=1e-9), k


def test_bc(spark):
    from llama_spark.operators.bc import betweenness_centrality
    for name, pairs in [("chain10", CHAIN10), ("rmat", rmat_edges(scale=7, avg_degree=4)),
                        ("islands", two_islands())]:
        roots = sorted({u for e in pairs for u in e})[:6]
        got = {r["id"]: r["bc"] for r in betweenness_centrality(edges_df(spark, pairs), roots=roots).collect()}
        want = oracle.brandes_bc(pairs, roots)
        assert set(got) == set(want), name
        for k in want:
            assert math.isclose(got[k], want[k], rel_tol=1e-9, abs_tol=1e-9), (name, k, got[k], want[k])
