import math
from tests import oracle
from tests.conftest import edges_df, rmat_edges, two_islands, CHAIN10

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
