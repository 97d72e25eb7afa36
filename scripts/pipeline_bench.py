"""End-to-end north-star pipeline benchmark at the FIXTURES 'bench' size.

pages (2^scale, default 2^17 ≈ 131k) → link+text extraction → dense-id
dictionary → edge table → PageRank ×10 → top-10 urls. Reports per-phase
seconds and throughputs as one JSON line; appends to BENCH/BASELINE.md.

Usage: python scripts/pipeline_bench.py [scale] [cores]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    scale = int(sys.argv[1]) if len(sys.argv) > 1 else 17
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else int(os.environ.get("SPARK_GRAFT_CPUS", "16"))

    from pyspark.storagelevel import StorageLevel

    from llama_spark.operators.pagerank import pagerank_result
    from llama_spark.session import get_spark
    from llama_spark.sources.edges import edges_from_pages
    from llama_spark.sources.pages import generate_pages

    spark = get_spark(app_name="pipeline_bench", cores=cores, shuffle_partitions=cores)
    phases: dict[str, float] = {}

    t = time.time()
    pages = generate_pages(spark, scale=scale, avg_degree=8).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    n_pages = pages.count()
    phases["generate"] = round(time.time() - t, 2)

    t = time.time()
    edges, dictionary = edges_from_pages(pages)
    edges = edges.persist(StorageLevel.MEMORY_AND_DISK)
    n_edges = edges.count()
    phases["extract_dict_edges"] = round(time.time() - t, 2)

    t = time.time()
    res = pagerank_result(edges, max_iter=10)
    res.state.count()
    phases["pagerank10"] = round(time.time() - t, 2)
    iter_secs = [m.seconds for m in res.metrics]

    t = time.time()
    from pyspark.sql import functions as F

    top = (
        res.state.join(dictionary, "id")
        .orderBy(F.desc("rank"), F.asc("url"))
        .limit(10)
        .collect()
    )
    phases["top10_urls"] = round(time.time() - t, 2)

    result = {
        "scale": scale,
        "cores": cores,
        "n_pages": n_pages,
        "n_edges": n_edges,
        "phases_sec": phases,
        "total_sec": round(sum(phases.values()), 2),
        "pages_per_sec_etl": round(n_pages / (phases["generate"] + phases["extract_dict_edges"]), 1),
        "pagerank_edges_per_sec_per_iter_steady": round(n_edges / min(iter_secs), 1),
        "top_url": top[0]["url"],
        "host_loadavg": open("/proc/loadavg").read().split()[0],
    }
    print(json.dumps(result))
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as f:
        f.write(
            f"\n**Pipeline bench** (scale {scale}, local[{cores}], loadavg "
            f"{result['host_loadavg']}): {n_pages} pages → {n_edges} edges; "
            f"phases {phases}; steady PR throughput "
            f"{result['pagerank_edges_per_sec_per_iter_steady']} edges/s/iter.\n"
        )
    spark.stop()


if __name__ == "__main__":
    main()
