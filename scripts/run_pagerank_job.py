"""Cluster job entry point — the spark-submit shape the north rule names.

Local sandbox:
    python scripts/run_pagerank_job.py /root/testdata/sf0.01 10

Real cluster (multi-executor; identical code — only the master and the
--py-files packaging differ):
    cd /path/to/repo && zip -r /tmp/llama_spark.zip llama_spark
    spark-submit --master yarn --deploy-mode cluster \
        --num-executors 250 --executor-cores 4 --executor-memory 16g \
        --py-files /tmp/llama_spark.zip \
        scripts/run_pagerank_job.py s3://bucket/sfdir 10

The engine contains no local-mode assumptions: session defaults tune
shuffle partitions to the session's parallelism, kernels pick broadcast vs
shuffled-hash joins from state size, and checkpoint manifests live on
whatever filesystem the checkpoint dir points at.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    iters = int(sys.argv[2]) if len(sys.argv) > 2 else 10

    from pyspark.sql import SparkSession

    # On a cluster spark-submit provides the session; locally fall back to
    # the tuned builder.
    spark = SparkSession.getActiveSession()
    if spark is None:
        from llama_spark.session import get_spark

        spark = get_spark(app_name="pagerank_job")

    from llama_spark.entry_queries import load_edges
    from llama_spark.operators.pagerank import pagerank_result

    edges = load_edges(spark, sf_dir).persist()
    m = edges.count()
    t0 = time.time()
    res = pagerank_result(edges, max_iter=iters)
    top = res.state.orderBy("rank", ascending=False).limit(10).collect()
    wall = time.time() - t0
    print(
        json.dumps(
            {
                "edges": m,
                "iterations": res.iterations,
                "wall_sec": round(wall, 2),
                "edges_per_sec_per_iter": round(m * iters / wall, 1),
                "top10": [(r["id"], round(r["rank"], 8)) for r in top],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
