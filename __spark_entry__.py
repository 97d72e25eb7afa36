"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (top-10 PageRank over the edge table
derived from sf0.001, mirroring examples/llama-pagerank.cc:253-270).
``queries()`` / ``oracle_sql()`` — per-operator Spark plans + DuckDB
oracle SQL (see llama_spark/entry_queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from llama_spark.entry_queries import q_pagerank_top10

    return q_pagerank_top10(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from llama_spark.entry_queries import QUERIES
    from llama_spark.entry_queries_docs import DOCS_QUERIES

    return dict(QUERIES) | dict(DOCS_QUERIES)


def oracle_sql() -> dict[str, str]:
    from llama_spark.entry_queries import ORACLE
    from llama_spark.entry_queries_docs import DOCS_ORACLE

    return dict(ORACLE) | dict(DOCS_ORACLE)
