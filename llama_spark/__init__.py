"""llama_spark — a from-scratch PySpark-native link-graph analytics engine.

Capabilities modeled on goatdb/llama (LLAMA, ICDE '15): PageRank, connected
components, label propagation, triangle counting, BFS/SSSP, degree
analytics — all as iterative DataFrame plans + vectorized Arrow UDFs over an
edge table extracted from Common-Crawl-style web pages, plus the
training-data-pipeline operators (dedup, similarity search, text analysis)
a 100 TB corpus needs. NOT a port: the reference is a single-node C++
mmap'd multi-version CSR; this engine is Catalyst/AQE-first.
"""

from __future__ import annotations

__version__ = "0.1.0"

from .session import get_spark  # noqa: F401
