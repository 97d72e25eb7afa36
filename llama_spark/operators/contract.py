"""Graph contraction — collapse nodes into groups (pages → domains).

The web-graph workflow this serves: the link graph extracted from
Common-Crawl-style pages (sources/extract.py) is page-level; most
link-spam / centrality analyses run on the *host graph* — every page
mapped to its domain, parallel inter-domain links collapsed into one
weighted edge, intra-domain links dropped. The contracted graph is
typically 3-4 orders of magnitude smaller than the page graph, which is
what makes domain-level PageRank cheap enough to iterate to convergence.

Two mapping forms, chosen by what the group id is derived from:

* ``contract_graph(edges, mapping)`` — mapping is a DataFrame[id, gid]
  (an explicit dictionary). Costs two hash joins before the groupBy; at
  10^12 pages the mapping is as big as the node set, so the joins
  co-partition on the id — no broadcast.
* ``contract_graph_expr(edges, gid_of)`` — gid is an *expression* of
  the node id (e.g. ``url_domain(col)`` on a url-keyed edge table, or a
  modulo on packed ids). No join at all: the contraction is one
  projection + one groupBy — the form to prefer whenever the group is
  computable from the key, which for url→domain it always is.

Both drop intra-group edges and return ``DataFrame[src, dst, weight]``
where weight = number of original edges collapsed into the group edge —
ready for ``pagerank_result(..., weight_col="weight")``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..graph import DST, SRC


def contract_graph(edges: DataFrame, mapping: DataFrame) -> DataFrame:
    """Contract via an explicit DataFrame[id, gid] dictionary.

    Nodes absent from the mapping keep their own id as group id (so a
    partial dictionary — e.g. only the crawled subset — is safe).
    """
    ms = mapping.select(F.col("id").alias(SRC), F.col("gid").alias("gsrc"))
    md = mapping.select(F.col("id").alias(DST), F.col("gid").alias("gdst"))
    return (
        edges.join(ms, SRC, "left")
        .join(md, DST, "left")
        .select(
            F.coalesce("gsrc", F.col(SRC)).alias(SRC),
            F.coalesce("gdst", F.col(DST)).alias(DST),
        )
        .filter(F.col(SRC) != F.col(DST))
        .groupBy(SRC, DST)
        .agg(F.count("*").cast("double").alias("weight"))
    )


def contract_graph_expr(
    edges: DataFrame, gid_of: Callable[[Column], Column]
) -> DataFrame:
    """Contract via a pure expression of the node key — join-free."""
    return (
        edges.select(gid_of(F.col(SRC)).alias(SRC), gid_of(F.col(DST)).alias(DST))
        .filter(F.col(SRC) != F.col(DST))
        .groupBy(SRC, DST)
        .agg(F.count("*").cast("double").alias("weight"))
    )
