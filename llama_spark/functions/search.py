"""Positional inverted index + exact phrase search.

The index-construction half of a web-search stack (the reference engine
is the graph half): tokenize once, keep (doc, term, position) — the
classic positional posting list — and answer an exact k-word phrase query
as a (k-1)-way self-join on adjacent positions, co-partitioned by doc.

Portability contract (entry_queries_docs.py header): tokens =
filter(split(lower(text), '\\s+'), x <> ''), positions 1-based — the same
pinned tokenizer every other text gate uses, so the oracle joins the
identical posting table.

100-TB lens: the index is one posexplode + repartition-by-term write (a
bucketed/partitioned parquet table in production); a phrase query touches
only the queried terms' postings (predicate pushdown on tok), and the
adjacency joins are hash joins keyed (doc_id, pos) after the per-term
filter — the rarest-term posting should drive the join order, which
Catalyst/AQE picks from the post-filter sizes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def positional_index(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """DataFrame[doc_id, tok, pos] — 1-based positional posting list."""
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), r"\s+"), lambda x: x != ""
    )
    return docs.select(
        F.col(id_col).alias("doc_id"), F.posexplode(toks).alias("p0", "tok")
    ).select("doc_id", "tok", (F.col("p0") + 1).cast("long").alias("pos"))


def phrase_search(
    docs: DataFrame,
    phrase: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Exact phrase match → DataFrame[doc_id, n_matches, first_pos].

    A k-word phrase matches at position p iff word_i sits at p+i for all
    i — (k-1) adjacency self-joins over the positional index, each keyed
    (doc_id, pos) on term-filtered postings.
    """
    words = [w for w in phrase.lower().split() if w]
    if not words:
        raise ValueError("empty phrase")
    idx = positional_index(docs, id_col=id_col, text_col=text_col)
    hits = idx.filter(F.col("tok") == words[0]).select("doc_id", "pos")
    for i, w in enumerate(words[1:], start=1):
        nxt = idx.filter(F.col("tok") == w).select(
            "doc_id", (F.col("pos") - i).alias("pos")
        )
        hits = hits.join(nxt, ["doc_id", "pos"])
    return hits.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_matches"), F.min("pos").alias("first_pos")
    )


# Patterns kept in the Java-regex ∩ RE2 common subset (no lookaround, no
# backreferences) so Spark and the DuckDB oracle agree on semantics —
# the content_flags contract.
_URL_SPLIT = r"^([A-Za-z][A-Za-z0-9+.-]*)://([^/?#]*)([^?#]*)(.*)$"


def normalize_urls(df: DataFrame, url_col: str = "url") -> DataFrame:
    """RFC 3986 §6 syntax-based URL normalization (the crawl-dedup subset)
    → input columns + ``canonical``.

    The canonicalization every web-crawl pipeline applies before URL-level
    dedup / frontier seeding (RFC 3986 §6.2; the normalizations Common
    Crawl-class crawlers treat as semantics-preserving):

      - scheme and host lowercased (§6.2.2.1)
      - default port dropped (:80 for http, :443 for https) (§6.2.3)
      - trailing dot of a fully-qualified host dropped
      - fragment dropped (§3.5 — never sent to the server)
      - path dot-segments resolved: '/./' and '/seg/../' (§6.2.2.3;
        4 bounded replace-all rounds — resolves nestings ≤ 4 deep, the
        crawl-practical envelope), '//' collapsed
      - empty path → '/' (§6.2.3)
      - a bare trailing '?' dropped

    Pure Catalyst regexp expressions — no UDF, embarrassingly parallel
    at any scale.
    """
    u = F.col(url_col)
    scheme = F.lower(F.regexp_extract(u, _URL_SPLIT, 1))
    host = F.lower(F.regexp_extract(u, _URL_SPLIT, 2))
    path = F.regexp_extract(u, _URL_SPLIT, 3)
    tail = F.regexp_extract(u, _URL_SPLIT, 4)  # '?query' and/or '#frag'

    # host: strip the scheme's default port FIRST, then a trailing dot
    # (a fully-qualified 'host.:443' must shed the port before the dot
    # becomes the suffix)
    host = F.when(
        scheme == "http", F.regexp_replace(host, r":80$", "")
    ).when(
        scheme == "https", F.regexp_replace(host, r":443$", "")
    ).otherwise(host)
    host = F.regexp_replace(host, r"\.$", "")

    # path: collapse '//', resolve dot-segments in 4 bounded rounds
    path = F.regexp_replace(path, r"/{2,}", "/")
    for _ in range(4):
        path = F.regexp_replace(path, r"/\./", "/")
        path = F.regexp_replace(path, r"/[^/.][^/]*/\.\./", "/")
    path = F.regexp_replace(path, r"/\.$", "/")
    path = F.when(path == "", F.lit("/")).otherwise(path)

    # tail: drop fragment, then a bare trailing '?'
    query = F.regexp_replace(tail, r"#.*$", "")
    query = F.regexp_replace(query, r"^\?$", "")

    return df.withColumn(
        "canonical",
        F.when(
            scheme == "", u  # not a parseable absolute URL: left untouched
        ).otherwise(F.concat(scheme, F.lit("://"), host, path, query)),
    )
