"""Link + text extraction from Common-Crawl-style pages — vectorized, pure.

Input schema (BASELINE.json input_hint):
    pages(url: string, warc_ts: timestamp, html: binary, text: string,
          lang: string)

The extractor is the engine's only scalar-function surface (SURVEY §2.5) and
carries the **byte-identical-per-url** contract: ``extract_text_bytes`` is a
pinned pure function of the html bytes — no environment-dependent parsing,
no library version drift (stdlib ``re`` only) — so extracted text matches
the golden fixtures byte-for-byte on any worker.

Both extractors run as Arrow-batched pandas UDFs (``mapInPandas``) — no
per-row Python UDFs anywhere (input-hint mandate). This is the Spark analog
of LLAMA's loader front end (ll_load_net.h:56-378 parses an edge file; here
the "file format" is HTML).
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

HREF_RE = re.compile(rb'<a\s+[^>]*href="([^"]+)"', re.IGNORECASE)
TAG_RE = re.compile(rb"<[^>]+>")
SCRIPT_RE = re.compile(rb"<(script|style)\b.*?</\1>", re.IGNORECASE | re.DOTALL)
WS_RE = re.compile(rb"\s+")

LINKS_SCHEMA = "src_url string, dst_url string"
TEXT_SCHEMA = "url string, text string"


def extract_links_bytes(html: bytes) -> list[bytes]:
    """All href targets of <a> anchors, in document order (pure function)."""
    return HREF_RE.findall(html)


def extract_text_bytes(html: bytes) -> bytes:
    """Visible text: drop script/style blocks, strip tags, collapse runs of
    whitespace to single spaces, trim. Pinned — changing this breaks the
    byte-identical golden contract."""
    no_script = SCRIPT_RE.sub(b" ", html)
    no_tags = TAG_RE.sub(b" ", no_script)
    return WS_RE.sub(b" ", no_tags).strip()


def extract_links(pages: DataFrame) -> DataFrame:
    """pages → DataFrame[src_url, dst_url], one row per anchor."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            srcs: list[str] = []
            dsts: list[str] = []
            for url, html in zip(pdf["url"], pdf["html"]):
                for target in extract_links_bytes(bytes(html)):
                    srcs.append(url)
                    dsts.append(target.decode("utf-8", errors="replace"))
            yield pd.DataFrame({"src_url": srcs, "dst_url": dsts})

    return pages.select("url", "html").mapInPandas(batches, schema=LINKS_SCHEMA)


def extract_text(pages: DataFrame) -> DataFrame:
    """pages → DataFrame[url, text] with the byte-identical contract."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            texts = [
                extract_text_bytes(bytes(h)).decode("utf-8", errors="replace")
                for h in pdf["html"]
            ]
            yield pd.DataFrame({"url": pdf["url"], "text": texts})

    return pages.select("url", "html").mapInPandas(batches, schema=TEXT_SCHEMA)


def url_domain(url):  # Column -> Column
    """Registrable-host of a url as a Catalyst expression (no UDF):
    strips scheme, userinfo, port, path. The gid_of expression for
    ``contract_graph_expr`` on url-keyed link tables."""
    from pyspark.sql import functions as F

    return F.regexp_extract(url, r"^(?:[a-z][a-z0-9+.-]*://)?(?:[^/@]*@)?([^/:?#]+)", 1)


ANCHOR_RE = re.compile(
    rb'<a\s+[^>]*href="([^"]+)"[^>]*>(.*?)</a>', re.IGNORECASE | re.DOTALL
)
ANCHORS_SCHEMA = "src_url string, dst_url string, anchor string"


def extract_anchors_bytes(html: bytes) -> list[tuple[bytes, bytes]]:
    """(href, visible anchor text) per <a>...</a>, document order — the
    anchor text goes through the SAME pinned text pipeline as page text,
    so the byte-identical contract extends to anchors (pure function)."""
    return [
        (href, extract_text_bytes(inner))
        for href, inner in ANCHOR_RE.findall(html)
    ]


def extract_anchor_texts(pages: DataFrame) -> DataFrame:
    """pages → DataFrame[src_url, dst_url, anchor], one row per anchor.

    The web-native third column of link extraction: anchor text is the
    linking page's description of the TARGET — per-target aggregation of
    it is the classic index-side relevance feature (and the standard
    web-scale label source for target-page classification)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            srcs: list[str] = []
            dsts: list[str] = []
            texts: list[str] = []
            for url, html in zip(pdf["url"], pdf["html"]):
                for href, anchor in extract_anchors_bytes(bytes(html)):
                    srcs.append(url)
                    dsts.append(href.decode("utf-8", errors="replace"))
                    texts.append(anchor.decode("utf-8", errors="replace"))
            yield pd.DataFrame({"src_url": srcs, "dst_url": dsts, "anchor": texts})

    return pages.select("url", "html").mapInPandas(batches, schema=ANCHORS_SCHEMA)


def anchor_text_summary(anchors: DataFrame, top_k: int = 3) -> DataFrame:
    """Per-target anchor aggregation:
    DataFrame[dst_url, anchor, cnt, n_inlinks, rank] — each target's
    ``top_k`` most frequent anchor strings (ties → lexicographic), with
    the target's total in-anchor count. Pure Catalyst after extraction:
    one (dst, anchor) groupBy, one per-dst count, one bounded window
    (the window partition holds DISTINCT anchor strings per target, not
    raw in-links — hub targets collapse in the map-side combine)."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    counts = anchors.groupBy("dst_url", "anchor").agg(F.count("*").alias("cnt"))
    inlinks = anchors.groupBy("dst_url").agg(F.count("*").alias("n_inlinks"))
    w = Window.partitionBy("dst_url").orderBy(F.desc("cnt"), F.asc("anchor"))
    return (
        counts.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .join(inlinks, "dst_url")
        .select("dst_url", "anchor", "cnt", "n_inlinks", "rank")
    )
