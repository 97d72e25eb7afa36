"""End-to-end pages pipeline: generate → extract → dictionary → edges → CSR
→ PageRank (FIXTURES.md F1/F2; SURVEY §7 stage 1-3)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def pages(spark):
    from llama_spark.sources.pages import generate_pages

    df = generate_pages(spark, scale=8, avg_degree=4, seed=42).persist()
    df.count()
    return df


def test_pages_schema_and_count(pages):
    assert [f.name for f in pages.schema.fields] == ["url", "warc_ts", "html", "text", "lang"]
    types = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
    assert types == {
        "url": "string",
        "warc_ts": "timestamp",
        "html": "binary",
        "text": "string",
        "lang": "string",
    }
    assert pages.count() == 256


def test_text_extraction_byte_identical(pages):
    """The byte-identical-per-url invariant (BASELINE.json input_hint):
    extractor(html) must equal the stored text column byte-for-byte."""
    from llama_spark.sources.extract import extract_text

    extracted = extract_text(pages)
    joined = pages.select("url", F.col("text").alias("want")).join(extracted, "url")
    mismatches = joined.filter(
        F.encode("want", "utf-8") != F.encode("text", "utf-8")
    ).count()
    assert mismatches == 0
    assert extracted.count() == 256


def test_extraction_is_pure_python_parity(pages):
    """Spark-side extraction equals driver-side pure-function application."""
    from llama_spark.sources.extract import extract_links_bytes, extract_text_bytes

    rows = pages.select("url", "html", "text").limit(20).collect()
    for r in rows:
        assert extract_text_bytes(bytes(r["html"])).decode() == r["text"]
        assert len(extract_links_bytes(bytes(r["html"]))) >= 1


def test_generation_partition_invariance(spark):
    """Same pages regardless of parallelism (counter-based generator)."""
    from llama_spark.sources.pages import generate_pages

    a = generate_pages(spark, scale=6, avg_degree=4, num_partitions=2)
    b = generate_pages(spark, scale=6, avg_degree=4, num_partitions=7)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0


def test_dense_id_dictionary(spark, pages):
    from llama_spark.sources.edges import edges_from_pages

    edges, dictionary = edges_from_pages(pages)
    n = dictionary.count()
    stats = dictionary.agg(
        F.min("id").alias("lo"), F.max("id").alias("hi"),
        F.countDistinct("id").alias("d"),
    ).collect()[0]
    assert stats["lo"] == 0 and stats["hi"] == n - 1 and stats["d"] == n  # dense, unique
    # determinism: rebuilding yields the identical mapping
    _, dict2 = edges_from_pages(pages)
    assert dictionary.exceptAll(dict2).count() == 0


def test_dense_id_bucket_autoscaling(spark):
    """Bucket count derives from the data size (no fixed single-task sort
    ceiling): with a tiny per-bucket target the ids stay dense, unique and
    deterministic across partition counts."""
    from llama_spark.sources.edges import assign_dense_ids

    urls = spark.range(1000).select(F.concat(F.lit("u"), F.col("id")).alias("url"))
    a = assign_dense_ids(urls.repartition(3), "url", target_rows_per_bucket=2)
    b = assign_dense_ids(urls.repartition(11), "url", target_rows_per_bucket=2)
    n = a.count()
    stats = a.agg(
        F.min("id").alias("lo"), F.max("id").alias("hi"),
        F.countDistinct("id").alias("d"),
    ).collect()[0]
    assert (stats["lo"], stats["hi"], stats["d"]) == (0, n - 1, n)
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0


def test_edges_match_pure_python(spark, pages):
    """Edge table == pure-python extraction + dictionary on collected pages."""
    from llama_spark.sources.edges import edges_from_pages
    from llama_spark.sources.extract import extract_links_bytes

    edges, dictionary = edges_from_pages(pages)
    url2id = {r["url"]: r["id"] for r in dictionary.collect()}
    want = set()
    for r in pages.select("url", "html").collect():
        for t in extract_links_bytes(bytes(r["html"])):
            want.add((url2id[r["url"]], url2id[t.decode()]))
    got = {(r["src"], r["dst"]) for r in edges.collect()}
    assert got == want


def test_csr_roundtrip(spark, pages):
    from llama_spark.operators.csr import pack_csr, unpack_csr
    from llama_spark.sources.edges import edges_from_pages

    edges, _ = edges_from_pages(pages)
    back = unpack_csr(pack_csr(edges, 8))
    assert edges.exceptAll(back).count() == 0
    assert back.exceptAll(edges).count() == 0


def test_pagerank_csr_equals_dataframe_pagerank(spark, pages):
    from llama_spark.operators.csr import pagerank_csr
    from llama_spark.operators.pagerank import pagerank
    from llama_spark.sources.edges import edges_from_pages

    edges, _ = edges_from_pages(pages)
    a = {r["id"]: r["rank"] for r in pagerank(edges, max_iter=5).collect()}
    b = {r["id"]: r["rank"] for r in pagerank_csr(edges, max_iter=5).collect()}
    assert set(a) == set(b)
    for k in a:
        assert math.isclose(a[k], b[k], rel_tol=0, abs_tol=1e-9), k


def test_salting(spark, pages):
    from llama_spark.sources.edges import edges_from_pages, salt_edges, salt_fanout_from_histogram

    edges, _ = edges_from_pages(pages)
    fanout = salt_fanout_from_histogram(edges, target_rows_per_key=10)
    assert fanout >= 1
    salted = salt_edges(edges, fanout=4)
    assert salted.select("_salt").distinct().count() <= 4
    # two-stage aggregation equals direct aggregation
    direct = edges.groupBy("dst").count()
    twostage = (
        salted.groupBy("dst", "_salt").count()
        .groupBy("dst").agg(F.sum("count").alias("count"))
    )
    assert direct.exceptAll(twostage).count() == 0


def test_anchor_extraction_matches_pure_python(spark, pages):
    """Anchor rows (src, dst, text) must equal a pure-Python replay of the
    pinned extractor over the collected html — and the anchor text goes
    through the SAME byte-identical text pipeline."""
    from llama_spark.sources.extract import (
        extract_anchor_texts,
        extract_anchors_bytes,
    )

    got = sorted(
        (r["src_url"], r["dst_url"], r["anchor"])
        for r in extract_anchor_texts(pages).collect()
    )
    expect = []
    for r in pages.select("url", "html").collect():
        for href, anchor in extract_anchors_bytes(bytes(r["html"])):
            expect.append((r["url"], href.decode(), anchor.decode()))
    assert got == sorted(expect)
    # generator embeds "link {j} from {page_id}" anchors — spot the shape
    assert all(a.startswith("link ") and " from " in a for _, _, a in expect)


def test_anchor_summary_top1_matches_model(spark, pages):
    from collections import Counter, defaultdict

    from llama_spark.sources.extract import anchor_text_summary, extract_anchor_texts

    anchors = extract_anchor_texts(pages).persist()
    rows = anchor_text_summary(anchors, top_k=1).collect()
    model = defaultdict(Counter)
    total = Counter()
    for r in anchors.collect():
        model[r["dst_url"]][r["anchor"]] += 1
        total[r["dst_url"]] += 1
    assert len(rows) == len(model)
    for r in rows:
        assert r["rank"] == 1
        assert r["n_inlinks"] == total[r["dst_url"]]
        best = min(model[r["dst_url"]].items(), key=lambda kv: (-kv[1], kv[0]))
        assert (r["anchor"], r["cnt"]) == best
    anchors.unpersist()
