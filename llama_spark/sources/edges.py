"""Edge-table ETL: url→id dictionary, edge build, skew handling.

This is LLAMA's two-pass loader (ll_load_utils.h:142-1129) re-expressed as
Spark shuffles: pass 1 (degree count + external sort) ≡ groupBy/
repartitionByRange; pass 2 (CSR write) ≡ the packed-CSR builder in
operators/csr.py. Dedup ≡ dropDuplicates (lc_deduplicate); undirected
doubling/ordering ≡ graph.py helpers.

Scale design:
- **dense id assignment** avoids any single-partition window: urls are
  hash-bucketed, per-bucket counts are collected (B small), and ids are
  ``offset[bucket] + row_number within bucket`` — deterministic across
  runs and parallelism levels, fully distributed.
- **hub salting**: PageRank-style aggregations on a power-law graph have a
  few dst keys carrying millions of rows. ``salt_edges`` splits each edge's
  shuffle key into (dst, salt) with salt fanout chosen from the degree
  histogram (tools/degree_distribution.h as skew detector); kernels do a
  two-stage aggregate: partial by (dst, salt), final by dst. Spark's own
  partial aggregation covers groupBy skew; explicit salting matters for
  join-side skew and is exposed for kernels that need it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def assign_dense_ids(
    df: DataFrame,
    col: str = "url",
    buckets: int | None = None,
    target_rows_per_bucket: int = 2_000_000,
) -> DataFrame:
    """DataFrame[<col>, id] — dense ids [0, N), deterministic: ordered by
    (hash bucket, value) with per-bucket offsets.

    ``buckets=None`` (default) sizes the bucket count from the exact
    distinct count so each bucket's single-task sort stays bounded at
    ``target_rows_per_bucket`` rows — a fixed bucket count is a hard scale
    ceiling (N/256 rows per task at 10^12 urls). The count is a property of
    the DATA, not the parallelism, so ids stay identical across partition
    counts and reruns. Offsets are a cumulative sum over the B-row bucket
    histogram, computed on the driver: B = N / target_rows_per_bucket is
    ~500k ints even at 10^12 urls (a few MB, once per load) — cheaper and
    quieter than an unpartitioned window (single-task sort + WindowExec
    warning) for a frame this small.
    """
    from pyspark.sql import Window

    distinct = df.select(col).distinct().persist(StorageLevel.MEMORY_AND_DISK)
    if buckets is None:
        n = distinct.count()
        b = max(1, -(-n // target_rows_per_bucket))
        buckets = max(256, 1 << (b - 1).bit_length())  # pow2, >= 256
    bucketed = distinct.withColumn(
        "_b", F.pmod(F.xxhash64(F.col(col)), F.lit(buckets)).cast("int")
    )
    hist = {
        r["_b"]: r["_cnt"]
        for r in bucketed.groupBy("_b").agg(F.count("*").alias("_cnt")).collect()
    }
    off_rows, acc = [], 0
    for bkt in sorted(hist):
        off_rows.append((bkt, acc))
        acc += hist[bkt]
    offsets = df.sparkSession.createDataFrame(off_rows, "_b int, _off long")
    w = Window.partitionBy("_b").orderBy(col)
    out = (
        bucketed.join(F.broadcast(offsets), "_b")
        .withColumn("_rn", F.row_number().over(w))
        .select(col, (F.col("_off") + F.col("_rn") - 1).alias("id"))
        .localCheckpoint(eager=True)
    )
    distinct.unpersist()
    return out


def edges_from_pages(
    pages: DataFrame,
    dedup: bool = True,
    id_buckets: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """pages → (edges[src, dst], dictionary[url, id]).

    Link extraction (pandas UDF) → union of all urls (sources ∪ targets,
    so dangling link targets get ids too) → dense dictionary → double
    dictionary join. Mirrors the reference loader: node space = every id
    seen on either endpoint (ll_load_utils.h pass 1).
    """
    from .extract import extract_links

    links = extract_links(pages).persist(StorageLevel.MEMORY_AND_DISK)
    urls = (
        links.select(F.col("src_url").alias("url"))
        .unionAll(links.select(F.col("dst_url").alias("url")))
        .distinct()
    )
    # assign_dense_ids returns an eagerly-checkpointed dictionary — no
    # extra persist layer (double-storing piles up stale blocks)
    dictionary = assign_dense_ids(urls, "url", buckets=id_buckets)
    d_src = dictionary.select(F.col("url").alias("src_url"), F.col("id").alias("src"))
    d_dst = dictionary.select(F.col("url").alias("dst_url"), F.col("id").alias("dst"))
    edges = links.join(d_src, "src_url").join(d_dst, "dst_url").select("src", "dst")
    if dedup:
        edges = edges.dropDuplicates(["src", "dst"])
    # materialize the edge table (a loader's pass-2 output) so the link
    # cache can be released instead of leaking across the session
    edges = edges.localCheckpoint(eager=True)
    links.unpersist()
    return edges, dictionary


def salt_fanout_from_histogram(edges: DataFrame, target_rows_per_key: int = 1_000_000) -> int:
    """Pick a salt fanout from the max in-degree: ceil(max_deg / target).
    1 means no salting needed at this scale."""
    row = edges.groupBy("dst").count().agg(F.max("count").alias("m")).collect()[0]
    max_deg = row["m"] or 0
    return max(1, -(-max_deg // target_rows_per_key))


def salt_edges(edges: DataFrame, fanout: int, key: str = "dst") -> DataFrame:
    """Add a deterministic salt column in [0, fanout) derived from the
    opposite endpoint — two-stage aggregations group by (key, _salt) then
    key. Deterministic (no rand()) so resumed runs reproduce partitioning."""
    other = "src" if key == "dst" else "dst"
    return edges.withColumn(
        "_salt", F.pmod(F.xxhash64(F.col(other)), F.lit(fanout)).cast("int")
    )


def write_versioned(edges: DataFrame, path: str, level: int) -> None:
    """Append one immutable snapshot level (ll_mlcsr_sp.h:624-713 analog) —
    see streaming/snapshots.py for the manifest layer."""
    edges.write.mode("overwrite").parquet(f"{path}/level={level}")
