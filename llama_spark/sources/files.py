"""File-format loaders and synthetic generators — the reference's pluggable
ll_file_loader surface (ll_file_loaders.h) re-expressed as DataFrame readers.

- ``read_snap``: SNAP / Pajek-style text edge lists (``.net``/``.snap``,
  ll_load_net.h:56-378): one ``src dst`` pair per line, arbitrary
  whitespace separators, ``#`` comment lines and blank lines skipped.
  Implemented as text scan + JVM split/cast (whole-stage codegen; parquet
  conversion is one ``.write`` away) rather than a driver-side parser.
- ``erdos_renyi``: the ER(nodes, edges [, seed]) generator
  (ll_gen_erdosrenyi.h:150-236): m edges with uniform independent endpoints
  (self-loops and duplicates possible, exactly like the reference's
  ``rand % n`` draws). Counter-based — each edge is a pure function of
  (seed, edge index) via xxhash64 — so output is identical at any
  parallelism (same property as sources/pages.py rmat_endpoints).

- ``read_xstream1``: X-Stream type-1 binary edge lists (``.dat``/``.xs1``,
  ll_load_xstream1.h:144-330): fixed 12-byte records ``(u32 tail, u32
  head, f32 weight)``, little-endian. The file is split into record-aligned
  byte ranges on the driver (exactly the reference's partial-load offset
  math, ll_load_xstream1.h:273-287) and each range is read by one task via
  numpy ``fromfile`` — an Arrow-batched, embarrassingly parallel scan.

The FGF typed-property loader stays intentionally absent: parquet columns
are the declared typed-property analog (SURVEY §2.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_snap(spark: SparkSession, path: str, weight: bool = False) -> DataFrame:
    """DataFrame[src: long, dst: long (, weight: double)] from a SNAP text
    edge list. Lines starting with ``#`` (after leading whitespace) and
    blank lines are ignored; fields split on any whitespace run."""
    lines = spark.read.text(path).select(F.trim(F.col("value")).alias("line"))
    rows = lines.filter(
        (F.length("line") > 0) & ~F.col("line").startswith("#")
    ).select(F.split("line", r"\s+").alias("f"))
    out = rows.select(
        F.element_at("f", 1).cast("long").alias("src"),
        F.element_at("f", 2).cast("long").alias("dst"),
    )
    if weight:
        out = rows.select(
            F.element_at("f", 1).cast("long").alias("src"),
            F.element_at("f", 2).cast("long").alias("dst"),
            F.element_at("f", 3).cast("double").alias("weight"),
        )
    return out


XS1_RECORD_BYTES = 12  # u32 tail + u32 head + f32 weight (struct xs1)


def read_xstream1(
    spark: SparkSession, path: str, records_per_task: int = 4_000_000
) -> DataFrame:
    """DataFrame[src: long, dst: long, weight: double] from an X-Stream
    type-1 binary edge file. Trailing partial records are ignored, matching
    the reference's ``st_size / sizeof(xs1)`` truncation
    (ll_load_xstream1.h:273).

    Requires ``path`` to be a LOCAL/SHARED filesystem path mounted
    identically on every executor (the size probe runs on the driver and
    each task re-opens the same path) — the same contract as the
    reference's mmap loader. For object stores / HDFS, land the file
    locally first or use ``spark.read.format("binaryFile")`` + a single
    in-task numpy decode (records are fixed 12-byte stride, so the
    record-aligned split below is the only part that needs the seekable
    local handle)."""
    import os

    n = os.path.getsize(path) // XS1_RECORD_BYTES
    starts = list(range(0, n, records_per_task)) or [0]
    ranges = spark.createDataFrame(
        [(s, min(records_per_task, n - s)) for s in starts], "start long, cnt long"
    ).repartition(len(starts))

    def read_chunks(it):
        import numpy as np
        import pandas as pd

        dt = np.dtype([("src", "<u4"), ("dst", "<u4"), ("w", "<f4")])
        for pdf in it:
            for s, c in zip(pdf["start"], pdf["cnt"]):
                if c <= 0:
                    continue
                with open(path, "rb") as f:
                    f.seek(int(s) * XS1_RECORD_BYTES)
                    arr = np.fromfile(f, dtype=dt, count=int(c))
                yield pd.DataFrame(
                    {
                        "src": arr["src"].astype("int64"),
                        "dst": arr["dst"].astype("int64"),
                        "weight": arr["w"].astype("float64"),
                    }
                )

    return ranges.mapInPandas(read_chunks, "src long, dst long, weight double")


def erdos_renyi(
    spark: SparkSession,
    nodes: int,
    edges: int,
    seed: int = 42,
    num_partitions: int | None = None,
) -> DataFrame:
    """DataFrame[src, dst] — ER(nodes, edges, seed), ll_gen_erdosrenyi.h
    semantics: each of the ``edges`` rows draws both endpoints uniformly in
    [0, nodes); self-loops/duplicates kept (callers dedup via graph.py)."""
    idx = spark.range(0, edges, numPartitions=num_partitions)
    return idx.select(
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(0)), F.lit(nodes)).alias(
            "src"
        ),
        F.pmod(F.xxhash64(F.col("id"), F.lit(seed), F.lit(1)), F.lit(nodes)).alias(
            "dst"
        ),
    )
