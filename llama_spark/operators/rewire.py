"""Degree-preserving null model — the configuration model (Newman, SIAM
Rev. 2003 §4.1): cut every undirected edge into two stubs, pair the stubs
in (deterministic pseudo-)random order. The resulting graph keeps every
node's degree EXACTLY and destroys all other structure — the null
baseline behind "is this clustering/assortativity/motif count more than
its degree sequence explains?" (triangle count vs null = the small-world
test; knn(k) vs null = real mixing).

Determinism without RNG state: each stub's shuffle key is the portable
md5 hash of its identity (node, owning edge, side, seed), so Spark and a
SQL mirror pair identical stubs. Self-loops and multi-edges stay, as the
standard model prescribes.

Scale note — the global stub ranking is TWO-PHASE (the hub-safe pattern
from walks.py): hash-RANGE buckets (hv DIV step is monotone in hv, so
bucket order ⊕ within-bucket order IS the global order), a window only
WITHIN each ≈2E/B-row bucket, and a B-row offset cumsum — no
single-partition sort ever sees the 2E-row stub table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.text import token_hash
from ..graph import DST, SRC, drop_self_loops, undirected_ordered

HBITS = 60  # token_hash is a 60-bit value


def configuration_model(
    edges: DataFrame, seed: int = 42, buckets: int = 1024
) -> DataFrame:
    """DataFrame[src, dst] — one row per paired stub couple (src ≤ dst);
    exactly E rows, degree sequence identical to the input's undirected
    simple graph. May contain self-loops and repeated rows (multi-edges)
    — the configuration model's documented behavior."""
    und = drop_self_loops(undirected_ordered(edges)).dropDuplicates([SRC, DST])
    s1 = und.select(
        F.col(SRC).alias("node"), F.col(SRC).alias("es"),
        F.col(DST).alias("ed"), F.lit(0).alias("side"),
    )
    s2 = und.select(
        F.col(DST).alias("node"), F.col(SRC).alias("es"),
        F.col(DST).alias("ed"), F.lit(1).alias("side"),
    )
    stubs = s1.unionByName(s2).withColumn(
        "hv",
        token_hash(
            F.concat_ws(
                ":",
                F.col("node").cast("string"),
                F.col("es").cast("string"),
                F.col("ed").cast("string"),
                F.col("side").cast("string"),
                F.lit(str(seed)),
            )
        ),
    )
    step = (1 << HBITS) // buckets
    stubs = stubs.withColumn("bkt", F.expr(f"hv DIV {step}"))
    w_in = Window.partitionBy("bkt").orderBy("hv", "node", "es", "ed", "side")
    ranked = stubs.withColumn("rn", F.row_number().over(w_in))
    # offsets over ≤``buckets`` rows — bounded window, never the stub table
    cnts = stubs.groupBy("bkt").agg(F.count("*").alias("c"))
    w_off = Window.orderBy("bkt").rowsBetween(Window.unboundedPreceding, -1)
    offs = cnts.select(
        "bkt", F.coalesce(F.sum("c").over(w_off), F.lit(0)).alias("off")
    )
    glob = ranked.join(F.broadcast(offs), "bkt").select(
        "node", (F.col("off") + F.col("rn") - 1).alias("rk")
    )
    return (
        glob.groupBy(F.expr("rk DIV 2").alias("pid"))
        .agg(F.min("node").alias(SRC), F.max("node").alias(DST))
        .select(SRC, DST)
    )
