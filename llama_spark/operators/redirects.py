"""Redirect-chain resolution — pointer doubling over a functional graph.

Web-pipeline primitive: a crawl yields a partial map url → redirect
target (HTTP 3xx / canonical link); indexing needs every url resolved to
its TERMINAL target (the page that actually serves content), with the
chain length, and redirect cycles flagged rather than looped over. This
is path compression on a functional graph — the same pointer-doubling
trick LLAMA-style systems use for union-find flattening, run as
O(log chain-length) self-joins instead of a sequential walk.

Spark plan: jump(u) = (target after 2^k steps, steps taken), where a
terminal self-maps with 0 steps so composition absorbs at chain ends:

    jump_{k+1}(u) = jump_k ∘ jump_k   (one hash self-join per doubling)

After K doublings every chain shorter than 2^K has converged; rows whose
final target still has an outgoing redirect are cycle members and come
back with final_url NULL / resolved false (they would never terminate).
No driver loops, no windows; state is exactly one row per url.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


def resolve_redirects(redirects: DataFrame, max_doublings: int = 6) -> DataFrame:
    """redirects: DataFrame[src, dst] (url src redirects to url dst; a url
    absent from src is terminal). Returns DataFrame[url, final, hops,
    resolved] for every url appearing in the map — resolved=false (NULL
    final/hops) marks redirect cycles / chains longer than 2^max_doublings.
    """
    rel = redirects.select("src", "dst").distinct().persist(
        StorageLevel.MEMORY_AND_DISK
    )
    rel.count()
    nodes = (
        rel.select(F.col("src").alias("id"))
        .unionByName(rel.select(F.col("dst").alias("id")))
        .distinct()
    )
    jump = nodes.join(rel, nodes["id"] == rel["src"], "left").select(
        "id",
        F.coalesce("dst", "id").alias("v"),
        F.when(F.col("dst").isNotNull(), F.lit(1)).otherwise(F.lit(0))
        .cast("long")
        .alias("steps"),
    )
    for _ in range(max_doublings):
        hop = jump.select(
            F.col("id").alias("v"),
            F.col("v").alias("w"),
            F.col("steps").alias("steps2"),
        )
        jump = (
            jump.join(hop, "v")
            .select("id", F.col("w").alias("v"), (F.col("steps") + F.col("steps2")).alias("steps"))
            .localCheckpoint(eager=True)
        )
    # terminal ⇔ the landing vertex has no outgoing redirect
    out_src = (
        rel.select(F.col("src").alias("v")).distinct().withColumn("has_out", F.lit(True))
    )
    res = jump.join(out_src, "v", "left")
    terminal = F.col("has_out").isNull()
    out = res.select(
        F.col("id").alias("url"),
        F.when(terminal, F.col("v")).alias("final"),
        F.when(terminal, F.col("steps")).alias("hops"),
        terminal.alias("resolved"),
    )
    rel.unpersist()
    return out
