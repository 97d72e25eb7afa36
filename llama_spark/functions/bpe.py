"""Distributed BPE merge learning — the tokenizer-training stage of an
LLM data pipeline (Sennrich et al. 2016, word-level byte-pair encoding).

The canonical shape at 100 TB:

1. **Corpus pass (the only full-scale stage)** — whitespace word counts:
   one map-side-combined groupBy over every document, then a capped
   TakeOrdered to the ``top_words`` vocabulary. At 10¹² docs this is the
   same plan as ``top_tokens`` (functions/sketch.py): partial aggregation
   keeps the shuffle proportional to the per-partition *distinct* words.
2. **Merge loop (vocabulary-scale, corpus-independent)** — the classic
   BPE recurrence runs over the weighted vocabulary only: ≤ top_words ·
   max_word_len symbol rows, re-paired and re-merged ``n_merges`` times.
   Every round is two window functions + one aggregate over that tiny
   table; the corpus is never touched again. This is why BPE trainers
   scale: the expensive part is one word count.

Determinism: ties on pair frequency break lexicographically (left, then
right symbol); the greedy left-to-right within-word merge is computed by
run-parity over consecutive match positions (a run of k overlapping
matches merges at offsets 0, 2, 4, … — exactly the sequential scan's
result), so the learned merge table is bit-identical in any engine and
any partitioning; the DuckDB oracle replays it with the same unrolled
window logic.

Per round one 1-row collect fetches the argmax pair (the same K-row
driver-pick pattern as betweenness roots).

Reference tie-in: the reference engine has no tokenizer trainer — this op
extends the corpus-pipeline surface (SURVEY §2 LLM-data additions) the
way dedup/similarity do.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .text import tokens_col


def bpe_merges(
    documents: DataFrame,
    n_merges: int = 6,
    top_words: int = 512,
    text_col: str = "text",
) -> DataFrame:
    """DataFrame[merge_rank, left_sym, right_sym, pair_freq] — the first
    ``n_merges`` BPE merge operations learned from the corpus, in learn
    order. Stops early (fewer rows) if the vocabulary runs out of
    adjacent pairs."""
    spark = documents.sparkSession

    words = (
        documents.select(F.explode(tokens_col(text_col)).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("freq"))
        .orderBy(F.desc("freq"), F.asc("w"))
        .limit(top_words)
    )
    seq = words.select(
        "w",
        "freq",
        F.posexplode(F.sequence(F.lit(1), F.length("w"))).alias("_p0", "i"),
    ).select(
        "w", "freq", F.col("i").cast("int").alias("pos"),
        F.expr("substring(w, i, 1)").alias("sym"),
    )
    seq = seq.localCheckpoint(eager=True)

    wseq = Window.partitionBy("w").orderBy("pos")
    merges: list[tuple[int, str, str, int]] = []
    for r in range(1, n_merges + 1):
        paired = seq.withColumn("nxt", F.lead("sym").over(wseq))
        top = (
            paired.filter(F.col("nxt").isNotNull())
            .groupBy("sym", "nxt")
            .agg(F.sum("freq").alias("total"))
            .orderBy(F.desc("total"), F.asc("sym"), F.asc("nxt"))
            .limit(1)
            .collect()
        )
        if not top:
            break
        a, b, total = top[0]["sym"], top[0]["nxt"], int(top[0]["total"])
        merges.append((r, a, b, total))

        # greedy left-to-right pairing: within each run of consecutive
        # match positions, merge at odd (1st, 3rd, …) run offsets only
        marked = paired.filter(
            (F.col("sym") == a) & (F.col("nxt") == b)
        ).select("w", "pos")
        wm = Window.partitionBy("w").orderBy("pos")
        heads = (
            marked.withColumn(
                "new_run",
                F.coalesce(
                    F.col("pos") != F.lag("pos").over(wm) + 1, F.lit(True)
                ).cast("int"),
            )
            .withColumn(
                "run_id",
                F.sum("new_run").over(
                    wm.rowsBetween(Window.unboundedPreceding, 0)
                ),
            )
            .withColumn(
                "idx",
                F.row_number().over(Window.partitionBy("w", "run_id").orderBy("pos")),
            )
            .filter(F.col("idx") % 2 == 1)
            .select(F.col("w").alias("hw"), F.col("pos").alias("hpos"))
        )
        gone = heads.select(
            F.col("hw").alias("gw"), (F.col("hpos") + 1).alias("gpos")
        )
        seq = (
            paired.join(
                heads,
                (F.col("w") == F.col("hw")) & (F.col("pos") == F.col("hpos")),
                "left",
            )
            .join(
                gone,
                (F.col("w") == F.col("gw")) & (F.col("pos") == F.col("gpos")),
                "left",
            )
            .filter(F.col("gpos").isNull())
            .select(
                "w",
                "freq",
                F.row_number().over(wseq).alias("pos"),
                F.when(
                    F.col("hpos").isNotNull(), F.concat("sym", "nxt")
                ).otherwise(F.col("sym")).alias("sym"),
            )
        )
        seq = seq.localCheckpoint(eager=True)

    return spark.createDataFrame(
        merges, "merge_rank int, left_sym string, right_sym string, pair_freq long"
    )


def bpe_encode(
    documents: DataFrame,
    merge_table: list[tuple[str, str]],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """DataFrame[id_col, n_tokens, n_symbols] — apply a learned merge
    table and count the resulting BPE symbols per document (the corpus
    tokenization-cost estimator: symbols/doc before vs after training).

    The merge applications run per *distinct word* (dictionary-sized),
    then join back on the word — the corpus-scale stage is one explode +
    one dictionary join, never per-document Python."""
    toks = documents.select(
        id_col, F.explode(tokens_col(text_col)).alias("w")
    )
    vocab = toks.select("w").distinct()
    spark = documents.sparkSession
    wseq = Window.partitionBy("w").orderBy("pos")
    seq = vocab.select(
        "w", F.posexplode(F.sequence(F.lit(1), F.length("w"))).alias("_p0", "i")
    ).select("w", F.col("i").cast("int").alias("pos"), F.expr("substring(w, i, 1)").alias("sym"))
    seq = seq.localCheckpoint(eager=True)
    for a, b in merge_table:
        paired = seq.withColumn("nxt", F.lead("sym").over(wseq))
        marked = paired.filter((F.col("sym") == a) & (F.col("nxt") == b)).select("w", "pos")
        wm = Window.partitionBy("w").orderBy("pos")
        heads = (
            marked.withColumn(
                "new_run",
                F.coalesce(F.col("pos") != F.lag("pos").over(wm) + 1, F.lit(True)).cast("int"),
            )
            .withColumn(
                "run_id",
                F.sum("new_run").over(wm.rowsBetween(Window.unboundedPreceding, 0)),
            )
            .withColumn(
                "idx",
                F.row_number().over(Window.partitionBy("w", "run_id").orderBy("pos")),
            )
            .filter(F.col("idx") % 2 == 1)
            .select(F.col("w").alias("hw"), F.col("pos").alias("hpos"))
        )
        gone = heads.select(F.col("hw").alias("gw"), (F.col("hpos") + 1).alias("gpos"))
        seq = (
            paired.join(heads, (F.col("w") == F.col("hw")) & (F.col("pos") == F.col("hpos")), "left")
            .join(gone, (F.col("w") == F.col("gw")) & (F.col("pos") == F.col("gpos")), "left")
            .filter(F.col("gpos").isNull())
            .select(
                "w",
                F.row_number().over(wseq).alias("pos"),
                F.when(F.col("hpos").isNotNull(), F.concat("sym", "nxt")).otherwise(F.col("sym")).alias("sym"),
            )
        )
        seq = seq.localCheckpoint(eager=True)
    wlen = seq.groupBy("w").agg(F.count("*").cast("long").alias("n_sym"))
    return (
        toks.join(wlen.hint("shuffle_hash"), "w")
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum("n_sym").cast("long").alias("n_symbols"),
        )
    )
