"""Distributed quality classifier — logistic regression as pure DataFrame
aggregates (no MLlib, no UDFs).

The canonical webtext curation pipeline (CCNet, LLaMA's data recipe,
RefinedWeb) trains a small linear classifier separating a TARGET corpus
from raw crawl and keeps documents the classifier scores as target-like.
This module reproduces that stage Spark-natively: full-batch gradient
descent where each step is ONE map-side-combinable aggregate over the
feature table (d+1 running sums per partition), so a step costs a single
pass regardless of corpus size — the exact shape that scales to 10^12
documents (the model is 5 doubles on the driver; the data never moves).

Determinism / oracle contract: features are exact rationals of token
counts, the label is the deterministic target proxy ``lang == target``,
weights start at zero, and every step computes

    w ← w − η · mean_docs[ (σ(w·x) − y) · x ]        (σ = 1/(1+e^{−z}))

with the operand order mirrored verbatim in the unrolled SQL oracle
(each step = one scalar-aggregate CTE + one weight CTE). Cross-engine
float drift is sum-order noise ~1e-15 per step; predictions are rounded
to 6 dp at the end like every float gate.

Features per doc (x0 = 1 bias implicit):
    x1  n_tokens / 100
    x2  mean token length
    x3  stopword token fraction
    x4  distinct-token fraction (type–token ratio)
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from .text import STOPWORDS, tokenize

CLASSIFY_STEPS = 8
CLASSIFY_LR = 1.0


def quality_features(documents: DataFrame, target_lang: str = "en") -> DataFrame:
    """DataFrame[doc_id, x1..x4, y] — exact-rational doc features + the
    deterministic target label (docs with zero tokens drop out)."""
    stop_arr = F.array(*[F.lit(s) for s in STOPWORDS])
    toks = tokenize(documents)
    feats = toks.groupBy("doc_id").agg(
        F.count("*").alias("n"),
        F.sum(F.length("tok")).alias("chars"),
        F.sum(F.array_contains(stop_arr, F.col("tok")).cast("long")).alias("stops"),
        F.countDistinct("tok").alias("kinds"),
    )
    return (
        feats.join(documents.select("doc_id", "lang"), "doc_id")
        .select(
            "doc_id",
            (F.col("n").cast("double") / F.lit(100.0)).alias("x1"),
            (F.col("chars").cast("double") / F.col("n")).alias("x2"),
            (F.col("stops").cast("double") / F.col("n")).alias("x3"),
            (F.col("kinds").cast("double") / F.col("n")).alias("x4"),
            (F.col("lang") == F.lit(target_lang)).cast("double").alias("y"),
        )
    )


def train_quality_classifier(
    features: DataFrame,
    steps: int = CLASSIFY_STEPS,
    lr: float = CLASSIFY_LR,
) -> list[float]:
    """[b0, b1, b2, b3, b4] after ``steps`` full-batch GD steps from zero.
    One 1-row aggregate job per step; the feature table is persisted once."""
    f = features.persist(StorageLevel.MEMORY_AND_DISK)
    f.count()
    w = [0.0, 0.0, 0.0, 0.0, 0.0]
    for _ in range(steps):
        z = (
            F.lit(w[0])
            + F.lit(w[1]) * F.col("x1")
            + F.lit(w[2]) * F.col("x2")
            + F.lit(w[3]) * F.col("x3")
            + F.lit(w[4]) * F.col("x4")
        )
        err = F.lit(1.0) / (F.lit(1.0) + F.exp(-z)) - F.col("y")
        g = f.agg(
            F.avg(err).alias("g0"),
            F.avg(err * F.col("x1")).alias("g1"),
            F.avg(err * F.col("x2")).alias("g2"),
            F.avg(err * F.col("x3")).alias("g3"),
            F.avg(err * F.col("x4")).alias("g4"),
        ).head()
        w = [w[j] - lr * g[j] for j in range(5)]
    f.unpersist()
    return w


def quality_classifier(
    documents: DataFrame,
    target_lang: str = "en",
    steps: int = CLASSIFY_STEPS,
    lr: float = CLASSIFY_LR,
) -> DataFrame:
    """DataFrame[doc_id, prob, keep] — trained-classifier target
    probability (6 dp) and the keep verdict at the 0.5 threshold."""
    feats = quality_features(documents, target_lang=target_lang).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    w = train_quality_classifier(feats, steps=steps, lr=lr)
    z = (
        F.lit(w[0])
        + F.lit(w[1]) * F.col("x1")
        + F.lit(w[2]) * F.col("x2")
        + F.lit(w[3]) * F.col("x3")
        + F.lit(w[4]) * F.col("x4")
    )
    prob = F.lit(1.0) / (F.lit(1.0) + F.exp(-z))
    out = feats.select(
        "doc_id",
        F.round(prob, 6).alias("prob"),
        (prob >= F.lit(0.5)).alias("keep"),
    )
    out = out.localCheckpoint()
    feats.unpersist()
    return out


def sigmoid(z: float) -> float:
    """Reference scalar σ for tests."""
    return 1.0 / (1.0 + math.exp(-z))
