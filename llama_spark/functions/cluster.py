"""K-means over the embedding column — Lloyd's algorithm, deterministic.

The LLM-data-pipeline consumer is twofold: (a) cluster-balanced corpus
sampling / diversity filtering, and (b) the coarse quantizer of an IVF
approximate-nearest-neighbor index (functions/similarity.py::ivf_ann) —
the production scale path for embedding search, complementing the
LSH-bucketed variant.

Determinism (no RNG state, exactly SQL-replicable):
- init: centroid j = the vector of the (j+1)-th smallest ``vec_id``;
- assignment: squared-L2 distance ROUNDED TO 6 DP before the argmin
  (ties then break on cluster index), so the ~1e-15 accumulation-order
  difference between Spark's sequential ``aggregate`` fold and a SQL
  engine's hash-ordered SUM can never flip an assignment;
- update: per-cluster per-dimension AVG (both engines divide the same
  double sum by the same count). A cluster that loses all members drops
  out in both engines.

Scale design (Lloyd IS the broadcast-iteration algorithm):
- centroids are O(k·d) — driver-sized by definition; each iteration is
  ONE map-side pass over the N vectors (k·d flops per row against the
  broadcast centroid table, no shuffle of the vectors) plus one
  map-side-combinable groupBy producing k·d partial sums. Nothing E- or
  N-sized ever moves; at 100 TB the cost is the scan, as it should be.
- the k·d centroid collect per iteration is the algorithm's sync point,
  not a driver-side loop over data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

KMEANS_K = 10
KMEANS_ITERS = 4


def _sqdist(v, c):
    return F.aggregate(
        F.zip_with(v, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def kmeans_fit(
    embeddings: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Run ``iters`` Lloyd steps → (assignments DataFrame[vec_id, cluster],
    centroids DataFrame[cluster, c: array<double>], the latter the ones the
    final assignment was computed against — probe with THESE for IVF)."""
    spark = embeddings.sparkSession
    vecs = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    ).persist(StorageLevel.MEMORY_AND_DISK)
    first = vecs.orderBy("vec_id").limit(k).collect()
    if not first:
        vecs.unpersist()
        empty_a = spark.createDataFrame([], "vec_id long, cluster int")
        empty_c = spark.createDataFrame([], "cluster int, c array<double>")
        return empty_a, empty_c
    dim = len(first[0]["v"])
    cents = [(j, list(r["v"])) for j, r in enumerate(first)]

    def cent_df(cs):
        return spark.createDataFrame(cs, "cluster int, c array<double>")

    assign = None
    for i in range(iters):
        cur = cent_df(cents)
        assign = (
            vecs.crossJoin(F.broadcast(cur))
            .select(
                "vec_id",
                "cluster",
                F.round(_sqdist(F.col("v"), F.col("c")), 6).alias("dist"),
            )
            .groupBy("vec_id")
            .agg(F.min(F.struct("dist", "cluster")).alias("s"))
            .select("vec_id", F.col("s.cluster").alias("cluster"))
        )
        if i == iters - 1:
            break  # final assignment is against cents as-is
        rows = (
            assign.join(vecs, "vec_id")
            .groupBy("cluster")
            .agg(*[F.avg(F.col("v")[d]).alias(f"c{d}") for d in range(dim)])
            .collect()
        )
        cents = sorted(
            (r["cluster"], [r[f"c{d}"] for d in range(dim)]) for r in rows
        )
    return assign, cent_df(cents)


def kmeans_assign(
    embeddings: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DataFrame[vec_id, cluster] — the gate-facing entry point."""
    assign, _ = kmeans_fit(embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col)
    return assign


def cluster_balanced_sample(
    embeddings: DataFrame,
    per_cluster: int = 10,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DataFrame[vec_id, cluster] — up to ``per_cluster`` vectors from each
    k-means cell (lowest ids win: deterministic). The diversity-sampling
    stage of a training-data pipeline: uniform sampling over-represents
    the dense clusters; sampling a quota per cell flattens the mixture.

    The per-cluster top-k window is bounded by cell population, and cells
    are the partition key — at 100 TB this is one window over data already
    hash-distributed by the groupBy that built the assignment.
    """
    from pyspark.sql import Window

    assign, _ = kmeans_fit(
        embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    )
    w = Window.partitionBy("cluster").orderBy(F.asc("vec_id"))
    return (
        assign.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= per_cluster)
        .select("vec_id", "cluster")
    )


def dataset_splits(
    documents: DataFrame,
    fractions: tuple[int, int, int] = (90, 5, 5),
    seed: int = 42,
    id_col: str = "doc_id",
) -> DataFrame:
    """DataFrame[doc_id, bucket, split] — deterministic train/val/test
    assignment: bucket = H(doc_id:split:seed) % 100 (the portable
    md5-derived 60-bit hash), split = 'train'/'val'/'test' by cumulative
    ``fractions`` (percent, summing to 100).

    Hash-based (not row_number/sample) on purpose: membership is a pure
    function of the id, so it is stable under corpus growth, reshuffles,
    partial reruns, and engine (the property every reproducible data
    pipeline needs — appending docs never reassigns existing ones).
    One map-side expression, no shuffle, no RNG state."""
    from .text import token_hash

    a, b, c = fractions
    if a + b + c != 100:
        raise ValueError(f"fractions must sum to 100, got {fractions}")
    bucket = F.pmod(
        token_hash(F.concat(F.col(id_col).cast("string"), F.lit(f":split:{seed}"))),
        F.lit(100),
    )
    return documents.select(F.col(id_col), bucket.alias("bucket")).select(
        id_col,
        "bucket",
        F.when(F.col("bucket") < a, F.lit("train"))
        .when(F.col("bucket") < a + b, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )


def kmeans_inertia(
    embeddings: DataFrame,
    k: int = KMEANS_K,
    iters: int = KMEANS_ITERS,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DataFrame[cluster, n_vectors, inertia] — per-cluster within-cluster
    sum of squared distances to the assigned centroid (the k-means quality
    objective; the elbow-curve quantity). "Measure, don't guess" for the
    clustering family: the quantizer the IVF/PQ indexes build on gets a
    gated quality number, like ann_recall for the retrieval family.

    Cross-engine float contract: each vector's squared distance is the
    SAME 6-dp-rounded quantity the assignment argmin used, quantized to
    integer micro-units and summed exactly — one double divide per
    cluster at the end (the adc_micro convention)."""
    assign, cents = kmeans_fit(
        embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    )
    vecs = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("v"),
    )
    return (
        assign.join(vecs, "vec_id")
        .join(F.broadcast(cents), "cluster")
        .select(
            "cluster",
            F.round(F.round(_sqdist(F.col("v"), F.col("c")), 6) * F.lit(1e6))
            .cast("long")
            .alias("micro"),
        )
        .groupBy("cluster")
        .agg(F.count("*").cast("long").alias("n_vectors"), F.sum("micro").alias("_s"))
        .select(
            F.col("cluster").cast("long").alias("cluster"),
            "n_vectors",
            F.round(F.col("_s") / F.lit(1e6), 6).alias("inertia"),
        )
    )


def embedding_stats(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    resolution: float = 1e6,
) -> DataFrame:
    """Per-dimension corpus statistics — DataFrame[dim, n, mean, std] —
    the feature-standardization pre-step (whitening inputs before
    k-means / PQ / projection). Exact-integer contract: each component is
    quantized once to micro-units, so Σq and Σq² are exact BIGINTs in any
    aggregation order; mean and the variance numerator n·Σq² − (Σq)² are
    exact integer arithmetic with ONE sqrt + divide at the end (IEEE
    sqrt is correctly rounded — identical in every engine). The BIGINT
    headroom bounds n·Σq² < 2^63: fine up to ~10^8 unit-scale vectors at
    micro resolution; drop ``resolution`` for more rows."""
    comp = embeddings.select(
        F.posexplode(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("dim", "val")
    ).select(
        "dim",
        F.round(F.col("val") * F.lit(resolution)).cast("long").alias("q"),
    )
    return (
        comp.groupBy("dim")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("q").alias("s"),
            F.sum(F.col("q") * F.col("q")).alias("s2"),
        )
        .select(
            F.col("dim").cast("long").alias("dim"),
            "n",
            F.round(F.col("s") / (F.col("n") * F.lit(resolution)), 6).alias("mean"),
            F.round(
                F.sqrt(
                    (F.col("n") * F.col("s2") - F.col("s") * F.col("s")).cast(
                        "double"
                    )
                )
                / (F.col("n") * F.lit(resolution)),
                6,
            ).alias("std"),
        )
    )


def standardize_embeddings(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dims: int | None = None,
) -> DataFrame:
    """Z-score standardization (the whitening step ``embedding_stats``
    exists to feed) — DataFrame[vec_id, dim, z] in long format, z rounded
    to 6 dp; zero-variance dims map to z = 0.

    Engine-exact by construction: with q the micro-unit quantized
    component, z = (q·n − Σq) / √(n·Σq² − (Σq)²) — the n·10⁶ factors of
    mean and std cancel algebraically, so the whole computation is exact
    BIGINT arithmetic until one IEEE sqrt and one division (both
    correctly rounded, identical everywhere). Same BIGINT-headroom regime
    as embedding_stats (n·Σq² < 2^63).

    Plan: one posexplode pass, one map-side-combinable per-dim aggregate
    (D rows), one broadcast join back — no windows, no UDFs."""
    comp = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(
            F.transform(F.col(vec_col), lambda x: x.cast("double"))
        ).alias("dim", "val"),
    ).select(
        "vec_id",
        "dim",
        F.round(F.col("val") * F.lit(1e6)).cast("long").alias("q"),
    )
    if dims is not None:
        comp = comp.filter(F.col("dim") < dims)
    d = comp.groupBy("dim").agg(
        F.count("*").cast("long").alias("n"),
        F.sum("q").alias("s"),
        F.sum(F.col("q") * F.col("q")).alias("s2"),
    )
    var_num = (F.col("n") * F.col("s2") - F.col("s") * F.col("s")).cast("double")
    return comp.join(F.broadcast(d), "dim").select(
        "vec_id",
        F.col("dim").cast("long").alias("dim"),
        F.when(
            var_num > 0,
            F.round(
                (F.col("q") * F.col("n") - F.col("s")).cast("double")
                / F.sqrt(var_num),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("z"),
    )


def embedding_covariance(
    embeddings: DataFrame,
    dims: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Upper-triangular covariance matrix of the first ``dims`` embedding
    components — DataFrame[i, j, cov] (i ≤ j, cov rounded to 6 dp). The
    PCA/whitening pre-step: at 10¹² rows the D×D Gram matrix is the ONLY
    thing that has to leave the executors.

    Plan — the vectorized-Arrow-UDF scale path, NOT an explode: each
    partition quantizes its batch to micro-unit int64 and computes the
    partial Gram Qᵀ Q with one numpy matmul (exact int64 accumulation),
    emitting D(D+1)/2 triangular rows per partition; a groupBy(i, j) sum
    (≤ P·D² rows total) and a D-row moment join finish it. A pair-explode
    plan would move N·D(D+1)/2 rows through the shuffle — 136× the corpus
    at D=16; here the shuffle carries partition-count-bounded partials
    only. Integer contract: partial sums are exact (per-partition q²·rows
    ≪ 2^63), their total is partitioning-invariant, and the final
    cov = (Σqq/n − (Σqᵢ/n)(Σqⱼ/n))/10¹² is the same double in any engine.
    """
    import numpy as np
    import pandas as pd

    tri_i, tri_j = [], []
    for a in range(dims):
        for b in range(a, dims):
            tri_i.append(a)
            tri_j.append(b)

    def gram(batches):
        total = np.zeros((dims, dims), dtype=np.int64)
        seen = False
        for pdf in batches:
            if len(pdf) == 0:
                continue
            x = np.array([v[:dims] for v in pdf["v"]], dtype=np.float64) * 1e6
            # half-AWAY rounding (np.rint is half-even; Spark/DuckDB ROUND
            # are half-away — keep the partials on the gate contract)
            q = (np.sign(x) * np.floor(np.abs(x) + 0.5)).astype(np.int64)
            total += q.T @ q
            seen = True
        if seen:
            yield pd.DataFrame(
                {
                    "i": np.array(tri_i, dtype=np.int64),
                    "j": np.array(tri_j, dtype=np.int64),
                    "sqq": total[tri_i, tri_j],
                }
            )

    base = embeddings.select(
        F.slice(
            F.transform(F.col(vec_col), lambda x: x.cast("double")), 1, dims
        ).alias("v")
    )
    pairs = (
        base.mapInPandas(gram, "i long, j long, sqq long")
        .groupBy("i", "j")
        .agg(F.sum("sqq").alias("sqq"))
    )
    comp = base.select(F.posexplode("v").alias("dim", "val")).select(
        "dim", F.round(F.col("val") * F.lit(1e6)).cast("long").alias("q")
    )
    d = comp.groupBy("dim").agg(
        F.count("*").cast("long").alias("n"), F.sum("q").alias("s")
    )
    da = d.select(F.col("dim").alias("i"), F.col("n"), F.col("s").alias("si"))
    db = d.select(F.col("dim").alias("j"), F.col("s").alias("sj"))
    return (
        pairs.join(F.broadcast(da), "i")
        .join(F.broadcast(db), "j")
        .select(
            F.col("i").cast("long").alias("i"),
            F.col("j").cast("long").alias("j"),
            F.round(
                (
                    F.col("sqq") / F.col("n")
                    - (F.col("si") / F.col("n")) * (F.col("sj") / F.col("n"))
                )
                / F.lit(1e12),
                6,
            ).alias("cov"),
        )
    )


def pca_top_component(
    embeddings: DataFrame,
    dims: int = 16,
    iters: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DataFrame[dim, loading] — the top principal component of the first
    ``dims`` embedding coordinates by power iteration on the covariance
    from ``embedding_covariance``. The distributed work IS the covariance
    (one Arrow Gram pass over the corpus); the D×D iteration runs on the
    driver — the documented only-D² -leaves-the-executors pattern, O(D²·K)
    flops on ≤ a few hundred doubles.

    Determinism contract: the cov entries are already 6 dp-rounded exact
    doubles in both engines; the iterate is re-rounded to 9 dp after every
    normalize so cross-engine accumulation-order noise (~1e-16) can never
    compound across steps; final loadings round 6 dp with the sign fixed
    so the largest-|loading| dimension (ties → lower dim) is positive.
    v₀ = 1/√D uniform.
    """
    import math

    def rnd(x: float, p: int) -> float:
        # half-AWAY like Spark/DuckDB ROUND (Python round() is half-even)
        s = 10.0**p
        return math.copysign(math.floor(abs(x) * s + 0.5), x) / s

    tri = embedding_covariance(
        embeddings, dims=dims, id_col=id_col, vec_col=vec_col
    ).collect()  # ≤ D(D+1)/2 rows — the bounded driver transfer
    c = [[0.0] * dims for _ in range(dims)]
    for r in tri:
        c[r["i"]][r["j"]] = r["cov"]
        c[r["j"]][r["i"]] = r["cov"]
    v = [1.0 / math.sqrt(dims)] * dims
    for _ in range(iters):
        nv = [sum(c[i][j] * v[j] for j in range(dims)) for i in range(dims)]
        nrm = math.sqrt(sum(x * x for x in nv))
        if nrm == 0.0:
            break
        v = [rnd(x / nrm, 9) for x in nv]
    lead = max(range(dims), key=lambda i: (abs(v[i]), -i))
    if v[lead] < 0:
        v = [-x for x in v]
    spark = embeddings.sparkSession
    return spark.createDataFrame(
        [(i, rnd(v[i], 6)) for i in range(dims)], "dim long, loading double"
    )


def leakage_safe_splits(
    documents: DataFrame,
    fractions: tuple[int, int, int] = (90, 5, 5),
    seed: int = 42,
    threshold: float = 0.5,
) -> DataFrame:
    """DataFrame[doc_id, cluster, bucket, split] — train/val/test assignment
    keyed by the NEAR-DUP CLUSTER id, not the document id: every document
    in a verified near-duplicate cluster lands in the same split, so a
    training document's near-copy can never leak into val/test (the
    standard eval-contamination failure of per-document splitting; cf. the
    dedup-before-split practice in large-corpus training pipelines).
    Composition of two gated operators: dedup_clusters (MinHash LSH →
    exact verify → CC closure) → hash-bucket split of the cluster id —
    same stability contract as ``dataset_splits`` (pure function of
    content-derived ids; appending docs never reassigns existing
    clusters)."""
    from .dedup import dedup_clusters
    from .text import token_hash

    a, b, c = fractions
    if a + b + c != 100:
        raise ValueError(f"fractions must sum to 100, got {fractions}")
    cl = dedup_clusters(documents, threshold=threshold).select("doc_id", "cluster")
    bucket = F.pmod(
        token_hash(
            F.concat(F.col("cluster").cast("string"), F.lit(f":split:{seed}"))
        ),
        F.lit(100),
    )
    return cl.select("doc_id", "cluster", bucket.alias("bucket")).select(
        "doc_id",
        "cluster",
        "bucket",
        F.when(F.col("bucket") < a, F.lit("train"))
        .when(F.col("bucket") < a + b, F.lit("val"))
        .otherwise(F.lit("test"))
        .alias("split"),
    )
