"""Similarity search over an embedding column (array<float>).

- ``cosine_topk``: brute-force exact top-k — the correctness baseline.
  Dot products run JVM-side via ``F.zip_with`` + ``F.aggregate`` (cast to
  double first for cross-engine determinism); the per-query top-k is a
  window rank, executed as TakeOrdered per query group.
- ``lsh_ann``: the scale path — random-hyperplane LSH. Hyperplane weights
  come from a closed-form pseudo-random formula (no RNG state), so Spark
  and the DuckDB oracle build identical planes. Buckets = sign-bit strings;
  candidates are searched only within the query's bucket. Recall<1 by
  design; the bucket join replaces the O(N·Q) cross product with
  O(N·Q/2^bits) expected work — at 10^12 rows the cross product is not an
  option.
- ``near_duplicate_pairs``: all pairs with cosine ≥ threshold via the same
  bucket blocking.

Hyperplane weight formula: w(p, d) = ((1103515245·(p·D + d) + 12345) mod
65536)/65536 − 0.5 for plane p, dimension d.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_double(col):
    return F.transform(col, lambda x: x.cast("double"))


def _norm(col):
    return F.sqrt(
        F.aggregate(col, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def cosine_topk(
    embeddings: DataFrame,
    k: int = 5,
    n_queries: int | None = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """DataFrame[query_id, neighbor_id, cos_sim, rank] — exact brute force.

    Queries default to the first ``n_queries`` ids (deterministic); pass
    None to use every row as a query (full k-NN graph)."""
    from pyspark.storagelevel import StorageLevel

    base = (
        embeddings.select(
            F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("v")
        )
        .withColumn("nrm", _norm(F.col("v")))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    q = base.select(
        F.col("nid").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    if n_queries is not None:
        q = q.orderBy("qid").limit(n_queries)
    pairs = F.broadcast(q).crossJoin(base).filter(F.col("qid") != F.col("nid"))
    scored = pairs.select(
        F.col("qid").alias("query_id"),
        F.col("nid").alias("neighbor_id"),
        F.round(_dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 4).alias(
            "cos_sim"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .localCheckpoint(eager=True)
    )
    base.unpersist()
    return out


def plane_weights(dim: int, planes: int, plane_offset: int = 0) -> list[list[float]]:
    """The closed-form plane-weight matrix (planes × dim) as Python floats —
    shared by the Spark bucket expression and any SQL mirror."""
    return [
        [
            ((1103515245 * ((plane_offset + p) * dim + d) + 12345) % 65536) / 65536.0
            - 0.5
            for d in range(dim)
        ]
        for p in range(planes)
    ]


def hyperplane_bucket(vec_col, dim: int, planes: int = 8, plane_offset: int = 0):
    """Sign-bit bucket id (0..2^planes-1) for a double-array column —
    closed-form plane weights, portable to SQL. ``plane_offset`` shifts
    into a later stretch of the plane-weight stream (table t of a
    multi-table LSH index uses ``plane_offset = t * planes``; offset 0 is
    bit-identical to the original single-table formula).

    The weight matrix ships as ONE array<array<double>> literal and each
    plane dot runs as aggregate(zip_with(...)) — the same left-fold
    accumulation order as the original unrolled planes·dim expression
    tree (bit-identical buckets), at a fraction of the analysis/codegen
    cost (the unrolled form was the dominant constant in the lsh_ann
    gate at planes·dim·tables nodes)."""
    w = F.lit(plane_weights(dim, planes, plane_offset))
    dots = F.transform(w, lambda pw: _dot(vec_col, pw))
    bits = F.zip_with(
        dots,
        F.lit([1 << p for p in range(planes)]),
        lambda d, pw: F.when(d > 0, pw).otherwise(F.lit(0)),
    )
    return F.aggregate(bits, F.lit(0), lambda a, x: a + x)


def lsh_ann(
    embeddings: DataFrame,
    k: int = 5,
    planes: int = 8,
    n_queries: int | None = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    tables: int = 1,
) -> DataFrame:
    """Approximate top-k: exact rescoring within the query's LSH buckets.

    ``tables`` = L independent hyperplane tables (OR-amplification): table
    t hashes with planes ``t*planes .. (t+1)*planes-1`` of the same weight
    stream, candidates are the UNION over tables (deduped), rescored once.
    Collision probability goes from p^k (one table, recall collapses as N
    grows) to 1-(1-p^k)^L — the standard production-ANN recall knob; cost
    is L bucket columns computed in the same single pass over the data and
    L candidate joins. ``tables=1`` is bit-identical to the original
    single-table formula (plane offset 0)."""
    from pyspark.storagelevel import StorageLevel

    dim = len(embeddings.select(vec_col).first()[0])
    base = embeddings.select(
        F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("v")
    ).withColumn("nrm", _norm(F.col("v")))
    for t in range(tables):
        base = base.withColumn(
            f"b{t}", hyperplane_bucket(F.col("v"), dim, planes, plane_offset=t * planes)
        )
    # the bucketed/normed table feeds the query pick, L candidate joins and
    # the rescoring join — persist it once instead of re-reading the source
    # and re-hashing the planes per consumer
    base = base.persist(StorageLevel.MEMORY_AND_DISK)
    q = base.select(
        F.col("nid").alias("qid"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        *[F.col(f"b{t}").alias(f"qb{t}") for t in range(tables)],
    )
    if n_queries is not None:
        q = q.orderBy("qid").limit(n_queries)
    # candidate pairs: union of per-table bucket joins, deduped BEFORE the
    # (more expensive) exact rescoring — each table's join only moves ids
    cands = None
    for t in range(tables):
        ct = (
            F.broadcast(q.select("qid", f"qb{t}"))
            .join(base.select("nid", f"b{t}"), F.col(f"qb{t}") == F.col(f"b{t}"))
            .select("qid", "nid")
        )
        cands = ct if cands is None else cands.unionByName(ct)
    cands = cands.filter(F.col("qid") != F.col("nid")).distinct()
    scored = (
        cands.join(F.broadcast(q.select("qid", "qv", "qn")), "qid")
        .join(base.select("nid", "v", "nrm"), "nid")
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.round(
                _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 4
            ).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    out = (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
        .localCheckpoint(eager=True)
    )
    base.unpersist()
    return out


def near_duplicate_pairs(
    embeddings: DataFrame,
    threshold: float = 0.95,
    planes: int = 6,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    max_bucket_size: int | None = 256,
) -> DataFrame:
    """DataFrame[id_a, id_b, cos_sim] with cosine ≥ threshold, found via
    LSH bucket blocking (near-identical vectors land in the same bucket
    with high probability; exact pass within buckets).

    **Giant-bucket bound**: a bucket of M near-identical embeddings would
    score M(M-1)/2 pairs. Buckets larger than ``max_bucket_size`` are
    canonical-star linked — each member scores only against the bucket's
    min id — which keeps the duplicate-cluster closure (the star spans the
    bucket) at O(M) pairs; ``None`` disables the bound. The sf0.01 gate's
    buckets are far below the default cap, so its output is exact."""
    from pyspark.storagelevel import StorageLevel

    dim = len(embeddings.select(vec_col).first()[0])
    base = (
        embeddings.select(
            F.col(id_col).alias("id"), _as_double(F.col(vec_col)).alias("v")
        )
        .withColumn("nrm", _norm(F.col("v")))
        .withColumn("bucket", hyperplane_bucket(F.col("v"), dim, planes))
        # consumed by the bucket-stats join and both sides of the self-join
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    def _flat(joined):
        return joined.select(
            F.col("a.id").alias("id_a"),
            F.col("a.v").alias("va"),
            F.col("a.nrm").alias("na"),
            F.col("b.id").alias("id_b"),
            F.col("b.v").alias("vb"),
            F.col("b.nrm").alias("nb"),
        )

    if max_bucket_size is not None:
        stats = base.groupBy("bucket").agg(
            F.count("*").alias("_m"), F.min("id").alias("_hub")
        )
        base = base.join(stats, "bucket")
        small = base.filter(F.col("_m") <= max_bucket_size).drop("_m", "_hub")
        hubs = base.filter(F.col("_m") > max_bucket_size).filter(
            F.col("id") == F.col("_hub")
        ).drop("_m", "_hub")
        spokes = base.filter(F.col("_m") > max_bucket_size).filter(
            F.col("id") != F.col("_hub")
        ).drop("_m", "_hub")
        pairs = _flat(
            small.alias("a").join(
                small.alias("b"),
                (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.id") < F.col("b.id")),
            )
        )
        star = _flat(
            hubs.alias("a").join(
                spokes.alias("b"), F.col("a.bucket") == F.col("b.bucket")
            )
        )
        pairs = pairs.unionByName(star)
    else:
        pairs = _flat(
            base.alias("a").join(
                base.alias("b"),
                (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.id") < F.col("b.id")),
            )
        )
    out = (
        pairs.select(
            "id_a",
            "id_b",
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 4
            ).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
        .localCheckpoint(eager=True)
    )
    base.unpersist()
    return out


def ivf_ann(
    embeddings: DataFrame,
    k: int = 5,
    n_clusters: int = 10,
    kmeans_iters: int = 4,
    nprobe: int = 2,
    n_queries: int | None = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF (inverted-file) ANN — the OTHER production scale path, next to
    ``lsh_ann``: a deterministic k-means coarse quantizer
    (functions/cluster.py) partitions the base vectors into inverted
    lists; each query probes only its ``nprobe`` nearest centroids and
    brute-forces those lists. Expected work per query is
    O(N·nprobe/n_clusters) instead of O(N); recall < 1 by design, rising
    with nprobe (the IVF recall knob, as ``tables`` is for LSH).

    DataFrame[query_id, neighbor_id, cos_sim, rank] — same shape as
    ``cosine_topk``/``lsh_ann``. cos_sim rounded to 4 dp BEFORE ranking
    (the cosine_topk convention: rank order is decided on the rounded
    value, so cross-engine float noise can't flip it).

    At 100 TB: the lists live partitioned by cluster id; a query batch
    joins its probe set against exactly those partitions — the classic
    FAISS IVF-Flat layout expressed as a cluster-keyed equi-join.
    """
    from pyspark.storagelevel import StorageLevel

    from .cluster import _sqdist, kmeans_fit

    assign, cents = kmeans_fit(
        embeddings, k=n_clusters, iters=kmeans_iters,
        id_col=id_col, vec_col=vec_col,
    )
    base = (
        embeddings.select(
            F.col(id_col).alias("nid"), _as_double(F.col(vec_col)).alias("v")
        )
        .withColumn("nrm", _norm(F.col("v")))
        .join(assign.withColumnRenamed("vec_id", "nid"), "nid")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    q = base.select(
        F.col("nid").alias("qid"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    if n_queries is not None:
        q = q.orderBy("qid").limit(n_queries)
    probes = (
        q.crossJoin(F.broadcast(cents))
        .select(
            "qid", "qv", "qn", "cluster",
            F.round(_sqdist(F.col("qv"), F.col("c")), 6).alias("d"),
        )
        .withColumn(
            "pr",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.asc("d"), F.asc("cluster"))
            ),
        )
        .filter(F.col("pr") <= nprobe)
        .select("qid", "qv", "qn", "cluster")
    )
    scored = (
        F.broadcast(probes)
        .join(base, "cluster")
        .filter(F.col("qid") != F.col("nid"))
        .select(
            F.col("qid").alias("query_id"),
            F.col("nid").alias("neighbor_id"),
            F.round(
                _dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")), 4
            ).alias("cos_sim"),
        )
    )
    out = (
        scored.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("query_id").orderBy(
                    F.desc("cos_sim"), F.asc("neighbor_id")
                )
            ),
        )
        .filter(F.col("rank") <= k)
        .localCheckpoint(eager=True)
    )
    base.unpersist()
    return out


def neighbor_mean_embeddings(
    edges: DataFrame,
    embeddings: DataFrame,
    dims: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    hops: int = 1,
) -> DataFrame:
    """GraphSAGE-style 1-hop mean aggregation (Hamilton et al. 2017) —
    the feature-propagation step that fuses the LINK GRAPH with the
    EMBEDDING table: for every node u, the element-wise mean of the
    embedding vectors of u's out-neighbors that have one.

    Returns LONG format — DataFrame[id, dim, mean_val] (dim 0-based over
    the first ``dims`` components, mean rounded to 6 dp) — because a
    per-node array column would hash fragilely across engines, and the
    long shape is what a downstream training join wants anyway.

    Plan: one E-row equi-join against the V-row embedding dictionary
    (shuffle-hash hinted — the E side streams), THEN a ``dims``-wide
    posexplode (E·dims rows, fully distributed), then one map-side-
    combinable (node, dim) sum/count aggregate. A degree-d hub is d·dims
    rows spread across partitions — no per-node list ever materializes,
    so there is no skew cliff. Floats are cast to double once before
    summing; the 6-dp round absorbs cross-engine sum-order ULPs (the
    adamic_adar / modularity precedent).

    ``hops`` stacks the aggregation GNN-style: layer h averages the
    layer-(h−1) vectors of the out-neighbors (mean-of-means — exactly a
    GraphSAGE mean-aggregator stack without the learned weights). Each
    extra hop is one more E-row join + (node, dim) aggregate over the
    already-long V·dims feature table — no explode repeats. Between
    hops the 6-dp layer outputs are carried as EXACT micro-unit BIGINTs
    (round(v·10⁶)): summing re-rounded doubles in engine-specific order
    hits 6-dp round boundaries (measured: 3 of 32k rows at sf0.01), while
    integer sums divided once are bit-stable everywhere.
    """
    if hops < 1:
        raise ValueError("hops must be >= 1")
    emb = embeddings.select(
        F.col(id_col).alias("_v"), F.slice(F.col(vec_col), 1, dims).alias("_e")
    ).hint("shuffle_hash")
    e = edges.select("src", "dst")
    joined = e.join(emb, e["dst"] == emb["_v"])
    comp = joined.select(
        F.col("src").alias("id"), F.posexplode("_e").alias("dim", "_val")
    )
    out = (
        comp.groupBy("id", "dim")
        .agg(
            F.round(
                F.sum(F.col("_val").cast("double")) / F.count("*"), 6
            ).alias("mean_val")
        )
        .select("id", F.col("dim").cast("long").alias("dim"), "mean_val")
    )
    for _ in range(hops - 1):
        prev = out.select(
            F.col("id").alias("_n"),
            "dim",
            F.round(F.col("mean_val") * F.lit(1e6)).cast("long").alias("_pv"),
        ).hint("shuffle_hash")
        # 6-dp mean computed ENTIRELY in integer micro-units: half-away
        # integer division (never ROUND on a double — engines disagree on
        # .5-ULP boundary doubles; measured 3/32k rows), then ONE exact
        # IEEE divide by 10⁶ for the output double.
        out = (
            e.join(prev, e["dst"] == prev["_n"])
            .groupBy(F.col("src").alias("id"), "dim")
            .agg(F.sum("_pv").alias("_s"), F.count("*").alias("_c"))
            .select(
                "id",
                F.col("dim").cast("long").alias("dim"),
                (
                    F.when(F.col("_s") < 0, F.lit(-1)).otherwise(F.lit(1))
                    * F.expr("(abs(_s) * 2 + _c) DIV (2 * _c)")
                ).cast("double").alias("_m"),
            )
            .select("id", "dim", (F.col("_m") / F.lit(1e6)).alias("mean_val"))
        )
    return out


def ann_recall(truth: DataFrame, approx: DataFrame) -> DataFrame:
    """ONE row [truth_pairs, hits, recall] — retrieval recall of an
    approximate neighbor list against an exact one: the fraction of
    ground-truth (query_id, neighbor_id) pairs the approximate index
    returned. THE quality metric for the ANN family ("measure, don't
    guess" — the recall knob claims of lsh_ann/ivf_ann become a gated
    number instead of a docstring assertion).

    Plan: one equi-join on (query_id, neighbor_id) + two count
    aggregates — both sides are k·|queries| rows (tiny, driver-bounded),
    so this costs nothing beyond the two input pipelines.
    """
    t = truth.select("query_id", "neighbor_id")
    a = approx.select("query_id", "neighbor_id")
    hit = t.join(a, ["query_id", "neighbor_id"]).agg(
        F.count("*").cast("long").alias("hits")
    )
    tot = t.agg(F.count("*").cast("long").alias("truth_pairs"))
    return tot.crossJoin(hit).select(
        "truth_pairs",
        "hits",
        F.round(
            F.col("hits").cast("double")
            / F.when(F.col("truth_pairs") > 0, F.col("truth_pairs")),
            6,
        ).alias("recall"),
    )


def pq_fit_codes(
    embeddings: DataFrame,
    m: int = 2,
    k: int = 8,
    iters: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
):
    """Product quantization (Jégou, Douze, Schmid, TPAMI 2011): split each
    vector into ``m`` contiguous subspaces and vector-quantize each with
    its own deterministic Lloyd codebook (functions/cluster.kmeans_fit —
    6-dp-rounded argmin, lowest-cluster tie-break, smallest-vec_id init).

    Returns ``(codes, codebooks)``:
      codes      DataFrame[vec_id, sub, code] — m rows per vector,
      codebooks  DataFrame[sub, code, c: array<double>] — ≤ m·k rows.

    The compression step of the production ANN ladder this engine ships
    (brute cosine → LSH multi-table → IVF-Flat → PQ): N·d doubles become
    N·m bytes-worth of codes plus a driver-sized codebook."""
    from .cluster import kmeans_fit

    dim = int(
        embeddings.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()[0]["d"]
    )
    if dim % m != 0:
        raise ValueError(f"dim {dim} not divisible by m={m} subspaces")
    d = dim // m
    codes = None
    books = None
    spark = embeddings.sparkSession
    for s in range(m):
        sub = embeddings.select(
            F.col(id_col).alias("vec_id"),
            F.slice(
                F.transform(F.col(vec_col), lambda x: x.cast("double")),
                s * d + 1,
                d,
            ).alias("embedding"),
        )
        assign, cents = kmeans_fit(sub, k=k, iters=iters)
        cpart = assign.select(
            "vec_id", F.lit(s).cast("long").alias("sub"),
            F.col("cluster").cast("long").alias("code"),
        )
        bpart = cents.select(
            F.lit(s).cast("long").alias("sub"),
            F.col("cluster").cast("long").alias("code"),
            "c",
        )
        codes = cpart if codes is None else codes.unionByName(cpart)
        books = bpart if books is None else books.unionByName(bpart)
    return codes, books


def pq_ann(
    embeddings: DataFrame,
    m: int = 2,
    k_codes: int = 8,
    iters: int = 2,
    k: int = 5,
    n_queries: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Asymmetric-distance (ADC) PQ search: queries keep their RAW
    subvectors; each query builds an m·k_codes lookup table of squared-L2
    distances to the codebook entries, and a database vector's distance
    is the SUM of its codes' LUT entries — one broadcast map-side join
    over the N·m code rows, no vector arithmetic per pair.

    DataFrame[query_id, neighbor_id, adc_micro, rank] — top ``k`` per
    query by ADC distance. **Engine-exact ranking**: each per-subspace
    LUT distance is rounded to 6 dp (the gate-proven cross-engine-equal
    quantity) then quantized to integer micro-units, so the per-pair SUM
    over subspaces is exact integer arithmetic — ties break on
    neighbor_id. Queries = the ``n_queries`` smallest vec_ids; the query
    itself is excluded from its result list."""
    codes, books = pq_fit_codes(
        embeddings, m=m, k=k_codes, iters=iters, id_col=id_col, vec_col=vec_col
    )
    codes = codes.persist()
    dim_row = embeddings.select(F.size(F.col(vec_col)).alias("d")).limit(1).collect()
    d = dim_row[0]["d"] // m

    q = (
        embeddings.orderBy(id_col)
        .limit(n_queries)
        .select(
            F.col(id_col).alias("qid"),
            F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("qv"),
        )
    )
    qsubs = q.select(
        "qid",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(s).cast("long").alias("sub"),
                    F.slice("qv", s * d + 1, d).alias("qs"),
                )
                for s in range(m)
            ])
        ).alias("e"),
    ).select("qid", F.col("e.sub").alias("sub"), F.col("e.qs").alias("qs"))
    lut = (
        qsubs.join(F.broadcast(books), "sub")
        .select(
            "qid",
            "sub",
            "code",
            F.round(F.round(_sq_l2(F.col("qs"), F.col("c")), 6) * F.lit(1_000_000.0))
            .cast("long")
            .alias("d_micro"),
        )
    )
    pairs = (
        codes.join(F.broadcast(lut), ["sub", "code"])
        .filter(F.col("vec_id") != F.col("qid"))
        .groupBy("qid", "vec_id")
        .agg(F.sum("d_micro").alias("adc_micro"), F.count("*").alias("_m"))
        .filter(F.col("_m") == m)  # drop pairs missing a subspace (never happens)
    )
    w = Window.partitionBy("qid").orderBy(F.asc("adc_micro"), F.asc("vec_id"))
    out = (
        pairs.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= k)
        .select(
            F.col("qid").alias("query_id"),
            F.col("vec_id").alias("neighbor_id"),
            "adc_micro",
            "rank",
        )
    )
    out = out.localCheckpoint(eager=True)
    codes.unpersist()
    return out


def _sq_l2(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: (x - y) * (x - y)),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def random_projection(
    embeddings: DataFrame,
    out_dims: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    plane_offset: int = 0,
) -> DataFrame:
    """Johnson–Lindenstrauss-style random projection to ``out_dims``
    components — DataFrame[vec_id, dim, val] (long format, val rounded to
    6 dp): val(p) = ⟨v, w_p⟩ over the same closed-form plane-weight
    stream the LSH index hashes with (``plane_weights``), so Spark and
    any SQL mirror build identical projections with no RNG state. The
    production pre-step for cheap filtering / visualization / coarse ANN:
    at 10^12 rows a 64→8 projection cuts every downstream distance pass
    8×, and JL says pairwise geometry survives up to (1±ε).

    One map-side pass (transform + posexplode), no shuffle, no UDF."""
    dim = len(embeddings.select(vec_col).first()[0])
    w = F.lit(plane_weights(dim, out_dims, plane_offset))
    v = _as_double(F.col(vec_col))
    return embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.posexplode(
            F.transform(w, lambda pw: F.round(_dot(v, pw), 6))
        ).alias("dim", "val"),
    ).select("vec_id", F.col("dim").cast("long").alias("dim"), "val")


def semdedup(
    embeddings: DataFrame,
    k: int = 8,
    iters: int = 4,
    threshold: float = 0.2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023) — DataFrame[vec_id, cluster, keep]:
    semantic dedup by k-means partition + WITHIN-CLUSTER cosine screen. An
    item is dropped when a lower-id member of its own cluster sits within
    the cosine threshold (deterministic keep-lowest-id stand-in for the
    paper's keep-farthest-from-centroid; same ε-duplicate groups).

    This IS the SemDeDup scale argument: clustering first turns the O(N²)
    all-pairs cosine into Σ_c O(|c|²) within-cluster pairs, shuffled on the
    cluster key — at 10⁹ embeddings with 10⁵ balanced cells that is 10⁸×
    less pair work, and each cell's pair block is one partition-local
    join. Reuses the deterministic Lloyd assignment (functions/cluster)
    and the 4-dp rounded cosine convention shared with
    near_dup_embeddings / cosine_topk.
    """
    from pyspark.storagelevel import StorageLevel

    from .cluster import kmeans_assign

    assign = kmeans_assign(
        embeddings, k=k, iters=iters, id_col=id_col, vec_col=vec_col
    )
    base = (
        embeddings.select(
            F.col(id_col).alias("vec_id"), _as_double(F.col(vec_col)).alias("v")
        )
        .withColumn("nrm", _norm(F.col("v")))
        .join(assign.withColumnRenamed(id_col, "vec_id"), "vec_id")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = base.select(
        F.col("cluster"), F.col("vec_id").alias("a"), F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    b = base.select(
        F.col("cluster"), F.col("vec_id").alias("b"), F.col("v").alias("vb"),
        F.col("nrm").alias("nb"),
    )
    dropped = (
        a.join(b, "cluster")
        .filter(F.col("a") < F.col("b"))
        .filter(
            F.round(
                _dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb")), 4
            )
            >= threshold
        )
        .select(F.col("b").alias("vec_id"))
        .distinct()
        .withColumn("dropped", F.lit(True))
    )
    out = (
        base.select("vec_id", "cluster")
        .join(dropped, "vec_id", "left")
        .select(
            "vec_id",
            F.col("cluster").cast("long").alias("cluster"),
            F.col("dropped").isNull().alias("keep"),
        )
        .localCheckpoint(eager=True)
    )
    base.unpersist()
    return out
