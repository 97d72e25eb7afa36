"""Driver-gate queries + DuckDB oracle SQL.

Each entry pairs a Spark DataFrame plan (built from llama_spark operators)
with an ANSI-SQL equivalent DuckDB runs on the same parquet tables. Graph
queries derive a deterministic edge table from ``lineitem`` (pure modulo
arithmetic — bit-identical in both engines):

    src = l_orderkey % 4096,  dst = l_partkey % 4096,  src <> dst, DISTINCT

Iterative kernels are fixed-point computations; the oracle unrolls a fixed
number of synchronous rounds as chained CTEs (enough to reach the fixpoint
on these graphs — the Spark side iterates to convergence, so any round
count ≥ the fixpoint depth matches exactly). Float outputs are scaled to
O(1) and rounded to 6 dp on BOTH sides so cross-engine accumulation-order
noise (~1e-12) can't flip the value hash.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MODULUS = 4096
DAMPING = 0.85
PR_ITERS = 10
LP_ITERS = 5
CC_UNROLL = 16  # ≥ graph diameter at every SF we run (verified ≤ 8)
BFS_UNROLL = 16

EDGES_SQL = f"""
  SELECT DISTINCT l_orderkey % {MODULUS} AS src, l_partkey % {MODULUS} AS dst
  FROM lineitem
  WHERE l_orderkey % {MODULUS} <> l_partkey % {MODULUS}
"""

NODES_SQL = """
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM edges UNION ALL SELECT dst AS id FROM edges
  )
"""

UND_SQL = """
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges UNION ALL SELECT dst AS src, src AS dst FROM edges
  ) WHERE src <> dst
"""


def load_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.select(
            (F.col("l_orderkey") % MODULUS).alias("src"),
            (F.col("l_partkey") % MODULUS).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _table(name: str) -> Callable[[SparkSession, str], DataFrame]:
    def q(spark: SparkSession, sf_dir: str) -> DataFrame:
        return spark.read.parquet(f"{sf_dir}/{name}.parquet")

    return q


# ---------------------------------------------------------------- graph ops


def q_edges(spark, sf_dir):
    return load_edges(spark, sf_dir)


def q_nodes(spark, sf_dir):
    from .graph import nodes_of

    return nodes_of(load_edges(spark, sf_dir))


def q_degrees(spark, sf_dir):
    from .graph import degrees

    return degrees(load_edges(spark, sf_dir))


def q_degree_distribution(spark, sf_dir):
    from .graph import degree_distribution

    return degree_distribution(load_edges(spark, sf_dir))


def q_pagerank(spark, sf_dir):
    from .operators.pagerank import pagerank_result

    edges = load_edges(spark, sf_dir)
    # the kernel already materialized |V| for its 1/N — no extra count() job
    res = pagerank_result(edges, damping=DAMPING, max_iter=PR_ITERS)
    return res.state.select(
        "id", F.round(F.col("rank") * F.lit(float(res.n_nodes)), 6).alias("rank_scaled")
    )


def q_pagerank_top10(spark, sf_dir):
    return (
        q_pagerank(spark, sf_dir)
        .orderBy(F.desc("rank_scaled"), F.asc("id"))
        .limit(10)
    )


def q_connected_components(spark, sf_dir):
    from .operators.components import connected_components

    return connected_components(load_edges(spark, sf_dir))


def q_label_propagation(spark, sf_dir):
    from .operators.components import label_propagation

    return label_propagation(load_edges(spark, sf_dir), max_iter=LP_ITERS)


def q_triangle_count(spark, sf_dir):
    from .operators.triangles import triangles_df

    return triangles_df(load_edges(spark, sf_dir), orient="degree")


def q_bfs_depths(spark, sf_dir):
    from .operators.traversal import bfs_depths

    edges = load_edges(spark, sf_dir)
    root = edges.agg(F.min(F.least("src", "dst")).alias("r")).collect()[0]["r"]
    return bfs_depths(edges, root=root, max_iter=BFS_UNROLL)


def q_bfs_reachable_count(spark, sf_dir):
    """bfs_count analog (bfs.h:70-73): reachable-vertex count from the min
    node, as a 1-row DataFrame for the gate."""
    from .operators.traversal import bfs_depths

    edges = load_edges(spark, sf_dir)
    root = edges.agg(F.min(F.least("src", "dst")).alias("r")).collect()[0]["r"]
    return (
        bfs_depths(edges, root=root, max_iter=BFS_UNROLL)
        .filter(F.col("depth").isNotNull())
        .agg(F.count("*").cast("long").alias("reachable"))
    )


def q_level_spread(spark, sf_dir):
    """tools/level_spread.h over a synthetic 3-level split of the edge
    table (level = (src*31 + dst) % 3 — SQL-portable so the oracle can
    replicate the exact store contents)."""
    from .streaming.snapshots import level_spread_of

    edges = load_edges(spark, sf_dir)
    with_level = edges.withColumn(
        "level", F.pmod(F.col("src") * F.lit(31) + F.col("dst"), F.lit(3))
    )
    return level_spread_of(with_level)


KCORE_K = 15  # gate graph degrees: min 3, median 22, max 70 → real peeling
KCORE_UNROLL = 12


def q_k_core(spark, sf_dir):
    """k-core membership + in-core degree after exactly KCORE_UNROLL peels
    (fixed-round mode — SQL-portable like BFS_UNROLL; the library's default
    mode runs to convergence)."""
    from .operators.kcore import k_core

    return k_core(load_edges(spark, sf_dir), k=KCORE_K, rounds=KCORE_UNROLL)


WKCORE_K = 25.0  # weighted threshold ≈ unweighted degree ~17 at avg w 1.5


def q_weighted_k_core(spark, sf_dir):
    """Weighted (s-core) peeling: survive while Σ incident weights ≥ k in
    the surviving subgraph; und weight = max over directions (symmetric,
    SQL-portable); weighted degrees rounded 6 dp before the compare."""
    from .graph import with_synthetic_weights
    from .operators.kcore import k_core

    return k_core(
        with_synthetic_weights(load_edges(spark, sf_dir)),
        k=WKCORE_K,
        rounds=KCORE_UNROLL,
        weight_col="weight",
    )


def _weighted_k_core_sql() -> str:
    hav = f"HAVING ROUND(SUM(w), 6) >= {WKCORE_K!r}"
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        "base AS (SELECT src, dst, 1e0 + ((src*31 + dst) % 100)/100e0 AS w "
        "FROM edges WHERE src <> dst)",
        "e0 AS MATERIALIZED (SELECT src, dst, MAX(w) AS w FROM ("
        "SELECT src, dst, w FROM base UNION ALL "
        "SELECT dst AS src, src AS dst, w FROM base) GROUP BY src, dst)",
    ]
    for i in range(1, KCORE_UNROLL + 1):
        ctes.append(
            f"""e{i} AS MATERIALIZED (
  SELECT e.src, e.dst, e.w FROM e{i-1} e
  WHERE e.src IN (SELECT src FROM e{i-1} GROUP BY src {hav})
    AND e.dst IN (SELECT src FROM e{i-1} GROUP BY src {hav})
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT src AS id, ROUND(SUM(w), 6) AS wdegree FROM e{KCORE_UNROLL} GROUP BY src"
    )


def q_pagerank_redistribute(spark, sf_dir):
    """Textbook dangling-mass-redistribution PageRank on a graph with real
    dangling nodes (all out-edges of ids ≡ 0 mod 7 dropped, so those ids
    appear as link targets only). Σrank stays 1 by construction."""
    from .operators.pagerank import pagerank_result

    edges = load_edges(spark, sf_dir).filter(F.col("src") % 7 != 0)
    res = pagerank_result(edges, max_iter=PR_ITERS, dangling="redistribute")
    return res.state.select(
        "id", F.round(F.col("rank") * F.lit(float(res.n_nodes)), 6).alias("rank_scaled")
    )


PPR_SOURCES = [0, 42, 1234]  # teleport set for the gate (all ids exist mod 4096)


def q_personalized_pagerank(spark, sf_dir):
    """Seeded PageRank (teleport restricted to PPR_SOURCES); output scaled
    by N and rounded like the pagerank gate."""
    from .operators.pagerank import personalized_pagerank_result

    edges = load_edges(spark, sf_dir)
    res = personalized_pagerank_result(
        edges, PPR_SOURCES, damping=DAMPING, max_iter=PR_ITERS
    )
    return res.state.select(
        "id", F.round(F.col("rank") * F.lit(float(res.n_nodes)), 6).alias("rank_scaled")
    )


def q_weighted_pagerank(spark, sf_dir):
    """Weighted PageRank: contributions scaled by edge weight / node's
    total out-weight (the synthetic SQL-portable weights SSSP uses). The
    last reference-loader property (edge weights, ll_load_utils.h:1076-1090)
    now feeds a second kernel beyond SSSP."""
    from .graph import with_synthetic_weights
    from .operators.pagerank import pagerank_result

    edges = with_synthetic_weights(load_edges(spark, sf_dir))
    res = pagerank_result(
        edges, damping=DAMPING, max_iter=PR_ITERS, weight_col="weight"
    )
    return res.state.select(
        "id", F.round(F.col("rank") * F.lit(float(res.n_nodes)), 6).alias("rank_scaled")
    )


PR_INC_SPLIT = 6   # pagerank_incremental: resume point (6 cold + 6 warm)
PR_INC_TOTAL = 12  # oracle = one uninterrupted 12-iteration unroll


def q_pagerank_incremental(spark, sf_dir):
    """Incremental/resumable PageRank gate: run PR_INC_SPLIT cold
    iterations, hand the resulting rank vector to a SECOND pagerank_result
    call via ``initial_ranks`` for the rest. The oracle is an
    *uninterrupted* PR_INC_TOTAL-iteration cold unroll — init-blind, so
    any warm-start plumbing bug
    (dropped nodes, wrong 1/N default, renormalization, an off-by-one in
    the iteration count) breaks bit-parity. This is the north rule's
    resume-from-checkpoint property as an exact hash gate; the companion
    property — a *perturbed* warm start converging to the same fixpoint —
    needs ~140 iterations to reach 6-dp agreement and is pytest-covered
    instead (test_pagerank_warm_start_converges_same)."""
    from .operators.pagerank import pagerank_result

    edges = load_edges(spark, sf_dir)
    first = pagerank_result(edges, damping=DAMPING, max_iter=PR_INC_SPLIT)
    res = pagerank_result(
        edges,
        damping=DAMPING,
        max_iter=PR_INC_TOTAL - PR_INC_SPLIT,
        initial_ranks=first.state,
    )
    return res.state.select(
        "id", F.round(F.col("rank") * F.lit(float(res.n_nodes)), 6).alias("rank_scaled")
    )


CC_DELTA_MOD = 5  # cc_incremental: edges with src % 5 == 0 arrive "later"


def q_cc_incremental(spark, sf_dir):
    """Incremental recompute gate: run CC on the graph WITHOUT the delta
    edges, then warm-start from those labels on the full graph. Hash-min is
    monotone, so the warm start must converge to EXACTLY the cold fixpoint
    — the oracle is the plain unrolled CC on the full edge set, so any
    warm-start shortcut that changed the answer would hash-mismatch."""
    from .operators.components import connected_components

    edges = load_edges(spark, sf_dir)
    old = edges.filter(F.col("src") % CC_DELTA_MOD != 0)
    prev = connected_components(old)
    return connected_components(edges, initial_components=prev)


WALK_LEN = 3
WALK_SEED = 42


def q_random_walks(spark, sf_dir):
    """Deterministic random walks (DeepWalk sampling stage): step t of
    walk w moves to out-neighbor index H(walk_id:t:seed) mod out_deg —
    no RNG state, so the DuckDB oracle replays the exact walks."""
    from .operators.walks import random_walks

    w = random_walks(
        load_edges(spark, sf_dir), walk_length=WALK_LEN, walks_per_node=1,
        seed=WALK_SEED,
    )
    return w.select("walk_id", F.col("step").cast("long").alias("step"), "node")


def q_random_walks_weighted(spark, sf_dir):
    """Weight-biased deterministic walks: neighbor i picked with
    probability ŵ_i/Σŵ (ŵ = floor(w·128)+1 exact integer quantization);
    the oracle replays the identical draw u = H mod Σŵ against the same
    cumulative-weight ranges."""
    from .graph import with_synthetic_weights
    from .operators.walks import random_walks

    w = random_walks(
        with_synthetic_weights(load_edges(spark, sf_dir)),
        walk_length=WALK_LEN, walks_per_node=1, seed=WALK_SEED,
        weight_col="weight",
    )
    return w.select("walk_id", F.col("step").cast("long").alias("step"), "node")


def _walks_sql() -> str:
    from .operators.walks import ADJ_SALTS

    h = (
        "CAST(('0x' || substr(md5(concat_ws(':', f.walk_id, {t}, "
        f"{WALK_SEED})), 1, 15)) AS BIGINT)"
    )
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        # canonical neighbor order is (dst % salts, dst) — the hub-safe
        # two-phase Spark rank composes to exactly this single-window rank
        "adj AS MATERIALIZED (SELECT src, dst, ROW_NUMBER() OVER "
        f"(PARTITION BY src ORDER BY dst % {ADJ_SALTS}, dst) AS idx FROM edges)",
        "deg AS MATERIALIZED (SELECT src, COUNT(*) AS od FROM edges GROUP BY src)",
        "s0 AS (SELECT id AS walk_id, 0 AS step, id AS node FROM nodes)",
    ]
    for t in range(WALK_LEN):
        ctes.append(
            f"""s{t+1} AS MATERIALIZED (
  SELECT f.walk_id, {t+1} AS step, a.dst AS node
  FROM s{t} f JOIN deg d ON d.src = f.node
  JOIN adj a ON a.src = f.node AND a.idx = ({h.format(t=t)} % d.od) + 1
)"""
        )
    union = " UNION ALL ".join(
        f"SELECT walk_id, step, node FROM s{t}" for t in range(WALK_LEN + 1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT walk_id, CAST(step AS BIGINT) AS step, node FROM ({union})"
    )


N2V_P, N2V_Q = 2.0, 0.5  # return penalty / exploration boost
N2V_RETRIES = 4


def q_node2vec_walks(spark, sf_dir):
    """Deterministic node2vec walks: rejection-sampled p/q bias (return
    1/p, one-hop 1, explore 1/q), `retries` uniform candidate draws per
    step, first accepted wins with last-candidate fallback — the oracle
    unrolls the identical draws and accept tests."""
    from .operators.walks import node2vec_walks

    w = node2vec_walks(
        load_edges(spark, sf_dir), walk_length=WALK_LEN, walks_per_node=1,
        p=N2V_P, q=N2V_Q, retries=N2V_RETRIES, seed=WALK_SEED,
    )
    return w.select("walk_id", F.col("step").cast("long").alias("step"), "node")


def _node2vec_sql() -> str:
    from .operators.walks import ADJ_SALTS

    m = 1 << 16
    a_ret, a_mid, a_far = 1.0 / N2V_P, 1.0, 1.0 / N2V_Q
    a_max = max(a_ret, a_mid, a_far)
    thr_ret = int(round(m * a_ret / a_max))
    thr_mid = int(round(m * a_mid / a_max))
    thr_far = int(round(m * a_far / a_max))

    def h(t, alias="c", acc=False):
        tag = ", 'acc'" if acc else ""
        return (
            f"CAST(('0x' || substr(md5(concat_ws(':', {alias}.walk_id, {t}, "
            f"{alias}.r{tag}, {WALK_SEED})), 1, 15)) AS BIGINT)"
        )

    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "adj AS MATERIALIZED (SELECT src, dst, ROW_NUMBER() OVER "
        f"(PARTITION BY src ORDER BY dst % {ADJ_SALTS}, dst) AS idx FROM edges)",
        "deg AS MATERIALIZED (SELECT src, COUNT(*) AS od FROM edges GROUP BY src)",
        "f0 AS (SELECT id AS walk_id, id AS node, CAST(NULL AS BIGINT) AS prev "
        "FROM nodes)",
    ]
    for t in range(WALK_LEN):
        n_r = 1 if t == 0 else N2V_RETRIES
        ctes.append(
            f"""c{t} AS MATERIALIZED (
  SELECT f.walk_id, f.node, f.prev, r.r, d.od
  FROM f{t} f JOIN deg d ON d.src = f.node
  CROSS JOIN (SELECT CAST(range AS INTEGER) AS r FROM range({n_r})) r
)"""
        )
        ctes.append(
            f"""x{t} AS MATERIALIZED (
  SELECT c.walk_id, c.prev, c.r, a.dst AS x
  FROM c{t} c JOIN adj a
    ON a.src = c.node AND a.idx = ({h(t)} % c.od) + 1
)"""
        )
        if t == 0:
            ctes.append(
                f"f{t+1} AS MATERIALIZED (SELECT x.walk_id, x.x AS node, "
                f"f.node AS prev FROM x{t} x JOIN f{t} f ON f.walk_id = x.walk_id)"
            )
        else:
            ctes.append(
                f"""p{t} AS MATERIALIZED (
  SELECT walk_id, x, prev FROM (
    SELECT c.walk_id, c.x, c.prev, c.r, c.acc,
           ROW_NUMBER() OVER (PARTITION BY c.walk_id ORDER BY c.acc DESC,
             CASE WHEN c.acc THEN c.r ELSE -c.r END ASC) AS rn
    FROM (
      SELECT y.walk_id, y.x, y.prev, y.r,
             ({h(t, alias='y', acc=True)} % {m}) <
             (CASE WHEN y.x = y.prev THEN {thr_ret}
                   WHEN ep.src IS NOT NULL THEN {thr_mid}
                   ELSE {thr_far} END) AS acc
      FROM x{t} y LEFT JOIN edges ep ON ep.src = y.prev AND ep.dst = y.x
    ) c
  ) WHERE rn = 1
)"""
            )
            ctes.append(
                f"f{t+1} AS MATERIALIZED (SELECT p.walk_id, p.x AS node, "
                f"f.node AS prev FROM p{t} p JOIN f{t} f ON f.walk_id = p.walk_id)"
            )
    union = " UNION ALL ".join(
        f"SELECT walk_id, {t} AS step, node FROM f{t}" for t in range(WALK_LEN + 1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT walk_id, CAST(step AS BIGINT) AS step, node FROM ({union})"
    )


WALK_W_RES = 128  # power of two → w·res is an exact double scaling


def _weighted_walks_sql() -> str:
    from .operators.walks import ADJ_SALTS

    h = (
        "CAST(('0x' || substr(md5(concat_ws(':', f.walk_id, {t}, "
        f"{WALK_SEED})), 1, 15)) AS BIGINT)"
    )
    iw = f"CAST(floor(w * {float(WALK_W_RES)!r}) AS BIGINT) + 1"
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "base AS (SELECT src, dst, 1e0 + ((src*31 + dst) % 100)/100e0 AS w "
        "FROM edges)",
        f"""rng AS MATERIALIZED (
  SELECT src, dst, hi - iw AS lo, hi FROM (
    SELECT src, dst, iw,
           CAST(SUM(iw) OVER (PARTITION BY src ORDER BY dst % {ADJ_SALTS}, dst
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS hi
    FROM (SELECT src, dst, {iw} AS iw FROM base)))""",
        "deg AS MATERIALIZED (SELECT src, MAX(hi) AS tot FROM rng GROUP BY src)",
        "s0 AS (SELECT id AS walk_id, 0 AS step, id AS node FROM nodes)",
    ]
    for t in range(WALK_LEN):
        u = f"({h.format(t=t)} % d.tot)"
        ctes.append(
            f"""s{t+1} AS MATERIALIZED (
  SELECT f.walk_id, {t+1} AS step, r.dst AS node
  FROM s{t} f JOIN deg d ON d.src = f.node
  JOIN rng r ON r.src = f.node AND {u} >= r.lo AND {u} < r.hi
)"""
        )
    union = " UNION ALL ".join(
        f"SELECT walk_id, step, node FROM s{t}" for t in range(WALK_LEN + 1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT walk_id, CAST(step AS BIGINT) AS step, node FROM ({union})"
    )


def q_cc_alternating(spark, sf_dir):
    """Large-star/small-star CC (O(log² n) rounds — the huge-diameter
    scale path). Oracle-shared with connected_components: both must land
    on the exact min-member labeling."""
    from .operators.components import connected_components_alternating

    return connected_components_alternating(load_edges(spark, sf_dir))


CLOSE_ROOTS = [0, 42, 77, 1234]  # sampled roots for the closeness gate


def q_closeness(spark, sf_dir):
    """K-sample closeness centrality via one multi-source BFS."""
    from .operators.traversal import closeness_centrality

    c = closeness_centrality(load_edges(spark, sf_dir), roots=CLOSE_ROOTS)
    return c.select("id", F.round("closeness", 6).alias("closeness"))


def q_harmonic(spark, sf_dir):
    """K-sample harmonic centrality (same multi-source BFS as closeness)."""
    from .operators.traversal import harmonic_centrality

    h = harmonic_centrality(load_edges(spark, sf_dir), roots=CLOSE_ROOTS)
    return h.select("id", F.round("harmonic", 6).alias("harmonic"))


def q_approx_diameter(spark, sf_dir):
    """Double-sweep diameter lower bound (2 BFS passes)."""
    from .operators.traversal import approx_diameter

    return approx_diameter(load_edges(spark, sf_dir), seed_root=0)


def q_scc(spark, sf_dir):
    """Strongly connected components (distributed FW-BW coloring) on the
    gate graph. The oracle is ALGORITHM-INDEPENDENT: SCC labels are a graph
    property, so DuckDB computes them from the recursive-CTE transitive
    closure (mutual reachability → min member id) rather than mirroring
    the FW-BW rounds."""
    from .operators.scc import strongly_connected_components

    return strongly_connected_components(load_edges(spark, sf_dir))


CORENESS_UNROLL = 12
TRUSS_K = 4  # sf0.01 cascade: 59673 → 4226 → 202 → 60 edges (4 rounds)
TRUSS_UNROLL = 6


def q_k_truss(spark, sf_dir):
    """k-truss edge set after exactly TRUSS_UNROLL support-peels
    (fixed-round SQL-portable mode; converged rounds are no-ops)."""
    from .operators.truss import k_truss

    return k_truss(load_edges(spark, sf_dir), k=TRUSS_K, rounds=TRUSS_UNROLL)


def q_coreness(spark, sf_dir):
    """Full core decomposition after exactly CORENESS_UNROLL h-index
    rounds (fixed-round SQL-portable mode; converged rounds are no-ops on
    both sides)."""
    from .operators.kcore import coreness

    return coreness(load_edges(spark, sf_dir), rounds=CORENESS_UNROLL)


def q_sssp_weighted(spark, sf_dir):
    from .graph import with_synthetic_weights
    from .operators.traversal import sssp

    edges = with_synthetic_weights(load_edges(spark, sf_dir))
    root = edges.agg(F.min(F.least("src", "dst")).alias("r")).collect()[0]["r"]
    d = sssp(edges, root=root, weight_col="weight", max_iter=BFS_UNROLL)
    return d.select("id", F.round("dist", 6).alias("dist"))


def q_avg_teen_cnt(spark, sf_dir):
    """avg_teen_cnt analog (avg_teen_cnt.h:56-141): node 'age' = id % 50;
    per node count in-neighbors with age ∈ [10,20); average over nodes with
    age > 25. Returns one row (avg_teen double, n_nodes long)."""
    edges = load_edges(spark, sf_dir)
    from .graph import nodes_of

    nodes = nodes_of(edges).withColumn("age", F.col("id") % 50)
    teen_in = (
        edges.join(nodes.withColumnRenamed("id", "src_id"),
                   F.col("src") == F.col("src_id"))
        .filter((F.col("age") >= 10) & (F.col("age") < 20))
        .groupBy(F.col("dst").alias("id"))
        .agg(F.count("*").alias("teen_cnt"))
    )
    per_node = nodes.select("id", (F.col("id") % 50).alias("age")).join(
        teen_in, "id", "left"
    ).select("id", "age", F.coalesce("teen_cnt", F.lit(0)).alias("teen_cnt"))
    return per_node.filter(F.col("age") > 25).agg(
        F.round(F.avg("teen_cnt"), 6).alias("avg_teen"),
        F.count("*").alias("n_nodes"),
    )


def q_edge_weight_stats(spark, sf_dir):
    from .graph import edge_prop_stats, with_synthetic_weights

    stats = edge_prop_stats(with_synthetic_weights(load_edges(spark, sf_dir)))
    return stats.select(
        F.round("min_v", 6).alias("min_v"),
        F.round("max_v", 6).alias("max_v"),
        F.round("sum_v", 3).alias("sum_v"),
        "count_v",
        F.round("avg_v", 6).alias("avg_v"),
    )


# ------------------------------------------------------------- oracle SQL


def _pagerank_sql(iters: int = PR_ITERS) -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS od FROM edges GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT id, 1e0/(SELECT n FROM nn) AS rank FROM nodes)",
    ]
    # exact IEEE-double parity with the Spark driver's Python arithmetic:
    # emit the repr of the already-computed double constants
    base_factor = repr(1.0 - DAMPING)
    for i in range(1, iters + 1):
        ctes.append(
            f"""r{i} AS MATERIALIZED (
  SELECT nodes.id,
         CAST({base_factor} AS DOUBLE)/(SELECT n FROM nn)
         + CAST({DAMPING!r} AS DOUBLE) * COALESCE(c.contrib, 0e0) AS rank
  FROM nodes LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank / d.od) AS contrib
    FROM r{i-1} r JOIN edges e ON e.src = r.id JOIN deg d ON d.id = r.id
    GROUP BY e.dst
  ) c ON nodes.id = c.id
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(rank * (SELECT n FROM nn), 6) AS rank_scaled FROM r{iters}"
    )


def _pagerank_redistribute_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED (SELECT * FROM ({EDGES_SQL}) WHERE src % 7 <> 0)",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS od FROM edges GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT id, 1e0/(SELECT n FROM nn) AS rank FROM nodes)",
    ]
    base_factor = repr(1.0 - DAMPING)
    for i in range(1, PR_ITERS + 1):
        # same operation grouping as the Spark column expression:
        # (base + d*coalesce(contrib,0)) + (d*dm)/n
        ctes.append(
            f"""dm{i-1} AS (SELECT COALESCE(SUM(rank), 0e0) AS dm FROM r{i-1}
  WHERE id NOT IN (SELECT id FROM deg)),
r{i} AS MATERIALIZED (
  SELECT nodes.id,
         (CAST({base_factor} AS DOUBLE)/(SELECT n FROM nn)
          + CAST({DAMPING!r} AS DOUBLE) * COALESCE(c.contrib, 0e0))
         + (CAST({DAMPING!r} AS DOUBLE) * (SELECT dm FROM dm{i-1}))
           / CAST((SELECT n FROM nn) AS DOUBLE) AS rank
  FROM nodes LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank / d.od) AS contrib
    FROM r{i-1} r JOIN edges e ON e.src = r.id JOIN deg d ON d.id = r.id
    GROUP BY e.dst
  ) c ON nodes.id = c.id
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(rank * (SELECT n FROM nn), 6) AS rank_scaled FROM r{PR_ITERS}"
    )


def _weighted_pagerank_sql() -> str:
    w = "(1e0 + ((e.src*31 + e.dst) % 100)/100e0)"
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "deg AS MATERIALIZED (SELECT e.src AS id, "
        f"SUM({w}) AS ow FROM edges e GROUP BY e.src)",
        "r0 AS MATERIALIZED (SELECT id, 1e0/(SELECT n FROM nn) AS rank FROM nodes)",
    ]
    base_factor = repr(1.0 - DAMPING)
    for i in range(1, PR_ITERS + 1):
        ctes.append(
            f"""r{i} AS MATERIALIZED (
  SELECT nodes.id,
         CAST({base_factor} AS DOUBLE)/(SELECT n FROM nn)
         + CAST({DAMPING!r} AS DOUBLE) * COALESCE(c.contrib, 0e0) AS rank
  FROM nodes LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank * ({w} / d.ow)) AS contrib
    FROM r{i-1} r JOIN edges e ON e.src = r.id JOIN deg d ON d.id = r.id
    GROUP BY e.dst
  ) c ON nodes.id = c.id
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(rank * (SELECT n FROM nn), 6) AS rank_scaled FROM r{PR_ITERS}"
    )


def _ppr_sql() -> str:
    srcs = ", ".join(str(s) for s in PPR_SOURCES)
    ev = f"(CASE WHEN nodes.id IN ({srcs}) THEN CAST({1.0 / len(PPR_SOURCES)!r} AS DOUBLE) ELSE 0e0 END)"
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS od FROM edges GROUP BY src)",
        f"r0 AS MATERIALIZED (SELECT nodes.id, {ev} AS rank FROM nodes)",
    ]
    base_factor = repr(1.0 - DAMPING)
    for i in range(1, PR_ITERS + 1):
        ctes.append(
            f"""r{i} AS MATERIALIZED (
  SELECT nodes.id,
         CAST({base_factor} AS DOUBLE) * {ev}
         + CAST({DAMPING!r} AS DOUBLE) * COALESCE(c.contrib, 0e0) AS rank
  FROM nodes LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank / d.od) AS contrib
    FROM r{i-1} r JOIN edges e ON e.src = r.id JOIN deg d ON d.id = r.id
    GROUP BY e.dst
  ) c ON nodes.id = c.id
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(rank * (SELECT n FROM nn), 6) AS rank_scaled FROM r{PR_ITERS}"
    )


def _truss_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        "e0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS src, "
        "GREATEST(src, dst) AS dst FROM edges WHERE src <> dst)",
    ]
    for i in range(1, TRUSS_UNROLL + 1):
        ctes.append(
            f"""t{i} AS MATERIALIZED (
  SELECT a.src AS u, a.dst AS v, b.dst AS w
  FROM e{i-1} a JOIN e{i-1} b ON b.src = a.dst
  JOIN e{i-1} c ON c.src = a.src AND c.dst = b.dst
)"""
        )
        ctes.append(
            f"""e{i} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{i-1} e JOIN (
    SELECT src, dst, COUNT(*) AS c FROM (
      SELECT u AS src, v AS dst FROM t{i} UNION ALL
      SELECT v AS src, w AS dst FROM t{i} UNION ALL
      SELECT u AS src, w AS dst FROM t{i}
    ) GROUP BY src, dst
  ) s ON s.src = e.src AND s.dst = e.dst
  WHERE s.c >= {TRUSS_K - 2}
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT src, dst FROM e{TRUSS_UNROLL}"
    )


def _coreness_sql(edges_sql: str = EDGES_SQL, rounds: int | None = None) -> str:
    rounds = CORENESS_UNROLL if rounds is None else rounds
    ctes = [
        f"edges AS MATERIALIZED ({edges_sql})",
        f"und AS MATERIALIZED ({UND_SQL})",
        "c0 AS MATERIALIZED (SELECT src AS id, COUNT(*) AS c FROM und GROUP BY src)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""c{i} AS MATERIALIZED (
  SELECT p.id, CAST(COALESCE(h.h, 0) AS BIGINT) AS c
  FROM c{i-1} p LEFT JOIN (
    SELECT id, MAX(LEAST(value, cum)) AS h FROM (
      SELECT id, value, SUM(cnt) OVER (PARTITION BY id ORDER BY value DESC) AS cum
      FROM (
        SELECT u.dst AS id, q.c AS value, COUNT(*) AS cnt
        FROM c{i-1} q JOIN und u ON u.src = q.id
        GROUP BY u.dst, q.c)
    ) GROUP BY id
  ) h ON p.id = h.id
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, c AS coreness FROM c{rounds}"
    )


def _ms_bfs_with(final_select: str) -> str:
    """Shared multi-root unrolled-BFS CTE chain (m0..m{BFS_UNROLL});
    ``final_select`` consumes m{BFS_UNROLL}(root, id, depth)."""
    roots = ", ".join(f"({r})" for r in CLOSE_ROOTS)
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        f"roots(root) AS (VALUES {roots})",
        "m0 AS MATERIALIZED (SELECT r.root, n.id, "
        "CASE WHEN n.id = r.root THEN 0 END AS depth FROM nodes n CROSS JOIN roots r)",
    ]
    for i in range(1, BFS_UNROLL + 1):
        ctes.append(
            f"""m{i} AS MATERIALIZED (
  SELECT p.root, p.id,
         CASE WHEN c.cand IS NULL THEN p.depth
              WHEN p.depth IS NULL OR c.cand < p.depth THEN c.cand
              ELSE p.depth END AS depth
  FROM m{i-1} p LEFT JOIN (
    SELECT q.root, e.dst AS id, MIN(q.depth + 1) AS cand
    FROM m{i-1} q JOIN edges e ON e.src = q.id
    WHERE q.depth IS NOT NULL GROUP BY q.root, e.dst
  ) c ON p.root = c.root AND p.id = c.id
)"""
        )
    return "WITH " + ",\n".join(ctes) + "\n" + final_select


def _closeness_sql() -> str:
    return _ms_bfs_with(
        f"""SELECT root AS id,
       ROUND(CASE WHEN SUM(depth) > 0
                  THEN (COUNT(depth) - 1) / CAST(SUM(depth) AS DOUBLE)
                  ELSE 0e0 END, 6) AS closeness
FROM m{BFS_UNROLL} WHERE depth IS NOT NULL GROUP BY root"""
    )


def _harmonic_sql() -> str:
    return _ms_bfs_with(
        f"""SELECT root AS id, ROUND(SUM(1e0 / depth), 6) AS harmonic
FROM m{BFS_UNROLL} WHERE depth IS NOT NULL AND depth > 0 GROUP BY root"""
    )


def _diameter_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "d0 AS MATERIALIZED (SELECT id, CASE WHEN id = 0 THEN 0 END AS depth FROM nodes)",
    ]

    def sweep(prefix: str, start: int) -> None:
        for i in range(1, BFS_UNROLL + 1):
            ctes.append(
                f"""{prefix}{i} AS MATERIALIZED (
  SELECT p.id,
         CASE WHEN c.cand IS NULL THEN p.depth
              WHEN p.depth IS NULL OR c.cand < p.depth THEN c.cand
              ELSE p.depth END AS depth
  FROM {prefix}{i-1} p LEFT JOIN (
    SELECT e.dst AS id, MIN(q.depth + 1) AS cand
    FROM {prefix}{i-1} q JOIN edges e ON e.src = q.id
    WHERE q.depth IS NOT NULL GROUP BY e.dst
  ) c ON p.id = c.id
)"""
            )

    sweep("d", 0)
    ctes.append(
        f"far AS (SELECT id FROM d{BFS_UNROLL} WHERE depth IS NOT NULL "
        "ORDER BY depth DESC, id ASC LIMIT 1)"
    )
    ctes.append(
        "g0 AS MATERIALIZED (SELECT id, CASE WHEN id = (SELECT id FROM far) "
        "THEN 0 END AS depth FROM nodes)"
    )
    sweep("g", 0)
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT CAST((SELECT id FROM far) AS BIGINT) AS peripheral_id,
       CAST(MAX(depth) AS BIGINT) AS diameter_lb
FROM g{BFS_UNROLL}"""
    )


def _pagerank_top10_sql() -> str:
    return (
        _pagerank_sql().replace(
            f"SELECT id, ROUND(rank * (SELECT n FROM nn), 6) AS rank_scaled FROM r{PR_ITERS}",
            f"SELECT id, ROUND(rank * (SELECT n FROM nn), 6) AS rank_scaled FROM r{PR_ITERS} "
            "ORDER BY rank_scaled DESC, id ASC LIMIT 10",
        )
    )


def _cc_sql(edges_sql: str = EDGES_SQL) -> str:
    ctes = [
        f"edges AS MATERIALIZED ({edges_sql})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        f"und AS MATERIALIZED ({UND_SQL})",
        "c0 AS MATERIALIZED (SELECT id, id AS component FROM nodes)",
    ]
    for i in range(1, CC_UNROLL + 1):
        ctes.append(
            f"""c{i} AS MATERIALIZED (
  SELECT c.id,
         CASE WHEN m.nmin IS NOT NULL AND m.nmin < c.component
              THEN m.nmin ELSE c.component END AS component
  FROM c{i-1} c LEFT JOIN (
    SELECT u.dst AS id, MIN(p.component) AS nmin
    FROM c{i-1} p JOIN und u ON u.src = p.id
    GROUP BY u.dst
  ) m ON c.id = m.id
)"""
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, component FROM c{CC_UNROLL}"


def _lp_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        f"und AS MATERIALIZED ({UND_SQL})",
        "l0 AS MATERIALIZED (SELECT id, id AS label FROM nodes)",
    ]
    for i in range(1, LP_ITERS + 1):
        ctes.append(
            f"""l{i} AS MATERIALIZED (
  SELECT p.id, COALESCE(v.label, p.label) AS label
  FROM l{i-1} p LEFT JOIN (
    SELECT id, label FROM (
      SELECT u.dst AS id, q.label, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY u.dst
                                ORDER BY COUNT(*) DESC, q.label ASC) AS rn
      FROM l{i-1} q JOIN und u ON u.src = q.id
      GROUP BY u.dst, q.label
    ) WHERE rn = 1
  ) v ON p.id = v.id
)"""
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, label FROM l{LP_ITERS}"


def _triangles_sql() -> str:
    return f"""WITH edges AS ({EDGES_SQL}),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM edges WHERE src <> dst
)
SELECT CAST(COUNT(*) AS BIGINT) AS triangles
FROM und e1 JOIN und e2 ON e1.dst = e2.src
JOIN und e3 ON e3.src = e1.src AND e3.dst = e2.dst"""


def _bfs_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "root AS (SELECT MIN(id) AS r FROM nodes)",
        "d0 AS MATERIALIZED (SELECT id, CASE WHEN id = (SELECT r FROM root) THEN 0 END AS depth FROM nodes)",
    ]
    for i in range(1, BFS_UNROLL + 1):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
  SELECT p.id,
         CASE WHEN c.cand IS NULL THEN p.depth
              WHEN p.depth IS NULL OR c.cand < p.depth THEN c.cand
              ELSE p.depth END AS depth
  FROM d{i-1} p LEFT JOIN (
    SELECT e.dst AS id, MIN(q.depth + 1) AS cand
    FROM d{i-1} q JOIN edges e ON e.src = q.id
    WHERE q.depth IS NOT NULL GROUP BY e.dst
  ) c ON p.id = c.id
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, CAST(depth AS BIGINT) AS depth FROM d{BFS_UNROLL}"
    )


def _sssp_sql() -> str:
    ctes = [
        f"edges_raw AS MATERIALIZED ({EDGES_SQL})",
        "edges AS MATERIALIZED (SELECT src, dst, 1e0 + ((src*31 + dst) % 100)/100e0 AS w FROM edges_raw)",
        "nodes AS (SELECT DISTINCT id FROM (SELECT src AS id FROM edges UNION ALL SELECT dst AS id FROM edges))",
        "root AS (SELECT MIN(id) AS r FROM nodes)",
        "d0 AS MATERIALIZED (SELECT id, CASE WHEN id = (SELECT r FROM root) THEN 0.0 END AS dist FROM nodes)",
    ]
    for i in range(1, BFS_UNROLL + 1):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
  SELECT p.id,
         CASE WHEN c.cand IS NULL THEN p.dist
              WHEN p.dist IS NULL OR c.cand < p.dist THEN c.cand
              ELSE p.dist END AS dist
  FROM d{i-1} p LEFT JOIN (
    SELECT e.dst AS id, MIN(q.dist + e.w) AS cand
    FROM d{i-1} q JOIN edges e ON e.src = q.id
    WHERE q.dist IS NOT NULL GROUP BY e.dst
  ) c ON p.id = c.id
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(dist, 6) AS dist FROM d{BFS_UNROLL}"
    )


ORACLE: dict[str, str] = {
    "edges": f"SELECT src, dst FROM ({EDGES_SQL})",
    "nodes": f"WITH edges AS ({EDGES_SQL}) SELECT id FROM ({NODES_SQL})",
    "degrees": f"""WITH edges AS ({EDGES_SQL}), nodes AS ({NODES_SQL})
SELECT n.id,
       CAST(COALESCE(o.od, 0) AS BIGINT) AS out_degree,
       CAST(COALESCE(i.ind, 0) AS BIGINT) AS in_degree
FROM nodes n
LEFT JOIN (SELECT src AS id, COUNT(*) AS od FROM edges GROUP BY src) o ON n.id = o.id
LEFT JOIN (SELECT dst AS id, COUNT(*) AS ind FROM edges GROUP BY dst) i ON n.id = i.id""",
    "degree_distribution": f"""WITH edges AS ({EDGES_SQL}),
deg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src)
SELECT CAST(FLOOR(LOG2(od)) AS BIGINT) AS bucket,
       COUNT(*) AS n_nodes, CAST(SUM(od) AS BIGINT) AS degree_mass
FROM deg GROUP BY 1 ORDER BY 1""",
    "pagerank": _pagerank_sql(),
    "pagerank_top10": _pagerank_top10_sql(),
    # resume-identity: warm-started 6+6 must equal one uninterrupted 12
    "pagerank_incremental": _pagerank_sql(PR_INC_TOTAL),
    "weighted_pagerank": _weighted_pagerank_sql(),
    # incremental warm-start must land on the SAME fixpoint as cold CC —
    # the oracle is deliberately initialization-blind (full-graph unroll)
    "cc_incremental": _cc_sql(),
    "cc_alternating": _cc_sql(),
    "random_walks": _walks_sql(),
    "random_walks_weighted": _weighted_walks_sql(),
    "node2vec_walks": _node2vec_sql(),
    "weighted_k_core": _weighted_k_core_sql(),
    "personalized_pagerank": _ppr_sql(),
    "pagerank_redistribute": _pagerank_redistribute_sql(),
    "connected_components": _cc_sql(),
    "label_propagation": _lp_sql(),
    "triangle_count": _triangles_sql(),
    "k_core": (lambda: (
        "WITH "
        + ",\n".join(
            [f"edges AS MATERIALIZED ({EDGES_SQL})", f"e0 AS MATERIALIZED ({UND_SQL})"]
            + [
                f"""e{i} AS MATERIALIZED (
  SELECT e.src, e.dst FROM e{i-1} e
  WHERE e.src IN (SELECT src FROM e{i-1} GROUP BY src HAVING COUNT(*) >= {KCORE_K})
    AND e.dst IN (SELECT src FROM e{i-1} GROUP BY src HAVING COUNT(*) >= {KCORE_K})
)"""
                for i in range(1, KCORE_UNROLL + 1)
            ]
        )
        + f"\nSELECT src AS id, COUNT(*) AS degree FROM e{KCORE_UNROLL} GROUP BY src"
    ))(),
    "closeness": _closeness_sql(),
    "harmonic": _harmonic_sql(),
    "approx_diameter": _diameter_sql(),
    "coreness": _coreness_sql(),
    "k_truss": _truss_sql(),
    "scc": f"""WITH RECURSIVE edges AS MATERIALIZED ({EDGES_SQL}),
nodes AS MATERIALIZED ({NODES_SQL}),
reach(a, b) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
mutual AS (
  SELECT r1.a AS v, r1.b AS u FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a)
SELECT n.id, LEAST(n.id, COALESCE(MIN(m.u), n.id)) AS scc
FROM nodes n LEFT JOIN mutual m ON m.v = n.id GROUP BY n.id""",
    "bfs_depths": _bfs_sql(),
    "bfs_reachable_count": f"""SELECT CAST(COUNT(*) AS BIGINT) AS reachable
FROM ({_bfs_sql()}) WHERE depth IS NOT NULL""",
    "level_spread": f"""WITH edges AS ({EDGES_SQL}),
wl AS (SELECT src, dst, (src*31 + dst) % 3 AS level FROM edges),
nodes AS (SELECT DISTINCT id FROM
  (SELECT src AS id FROM wl UNION ALL SELECT dst AS id FROM wl)),
per_node AS (
  SELECT n.id,
         CAST(COALESCE(p.spread, 0) AS BIGINT) AS spread,
         CAST(COALESCE(p.od, 0) AS BIGINT) AS out_degree
  FROM nodes n LEFT JOIN (
    SELECT src AS id, COUNT(DISTINCT level) AS spread, COUNT(*) AS od
    FROM wl GROUP BY src
  ) p ON n.id = p.id)
SELECT spread, COUNT(*) AS frequency,
       CAST(SUM(out_degree) AS BIGINT) AS degree_sum,
       ROUND(SUM(out_degree) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_out_degree
FROM per_node GROUP BY spread ORDER BY spread""",
    "sssp_weighted": _sssp_sql(),
    "avg_teen_cnt": f"""WITH edges AS ({EDGES_SQL}), nodes AS ({NODES_SQL}),
teen_in AS (
  SELECT e.dst AS id, COUNT(*) AS teen_cnt
  FROM edges e JOIN nodes s ON e.src = s.id
  WHERE (s.id % 50) >= 10 AND (s.id % 50) < 20
  GROUP BY e.dst
),
per_node AS (
  SELECT n.id, n.id % 50 AS age, COALESCE(t.teen_cnt, 0) AS teen_cnt
  FROM nodes n LEFT JOIN teen_in t ON n.id = t.id
)
SELECT ROUND(AVG(teen_cnt), 6) AS avg_teen, COUNT(*) AS n_nodes
FROM per_node WHERE age > 25""",
    "edge_weight_stats": f"""WITH edges_raw AS ({EDGES_SQL}),
w AS (SELECT 1e0 + ((src*31 + dst) % 100)/100e0 AS weight FROM edges_raw)
SELECT ROUND(MIN(weight), 6) AS min_v, ROUND(MAX(weight), 6) AS max_v,
       ROUND(SUM(weight), 3) AS sum_v, COUNT(weight) AS count_v,
       ROUND(AVG(weight), 6) AS avg_v
FROM w""",
}

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "edges": q_edges,
    "nodes": q_nodes,
    "degrees": q_degrees,
    "degree_distribution": q_degree_distribution,
    "pagerank": q_pagerank,
    "pagerank_top10": q_pagerank_top10,
    "pagerank_incremental": q_pagerank_incremental,
    "weighted_pagerank": q_weighted_pagerank,
    "cc_incremental": q_cc_incremental,
    "cc_alternating": q_cc_alternating,
    "random_walks": q_random_walks,
    "random_walks_weighted": q_random_walks_weighted,
    "node2vec_walks": q_node2vec_walks,
    "weighted_k_core": q_weighted_k_core,
    "personalized_pagerank": q_personalized_pagerank,
    "pagerank_redistribute": q_pagerank_redistribute,
    "connected_components": q_connected_components,
    "label_propagation": q_label_propagation,
    "triangle_count": q_triangle_count,
    "bfs_depths": q_bfs_depths,
    "k_core": q_k_core,
    "scc": q_scc,
    "closeness": q_closeness,
    "harmonic": q_harmonic,
    "approx_diameter": q_approx_diameter,
    "coreness": q_coreness,
    "k_truss": q_k_truss,
    "bfs_reachable_count": q_bfs_reachable_count,
    "level_spread": q_level_spread,
    "sssp_weighted": q_sssp_weighted,
    "avg_teen_cnt": q_avg_teen_cnt,
    "edge_weight_stats": q_edge_weight_stats,
}


# ---- betweenness centrality (bc_random analog, K=4 deterministic roots) ----

BC_ROOTS_K = 4
BC_UNROLL = 12


def q_betweenness(spark, sf_dir):
    from .operators.bc import betweenness_centrality

    edges = load_edges(spark, sf_dir)
    roots = [
        r["id"]
        for r in edges.selectExpr("src AS id")
        .union(edges.selectExpr("dst AS id"))
        .distinct()
        .orderBy("id")
        .limit(BC_ROOTS_K)
        .collect()
    ]
    bc = betweenness_centrality(edges, roots=roots, max_depth=BC_UNROLL)
    return bc.select("id", F.round("bc", 6).alias("bc"))


def _bc_ctes() -> list:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        f"roots AS (SELECT id AS root FROM nodes ORDER BY id LIMIT {BC_ROOTS_K})",
        "v0 AS MATERIALIZED (SELECT root, root AS id, 0 AS depth, 1e0 AS sigma FROM roots)",
        "vis0 AS MATERIALIZED (SELECT * FROM v0)",
    ]
    for d in range(1, BC_UNROLL + 1):
        ctes.append(
            f"""v{d} AS MATERIALIZED (
  SELECT c.root, c.id, {d} AS depth, SUM(c.sigma) AS sigma
  FROM (
    SELECT f.root, e.dst AS id, f.sigma
    FROM v{d-1} f JOIN edges e ON e.src = f.id
  ) c LEFT JOIN vis{d-1} seen ON seen.root = c.root AND seen.id = c.id
  WHERE seen.id IS NULL
  GROUP BY c.root, c.id
)"""
        )
        ctes.append(
            f"vis{d} AS MATERIALIZED (SELECT * FROM vis{d-1} UNION ALL SELECT * FROM v{d})"
        )
    # backward sweep
    ctes.append(
        f"delta{BC_UNROLL} AS MATERIALIZED (SELECT root, id, 0e0 AS delta FROM v{BC_UNROLL})"
    )
    for d in range(BC_UNROLL - 1, -1, -1):
        # delta rows for nodes at depth d (accumulated from depth d+1)
        ctes.append(
            f"""delta{d} AS MATERIALIZED (
  SELECT v.root, v.id,
         COALESCE(v.sigma * s.acc, 0e0) AS delta
  FROM v{d} v LEFT JOIN (
    SELECT v2.root, v2.id,
           SUM((1e0 + w.delta) / wv.sigma) AS acc
    FROM v{d} v2
    JOIN edges e ON e.src = v2.id
    JOIN v{d+1} wv ON wv.root = v2.root AND wv.id = e.dst
    JOIN delta{d+1} w ON w.root = wv.root AND w.id = wv.id
    GROUP BY v2.root, v2.id
  ) s ON s.root = v.root AND s.id = v.id
)"""
        )
    # note: delta{d+1} rows carry w.delta but sigma comes from v{d+1} (wv)
    return ctes


def _bc_sql() -> str:
    ctes = _bc_ctes()
    all_deltas = " UNION ALL ".join(
        f"SELECT root, id, delta FROM delta{d}" for d in range(BC_UNROLL + 1)
    )
    ctes.append(f"alldelta AS MATERIALIZED ({all_deltas})")
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT n.id, ROUND(COALESCE(b.bc, 0e0), 6) AS bc
FROM nodes n LEFT JOIN (
  SELECT id, SUM(delta) AS bc FROM alldelta WHERE id <> root GROUP BY id
) b ON n.id = b.id"""
    )


def _ebc_sql() -> str:
    """Edge-betweenness oracle: the node chain's CTEs plus per-level edge
    terms sigma_v*(1+delta_w)/sigma_w summed per directed edge."""
    ctes = _bc_ctes()
    for d in range(BC_UNROLL):
        ctes.append(
            f"""ect{d} AS MATERIALIZED (
  SELECT v2.root, v2.id AS src, wv.id AS dst,
         v2.sigma * (1e0 + w.delta) / wv.sigma AS contrib
  FROM v{d} v2
  JOIN edges e ON e.src = v2.id
  JOIN v{d+1} wv ON wv.root = v2.root AND wv.id = e.dst
  JOIN delta{d+1} w ON w.root = wv.root AND w.id = wv.id
)"""
        )
    all_terms = " UNION ALL ".join(
        f"SELECT src, dst, contrib FROM ect{d}" for d in range(BC_UNROLL)
    )
    ctes.append(f"allterms AS MATERIALIZED ({all_terms})")
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT de.src, de.dst, ROUND(COALESCE(s.v, 0e0), 6) AS ebc
FROM (SELECT DISTINCT src, dst FROM edges WHERE src <> dst) de
LEFT JOIN (
  SELECT src, dst, SUM(contrib) AS v FROM allterms GROUP BY src, dst
) s ON s.src = de.src AND s.dst = de.dst"""
    )


# ---- relational showcase (general DataFrame capability) ----


def q_tpch_q1(spark, sf_dir):
    """TPC-H Q1 shape with exact decimal aggregation (cast to DECIMAL(18,4)
    before summing, final cast to double → bit-identical across engines)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))).cast(
                    "decimal(28,8)"
                )
            ).cast("double").alias("sum_disc_price"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_tpch_q3(spark, sf_dir):
    """TPC-H Q3 shape (shipping-priority top orders): 3-way join with
    selective filters on both fact sides, decimal-exact revenue, top-10 by
    (revenue desc, orderkey) — the full ordering key is identical in the
    oracle so the LIMIT cut is deterministic."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderdate") < F.lit("1998-01-01")
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_shipdate") > F.lit("1998-01-01")
    )
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    # customer is fact-sized at the 100-TB target → no explicit broadcast;
    # AQE picks broadcast at small SF from actual post-filter sizes.
    # orders⨝lineitem shuffles on the join key, both sides pre-filtered.
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))).cast(
                    "decimal(28,8)"
                )
            ).cast("double").alias("revenue")
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
        .select("l_orderkey", F.round("revenue", 4).alias("revenue"),
                F.col("o_orderdate").cast("timestamp").cast("long").alias("o_orderdate_s"))
    )


def q_tpch_q5(spark, sf_dir):
    """TPC-H Q5 shape (local-supplier volume per nation): 6-table join —
    dims (nation, region, supplier, customer) broadcast, facts shuffle on
    the join keys; revenue only where customer and supplier share a
    nation."""
    region = spark.read.parquet(f"{sf_dir}/region.parquet").filter(
        F.col("r_name") == "ASIA"
    )
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    supplier = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    asian_nations = nation.join(
        F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"]
    ).select("n_nationkey", "n_name")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(supplier), li["l_suppkey"] == supplier["s_suppkey"])
        .join(
            cust,  # fact-sized at target scale — shuffle/AQE, not broadcast
            (orders["o_custkey"] == cust["c_custkey"])
            & (cust["c_nationkey"] == supplier["s_nationkey"]),
        )
        .join(
            F.broadcast(asian_nations),
            supplier["s_nationkey"] == asian_nations["n_nationkey"],
        )
        .groupBy("n_name")
        .agg(
            F.sum(
                (dec("l_extendedprice") * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))).cast(
                    "decimal(28,8)"
                )
            ).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
        .select("n_name", F.round("revenue", 4).alias("revenue"), "n_items")
    )


def q_top_parts_per_supplier(spark, sf_dir):
    """Top-3 parts by revenue per supplier — window top-k pattern."""
    from pyspark.sql import Window

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    rev = (
        li.groupBy("l_suppkey", "l_partkey")
        .agg(
            F.sum(
                (F.col("l_extendedprice").cast("decimal(18,4)")
                 * (F.lit(1).cast("decimal(18,4)") - F.col("l_discount").cast("decimal(18,4)"))
                 ).cast("decimal(28,8)")
            ).cast("double").alias("revenue")
        )
    )
    w = Window.partitionBy("l_suppkey").orderBy(F.desc("revenue"), F.asc("l_partkey"))
    return (
        rev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("l_suppkey", "l_partkey", F.round("revenue", 4).alias("revenue"),
                F.col("rn").cast("long").alias("rn"))
    )


def q_event_sessions(spark, sf_dir):
    """Sessionization: 30-min inactivity gap per user → session bounds."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet").withColumn(
        "ts_s", F.col("ts").cast("timestamp").cast("long")
    )
    # order by the SAME key the DuckDB oracle uses (floored epoch seconds +
    # event_id) so sub-second timestamps can't reorder the running sums
    w = Window.partitionBy("user_id").orderBy("ts_s", "event_id")
    with_gap = ev.withColumn(
        "new_session",
        (
            F.col("ts_s") - F.coalesce(F.lag("ts_s").over(w), F.lit(0)) > 1800
        ).cast("int"),
    )
    sess = with_gap.withColumn(
        "session_no",
        F.sum("new_session").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    return sess.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.min(F.col("ts").cast("timestamp").cast("long")).alias("start_s"),
        F.max(F.col("ts").cast("timestamp").cast("long")).alias("end_s"),
        F.round(F.sum("value"), 4).alias("total_value"),
    )


def q_event_window_counts(spark, sf_dir):
    """Tumbling 5-minute windows per event type (epoch-bucket form so the
    oracle needs no timezone gymnastics)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        ev.withColumn("bucket", (F.col("ts").cast("timestamp").cast("long") / 300).cast("long"))
        .groupBy("bucket", "event_type")
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


ORACLE["betweenness"] = _bc_sql()
ORACLE["tpch_q1"] = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                AS DECIMAL(28,8))) AS DOUBLE) AS sum_disc_price,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus"""
ORACLE["tpch_q3"] = """
WITH rev AS (
  SELECT l.l_orderkey, o.o_orderdate,
         CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                  * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))
                  AS DECIMAL(28,8))) AS DOUBLE) AS revenue
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  WHERE c.c_mktsegment = 'BUILDING'
    AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
    AND l.l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY l.l_orderkey, o.o_orderdate)
SELECT l_orderkey, ROUND(revenue, 4) AS revenue,
       CAST(floor(epoch(o_orderdate)) AS BIGINT) AS o_orderdate_s
FROM rev ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"""
ORACLE["tpch_q5"] = """
SELECT n.n_name,
       ROUND(CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))
                AS DECIMAL(28,8))) AS DOUBLE), 4) AS revenue,
       COUNT(*) AS n_items
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey AND c.c_nationkey = s.s_nationkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n.n_name"""
ORACLE["top_parts_per_supplier"] = """
WITH rev AS (
  SELECT l_suppkey, l_partkey,
         CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
                  * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
                  AS DECIMAL(28,8))) AS DOUBLE) AS revenue
  FROM lineitem GROUP BY l_suppkey, l_partkey),
ranked AS (
  SELECT l_suppkey, l_partkey, revenue,
         ROW_NUMBER() OVER (PARTITION BY l_suppkey
                            ORDER BY revenue DESC, l_partkey ASC) AS rn
  FROM rev)
SELECT l_suppkey, l_partkey, ROUND(revenue, 4) AS revenue, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 3"""
ORACLE["event_sessions"] = """
WITH wg AS (
  SELECT user_id, event_id, value, CAST(floor(epoch(ts)) AS BIGINT) AS ts_s,
         CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
                   - COALESCE(lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w, 0) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
sess AS (
  SELECT user_id, value, ts_s,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts_s, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_no
  FROM wg)
SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
       COUNT(*) AS n_events,
       MIN(ts_s) AS start_s, MAX(ts_s) AS end_s,
       ROUND(SUM(value), 4) AS total_value
FROM sess GROUP BY user_id, session_no"""
ORACLE["event_window_counts"] = """
SELECT CAST(CAST(floor(epoch(ts)) AS BIGINT) // 300 AS BIGINT) AS bucket, event_type,
       COUNT(*) AS n, ROUND(SUM(value), 4) AS sum_value
FROM events GROUP BY 1, 2"""

QUERIES["betweenness"] = q_betweenness
QUERIES["tpch_q1"] = q_tpch_q1
QUERIES["tpch_q3"] = q_tpch_q3
QUERIES["tpch_q5"] = q_tpch_q5
QUERIES["top_parts_per_supplier"] = q_top_parts_per_supplier
QUERIES["event_sessions"] = q_event_sessions
QUERIES["event_window_counts"] = q_event_window_counts


def q_triangles_per_node(spark, sf_dir):
    from .operators.triangles import triangles_per_node

    return triangles_per_node(load_edges(spark, sf_dir), orient="degree")


ORACLE["triangles_per_node"] = f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM edges WHERE src <> dst
),
tris AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM und e1 JOIN und e2 ON e1.dst = e2.src
  JOIN und e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
corners AS (
  SELECT a AS id FROM tris UNION ALL SELECT b FROM tris UNION ALL SELECT c FROM tris
)
SELECT id, COUNT(*) AS triangles FROM corners GROUP BY id"""

QUERIES["triangles_per_node"] = q_triangles_per_node


def q_component_sizes(spark, sf_dir):
    """Component histogram: size of each weakly-connected component."""
    from .operators.components import connected_components

    cc = connected_components(load_edges(spark, sf_dir))
    return cc.groupBy("component").agg(F.count("*").alias("n_nodes"))


ORACLE["component_sizes"] = (
    _cc_sql().replace(
        f"SELECT id, component FROM c{CC_UNROLL}",
        f"SELECT component, COUNT(*) AS n_nodes FROM c{CC_UNROLL} GROUP BY component",
    )
)
QUERIES["component_sizes"] = q_component_sizes


# ---- local clustering coefficient + link prediction (operators/linkpred) ----

LINKPRED_TOP_K = 50


def q_local_clustering(spark, sf_dir):
    from .operators.linkpred import local_clustering

    return local_clustering(load_edges(spark, sf_dir), orient="degree")


ORACLE["local_clustering"] = f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
und AS MATERIALIZED ({UND_SQL}),
ordered AS MATERIALIZED (SELECT src, dst FROM und WHERE src < dst),
deg AS (SELECT src AS id, COUNT(*) AS deg FROM und GROUP BY src),
tris AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM ordered e1 JOIN ordered e2 ON e1.dst = e2.src
  JOIN ordered e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
corners AS (
  SELECT a AS id FROM tris UNION ALL SELECT b FROM tris UNION ALL SELECT c FROM tris
),
tpn AS (SELECT id, COUNT(*) AS t FROM corners GROUP BY id)
SELECT d.id,
       CAST(COALESCE(t.t, 0) AS BIGINT) AS triangles,
       CAST(d.deg AS BIGINT) AS degree,
       ROUND(CASE WHEN d.deg >= 2
                  THEN 2e0 * COALESCE(t.t, 0) / (d.deg * (d.deg - 1))
                  ELSE 0e0 END, 6) AS coefficient
FROM deg d LEFT JOIN tpn t ON d.id = t.id"""

QUERIES["local_clustering"] = q_local_clustering


def q_link_prediction(spark, sf_dir):
    from .operators.linkpred import link_prediction_scores

    return link_prediction_scores(load_edges(spark, sf_dir), top_k=LINKPRED_TOP_K)


ORACLE["link_prediction"] = f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
und AS MATERIALIZED ({UND_SQL}),
deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS deg FROM und GROUP BY src),
wedges AS (
  SELECT l.dst AS a, r.dst AS b, d.deg AS zdeg
  FROM und l JOIN und r ON l.src = r.src AND l.dst < r.dst
  JOIN deg d ON d.id = l.src
),
scored AS (
  SELECT a, b, COUNT(*) AS common, SUM(1e0/LN(zdeg)) AS aa_raw
  FROM wedges GROUP BY a, b
),
non_edges AS (
  SELECT s.* FROM scored s
  WHERE NOT EXISTS (SELECT 1 FROM und u WHERE u.src = s.a AND u.dst = s.b)
)
SELECT n.a, n.b, CAST(n.common AS BIGINT) AS common,
       ROUND(n.common / CAST(da.deg + db.deg - n.common AS DOUBLE), 6) AS jaccard,
       ROUND(n.aa_raw, 6) AS adamic_adar,
       CAST(da.deg * db.deg AS BIGINT) AS pref_attach
FROM non_edges n JOIN deg da ON da.id = n.a JOIN deg db ON db.id = n.b
ORDER BY adamic_adar DESC, n.a, n.b LIMIT {LINKPRED_TOP_K}"""

QUERIES["link_prediction"] = q_link_prediction


# ---- domain-contracted PageRank (operators/contract) ----

DOMAIN_MOD = 64


def _domain_pagerank_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"""cedges AS MATERIALIZED (
  SELECT src % {DOMAIN_MOD} AS src, dst % {DOMAIN_MOD} AS dst,
         CAST(COUNT(*) AS DOUBLE) AS weight
  FROM edges WHERE src % {DOMAIN_MOD} <> dst % {DOMAIN_MOD}
  GROUP BY 1, 2
)""",
        """cnodes AS MATERIALIZED (SELECT DISTINCT id FROM (
  SELECT src AS id FROM cedges UNION ALL SELECT dst AS id FROM cedges))""",
        "nn AS (SELECT COUNT(*) AS n FROM cnodes)",
        "ow AS MATERIALIZED (SELECT src AS id, SUM(weight) AS ow FROM cedges GROUP BY src)",
        "r0 AS MATERIALIZED (SELECT id, 1e0/(SELECT n FROM nn) AS rank FROM cnodes)",
    ]
    base_factor = repr(1.0 - DAMPING)
    for i in range(1, PR_ITERS + 1):
        ctes.append(
            f"""r{i} AS MATERIALIZED (
  SELECT cnodes.id,
         CAST({base_factor} AS DOUBLE)/(SELECT n FROM nn)
         + CAST({DAMPING!r} AS DOUBLE) * COALESCE(c.contrib, 0e0) AS rank
  FROM cnodes LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank * (e.weight / d.ow)) AS contrib
    FROM r{i-1} r JOIN cedges e ON e.src = r.id JOIN ow d ON d.id = r.id
    GROUP BY e.dst
  ) c ON cnodes.id = c.id
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(rank * (SELECT n FROM nn), 6) AS rank_scaled FROM r{PR_ITERS}"
    )


def q_domain_pagerank(spark, sf_dir):
    """Host-graph PageRank: contract the page graph to domains (synthetic
    domain = id % 64 — the modulo analog of url_domain on packed ids),
    then weighted power iteration over the contracted multigraph."""
    from .graph import nodes_of
    from .operators.contract import contract_graph
    from .operators.pagerank import pagerank_result

    edges = load_edges(spark, sf_dir)
    mapping = nodes_of(edges).select("id", (F.col("id") % DOMAIN_MOD).alias("gid"))
    ce = contract_graph(edges, mapping)
    res = pagerank_result(ce, damping=DAMPING, max_iter=PR_ITERS, weight_col="weight")
    return res.state.select(
        "id", F.round(F.col("rank") * F.lit(float(res.n_nodes)), 6).alias("rank_scaled")
    )


ORACLE["domain_pagerank"] = _domain_pagerank_sql()
QUERIES["domain_pagerank"] = q_domain_pagerank


# ---- maximal independent set (operators/mis, Luby rounds) ----

MIS_UNROLL = 24


def _mis_sql() -> str:
    def key(col: str, r: int) -> str:
        # packed (prio, id-low-32) BIGINT — mirrors operators/mis._key
        prio = (
            f"(({col} % 1000003) * 2654435761 + {r * 1315423911}"
            f" + ({col} % 2147483647)) % 2147483647"
        )
        return f"(({prio}) * 4294967296 + ({col} % 4294967296))"

    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"und AS MATERIALIZED ({UND_SQL})",
        """a0 AS MATERIALIZED (SELECT DISTINCT id FROM (
  SELECT src AS id FROM und UNION ALL SELECT dst FROM und))""",
    ]
    for r in range(1, MIS_UNROLL + 1):
        ctes.append(
            f"""s{r} AS MATERIALIZED (
  SELECT v.id FROM a{r-1} v LEFT JOIN (
    SELECT e.src AS id, MIN({key('n.id', r)}) AS b
    FROM und e JOIN a{r-1} n ON n.id = e.dst
    GROUP BY e.src
  ) bn ON bn.id = v.id
  WHERE bn.b IS NULL OR {key('v.id', r)} < bn.b
)"""
        )
        ctes.append(
            f"""a{r} AS MATERIALIZED (
  SELECT id FROM a{r-1}
  WHERE id NOT IN (SELECT id FROM s{r})
    AND id NOT IN (SELECT e.dst FROM und e JOIN s{r} s ON s.id = e.src)
)"""
        )
    union = " UNION ALL ".join(f"SELECT id FROM s{r}" for r in range(1, MIS_UNROLL + 1))
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id FROM ({union})"


def q_mis(spark, sf_dir):
    from .operators.mis import maximal_independent_set

    return maximal_independent_set(load_edges(spark, sf_dir))


ORACLE["mis"] = _mis_sql()
QUERIES["mis"] = q_mis


# ---- minimum spanning forest (operators/mst, Borůvka rounds) ----

MST_UNROLL = 13   # ≥ ⌈log2 |V|⌉ + 1 detect round at every gate SF
MST_JUMPS = 13    # pointer doublings: resolves chosen chains up to 2^13


def _mst_sql() -> str:
    w = "1e0 + ((src*31 + dst) % 100)/100e0"
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"""cund AS MATERIALIZED (
  SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b, MIN({w}) AS w
  FROM edges GROUP BY 1, 2
)""",
        """c0 AS MATERIALIZED (
  SELECT id, id AS comp FROM (
    SELECT DISTINCT a AS id FROM cund UNION SELECT DISTINCT b FROM cund))""",
    ]
    for r in range(1, MST_UNROLL + 1):
        # every CTE referenced more than once MUST be MATERIALIZED: DuckDB
        # inlines plain CTEs per reference, and the self-joining pointer
        # chain q_k would otherwise expand 2^MST_JUMPS-fold at plan time
        ctes.append(
            f"""lab{r} AS MATERIALIZED (
  SELECT ca.comp AS comp_a, cb.comp AS comp_b, e.w, e.a, e.b
  FROM cund e JOIN c{r-1} ca ON ca.id = e.a JOIN c{r-1} cb ON cb.id = e.b
  WHERE ca.comp <> cb.comp
)"""
        )
        ctes.append(
            f"""ch{r} AS MATERIALIZED (
  SELECT comp, w, a, b, other FROM (
    SELECT comp, w, a, b, other,
           ROW_NUMBER() OVER (PARTITION BY comp ORDER BY w, a, b) AS rn
    FROM (
      SELECT comp_a AS comp, w, a, b, comp_b AS other FROM lab{r}
      UNION ALL
      SELECT comp_b, w, a, b, comp_a FROM lab{r}
    )) t WHERE rn = 1
)"""
        )
        ctes.append(
            f"""q{r}_0 AS MATERIALIZED (
  SELECT x.comp,
         CASE WHEN y.other = x.comp AND x.comp < x.other
              THEN x.comp ELSE x.other END AS p
  FROM ch{r} x JOIN ch{r} y ON x.other = y.comp
)"""
        )
        for k in range(1, MST_JUMPS + 1):
            ctes.append(
                f"""q{r}_{k} AS MATERIALIZED (
  SELECT x.comp, y.p FROM q{r}_{k-1} x JOIN q{r}_{k-1} y ON x.p = y.comp
)"""
            )
        ctes.append(
            f"""c{r} AS MATERIALIZED (
  SELECT c.id, COALESCE(q.p, c.comp) AS comp
  FROM c{r-1} c LEFT JOIN q{r}_{MST_JUMPS} q ON q.comp = c.comp
)"""
        )
    union = " UNION ALL ".join(
        f"SELECT a, b, w FROM ch{r}" for r in range(1, MST_UNROLL + 1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""\nSELECT DISTINCT a AS src, b AS dst, ROUND(w, 6) AS weight
FROM ({union})"""
    )


def q_mst(spark, sf_dir):
    from .graph import with_synthetic_weights
    from .operators.mst import minimum_spanning_forest

    return minimum_spanning_forest(with_synthetic_weights(load_edges(spark, sf_dir)))


ORACLE["mst"] = _mst_sql()
QUERIES["mst"] = q_mst


# ------------------------------------------------- HITS (hubs & authorities)

HITS_ITERS = 8


def q_hits(spark, sf_dir):
    from .operators.hits import hits_result

    res = hits_result(load_edges(spark, sf_dir), max_iter=HITS_ITERS)
    n = float(res.n_nodes)
    return res.state.select(
        "id",
        F.round(F.col("auth") * F.lit(n), 6).alias("auth_scaled"),
        F.round(F.col("hub") * F.lit(n), 6).alias("hub_scaled"),
    )


def _hits_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "s0 AS MATERIALIZED (SELECT id, 1e0/(SELECT n FROM nn) AS auth, "
        "1e0/(SELECT n FROM nn) AS hub FROM nodes)",
    ]
    for i in range(1, HITS_ITERS + 1):
        ctes.append(
            f"""ar{i} AS (SELECT e.dst AS id, SUM(s.hub) AS ar
  FROM s{i-1} s JOIN edges e ON e.src = s.id GROUP BY e.dst),
at{i} AS (SELECT SUM(ar) AS t FROM ar{i}),
a{i} AS MATERIALIZED (
  SELECT n.id, COALESCE(r.ar, 0e0) / (SELECT t FROM at{i}) AS auth
  FROM nodes n LEFT JOIN ar{i} r ON r.id = n.id),
hr{i} AS (SELECT e.src AS id, SUM(a.auth) AS hr
  FROM a{i} a JOIN edges e ON e.dst = a.id GROUP BY e.src),
ht{i} AS (SELECT SUM(hr) AS t FROM hr{i}),
s{i} AS MATERIALIZED (
  SELECT a.id, a.auth, COALESCE(h.hr, 0e0) / (SELECT t FROM ht{i}) AS hub
  FROM a{i} a LEFT JOIN hr{i} h ON h.id = a.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""\nSELECT id,
       ROUND(auth * (SELECT n FROM nn), 6) AS auth_scaled,
       ROUND(hub * (SELECT n FROM nn), 6) AS hub_scaled
FROM s{HITS_ITERS}"""
    )


ORACLE["hits"] = _hits_sql()
QUERIES["hits"] = q_hits


# ---------------------------------------- ANF / neighborhood function

ANF_T = 6
ANF_R = 8
_ANF_FORCE = 1 << 59


def q_neighborhood_function(spark, sf_dir):
    from .operators.anf import neighborhood_function

    return neighborhood_function(
        load_edges(spark, sf_dir), max_t=ANF_T, registers=ANF_R
    )


def _anf_sql() -> str:
    def h(r: int) -> str:
        return (
            "CAST(('0x' || substr(md5(concat(CAST(id AS VARCHAR), "
            f"':anf{r}')), 1, 15)) AS BIGINT)"
        )

    init_cols = ", ".join(
        f"(({h(r)} | {_ANF_FORCE}) & -({h(r)} | {_ANF_FORCE})) AS m{r}"
        for r in range(ANF_R)
    )
    bsum = " + ".join(
        f"bit_count(((~m{r}) & -(~m{r})) - 1)" for r in range(ANF_R)
    )
    est = (
        f"ROUND(SUM(POWER(2.0, CAST(({bsum}) AS DOUBLE) / {float(ANF_R)!r})) "
        f"/ {0.77351!r} / CAST((SELECT n FROM nn) AS DOUBLE), 6)"
    )
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        f"s0 AS MATERIALIZED (SELECT id, {init_cols} FROM nodes)",
    ]
    for t in range(1, ANF_T + 1):
        ors = ", ".join(f"bit_or(q.m{r}) AS o{r}" for r in range(ANF_R))
        merged = ", ".join(
            f"p.m{r} | COALESCE(o.o{r}, 0) AS m{r}" for r in range(ANF_R)
        )
        ctes.append(
            f"""s{t} AS MATERIALIZED (
  SELECT p.id, {merged}
  FROM s{t-1} p LEFT JOIN (
    SELECT e.src AS id, {ors}
    FROM s{t-1} q JOIN edges e ON e.dst = q.id GROUP BY e.src
  ) o ON o.id = p.id)"""
        )
    union = " UNION ALL ".join(
        f"SELECT {t} AS t, {est} AS avg_reach FROM s{t}"
        for t in range(ANF_T + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + union


ORACLE["neighborhood_function"] = _anf_sql()
QUERIES["neighborhood_function"] = q_neighborhood_function


# ------------------------------------------- assortativity / reciprocity


def q_assortativity(spark, sf_dir):
    from .graph import assortativity

    return assortativity(load_edges(spark, sf_dir))


ORACLE["assortativity"] = f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
und AS MATERIALIZED ({UND_SQL}),
deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS d FROM und GROUP BY src),
s AS (SELECT COUNT(*) AS m, SUM(dj.d) AS sj,
             SUM(dj.d * dk.d) AS sjk, SUM(dj.d * dj.d) AS sjj
      FROM und e JOIN deg dj ON dj.id = e.src JOIN deg dk ON dk.id = e.dst),
r AS (SELECT COUNT(*) AS rm FROM edges a
      WHERE EXISTS (SELECT 1 FROM edges b
                    WHERE b.src = a.dst AND b.dst = a.src)),
t AS (SELECT COUNT(*) AS te FROM edges)
SELECT ROUND(CAST(s.m * s.sjk - s.sj * s.sj AS DOUBLE)
             / (s.m * s.sjj - s.sj * s.sj), 6) AS assortativity,
       ROUND(CAST(r.rm AS DOUBLE) / t.te, 6) AS reciprocity
FROM s, r, t"""
QUERIES["assortativity"] = q_assortativity


# -------------------------------------------------- modularity (LP quality)


def q_modularity(spark, sf_dir):
    from .operators.components import label_propagation, modularity

    edges = load_edges(spark, sf_dir)
    return modularity(edges, label_propagation(edges, max_iter=LP_ITERS))


def _modularity_sql() -> str:
    lp = _lp_sql()
    # reuse the LP unroll as a subquery; recompute und/deg on top
    return f"""WITH lp AS MATERIALIZED ({lp}),
edges2 AS MATERIALIZED ({EDGES_SQL}),
und2 AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges2
    UNION ALL SELECT dst AS src, src AS dst FROM edges2
  ) WHERE src <> dst),
m2 AS (SELECT COUNT(*) AS m FROM und2),
deg2 AS (SELECT src AS id, COUNT(*) AS d FROM und2 GROUP BY src),
intra AS (
  SELECT la.label AS c, COUNT(*) AS i
  FROM und2 u JOIN lp la ON la.id = u.src JOIN lp lb ON lb.id = u.dst
  WHERE la.label = lb.label GROUP BY la.label),
dsum AS (
  SELECT l.label AS c, SUM(d.d) AS dc
  FROM lp l JOIN deg2 d ON d.id = l.id GROUP BY l.label)
SELECT ROUND(SUM(
  CAST(COALESCE(i.i, 0) AS DOUBLE) / (SELECT m FROM m2)
  - (CAST(s.dc AS DOUBLE) / (SELECT m FROM m2))
    * (CAST(s.dc AS DOUBLE) / (SELECT m FROM m2))
), 6) AS modularity
FROM dsum s LEFT JOIN intra i ON i.c = s.c"""


ORACLE["modularity"] = _modularity_sql()
QUERIES["modularity"] = q_modularity


# ------------------------------------------ Katz / eigenvector centrality

KATZ_ALPHA = 0.05
KATZ_BETA = 1.0
KATZ_ITERS = 8
EIG_ITERS = 8


def q_katz(spark, sf_dir):
    from .operators.centrality import katz_centrality

    return katz_centrality(
        load_edges(spark, sf_dir),
        alpha=KATZ_ALPHA,
        beta=KATZ_BETA,
        max_iter=KATZ_ITERS,
    ).select("id", F.round("katz", 6).alias("katz"))


def _katz_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        f"k0 AS MATERIALIZED (SELECT id, CAST({KATZ_BETA!r} AS DOUBLE) AS x FROM nodes)",
    ]
    for i in range(1, KATZ_ITERS + 1):
        ctes.append(
            f"""k{i} AS MATERIALIZED (
  SELECT nodes.id,
         CAST({KATZ_BETA!r} AS DOUBLE)
         + CAST({KATZ_ALPHA!r} AS DOUBLE) * COALESCE(c.s, 0e0) AS x
  FROM nodes LEFT JOIN (
    SELECT e.dst AS id, SUM(k.x) AS s
    FROM k{i-1} k JOIN edges e ON e.src = k.id GROUP BY e.dst
  ) c ON nodes.id = c.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(x, 6) AS katz FROM k{KATZ_ITERS}"
    )


ORACLE["katz"] = _katz_sql()
QUERIES["katz"] = q_katz


def q_eigenvector(spark, sf_dir):
    from .operators.centrality import eigenvector_centrality

    res = eigenvector_centrality(load_edges(spark, sf_dir), max_iter=EIG_ITERS)
    n = float(res.n_nodes)
    return res.state.select(
        "id", F.round(F.col("score") * F.lit(n), 6).alias("score_scaled")
    )


def _eigenvector_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "r0 AS MATERIALIZED (SELECT id, 1e0/(SELECT n FROM nn) AS score FROM nodes)",
    ]
    for i in range(1, EIG_ITERS + 1):
        ctes.append(
            f"""raw{i} AS (SELECT e.dst AS id, SUM(r.score) AS s
  FROM r{i-1} r JOIN edges e ON e.src = r.id GROUP BY e.dst),
t{i} AS (SELECT SUM(s) AS t FROM raw{i}),
r{i} AS MATERIALIZED (
  SELECT nodes.id,
         CASE WHEN (SELECT t FROM t{i}) > 0e0
              THEN COALESCE(w.s, 0e0) / (SELECT t FROM t{i})
              ELSE 0e0 END AS score
  FROM nodes LEFT JOIN raw{i} w ON nodes.id = w.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""\nSELECT id, ROUND(score * (SELECT n FROM nn), 6) AS score_scaled
FROM r{EIG_ITERS}"""
    )


ORACLE["eigenvector"] = _eigenvector_sql()
QUERIES["eigenvector"] = q_eigenvector


# --------------------------------------------------- spectral bisection

# 10 fixed steps: the gate checks recurrence parity (both engines replay
# identical arithmetic), not eigen-convergence — pytest covers the semantic
# claims at 40-60 iterations; 10 keeps this inside the per-gate time budget
# (16 steps measured 17.1s solo at sf0.01 — the r4 lsh_ann lesson).
FIEDLER_ITERS = 10


def q_fiedler(spark, sf_dir):
    """Fiedler vector (deflated power iteration on cI − L, 16 fixed steps,
    sign-canonicalized) — both engines replay the identical recurrence and
    round to 6 dp only at the end."""
    from .operators.spectral import fiedler_vector

    v = fiedler_vector(load_edges(spark, sf_dir), max_iter=FIEDLER_ITERS)
    return v.select("id", F.round("fiedler", 6).alias("fiedler"))


def q_fiedler_cut(spark, sf_dir):
    """Conductance of the sign(fiedler) spectral bisection."""
    from .operators.spectral import spectral_cut_summary

    return spectral_cut_summary(load_edges(spark, sf_dir), max_iter=FIEDLER_ITERS)


def _fiedler_ctes(iters: int = FIEDLER_ITERS) -> str:
    """Shared unrolled CTE body ending at x{iters} + the sign probe ``sgn``.

    Operand order mirrors operators/spectral.py verbatim:
    y = (c−d)·x + Σ_{u~v} x_u ; m = sy/n ; x' = (y−m)/sqrt(syy − (m·m)·n).
    """
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"und AS MATERIALIZED ({UND_SQL})",
        "deg AS MATERIALIZED (SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS d"
        " FROM und GROUP BY src)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg)",
        "cc AS (SELECT 1e0 + MAX(d) AS c FROM deg)",
        "x0 AS MATERIALIZED (SELECT id, d,"
        " CAST((id * 2654435761) % 1048576 AS DOUBLE)/1048576e0 - 0.5e0 AS x"
        " FROM deg)",
    ]
    for i in range(1, iters + 1):
        m = f"((SELECT sy FROM st{i}) / (SELECT n FROM nn))"
        ctes.append(
            f"""y{i} AS (
  SELECT s.id, s.d,
         ((SELECT c FROM cc) - s.d) * s.x + COALESCE(g.s, 0e0) AS y
  FROM x{i-1} s LEFT JOIN (
    SELECT u.dst AS id, SUM(s2.x) AS s
    FROM x{i-1} s2 JOIN und u ON u.src = s2.id GROUP BY u.dst
  ) g ON g.id = s.id),
st{i} AS (SELECT SUM(y) AS sy, SUM(y*y) AS syy FROM y{i}),
x{i} AS MATERIALIZED (
  SELECT id, d,
         (y - {m}) / SQRT((SELECT syy FROM st{i}) - ({m} * {m}) * (SELECT n FROM nn)) AS x
  FROM y{i})"""
        )
    ctes.append(
        f"sgn AS (SELECT CASE WHEN x >= 0e0 THEN 1e0 ELSE -1e0 END AS s"
        f" FROM x{iters} ORDER BY ABS(x) DESC, id LIMIT 1)"
    )
    return ",\n".join(ctes)


def _fiedler_sql(iters: int = FIEDLER_ITERS) -> str:
    return (
        "WITH " + _fiedler_ctes(iters)
        + f"\nSELECT id, ROUND(x * (SELECT s FROM sgn), 6) AS fiedler FROM x{iters}"
    )


def _fiedler_cut_sql(iters: int = FIEDLER_ITERS) -> str:
    return (
        "WITH " + _fiedler_ctes(iters)
        + f""",
side AS MATERIALIZED (
  SELECT id, d,
         CASE WHEN x * (SELECT s FROM sgn) >= 0e0 THEN 1 ELSE 0 END AS side
  FROM x{iters}),
cr AS (SELECT COUNT(*) AS crossing
       FROM und u JOIN side a ON a.id = u.src JOIN side b ON b.id = u.dst
       WHERE a.side <> b.side),
vols AS (SELECT MIN(vol) AS vol_small
         FROM (SELECT side, SUM(d) AS vol FROM side GROUP BY side))
SELECT CAST((SELECT crossing FROM cr) // 2 AS BIGINT) AS cut_edges,
       (SELECT vol_small FROM vols) AS vol_small,
       CASE WHEN (SELECT vol_small FROM vols) > 0e0
            THEN ROUND(CAST((SELECT crossing FROM cr) AS DOUBLE)
                       / (SELECT vol_small FROM vols), 6)
            ELSE 0e0 END AS conductance"""
    )


ORACLE["fiedler_vector"] = _fiedler_sql()
QUERIES["fiedler_vector"] = q_fiedler
ORACLE["fiedler_cut"] = _fiedler_cut_sql()
QUERIES["fiedler_cut"] = q_fiedler_cut


# ----------------------------------------- balanced k-way partitioning

PARTITION_K = 8
PARTITION_ROUNDS = 6


def q_graph_partition(spark, sf_dir):
    """Spinner-style balanced label-propagation partition labels —
    exact-integer scoring, so both engines' argmax agrees bit-for-bit."""
    from .operators.partition import spinner_partition

    return spinner_partition(
        load_edges(spark, sf_dir), k=PARTITION_K, rounds=PARTITION_ROUNDS
    ).select("id", "part")


def q_partition_quality(spark, sf_dir):
    """Degree-volume balance + edge-cut fraction of the Spinner partition."""
    from .operators.partition import partition_quality

    return partition_quality(
        load_edges(spark, sf_dir), k=PARTITION_K, rounds=PARTITION_ROUNDS
    )


def _partition_ctes(k: int = PARTITION_K, rounds: int = PARTITION_ROUNDS) -> str:
    """Unrolled Spinner rounds, integer score mirrored from
    operators/partition.py: S = 4·w·total − k·deg·load; ties → current
    label, then smaller label."""
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"und AS MATERIALIZED ({UND_SQL})",
        "deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS d FROM und GROUP BY src)",
        "tot AS (SELECT COUNT(*) AS t FROM und)",
        f"s0 AS MATERIALIZED (SELECT id, d,"
        f" ((id * 2654435761) % 1048576) % {k} AS part FROM deg)",
    ]
    for i in range(1, rounds + 1):
        ctes.append(
            f"""ld{i} AS (SELECT part AS lbl, SUM(d) AS load FROM s{i-1} GROUP BY part),
cand{i} AS (
  SELECT id, lbl, SUM(w) AS w FROM (
    SELECT u.dst AS id, s.part AS lbl, 1 AS w
    FROM s{i-1} s JOIN und u ON u.src = s.id
    UNION ALL
    SELECT id, part AS lbl, 0 AS w FROM s{i-1}
  ) GROUP BY id, lbl),
s{i} AS MATERIALIZED (
  SELECT id, d, lbl AS part FROM (
    SELECT c.id, p.d, c.lbl,
           ROW_NUMBER() OVER (
             PARTITION BY c.id
             ORDER BY 4*c.w*(SELECT t FROM tot) - {k}*p.d*ld.load DESC,
                      (c.lbl = p.part) DESC, c.lbl
           ) AS rn
    FROM cand{i} c JOIN s{i-1} p ON p.id = c.id JOIN ld{i} ld ON ld.lbl = c.lbl
  ) WHERE rn = 1)"""
        )
    return ",\n".join(ctes)


def _graph_partition_sql() -> str:
    return (
        "WITH " + _partition_ctes()
        + f"\nSELECT id, part FROM s{PARTITION_ROUNDS}"
    )


def _partition_quality_sql() -> str:
    k, r = PARTITION_K, PARTITION_ROUNDS
    return (
        "WITH " + _partition_ctes()
        + f""",
cr AS (SELECT COUNT(*) AS crossing
       FROM und u JOIN s{r} a ON a.id = u.src JOIN s{r} b ON b.id = u.dst
       WHERE a.part <> b.part),
lds AS (SELECT part, SUM(d) AS load FROM s{r} GROUP BY part),
agg AS (SELECT COUNT(*) AS used, MAX(load) AS mx, MIN(load) AS mn FROM lds)
SELECT {k} AS k,
       (SELECT used FROM agg) AS n_parts_used,
       (SELECT mx FROM agg) AS max_load,
       (SELECT mn FROM agg) AS min_load,
       ROUND(CAST((SELECT mx FROM agg) AS DOUBLE) * {k} / (SELECT t FROM tot), 6)
         AS imbalance,
       ROUND(CAST((SELECT crossing FROM cr) AS DOUBLE) / (SELECT t FROM tot), 6)
         AS cut_frac"""
    )


ORACLE["graph_partition"] = _graph_partition_sql()
QUERIES["graph_partition"] = q_graph_partition
ORACLE["partition_quality"] = _partition_quality_sql()
QUERIES["partition_quality"] = q_partition_quality


# ------------------------------------------------ 2-D spectral embedding

SE_ITERS = 8


def q_spectral_embedding(spark, sf_dir):
    """2-D spectral embedding (orthogonal iteration on cI − L with
    closed-form Gram-Schmidt from one 5-sum aggregate per round)."""
    from .operators.spectral import spectral_embedding2

    return spectral_embedding2(load_edges(spark, sf_dir), max_iter=SE_ITERS).select(
        "id", F.round("e1", 6).alias("e1"), F.round("e2", 6).alias("e2")
    )


def _spectral_embedding_sql(iters: int = SE_ITERS) -> str:
    """Unrolled orthogonal iteration mirroring operators/spectral.py
    spectral_embedding2 operand-for-operand (DuckDB lateral column
    aliases carry the chained scalar definitions m→u1n→beta→u2n)."""
    nn = "(SELECT n FROM nn)"
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"und AS MATERIALIZED ({UND_SQL})",
        "deg AS MATERIALIZED (SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS d"
        " FROM und GROUP BY src)",
        "nn AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM deg)",
        "cc AS (SELECT 1e0 + MAX(d) AS c FROM deg)",
        "x0 AS MATERIALIZED (SELECT id, d,"
        " CAST((id * 2654435761) % 1048576 AS DOUBLE)/1048576e0 - 0.5e0 AS x1,"
        " CAST((id * 1566083941) % 1048576 AS DOUBLE)/1048576e0 - 0.5e0 AS x2"
        " FROM deg)",
    ]
    for i in range(1, iters + 1):
        ctes.append(
            f"""y{i} AS (
  SELECT s.id, s.d,
         ((SELECT c FROM cc) - s.d) * s.x1 + COALESCE(g.s1g, 0e0) AS y1,
         ((SELECT c FROM cc) - s.d) * s.x2 + COALESCE(g.s2g, 0e0) AS y2
  FROM x{i-1} s LEFT JOIN (
    SELECT u.dst AS id, SUM(s2.x1) AS s1g, SUM(s2.x2) AS s2g
    FROM x{i-1} s2 JOIN und u ON u.src = s2.id GROUP BY u.dst
  ) g ON g.id = s.id),
st{i} AS (SELECT SUM(y1) AS s1, SUM(y2) AS s2, SUM(y1*y1) AS s11,
                 SUM(y2*y2) AS s22, SUM(y1*y2) AS s12 FROM y{i}),
sc{i} AS (SELECT s1 / nn.n AS m1, s2 / nn.n AS m2,
                 SQRT(s11 - (m1 * m1) * nn.n) AS u1n,
                 (s12 - m1 * s2 - m2 * s1 + (m1 * m2) * nn.n) / u1n AS beta,
                 SQRT(s22 - (m2 * m2) * nn.n - beta * beta) AS u2n
          FROM st{i} CROSS JOIN nn),
x{i} AS MATERIALIZED (
  SELECT y.id, y.d,
         (y.y1 - sc.m1) / sc.u1n AS x1,
         (y.y2 - sc.m2 - (sc.beta / sc.u1n) * (y.y1 - sc.m1)) / sc.u2n AS x2
  FROM y{i} y CROSS JOIN sc{i} sc)"""
        )
    ctes.append(
        f"sg1 AS (SELECT CASE WHEN x1 >= 0e0 THEN 1e0 ELSE -1e0 END AS s"
        f" FROM x{iters} ORDER BY ABS(x1) DESC, id LIMIT 1)"
    )
    ctes.append(
        f"sg2 AS (SELECT CASE WHEN x2 >= 0e0 THEN 1e0 ELSE -1e0 END AS s"
        f" FROM x{iters} ORDER BY ABS(x2) DESC, id LIMIT 1)"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT id, ROUND(x1 * (SELECT s FROM sg1), 6) AS e1,
       ROUND(x2 * (SELECT s FROM sg2), 6) AS e2
FROM x{iters}"""
    )


ORACLE["spectral_embedding"] = _spectral_embedding_sql()
QUERIES["spectral_embedding"] = q_spectral_embedding


# --------------------------------------------------- effective diameter

EFF_DIAM_Q = 0.9


def q_effective_diameter(spark, sf_dir):
    from .operators.anf import effective_diameter

    return effective_diameter(
        load_edges(spark, sf_dir), max_t=ANF_T, registers=ANF_R, quantile=EFF_DIAM_Q
    )


ORACLE["effective_diameter"] = f"""SELECT MIN(t) AS effective_diameter
FROM ({_anf_sql()}) anf
WHERE avg_reach >= {EFF_DIAM_Q!r} * (SELECT MAX(avg_reach) FROM ({_anf_sql()}))"""
QUERIES["effective_diameter"] = q_effective_diameter


# ------------------------------------------------ greedy coloring (JP)

# Gate subgraph: nodes ≡ 0 (mod 8). Jones–Plassmann's round count is the
# priority-DAG depth, which on this skewed graph is 82 rounds at sf0.01
# (506 at sf0.1) — hub tails linger (measured; the Luby per-round-rehash
# variant is no better: 58/381). The mod-16 subgraph colors in 6 rounds
# at sf0.01 (186 nodes, 4 colors), so the gate proves the kernel
# end-to-end at a depth both engines unroll cheaply; the subset-gate
# precedent is pagerank_redistribute.
COLOR_MOD = 16
COLOR_UNROLL = 12  # ≥ measured 6 rounds at sf0.01 (5 at sf0.001) + margin;
                   # rounds past the fixpoint are no-ops (empty ready set)


def q_coloring(spark, sf_dir):
    from .operators.coloring import greedy_coloring

    e = load_edges(spark, sf_dir).filter(
        (F.col("src") % COLOR_MOD == 0) & (F.col("dst") % COLOR_MOD == 0)
    )
    return greedy_coloring(e)


def _coloring_sql() -> str:
    def key(col: str) -> str:
        prio = (
            f"(({col} % 1000003) * 2654435761"
            f" + ({col} % 2147483647)) % 2147483647"
        )
        return f"(({prio}) * 4294967296 + ({col} % 4294967296))"

    ctes = [
        f"""edges AS MATERIALIZED (SELECT * FROM ({EDGES_SQL})
  WHERE src % {COLOR_MOD} = 0 AND dst % {COLOR_MOD} = 0)""",
        f"und AS MATERIALIZED ({UND_SQL})",
        """a0 AS MATERIALIZED (SELECT DISTINCT id FROM (
  SELECT src AS id FROM und UNION ALL SELECT dst FROM und))""",
        "c0 AS MATERIALIZED (SELECT CAST(NULL AS BIGINT) AS id, "
        "CAST(NULL AS BIGINT) AS color WHERE 1=0)",
    ]
    for r in range(1, COLOR_UNROLL + 1):
        ctes.append(
            f"""rdy{r} AS MATERIALIZED (
  SELECT v.id FROM a{r-1} v LEFT JOIN (
    SELECT e.src AS id, MIN({key('e.dst')}) AS b
    FROM und e JOIN a{r-1} n ON n.id = e.dst
    WHERE e.src IN (SELECT id FROM a{r-1})
    GROUP BY e.src
  ) nm ON nm.id = v.id
  WHERE nm.b IS NULL OR {key('v.id')} < nm.b),
used{r} AS (
  SELECT DISTINCT e.src AS id, c.color
  FROM und e JOIN rdy{r} s ON s.id = e.src JOIN c{r-1} c ON c.id = e.dst),
uc{r} AS (SELECT id, COUNT(*) AS n FROM used{r} GROUP BY id),
mex{r} AS (
  SELECT s.id, MIN(g.c) AS color
  FROM rdy{r} s LEFT JOIN uc{r} u ON u.id = s.id,
       LATERAL (SELECT unnest(generate_series(0, COALESCE(u.n, 0))) AS c) g
  WHERE NOT EXISTS (SELECT 1 FROM used{r} w
                    WHERE w.id = s.id AND w.color = g.c)
  GROUP BY s.id),
c{r} AS MATERIALIZED (
  SELECT id, color FROM c{r-1}
  UNION ALL SELECT id, CAST(color AS BIGINT) FROM mex{r}),
a{r} AS MATERIALIZED (
  SELECT id FROM a{r-1} WHERE id NOT IN (SELECT id FROM rdy{r}))"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, color FROM c{COLOR_UNROLL}"
    )


ORACLE["coloring"] = _coloring_sql()
QUERIES["coloring"] = q_coloring


# --------------------------------------- incremental triangle maintenance


def q_triangle_incremental(spark, sf_dir):
    from .operators.triangles import triangle_count_incremental

    edges = load_edges(spark, sf_dir)
    key = F.col("src") * 31 + F.col("dst")
    return triangle_count_incremental(
        edges.filter(key % 5 != 0), edges.filter(key % 5 == 0)
    )


# the oracle is deliberately algorithm-independent: the full-union count
ORACLE["triangle_incremental"] = _triangles_sql()
QUERIES["triangle_incremental"] = q_triangle_incremental


def q_transitivity(spark, sf_dir):
    """Global clustering coefficient 3·triangles/wedges — exact-integer
    wedge sum composed with the skew-safe oriented triangle plan."""
    from .operators.triangles import transitivity

    return transitivity(load_edges(spark, sf_dir))


ORACLE["transitivity"] = f"""WITH edges AS ({EDGES_SQL}),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM edges WHERE src <> dst
),
deg AS (SELECT id, COUNT(*) AS d FROM (
  SELECT src AS id FROM und UNION ALL SELECT dst AS id FROM und) GROUP BY id),
wed AS (SELECT CAST(COALESCE(SUM(d * (d - 1)), 0) // 2 AS BIGINT) AS wedges FROM deg),
tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS triangles
        FROM und e1 JOIN und e2 ON e1.dst = e2.src
        JOIN und e3 ON e3.src = e1.src AND e3.dst = e2.dst)
SELECT wedges, triangles,
       CASE WHEN wedges > 0 THEN ROUND(3e0 * triangles / wedges, 6)
            ELSE 0e0 END AS transitivity
FROM wed, tri"""
QUERIES["transitivity"] = q_transitivity


SKIPGRAM_WINDOW = 2


def q_skipgram_pairs(spark, sf_dir):
    """Skip-gram co-occurrence counts over the deterministic walk corpus —
    the DeepWalk training-input stage; the oracle replays the identical
    walks and self-joins them."""
    from .operators.walks import random_walks, skipgram_pairs

    w = random_walks(
        load_edges(spark, sf_dir), walk_length=WALK_LEN, walks_per_node=1,
        seed=WALK_SEED,
    )
    return skipgram_pairs(w, window=SKIPGRAM_WINDOW)


ORACLE["skipgram_pairs"] = f"""WITH walks AS MATERIALIZED (
{_walks_sql()}
)
SELECT a.node AS center, b.node AS context, CAST(COUNT(*) AS BIGINT) AS cnt
FROM walks a JOIN walks b
  ON a.walk_id = b.walk_id AND a.step <> b.step
 AND abs(a.step - b.step) <= {SKIPGRAM_WINDOW}
GROUP BY a.node, b.node"""
QUERIES["skipgram_pairs"] = q_skipgram_pairs


LOUVAIN_ROUNDS = 4


def q_louvain(spark, sf_dir):
    """Staged-synchronous Louvain phase-1 (modularity-gain label moves,
    parity-staged to break sync oscillation) — integer-exact gain scores,
    so the oracle unrolls the identical rounds."""
    from .operators.components import louvain_communities

    return louvain_communities(load_edges(spark, sf_dir), max_iter=LOUVAIN_ROUNDS)


def _louvain_sql(rounds: int = 4) -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"und AS MATERIALIZED ({UND_SQL})",
        "deg AS MATERIALIZED (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS k "
        "FROM und GROUP BY src)",
        "m2 AS (SELECT CAST(SUM(k) AS BIGINT) AS m2 FROM deg)",
        "s0 AS (SELECT id, id AS comm FROM deg)",
    ]
    for r in range(1, rounds + 1):
        par = r - 1  # movers this round: (id + par) % 2 = 0
        ctes.append(
            f"""evc{r} AS MATERIALIZED (
  SELECT u.dst AS id, s.comm AS c, CAST(COUNT(*) AS BIGINT) AS e
  FROM und u JOIN s{r-1} s ON s.id = u.src
  WHERE (u.dst + {par}) % 2 = 0
  GROUP BY u.dst, s.comm)"""
        )
        ctes.append(
            f"""cand{r} AS (
  SELECT id, c, MAX(e) AS e FROM (
    SELECT id, c, e FROM evc{r}
    UNION ALL
    SELECT id, comm AS c, CAST(0 AS BIGINT) AS e FROM s{r-1}
    WHERE (id + {par}) % 2 = 0
  ) GROUP BY id, c)"""
        )
        ctes.append(
            f"tot{r} AS (SELECT s.comm AS c, CAST(SUM(d.k) AS BIGINT) AS tot "
            f"FROM s{r-1} s JOIN deg d ON d.id = s.id GROUP BY s.comm)"
        )
        ctes.append(
            f"""pick{r} AS (
  SELECT id, c AS comm FROM (
    SELECT cand.id, cand.c,
           ROW_NUMBER() OVER (PARTITION BY cand.id ORDER BY
             (m.m2 * cand.e - d.k *
              (t.tot - CASE WHEN cand.c = s.comm THEN d.k ELSE 0 END)) DESC,
             cand.c ASC) AS rn
    FROM cand{r} cand
    JOIN s{r-1} s ON s.id = cand.id
    JOIN deg d ON d.id = cand.id
    JOIN tot{r} t ON t.c = cand.c
    CROSS JOIN m2 m
  ) WHERE rn = 1)"""
        )
        ctes.append(
            f"""s{r} AS MATERIALIZED (
  SELECT s.id, COALESCE(p.comm, s.comm) AS comm
  FROM s{r-1} s LEFT JOIN pick{r} p ON p.id = s.id)"""
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, comm FROM s{rounds}"


ORACLE["louvain"] = _louvain_sql(LOUVAIN_ROUNDS)
QUERIES["louvain"] = q_louvain


def q_hyperball_harmonic(spark, sf_dir):
    """HyperBall: per-node harmonic centrality for ALL nodes from the FM
    ball sketches — the all-V centrality scale path (the exact multi-source
    BFS kernel answers K sampled roots at the same round cost)."""
    from .operators.anf import hyperball_harmonic

    return hyperball_harmonic(load_edges(spark, sf_dir), max_t=ANF_T, registers=ANF_R)


def _hyperball_sql() -> str:
    def h(r: int) -> str:
        return (
            "CAST(('0x' || substr(md5(concat(CAST(id AS VARCHAR), "
            f"':anf{r}')), 1, 15)) AS BIGINT)"
        )

    init_cols = ", ".join(
        f"(({h(r)} | {_ANF_FORCE}) & -({h(r)} | {_ANF_FORCE})) AS m{r}"
        for r in range(ANF_R)
    )
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        f"s0 AS MATERIALIZED (SELECT id, {init_cols} FROM nodes)",
    ]
    for t in range(1, ANF_T + 1):
        ors = ", ".join(f"bit_or(q.m{r}) AS o{r}" for r in range(ANF_R))
        merged = ", ".join(
            f"p.m{r} | COALESCE(o.o{r}, 0) AS m{r}" for r in range(ANF_R)
        )
        ctes.append(
            f"""s{t} AS MATERIALIZED (
  SELECT p.id, {merged}
  FROM s{t-1} p LEFT JOIN (
    SELECT e.src AS id, {ors}
    FROM s{t-1} q JOIN edges e ON e.dst = q.id GROUP BY e.src
  ) o ON o.id = p.id)"""
        )

    def est(alias: str) -> str:
        bsum = " + ".join(
            f"bit_count(((~{alias}.m{r}) & -(~{alias}.m{r})) - 1)"
            for r in range(ANF_R)
        )
        return (
            f"(POWER(2.0, CAST(({bsum}) AS DOUBLE) / {float(ANF_R)!r}) "
            f"/ {0.77351!r})"
        )

    # the same left-associated increment chain the Spark state accumulates
    incs = " + ".join(
        f"(({est(f's{t}')}) - ({est(f's{t-1}')})) / {float(t)!r}"
        for t in range(1, ANF_T + 1)
    )
    joins = " ".join(
        f"JOIN s{t} ON s{t}.id = s0.id" for t in range(1, ANF_T + 1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT s0.id, ROUND({incs}, 6) AS harmonic FROM s0 {joins}"
    )


ORACLE["hyperball_harmonic"] = _hyperball_sql()
QUERIES["hyperball_harmonic"] = q_hyperball_harmonic


def q_louvain_multilevel(spark, sf_dir):
    """Full multi-level Louvain: staged move rounds, community contraction
    (integer edge-count weights; intra mass folds into supernode degree),
    staged weighted rounds on the contracted graph, labels composed."""
    from .operators.components import louvain_multilevel

    return louvain_multilevel(
        load_edges(spark, sf_dir), levels=2, rounds_per_level=LOUVAIN_ROUNDS
    )


def _louvain_round_ctes(prefix: str, und: str, deg: str, rounds: int) -> list[str]:
    """Weighted staged-Louvain round CTEs: state frames {prefix}0..{prefix}R
    over edge table ``und``[src,dst,w] and mass table ``deg``[id,k] (the
    m2 CTE must exist). Mirrors operators/components._louvain_rounds."""
    ctes = [f"{prefix}0 AS (SELECT id, id AS comm FROM {deg})"]
    for r in range(1, rounds + 1):
        par = r - 1
        p0 = f"{prefix}{r-1}"
        ctes.append(
            f"""evc_{prefix}{r} AS MATERIALIZED (
  SELECT u.dst AS id, s.comm AS c, CAST(SUM(u.w) AS BIGINT) AS e
  FROM {und} u JOIN {p0} s ON s.id = u.src
  WHERE (u.dst + {par}) % 2 = 0
  GROUP BY u.dst, s.comm)"""
        )
        ctes.append(
            f"""cand_{prefix}{r} AS (
  SELECT id, c, MAX(e) AS e FROM (
    SELECT id, c, e FROM evc_{prefix}{r}
    UNION ALL
    SELECT id, comm AS c, CAST(0 AS BIGINT) AS e FROM {p0}
    WHERE (id + {par}) % 2 = 0
  ) GROUP BY id, c)"""
        )
        ctes.append(
            f"tot_{prefix}{r} AS (SELECT s.comm AS c, CAST(SUM(d.k) AS BIGINT) "
            f"AS tot FROM {p0} s JOIN {deg} d ON d.id = s.id GROUP BY s.comm)"
        )
        ctes.append(
            f"""pick_{prefix}{r} AS (
  SELECT id, c AS comm FROM (
    SELECT cand.id, cand.c,
           ROW_NUMBER() OVER (PARTITION BY cand.id ORDER BY
             (m.m2 * cand.e - d.k *
              (t.tot - CASE WHEN cand.c = s.comm THEN d.k ELSE 0 END)) DESC,
             cand.c ASC) AS rn
    FROM cand_{prefix}{r} cand
    JOIN {p0} s ON s.id = cand.id
    JOIN {deg} d ON d.id = cand.id
    JOIN tot_{prefix}{r} t ON t.c = cand.c
    CROSS JOIN m2 m
  ) WHERE rn = 1)"""
        )
        ctes.append(
            f"""{prefix}{r} AS MATERIALIZED (
  SELECT s.id, COALESCE(p.comm, s.comm) AS comm
  FROM {p0} s LEFT JOIN pick_{prefix}{r} p ON p.id = s.id)"""
        )
    return ctes


def _louvain_ml_sql(rounds: int = 4) -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"und AS MATERIALIZED ({UND_SQL})",
        "undw AS (SELECT src, dst, CAST(1 AS BIGINT) AS w FROM und)",
        "deg1 AS MATERIALIZED (SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS k "
        "FROM und GROUP BY src)",
        "m2 AS (SELECT CAST(SUM(k) AS BIGINT) AS m2 FROM deg1)",
    ]
    ctes += _louvain_round_ctes("a", "undw", "deg1", rounds)
    ctes += [
        f"""mapped AS MATERIALIZED (
  SELECT x.comm AS ca, y.comm AS cb
  FROM und u JOIN a{rounds} x ON x.id = u.src JOIN a{rounds} y ON y.id = u.dst)""",
        "deg2 AS MATERIALIZED (SELECT ca AS id, CAST(COUNT(*) AS BIGINT) AS k "
        "FROM mapped GROUP BY ca)",
        """und2 AS MATERIALIZED (
  SELECT ca AS src, cb AS dst, CAST(COUNT(*) AS BIGINT) AS w
  FROM mapped WHERE ca <> cb GROUP BY ca, cb)""",
    ]
    ctes += _louvain_round_ctes("b", "und2", "deg2", rounds)
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT a.id, b.comm FROM a{rounds} a JOIN b{rounds} b ON b.id = a.comm"
    )


ORACLE["louvain_multilevel"] = _louvain_ml_sql(LOUVAIN_ROUNDS)
QUERIES["louvain_multilevel"] = q_louvain_multilevel


def q_four_cycles(spark, sf_dir):
    """Exact 4-cycle (butterfly) count — Σ_{u<v} C(common, 2) over wedge
    endpoint pairs, halved for the two opposite-corner pairs per cycle."""
    from .operators.triangles import four_cycle_count

    return four_cycle_count(load_edges(spark, sf_dir))


ORACLE["four_cycles"] = f"""WITH edges AS ({EDGES_SQL}),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM edges WHERE src <> dst
),
both_dir AS (
  SELECT src, dst FROM und UNION ALL SELECT dst AS src, src AS dst FROM und
),
wp AS (
  SELECT a.dst AS u, b.dst AS v, COUNT(*) AS c
  FROM both_dir a JOIN both_dir b ON a.src = b.src AND a.dst < b.dst
  GROUP BY a.dst, b.dst
)
SELECT CAST(COALESCE(SUM(c * (c - 1)), 0) // 4 AS BIGINT) AS four_cycles
FROM wp"""
QUERIES["four_cycles"] = q_four_cycles


def q_louvain_weighted(spark, sf_dir):
    """Weighted staged Louvain: gain over quantized integer edge weights
    ŵ = floor(w·128)+1 (exact in both engines), synthetic loader weights."""
    from .graph import with_synthetic_weights
    from .operators.components import louvain_communities

    return louvain_communities(
        with_synthetic_weights(load_edges(spark, sf_dir)),
        max_iter=LOUVAIN_ROUNDS,
        weight_col="weight",
    )


def _louvain_weighted_sql(rounds: int = 4) -> str:
    w = "(1e0 + ((src*31 + dst) % 100)/100e0)"
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"""pair AS MATERIALIZED (
  SELECT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst,
         CAST(FLOOR(MAX({w}) * 128e0) + 1 AS BIGINT) AS w
  FROM edges WHERE src <> dst GROUP BY 1, 2)""",
        "undw AS MATERIALIZED (SELECT src, dst, w FROM pair "
        "UNION ALL SELECT dst AS src, src AS dst, w FROM pair)",
        "degw AS MATERIALIZED (SELECT src AS id, CAST(SUM(w) AS BIGINT) AS k "
        "FROM undw GROUP BY src)",
        "m2 AS (SELECT CAST(SUM(k) AS BIGINT) AS m2 FROM degw)",
    ]
    ctes += _louvain_round_ctes("lw", "undw", "degw", rounds)
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, comm FROM lw{rounds}"


ORACLE["louvain_weighted"] = _louvain_weighted_sql(LOUVAIN_ROUNDS)
QUERIES["louvain_weighted"] = q_louvain_weighted


def q_hyperball_closeness(spark, sf_dir):
    """HyperBall closeness for ALL nodes: (B̂(max_t)−1) / Σ t·ΔB̂ — the
    all-V sibling of the exact K-root closeness gate."""
    from .operators.anf import hyperball_closeness

    return hyperball_closeness(load_edges(spark, sf_dir), max_t=ANF_T, registers=ANF_R)


def _hyperball_closeness_sql() -> str:
    base = _hyperball_sql()
    head, tail = base.rsplit("\nSELECT s0.id, ROUND(", 1)
    incs, joins = tail.split(", 6) AS harmonic FROM s0 ", 1)
    # reuse the same state CTEs; weight increments by t instead of 1/t and
    # divide the (max_t-ball − 1) by that sum
    def est(alias: str) -> str:
        bsum = " + ".join(
            f"bit_count(((~{alias}.m{r}) & -(~{alias}.m{r})) - 1)"
            for r in range(ANF_R)
        )
        return (
            f"(POWER(2.0, CAST(({bsum}) AS DOUBLE) / {float(ANF_R)!r}) "
            f"/ {0.77351!r})"
        )

    s = " + ".join(
        f"(({est(f's{t}')}) - ({est(f's{t-1}')})) * {float(t)!r}"
        for t in range(1, ANF_T + 1)
    )
    return (
        head
        + f"\nSELECT s0.id, CASE WHEN ({s}) > 0.0 THEN "
        + f"ROUND((({est(f's{ANF_T}')}) - 1e0) / ({s}), 6) ELSE 0e0 END "
        + "AS closeness FROM s0 "
        + joins
    )


ORACLE["hyperball_closeness"] = _hyperball_closeness_sql()
QUERIES["hyperball_closeness"] = q_hyperball_closeness


def q_hyperball_eccentricity(spark, sf_dir):
    """Per-node out-eccentricity lower bound from the HyperBall sketches
    (last round whose estimated ball still grew, capped at max_t)."""
    from .operators.anf import hyperball_eccentricity

    return hyperball_eccentricity(
        load_edges(spark, sf_dir), max_t=ANF_T, registers=ANF_R
    )


def _hyperball_ecc_sql() -> str:
    base = _hyperball_sql()
    head, _tail = base.rsplit("\nSELECT s0.id, ROUND(", 1)

    def est(alias: str) -> str:
        bsum = " + ".join(
            f"bit_count(((~{alias}.m{r}) & -(~{alias}.m{r})) - 1)"
            for r in range(ANF_R)
        )
        return (
            f"(POWER(2.0, CAST(({bsum}) AS DOUBLE) / {float(ANF_R)!r}) "
            f"/ {0.77351!r})"
        )

    # last t with growth — the OUTERMOST case must test the highest round,
    # so wrap ascending (the final wrap, t = max_t, is evaluated first)
    expr = "0"
    for t in range(1, ANF_T + 1):
        expr = (
            f"CASE WHEN ({est(f's{t}')}) > ({est(f's{t-1}')}) "
            f"THEN {t} ELSE {expr} END"
        )
    joins = " ".join(
        f"JOIN s{t} ON s{t}.id = s0.id" for t in range(1, ANF_T + 1)
    )
    return (
        head
        + f"\nSELECT s0.id, CAST(({expr}) AS INTEGER) AS eccentricity "
        + f"FROM s0 {joins}"
    )


ORACLE["hyperball_eccentricity"] = _hyperball_ecc_sql()
QUERIES["hyperball_eccentricity"] = q_hyperball_eccentricity


RICH_KS = (1, 2, 4, 8, 16, 32)


def q_rich_club(spark, sf_dir):
    """Rich-club coefficient φ(k) for a fixed k ladder — hub
    interconnection density over the undirected simple graph."""
    from .graph import rich_club

    return rich_club(load_edges(spark, sf_dir), ks=RICH_KS)


def _rich_club_sql() -> str:
    parts = []
    for k in RICH_KS:
        parts.append(
            f"""SELECT CAST({k} AS BIGINT) AS k,
       (SELECT CAST(COUNT(*) AS BIGINT) FROM deg WHERE d > {k}) AS n_rich,
       (SELECT CAST(COALESCE(SUM(CASE WHEN min_d > {k} THEN 1 ELSE 0 END), 0)
               AS BIGINT) FROM tagged) AS e_rich"""
        )
    union = " UNION ALL ".join(parts)
    return f"""WITH edges AS ({EDGES_SQL}),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM edges WHERE src <> dst
),
deg AS (SELECT id, COUNT(*) AS d FROM (
  SELECT src AS id FROM und UNION ALL SELECT dst AS id FROM und) GROUP BY id),
tagged AS (
  SELECT LEAST(a.d, b.d) AS min_d
  FROM und u JOIN deg a ON a.id = u.src JOIN deg b ON b.id = u.dst),
rows_k AS ({union})
SELECT k, n_rich, e_rich,
       CASE WHEN n_rich >= 2
            THEN ROUND(2e0 * e_rich / (n_rich * (n_rich - 1)), 6)
            ELSE 0e0 END AS phi
FROM rows_k"""


ORACLE["rich_club"] = _rich_club_sql()
QUERIES["rich_club"] = q_rich_club


SALSA_ITERS = 6


def q_salsa(spark, sf_dir):
    """SALSA — the stochastic HITS sibling: degree-normalized alternating
    walk; mass conserved exactly, so no normalization half-jobs exist to
    mirror. Scores scaled by n and rounded (the hits gate convention)."""
    from .operators.hits import salsa_result

    res = salsa_result(load_edges(spark, sf_dir), max_iter=SALSA_ITERS)
    n = float(res.n_nodes)
    return res.state.select(
        "id",
        F.round(F.col("auth") * F.lit(n), 6).alias("auth_scaled"),
        F.round(F.col("hub") * F.lit(n), 6).alias("hub_scaled"),
    )


def _salsa_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "od AS MATERIALIZED (SELECT src, COUNT(*) AS od FROM edges GROUP BY src)",
        "idg AS MATERIALIZED (SELECT dst, COUNT(*) AS idg FROM edges GROUP BY dst)",
        "ns AS (SELECT COUNT(*) AS k FROM od)",
        "h0 AS MATERIALIZED (SELECT src AS id, 1e0/(SELECT k FROM ns) AS hub "
        "FROM od)",
    ]
    for i in range(1, SALSA_ITERS + 1):
        ctes.append(
            f"""a{i} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(h.hub / d.od) AS ar
  FROM h{i-1} h JOIN edges e ON e.src = h.id JOIN od d ON d.src = e.src
  GROUP BY e.dst),
h{i} AS MATERIALIZED (
  SELECT e.src AS id, SUM(a.ar / g.idg) AS hub
  FROM a{i} a JOIN edges e ON e.dst = a.id JOIN idg g ON g.dst = e.dst
  GROUP BY e.src)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""\nSELECT n.id,
       ROUND(COALESCE(a.ar, 0e0) * (SELECT n FROM nn), 6) AS auth_scaled,
       ROUND(COALESCE(h.hub, 0e0) * (SELECT n FROM nn), 6) AS hub_scaled
FROM nodes n
LEFT JOIN a{SALSA_ITERS} a ON a.id = n.id
LEFT JOIN h{SALSA_ITERS} h ON h.id = n.id"""
    )


ORACLE["salsa"] = _salsa_sql()
QUERIES["salsa"] = q_salsa


def q_graph_radius(spark, sf_dir):
    """1-row [radius_lb, diameter_lb] — min/max of the HyperBall per-node
    eccentricity bounds over nodes that reach beyond themselves (ecc > 0);
    the per-node generalization of the double-sweep approx_diameter gate."""
    from .operators.anf import hyperball_eccentricity

    ecc = hyperball_eccentricity(load_edges(spark, sf_dir), max_t=ANF_T,
                                 registers=ANF_R)
    live = ecc.filter(F.col("eccentricity") > 0)
    return live.agg(
        F.min("eccentricity").cast("int").alias("radius_lb"),
        F.max("eccentricity").cast("int").alias("diameter_lb"),
    )


ORACLE["graph_radius"] = f"""WITH ecc AS ({ORACLE["hyperball_eccentricity"]})
SELECT CAST(MIN(eccentricity) AS INTEGER) AS radius_lb,
       CAST(MAX(eccentricity) AS INTEGER) AS diameter_lb
FROM ecc WHERE eccentricity > 0"""
QUERIES["graph_radius"] = q_graph_radius


PPR_SEEDS = (0, 1, 2, 3, 5, 8, 13, 21)


def q_walk_ppr(spark, sf_dir):
    """Monte-Carlo personalized relevance: visit counts of deterministic
    walks from a fixed seed set (walk_id = node id at walks_per_node=1,
    so the corpus is the seed-filtered subset of the random_walks gate's,
    bit-identical)."""
    from .operators.walks import walk_visit_counts

    return walk_visit_counts(
        load_edges(spark, sf_dir), sources=list(PPR_SEEDS),
        walk_length=WALK_LEN, walks_per_node=1, seed=WALK_SEED,
    )


def _walk_ppr_sql() -> str:
    from .operators.walks import ADJ_SALTS

    h = (
        "CAST(('0x' || substr(md5(concat_ws(':', f.walk_id, {t}, "
        f"{WALK_SEED})), 1, 15)) AS BIGINT)"
    )
    seeds = ", ".join(str(s) for s in PPR_SEEDS)
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "adj AS MATERIALIZED (SELECT src, dst, ROW_NUMBER() OVER "
        f"(PARTITION BY src ORDER BY dst % {ADJ_SALTS}, dst) AS idx FROM edges)",
        "deg AS MATERIALIZED (SELECT src, COUNT(*) AS od FROM edges GROUP BY src)",
        f"s0 AS (SELECT id AS walk_id, 0 AS step, id AS node FROM nodes "
        f"WHERE id IN ({seeds}))",
    ]
    for t in range(WALK_LEN):
        ctes.append(
            f"""s{t+1} AS MATERIALIZED (
  SELECT f.walk_id, {t+1} AS step, a.dst AS node
  FROM s{t} f JOIN deg d ON d.src = f.node
  JOIN adj a ON a.src = f.node AND a.idx = ({h.format(t=t)} % d.od) + 1
)"""
        )
    union = " UNION ALL ".join(
        f"SELECT walk_id, step, node FROM s{t}" for t in range(WALK_LEN + 1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f", walks AS MATERIALIZED ({union})\n"
        + """SELECT node, CAST(COUNT(*) AS BIGINT) AS visits,
       ROUND(CAST(COUNT(*) AS DOUBLE) / (SELECT COUNT(*) FROM walks), 6)
         AS ppr_estimate
FROM walks GROUP BY node"""
    )


ORACLE["walk_ppr"] = _walk_ppr_sql()
QUERIES["walk_ppr"] = q_walk_ppr


# ------------------------------- co-citation / bibliographic coupling

COCIT_TOP_K = 25


def q_cocitation(spark, sf_dir):
    """Co-citation strength — pages cited together by a common source
    (Small 1973); the directed sibling of link_prediction's undirected
    common-neighbor scores. Uncapped so the oracle sees identical pairs."""
    from .operators.linkpred import cocitation_pairs

    return cocitation_pairs(
        load_edges(spark, sf_dir), mode="cocitation", top_k=COCIT_TOP_K
    )


def q_bib_coupling(spark, sf_dir):
    """Bibliographic coupling — pages citing the same targets (Kessler
    1963); the transposed pivot of q_cocitation."""
    from .operators.linkpred import cocitation_pairs

    return cocitation_pairs(
        load_edges(spark, sf_dir), mode="coupling", top_k=COCIT_TOP_K
    )


def _cocitation_sql(pivot: str, leaf: str) -> str:
    return f"""WITH edges AS MATERIALIZED ({EDGES_SQL})
SELECT a.{leaf} AS a, b.{leaf} AS b, CAST(COUNT(*) AS BIGINT) AS strength
FROM edges a JOIN edges b
  ON a.{pivot} = b.{pivot} AND a.{leaf} < b.{leaf}
GROUP BY a.{leaf}, b.{leaf}
ORDER BY strength DESC, a, b
LIMIT {COCIT_TOP_K}"""


ORACLE["cocitation"] = _cocitation_sql("src", "dst")
ORACLE["bib_coupling"] = _cocitation_sql("dst", "src")
QUERIES["cocitation"] = q_cocitation
QUERIES["bib_coupling"] = q_bib_coupling


# --------------------------------------------------- weighted modularity


def q_modularity_weighted(spark, sf_dir):
    """Weighted Newman Q of the weighted staged-Louvain assignment —
    the objective the weighted mover climbs, scored exactly (quantized
    integer masses; floats only in the final per-community terms)."""
    from .graph import with_synthetic_weights
    from .operators.components import louvain_communities, modularity_weighted

    ew = with_synthetic_weights(load_edges(spark, sf_dir))
    comm = louvain_communities(ew, max_iter=LOUVAIN_ROUNDS, weight_col="weight")
    return modularity_weighted(ew, comm, label_col="comm", weight_col="weight")


def _modularity_weighted_sql(rounds: int = 4) -> str:
    w = "(1e0 + ((src*31 + dst) % 100)/100e0)"
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"""pair AS MATERIALIZED (
  SELECT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst,
         CAST(FLOOR(MAX({w}) * 128e0) + 1 AS BIGINT) AS w
  FROM edges WHERE src <> dst GROUP BY 1, 2)""",
        "undw AS MATERIALIZED (SELECT src, dst, w FROM pair "
        "UNION ALL SELECT dst AS src, src AS dst, w FROM pair)",
        "degw AS MATERIALIZED (SELECT src AS id, CAST(SUM(w) AS BIGINT) AS k "
        "FROM undw GROUP BY src)",
        "m2 AS (SELECT CAST(SUM(k) AS BIGINT) AS m2 FROM degw)",
    ]
    ctes += _louvain_round_ctes("mw", "undw", "degw", rounds)
    ctes += [
        f"""intra AS (
  SELECT la.comm AS c, SUM(u.w) AS i
  FROM undw u JOIN mw{rounds} la ON la.id = u.src
  JOIN mw{rounds} lb ON lb.id = u.dst
  WHERE la.comm = lb.comm GROUP BY la.comm)""",
        f"""ssum AS (
  SELECT l.comm AS c, SUM(d.k) AS sc
  FROM mw{rounds} l JOIN degw d ON d.id = l.id GROUP BY l.comm)""",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + """
SELECT ROUND(SUM(
  CAST(COALESCE(i.i, 0) AS DOUBLE) / (SELECT m2 FROM m2)
  - (CAST(s.sc AS DOUBLE) / (SELECT m2 FROM m2))
    * (CAST(s.sc AS DOUBLE) / (SELECT m2 FROM m2))
), 6) AS modularity
FROM ssum s LEFT JOIN intra i ON i.c = s.c"""
    )


ORACLE["modularity_weighted"] = _modularity_weighted_sql(LOUVAIN_ROUNDS)
QUERIES["modularity_weighted"] = q_modularity_weighted


# ------------------------------------------------- power-law degree fit

POWERLAW_DMIN = 4


def q_degree_powerlaw(spark, sf_dir):
    """Hill MLE of the undirected degree-tail exponent — the scale-free
    diagnostic over the same histogram degree_distribution reports."""
    from .graph import degree_powerlaw

    return degree_powerlaw(load_edges(spark, sf_dir), d_min=POWERLAW_DMIN)


ORACLE["degree_powerlaw"] = f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM edges WHERE src <> dst),
deg AS (SELECT id, COUNT(*) AS d FROM (
  SELECT src AS id FROM und UNION ALL SELECT dst AS id FROM und) GROUP BY id),
hist AS (SELECT d, COUNT(*) AS c FROM deg WHERE d >= {POWERLAW_DMIN} GROUP BY d),
aggd AS (
  SELECT CAST(COALESCE(SUM(c), 0) AS BIGINT) AS n,
         SUM(c * ln(CAST(d AS DOUBLE) / {float(POWERLAW_DMIN)!r})) AS lm
  FROM hist)
SELECT CAST({POWERLAW_DMIN} AS BIGINT) AS d_min, n AS n_tail,
       CASE WHEN lm > 0e0 THEN ROUND(1e0 + CAST(n AS DOUBLE) / lm, 6) END AS alpha
FROM aggd"""
QUERIES["degree_powerlaw"] = q_degree_powerlaw


# ----------------------------------------------- decremental coreness

CORE_SUB_SQL = f"""
  SELECT src, dst FROM ({EDGES_SQL}) WHERE src % 2 = 0 AND dst % 2 = 0
"""
CORE_DEL_MOD = 10


def q_coreness_decremental(spark, sf_dir):
    """Core maintenance under edge DELETIONS: a cheap truncated prior run
    (3 h-index rounds on the even-node subgraph — a pointwise upper bound
    of its core numbers, hence also of the reduced graph's) warm-starts
    the descent on the graph minus a deterministic 10% deletion batch.
    The oracle is the plain cold unrolled decomposition of the reduced
    graph, so any warm-start shortcut that changed the fixpoint would
    hash-mismatch (the cc_incremental convention, pointed at deletes)."""
    from .operators.kcore import coreness

    sub = load_edges(spark, sf_dir).filter(
        (F.col("src") % 2 == 0) & (F.col("dst") % 2 == 0)
    )
    kept = sub.filter((F.col("src") * 31 + F.col("dst")) % CORE_DEL_MOD != 0)
    prior = coreness(sub, rounds=3)
    return coreness(kept, initial=prior)


ORACLE["coreness_decremental"] = _coreness_sql(
    f"SELECT src, dst FROM ({CORE_SUB_SQL}) "
    f"WHERE (src * 31 + dst) % {CORE_DEL_MOD} <> 0"
)
QUERIES["coreness_decremental"] = q_coreness_decremental


# ------------------------------------------------- truss decomposition

TRUSS_UNROLL = 4


def q_trussness(spark, sf_dir):
    """Full truss decomposition — per-edge max k with the edge in the
    k-truss, via the local h-index descent (fixed-round portable mode;
    converged rounds are no-ops on both sides)."""
    from .operators.truss import trussness

    return trussness(load_edges(spark, sf_dir), rounds=TRUSS_UNROLL)


def _trussness_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        """canon AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM edges WHERE src <> dst)""",
        """tri AS MATERIALIZED (
  SELECT a.src AS u, a.dst AS v, b.dst AS w
  FROM canon a JOIN canon b ON b.src = a.dst
  JOIN canon c ON c.src = a.src AND c.dst = b.dst)""",
        """t0 AS MATERIALIZED (
  SELECT e.src, e.dst, CAST(COALESCE(s.t, 0) AS BIGINT) AS t
  FROM canon e LEFT JOIN (
    SELECT src, dst, COUNT(*) AS t FROM (
      SELECT u AS src, v AS dst FROM tri
      UNION ALL SELECT v AS src, w AS dst FROM tri
      UNION ALL SELECT u AS src, w AS dst FROM tri)
    GROUP BY src, dst) s ON s.src = e.src AND s.dst = e.dst)""",
    ]
    for i in range(1, TRUSS_UNROLL + 1):
        p = f"t{i-1}"
        ctes.append(
            f"""t{i} AS MATERIALIZED (
  SELECT p.src, p.dst, LEAST(p.t, COALESCE(h.h, p.t)) AS t
  FROM {p} p LEFT JOIN (
    SELECT src, dst, MAX(LEAST(level, cum)) AS h FROM (
      SELECT src, dst, level,
             SUM(cnt) OVER (PARTITION BY src, dst ORDER BY level DESC) AS cum
      FROM (
        SELECT src, dst, level, COUNT(*) AS cnt FROM (
          SELECT tr.u AS src, tr.v AS dst, LEAST(t2.t, t3.t) AS level
          FROM tri tr
          JOIN {p} t2 ON t2.src = tr.v AND t2.dst = tr.w
          JOIN {p} t3 ON t3.src = tr.u AND t3.dst = tr.w
          UNION ALL
          SELECT tr.v AS src, tr.w AS dst, LEAST(t1.t, t3.t) AS level
          FROM tri tr
          JOIN {p} t1 ON t1.src = tr.u AND t1.dst = tr.v
          JOIN {p} t3 ON t3.src = tr.u AND t3.dst = tr.w
          UNION ALL
          SELECT tr.u AS src, tr.w AS dst, LEAST(t1.t, t2.t) AS level
          FROM tri tr
          JOIN {p} t1 ON t1.src = tr.u AND t1.dst = tr.v
          JOIN {p} t2 ON t2.src = tr.v AND t2.dst = tr.w
        ) GROUP BY src, dst, level)
    ) GROUP BY src, dst
  ) h ON h.src = p.src AND h.dst = p.dst)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT src, dst, t + 2 AS trussness FROM t{TRUSS_UNROLL}"
    )


ORACLE["trussness"] = _trussness_sql()
QUERIES["trussness"] = q_trussness


# --------------------------------------------------- decremental CC

CC_DEL_MOD = 10


def q_cc_decremental(spark, sf_dir):
    """Component maintenance under edge DELETIONS: only the components a
    deletion touched are re-solved; every other node keeps its prior
    label. The oracle is the plain cold unrolled CC on the reduced edge
    set — any stale label or missed split hash-mismatches."""
    from .operators.components import (
        connected_components,
        connected_components_decremental,
    )

    edges = load_edges(spark, sf_dir)
    pred = (F.col("src") * 31 + F.col("dst")) % CC_DEL_MOD == 0
    kept, deleted = edges.filter(~pred), edges.filter(pred)
    prior = connected_components(edges)
    return connected_components_decremental(kept, deleted, prior)


ORACLE["cc_decremental"] = _cc_sql(
    f"SELECT src, dst FROM ({EDGES_SQL}) WHERE (src * 31 + dst) % {CC_DEL_MOD} <> 0"
)
QUERIES["cc_decremental"] = q_cc_decremental


# ------------------------------------------- weighted multi-root closeness

WSSSP_UNROLL = 16
WALK_WQ = "CAST(FLOOR((1e0 + ((src*31 + dst) % 100)/100e0) * 128e0) + 1 AS BIGINT)"


def q_weighted_closeness(spark, sf_dir):
    """Closeness over WEIGHTED shortest paths for the sampled root set —
    one multi-root Bellman-Ford wave (integer-quantized weights, so every
    distance and distance-sum is an exact BIGINT on both engines)."""
    from .graph import with_synthetic_weights
    from .operators.traversal import weighted_closeness_centrality

    return weighted_closeness_centrality(
        with_synthetic_weights(load_edges(spark, sf_dir)),
        roots=CLOSE_ROOTS,
        max_iter=WSSSP_UNROLL,
    )


def _weighted_closeness_sql() -> str:
    roots = ", ".join(f"({r}, {r}, 0)" for r in sorted(set(CLOSE_ROOTS)))
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"""relw AS MATERIALIZED (
  SELECT src, dst, MIN({WALK_WQ}) AS w
  FROM edges WHERE src <> dst GROUP BY src, dst)""",
        f"s0(root, id, dist) AS (VALUES {roots})",
    ]
    for i in range(1, WSSSP_UNROLL + 1):
        ctes.append(
            f"""s{i} AS MATERIALIZED (
  SELECT root, id, MIN(dist) AS dist FROM (
    SELECT root, id, dist FROM s{i-1}
    UNION ALL
    SELECT p.root, u.dst AS id, p.dist + u.w AS dist
    FROM s{i-1} p JOIN relw u ON u.src = p.id
  ) GROUP BY root, id)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT root AS id,
       CAST(COUNT(*) - 1 AS BIGINT) AS n_reached,
       ROUND(CASE WHEN SUM(dist) > 0
                  THEN CAST(COUNT(*) - 1 AS DOUBLE) / SUM(dist)
                  ELSE 0e0 END, 6) AS closeness
FROM s{WSSSP_UNROLL} GROUP BY root"""
    )


ORACLE["weighted_closeness"] = _weighted_closeness_sql()
QUERIES["weighted_closeness"] = q_weighted_closeness


# ------------------------------------------------------- GNN fan-out sampling

FANOUT_ROOT_MOD = 256  # roots = node ids divisible by this (16 at MODULUS 4096)
FANOUTS = (8, 4)
FANOUT_SEED = 17


def q_gnn_fanout(spark, sf_dir):
    """GraphSAGE-style deterministic fan-out sampling: up to 8 neighbors
    per root, then up to 4 per sampled node — the GNN minibatch block.
    Sampling keys are portable md5 hashes, so the oracle draws the exact
    same neighbors."""
    from .operators.walks import fanout_sample

    edges = load_edges(spark, sf_dir)
    from .graph import nodes_of

    roots = [
        r.id
        for r in nodes_of(edges)
        .filter(F.col("id") % FANOUT_ROOT_MOD == 0)
        .collect()
    ]
    out = fanout_sample(edges, roots, fanouts=FANOUTS, seed=FANOUT_SEED)
    return out.select("root", F.col("hop").cast("int").alias("hop"), "src", "dst")


def _fanout_key(root: str, src: str, dst: str, hop: int) -> str:
    return (
        f"CAST(('0x'||substr(md5({root}||':'||{src}||':'||{dst}"
        f"||':{FANOUT_SEED}:{hop}'),1,15)) AS BIGINT)"
    )


def _fanout_sql() -> str:
    f1, f2 = FANOUTS
    return f"""WITH edges AS ({EDGES_SQL}),
nodes AS ({NODES_SQL}),
roots AS (SELECT id AS root FROM nodes WHERE id % {FANOUT_ROOT_MOD} = 0),
c1 AS (
  SELECT r.root, e.src, e.dst,
         {_fanout_key('r.root', 'e.src', 'e.dst', 1)} AS k
  FROM roots r JOIN edges e ON e.src = r.root),
h1 AS (SELECT root, src, dst FROM (
    SELECT root, src, dst,
           row_number() OVER (PARTITION BY root, src ORDER BY k, dst) AS rk
    FROM c1) WHERE rk <= {f1}),
f2 AS (SELECT DISTINCT root, dst AS node FROM h1),
c2 AS (
  SELECT f.root, e.src, e.dst,
         {_fanout_key('f.root', 'e.src', 'e.dst', 2)} AS k
  FROM f2 f JOIN edges e ON e.src = f.node),
h2 AS (SELECT root, src, dst FROM (
    SELECT root, src, dst,
           row_number() OVER (PARTITION BY root, src ORDER BY k, dst) AS rk
    FROM c2) WHERE rk <= {f2})
SELECT root, CAST(1 AS INTEGER) AS hop, src, dst FROM h1
UNION ALL
SELECT root, CAST(2 AS INTEGER) AS hop, src, dst FROM h2"""


ORACLE["gnn_fanout"] = _fanout_sql()
QUERIES["gnn_fanout"] = q_gnn_fanout


# ----------------------------------------------------- seeded label spreading

LS_SEED_MOD = 17   # seeds = ids divisible by this (241 of 4096)
LS_CLASSES = 3     # seed label = id % LS_CLASSES
LS_ROUNDS = 8      # ≥ graph diameter at every SF we run


def q_label_spreading(spark, sf_dir):
    """Semi-supervised label spreading: clamp labels id%3 on the ids
    divisible by 17, majority-vote-propagate 8 synchronous rounds."""
    from .operators.components import label_spreading

    edges = load_edges(spark, sf_dir)
    from .graph import nodes_of

    seeds = nodes_of(edges).filter(F.col("id") % LS_SEED_MOD == 0).select(
        "id", (F.col("id") % LS_CLASSES).alias("label")
    )
    return label_spreading(edges, seeds, max_iter=LS_ROUNDS)


def _label_spreading_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        f"und AS MATERIALIZED ({UND_SQL})",
        f"""l0 AS MATERIALIZED (
  SELECT n.id,
         CASE WHEN n.id % {LS_SEED_MOD} = 0 THEN n.id % {LS_CLASSES} END AS label,
         n.id % {LS_SEED_MOD} = 0 AS seeded
  FROM nodes n)""",
    ]
    for i in range(1, LS_ROUNDS + 1):
        ctes.append(
            f"""v{i} AS MATERIALIZED (
  SELECT id, label FROM (
    SELECT u.dst AS id, l.label,
           row_number() OVER (PARTITION BY u.dst
                              ORDER BY COUNT(*) DESC, l.label ASC) AS rk
    FROM l{i-1} l JOIN und u ON u.src = l.id
    WHERE l.label IS NOT NULL
    GROUP BY u.dst, l.label) WHERE rk = 1)"""
        )
        ctes.append(
            f"""l{i} AS MATERIALIZED (
  SELECT l.id,
         CASE WHEN l.seeded THEN l.id % {LS_CLASSES}
              ELSE COALESCE(v.label, l.label) END AS label,
         l.seeded
  FROM l{i-1} l LEFT JOIN v{i} v ON v.id = l.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, label FROM l{LS_ROUNDS}"
    )


ORACLE["label_spreading"] = _label_spreading_sql()
QUERIES["label_spreading"] = q_label_spreading


# ------------------------------------------------ PPR sweep cut (local clustering)

SWEEP_TOP_R = 64
SWEEP_ITERS = 6  # sweep ordering, not score parity — 6 rounds keeps the gate lean
_SWEEP_BIG = 999999999


def q_ppr_sweep(spark, sf_dir):
    """Andersen–Chung–Lang local clustering: sweep the top-64 nodes by
    degree-normalized personalized PageRank (seed set = PPR_SOURCES) over
    the undirected view and report each prefix's conductance."""
    from .operators.sweep import ppr_sweep

    return ppr_sweep(
        load_edges(spark, sf_dir),
        PPR_SOURCES,
        damping=DAMPING,
        max_iter=SWEEP_ITERS,
        top_r=SWEEP_TOP_R,
    )


def _ppr_sweep_sql() -> str:
    srcs = ", ".join(str(s) for s in PPR_SOURCES)
    ev = (
        f"(CASE WHEN nodes.id IN ({srcs}) "
        f"THEN CAST({1.0 / len(PPR_SOURCES)!r} AS DOUBLE) ELSE 0e0 END)"
    )
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"und AS MATERIALIZED ({UND_SQL})",
        "nodes AS MATERIALIZED (SELECT DISTINCT src AS id FROM und)",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS d FROM und GROUP BY src)",
        f"r0 AS MATERIALIZED (SELECT nodes.id, {ev} AS rank FROM nodes)",
    ]
    base_factor = repr(1.0 - DAMPING)
    for i in range(1, SWEEP_ITERS + 1):
        ctes.append(
            f"""r{i} AS MATERIALIZED (
  SELECT nodes.id,
         CAST({base_factor} AS DOUBLE) * {ev}
         + CAST({DAMPING!r} AS DOUBLE) * COALESCE(c.contrib, 0e0) AS rank
  FROM nodes LEFT JOIN (
    SELECT u.dst AS id, SUM(r.rank / d.d) AS contrib
    FROM r{i-1} r JOIN und u ON u.src = r.id JOIN deg d ON d.id = r.id
    GROUP BY u.dst
  ) c ON nodes.id = c.id
)"""
        )
    ctes += [
        f"""scored AS MATERIALIZED (
  SELECT r.id, d.d,
         ROUND(r.rank * (SELECT n FROM nn), 6) / d.d AS ratio
  FROM r{SWEEP_ITERS} r JOIN deg d ON d.id = r.id)""",
        f"""topr AS MATERIALIZED (
  SELECT id, d, ROW_NUMBER() OVER (ORDER BY ratio DESC, id) AS r
  FROM scored QUALIFY r <= {SWEEP_TOP_R})""",
        "tv AS (SELECT COUNT(*) AS v FROM und)",
        "canon AS (SELECT src, dst FROM und WHERE src < dst)",
        f"""pe AS MATERIALIZED (
  SELECT LEAST(COALESCE(ru.r, {_SWEEP_BIG}), COALESCE(rv.r, {_SWEEP_BIG})) AS lo,
         GREATEST(COALESCE(ru.r, {_SWEEP_BIG}), COALESCE(rv.r, {_SWEEP_BIG})) AS hi
  FROM canon c
  LEFT JOIN topr ru ON ru.id = c.src
  LEFT JOIN topr rv ON rv.id = c.dst)""",
        f"""deltas AS (
  SELECT r, SUM(x) AS dx FROM (
    SELECT lo AS r, 1 AS x FROM pe WHERE lo < {_SWEEP_BIG}
    UNION ALL
    SELECT hi AS r, -1 AS x FROM pe WHERE hi < {_SWEEP_BIG}
  ) GROUP BY r)""",
        """sweep AS (
  SELECT t.r AS rank, t.id,
         SUM(t.d) OVER (ORDER BY t.r) AS volume,
         COALESCE(SUM(dl.dx) OVER (ORDER BY t.r), 0) AS cut_edges
  FROM topr t LEFT JOIN deltas dl ON dl.r = t.r)""",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + """
SELECT CAST(rank AS BIGINT) AS rank, id,
       CAST(volume AS BIGINT) AS volume,
       CAST(cut_edges AS BIGINT) AS cut_edges,
       CASE WHEN LEAST(volume, (SELECT v FROM tv) - volume) > 0
            THEN ROUND(CAST(cut_edges AS DOUBLE)
                       / LEAST(volume, (SELECT v FROM tv) - volume), 6)
       END AS conductance
FROM sweep"""
    )


ORACLE["ppr_sweep"] = _ppr_sweep_sql()
QUERIES["ppr_sweep"] = q_ppr_sweep


# --------------------------------- edge embeddedness + local sparsification

SPARSIFY_K = 4

OVERLAP_SQL = f"""
WITH edges AS MATERIALIZED ({EDGES_SQL}),
canon AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM edges WHERE src <> dst),
deg AS MATERIALIZED (
  SELECT id, COUNT(*) AS d FROM (
    SELECT src AS id FROM canon UNION ALL SELECT dst AS id FROM canon
  ) GROUP BY id),
tri AS MATERIALIZED (
  SELECT a.src AS u, a.dst AS v, b.dst AS w
  FROM canon a JOIN canon b ON b.src = a.dst
  JOIN canon c ON c.src = a.src AND c.dst = b.dst),
cn AS MATERIALIZED (
  SELECT src, dst, COUNT(*) AS cn FROM (
    SELECT u AS src, v AS dst FROM tri
    UNION ALL SELECT v AS src, w AS dst FROM tri
    UNION ALL SELECT u AS src, w AS dst FROM tri
  ) GROUP BY src, dst)
SELECT c.src, c.dst, CAST(COALESCE(n.cn, 0) AS BIGINT) AS cn,
       CASE WHEN du.d + dv.d - 2 - COALESCE(n.cn, 0) > 0
            THEN ROUND(CAST(COALESCE(n.cn, 0) AS DOUBLE)
                       / (du.d + dv.d - 2 - COALESCE(n.cn, 0)), 6)
            ELSE 0e0 END AS overlap
FROM canon c
LEFT JOIN cn n ON n.src = c.src AND n.dst = c.dst
JOIN deg du ON du.id = c.src
JOIN deg dv ON dv.id = c.dst"""


def q_edge_overlap(spark, sf_dir):
    """Per-edge neighborhood-overlap (embeddedness) scores — tie strength
    for every canonical undirected edge via the skew-safe oriented
    triangle join."""
    from .operators.sparsify import edge_overlap

    return edge_overlap(load_edges(spark, sf_dir))


ORACLE["edge_overlap"] = OVERLAP_SQL
QUERIES["edge_overlap"] = q_edge_overlap


def q_sparsify(spark, sf_dir):
    """Local similarity sparsification (Satuluri et al.): keep each node's
    top-k incident edges by overlap; an edge survives if either endpoint
    keeps it."""
    from .operators.sparsify import sparsify_top_overlap

    return sparsify_top_overlap(load_edges(spark, sf_dir), k=SPARSIFY_K)


ORACLE["sparsify_topk"] = f"""WITH ov AS MATERIALIZED ({OVERLAP_SQL}),
incident AS (
  SELECT src AS node, dst AS other, src, dst, cn, overlap FROM ov
  UNION ALL
  SELECT dst AS node, src AS other, src, dst, cn, overlap FROM ov),
ranked AS (
  SELECT src, dst,
         ROW_NUMBER() OVER (PARTITION BY node
                            ORDER BY overlap DESC, cn DESC, other ASC) AS rk
  FROM incident)
SELECT DISTINCT src, dst FROM ranked WHERE rk <= {SPARSIFY_K}"""
QUERIES["sparsify_topk"] = q_sparsify


# -------------------------------------- densest subgraph (parallel peeling)

DS_UNROLL = 24  # >= log_{1.5}(4096) rounds; converged rounds are no-ops
DS_NUM, DS_DEN = 3, 1  # 2(1+eps) with eps = 0.5


def q_densest_subgraph(spark, sf_dir):
    """Bahmani et al. parallel peeling trace: per-round (nodes, edges,
    density) of the surviving subgraph plus the max-density marker — the
    2(1+eps)-approximate densest subgraph certificate."""
    from .operators.densest import densest_subgraph_trace

    trace, _nodes = densest_subgraph_trace(
        load_edges(spark, sf_dir), eps=0.5, max_rounds=DS_UNROLL
    )
    return trace


def _densest_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"u0 AS MATERIALIZED ({UND_SQL})",
        "s0 AS MATERIALIZED (SELECT COUNT(DISTINCT src) AS s, COUNT(*) // 2 AS e FROM u0)",
    ]
    for i in range(1, DS_UNROLL + 1):
        ctes.append(
            f"""k{i} AS (
  SELECT dd.src FROM (SELECT src, COUNT(*) AS d FROM u{i-1} GROUP BY src) dd
  CROSS JOIN s{i-1} st
  WHERE CAST({DS_DEN} AS HUGEINT) * st.s * dd.d > CAST({DS_NUM} AS HUGEINT) * st.e)"""
        )
        ctes.append(
            f"""u{i} AS MATERIALIZED (
  SELECT u.src, u.dst FROM u{i-1} u
  JOIN k{i} a ON a.src = u.src JOIN k{i} b ON b.src = u.dst)"""
        )
        ctes.append(
            f"s{i} AS MATERIALIZED (SELECT COUNT(DISTINCT src) AS s, COUNT(*) // 2 AS e FROM u{i})"
        )
    trace = "\nUNION ALL ".join(
        f"SELECT {i} AS round, s, e FROM s{i} WHERE s > 0"
        for i in range(DS_UNROLL + 1)
    )
    ctes.append(f"trace AS ({trace})")
    return (
        "WITH " + ",\n".join(ctes)
        + """
SELECT CAST(round AS BIGINT) AS round, CAST(s AS BIGINT) AS n_nodes,
       CAST(e AS BIGINT) AS n_edges,
       ROUND(CAST(e AS DOUBLE) / s, 6) AS density,
       ROW_NUMBER() OVER (ORDER BY CAST(e AS DOUBLE) / s DESC, round ASC) = 1
         AS is_best
FROM trace"""
    )


ORACLE["densest_subgraph"] = _densest_sql()
QUERIES["densest_subgraph"] = q_densest_subgraph


# ------------------------------------------------ incremental coreness (inserts)

CORE_INS_MOD = 4096  # ~15 batch edges at sf0.01 — the small-delta regime


def q_coreness_incremental(spark, sf_dir):
    """Core maintenance under edge INSERTIONS: warm-start the h-index
    descent from prior_core + |batch| (the subcore +1-per-insert bound),
    tightened by new degree inside coreness(). The oracle is the plain
    cold unrolled decomposition of the FULL edge set, so any invalid
    warm start (e.g. the delete-side rule pointed at inserts) would
    hash-mismatch."""
    from .operators.kcore import coreness, coreness_incremental

    edges = load_edges(spark, sf_dir)
    pred = (F.col("src") * 31 + F.col("dst")) % CORE_INS_MOD == 0
    base, batch = edges.filter(~pred), edges.filter(pred)
    prior = coreness(base)
    return coreness_incremental(edges, prior, n_inserted=batch.count())


# insert-side maintenance runs to CONVERGENCE, so its oracle must be
# the converged cold decomposition (fixpoint reached by round 16 at
# sf0.01; 20 gives margin) — NOT the 12-round portable-mode gate
ORACLE["coreness_incremental"] = _coreness_sql(rounds=20)
QUERIES["coreness_incremental"] = q_coreness_incremental


# ------------------------------------------- weighted label propagation

WLP_ITERS = 5
_WQ_MICRO = "CAST(ROUND((1e0 + ((src*31 + dst) % 100)/100e0) * 1000000.0) AS BIGINT)"


def q_label_propagation_weighted(spark, sf_dir):
    """Weighted synchronous LP over the synthetic SQL-portable weights:
    votes are micro-unit integer weight sums (order-independent on both
    engines), argmax per node, smallest-label tie-break."""
    from .graph import with_synthetic_weights
    from .operators.components import label_propagation_weighted

    return label_propagation_weighted(
        with_synthetic_weights(load_edges(spark, sf_dir)), max_iter=WLP_ITERS
    )


def _wlp_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        f"""undw AS MATERIALIZED (
  SELECT src, dst, MAX(w) AS w FROM (
    SELECT src, dst, {_WQ_MICRO} AS w FROM edges WHERE src <> dst
    UNION ALL
    SELECT dst AS src, src AS dst, {_WQ_MICRO} AS w FROM edges WHERE src <> dst
  ) GROUP BY src, dst)""",
        "l0 AS MATERIALIZED (SELECT id, id AS label FROM nodes)",
    ]
    for i in range(1, WLP_ITERS + 1):
        ctes.append(
            f"""l{i} AS MATERIALIZED (
  SELECT p.id, COALESCE(v.label, p.label) AS label
  FROM l{i-1} p LEFT JOIN (
    SELECT id, label FROM (
      SELECT u.dst AS id, q.label, SUM(u.w) AS wcnt,
             ROW_NUMBER() OVER (PARTITION BY u.dst
                                ORDER BY SUM(u.w) DESC, q.label ASC) AS rn
      FROM l{i-1} q JOIN undw u ON u.src = q.id
      GROUP BY u.dst, q.label
    ) WHERE rn = 1
  ) v ON p.id = v.id
)"""
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, label FROM l{WLP_ITERS}"


ORACLE["label_propagation_weighted"] = _wlp_sql()
QUERIES["label_propagation_weighted"] = q_label_propagation_weighted


# ----------------------------------------------------------- reciprocity


def q_reciprocity(spark, sf_dir):
    """Directed-edge reciprocity: fraction of simple directed edges whose
    reverse exists."""
    from .graph import reciprocity

    return reciprocity(load_edges(spark, sf_dir))


ORACLE["reciprocity"] = f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
dirs AS (SELECT DISTINCT src, dst FROM edges WHERE src <> dst),
m AS (SELECT COUNT(*) AS n_mutual FROM dirs d
      WHERE EXISTS (SELECT 1 FROM dirs r WHERE r.src = d.dst AND r.dst = d.src)),
n AS (SELECT COUNT(*) AS n_directed FROM dirs)
SELECT CAST(n.n_directed AS BIGINT) AS n_directed,
       CAST(m.n_mutual AS BIGINT) AS n_mutual,
       CASE WHEN n.n_directed > 0
            THEN ROUND(CAST(m.n_mutual AS DOUBLE) / n.n_directed, 6)
            ELSE 0e0 END AS reciprocity
FROM n CROSS JOIN m"""
QUERIES["reciprocity"] = q_reciprocity


# --------------------------------------------------- edge betweenness


def q_edge_betweenness(spark, sf_dir):
    """K-root Brandes EDGE betweenness (Girvan–Newman primitive): per
    directed edge, sigma_v*(1+delta_w)/sigma_w summed over the sampled
    shortest-path DAGs; 0 for edges on none of them."""
    from .operators.bc import edge_betweenness

    edges = load_edges(spark, sf_dir)
    roots = [
        r["id"]
        for r in edges.selectExpr("src AS id")
        .union(edges.selectExpr("dst AS id"))
        .distinct()
        .orderBy("id")
        .limit(BC_ROOTS_K)
        .collect()
    ]
    return edge_betweenness(edges, roots=roots, max_depth=BC_UNROLL)


ORACLE["edge_betweenness"] = _ebc_sql()
QUERIES["edge_betweenness"] = q_edge_betweenness


# --------------------------------------------------- bow-tie decomposition


def q_bowtie(spark, sf_dir):
    """Broder et al. bow-tie census: per-node region relative to the
    largest SCC (CORE/IN/OUT/TENDRIL/DISCONNECTED)."""
    from .operators.bowtie import bowtie_decomposition

    return bowtie_decomposition(load_edges(spark, sf_dir))


ORACLE["bowtie"] = f"""WITH RECURSIVE edges AS MATERIALIZED ({EDGES_SQL}),
nodes AS MATERIALIZED ({NODES_SQL}),
reach(a, b) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
mutual AS (
  SELECT r1.a AS v, r1.b AS u FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a),
lab AS MATERIALIZED (
  SELECT n.id, LEAST(n.id, COALESCE(MIN(m.u), n.id)) AS scc
  FROM nodes n LEFT JOIN mutual m ON m.v = n.id GROUP BY n.id),
core AS (SELECT scc FROM lab GROUP BY scc ORDER BY COUNT(*) DESC, scc ASC LIMIT 1),
und AS MATERIALIZED ({UND_SQL}),
ureach(b) AS (
  SELECT scc FROM core
  UNION
  SELECT u.dst FROM ureach r JOIN und u ON u.src = r.b)
SELECT l.id,
  CASE WHEN l.scc = (SELECT scc FROM core) THEN 'CORE'
       WHEN l.id IN (SELECT a FROM reach WHERE b = (SELECT scc FROM core)) THEN 'IN'
       WHEN l.id IN (SELECT b FROM reach WHERE a = (SELECT scc FROM core)) THEN 'OUT'
       WHEN l.id IN (SELECT b FROM ureach) THEN 'TENDRIL'
       ELSE 'DISCONNECTED' END AS region
FROM lab l"""
QUERIES["bowtie"] = q_bowtie


# --------------------------------------------------- condensation levels


def q_condensation_levels(spark, sf_dir):
    """Longest-path topological depth of every SCC-condensation component."""
    from .operators.scc import condensation_levels

    return condensation_levels(load_edges(spark, sf_dir))


ORACLE["condensation_levels"] = f"""WITH RECURSIVE edges AS MATERIALIZED ({EDGES_SQL}),
nodes AS MATERIALIZED ({NODES_SQL}),
reach(a, b) AS (
  SELECT src, dst FROM edges
  UNION
  SELECT r.a, e.dst FROM reach r JOIN edges e ON r.b = e.src),
mutual AS (
  SELECT r1.a AS v, r1.b AS u FROM reach r1 JOIN reach r2 ON r1.a = r2.b AND r1.b = r2.a),
lab AS MATERIALIZED (
  SELECT n.id, LEAST(n.id, COALESCE(MIN(m.u), n.id)) AS scc
  FROM nodes n LEFT JOIN mutual m ON m.v = n.id GROUP BY n.id),
cedges AS MATERIALIZED (
  SELECT DISTINCT la.scc AS cs, lb.scc AS cd
  FROM edges e JOIN lab la ON la.id = e.src JOIN lab lb ON lb.id = e.dst
  WHERE la.scc <> lb.scc),
comps AS (SELECT DISTINCT scc AS comp FROM lab),
lev(comp, d) AS (
  SELECT comp, 0 FROM comps WHERE comp NOT IN (SELECT cd FROM cedges)
  UNION
  SELECT c.cd, l.d + 1 FROM lev l JOIN cedges c ON c.cs = l.comp)
SELECT comp, CAST(MAX(d) AS BIGINT) AS level FROM lev GROUP BY comp"""
QUERIES["condensation_levels"] = q_condensation_levels


# --------------------------------------------------- trustrank / spam mass

TRUST_SEEDS = PPR_SOURCES  # gate pins the trusted set to the PPR gate's seeds


def _spam_mass_sql() -> str:
    srcs = ", ".join(str(s) for s in TRUST_SEEDS)
    ev = (
        f"(CASE WHEN nodes.id IN ({srcs}) THEN "
        f"CAST({1.0 / len(TRUST_SEEDS)!r} AS DOUBLE) ELSE 0e0 END)"
    )
    base = repr(1.0 - DAMPING)
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS od FROM edges GROUP BY src)",
        "pr0 AS MATERIALIZED (SELECT id, 1e0/(SELECT n FROM nn) AS rank FROM nodes)",
        f"tr0 AS MATERIALIZED (SELECT nodes.id, {ev} AS rank FROM nodes)",
    ]
    for i in range(1, PR_ITERS + 1):
        ctes.append(
            f"""pr{i} AS MATERIALIZED (
  SELECT nodes.id,
         CAST({base} AS DOUBLE)/(SELECT n FROM nn)
         + CAST({DAMPING!r} AS DOUBLE) * COALESCE(c.contrib, 0e0) AS rank
  FROM nodes LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank / d.od) AS contrib
    FROM pr{i-1} r JOIN edges e ON e.src = r.id JOIN deg d ON d.id = r.id
    GROUP BY e.dst
  ) c ON nodes.id = c.id
)"""
        )
        ctes.append(
            f"""tr{i} AS MATERIALIZED (
  SELECT nodes.id,
         CAST({base} AS DOUBLE) * {ev}
         + CAST({DAMPING!r} AS DOUBLE) * COALESCE(c.contrib, 0e0) AS rank
  FROM nodes LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank / d.od) AS contrib
    FROM tr{i-1} r JOIN edges e ON e.src = r.id JOIN deg d ON d.id = r.id
    GROUP BY e.dst
  ) c ON nodes.id = c.id
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT id, pr_scaled, trust_scaled,
       ROUND((pr_scaled - trust_scaled) / pr_scaled, 6) AS rel_mass
FROM (
  SELECT p.id,
         ROUND(p.rank * (SELECT n FROM nn), 6) AS pr_scaled,
         ROUND(t.rank * (SELECT n FROM nn), 6) AS trust_scaled
  FROM pr{PR_ITERS} p JOIN tr{PR_ITERS} t ON t.id = p.id
)"""
    )


def q_spam_mass(spark, sf_dir):
    """TrustRank spam mass: (PR − TR)/PR per node, TR seeded at
    TRUST_SEEDS (Gyongyi et al. VLDB 2004/2006)."""
    from .operators.trust import spam_mass

    return spam_mass(
        load_edges(spark, sf_dir), seeds=TRUST_SEEDS,
        damping=DAMPING, max_iter=PR_ITERS,
    )


ORACLE["spam_mass"] = _spam_mass_sql()
QUERIES["spam_mass"] = q_spam_mass


# --------------------------------------------------- four-clique count


def q_four_cliques(spark, sf_dir):
    from .operators.triangles import four_clique_count

    return four_clique_count(load_edges(spark, sf_dir))


ORACLE["four_cliques"] = f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
e0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM edges WHERE src <> dst),
tri AS (
  SELECT a.src AS u, a.dst AS v, b.dst AS w
  FROM e0 a JOIN e0 b ON b.src = a.dst
  JOIN e0 c ON c.src = a.src AND c.dst = b.dst)
SELECT CAST(COUNT(*) AS BIGINT) AS four_cliques
FROM tri t
JOIN e0 x ON x.src = t.u
JOIN e0 y ON y.src = t.v AND y.dst = x.dst
JOIN e0 z ON z.src = t.w AND z.dst = x.dst"""
QUERIES["four_cliques"] = q_four_cliques


# --------------------------------------------------- maximal matching

MATCH_UNROLL = 24


def _matching_sql() -> str:
    def key(r: int) -> str:
        eid = "(src * 4294967296 + dst)"
        prio = (
            f"(({eid} % 1000003) * 2654435761 + {r * 1315423911}"
            f" + ({eid} % 2147483647)) % 2147483647"
        )
        return f"(({prio}) * 4294967296 + (src * 65599 + dst) % 4294967296)"

    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        "e0 AS MATERIALIZED (SELECT DISTINCT LEAST(src, dst) AS src, "
        "GREATEST(src, dst) AS dst FROM edges WHERE src <> dst)",
    ]
    for r in range(1, MATCH_UNROLL + 1):
        ctes.append(f"k{r} AS (SELECT src, dst, {key(r)} AS k FROM e{r-1})")
        ctes.append(
            f"""b{r} AS (
  SELECT id, MIN(k) AS b FROM (
    SELECT src AS id, k FROM k{r} UNION ALL SELECT dst AS id, k FROM k{r}
  ) GROUP BY id)"""
        )
        ctes.append(
            f"""s{r} AS MATERIALIZED (
  SELECT e.src, e.dst FROM k{r} e
  JOIN b{r} bu ON bu.id = e.src AND bu.b = e.k
  JOIN b{r} bv ON bv.id = e.dst AND bv.b = e.k)"""
        )
        ctes.append(
            f"""e{r} AS MATERIALIZED (
  SELECT src, dst FROM e{r-1}
  WHERE src NOT IN (SELECT src FROM s{r} UNION SELECT dst FROM s{r})
    AND dst NOT IN (SELECT src FROM s{r} UNION SELECT dst FROM s{r}))"""
        )
    union = " UNION ALL ".join(
        f"SELECT src, dst FROM s{r}" for r in range(1, MATCH_UNROLL + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT src, dst FROM ({union})"


def q_matching(spark, sf_dir):
    from .operators.matching import maximal_matching

    return maximal_matching(load_edges(spark, sf_dir))


ORACLE["matching"] = _matching_sql()
QUERIES["matching"] = q_matching


# --------------------------------------------------- weighted matching

WMATCH_UNROLL = 32


def _weighted_matching_sql() -> str:
    def key(r: int) -> str:
        eid = "(src * 4294967296 + dst)"
        prio = (
            f"(({eid} % 1000003) * 2654435761 + {r * 1315423911}"
            f" + ({eid} % 2147483647)) % 2147483647"
        )
        return (
            f"(((100000 - wq) * 2147483648 + ({prio})) * 4096"
            f" + (src * 65599 + dst) % 4096)"
        )

    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        "base AS (SELECT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst, "
        "CAST(ROUND((1e0 + ((src*31 + dst) % 100)/100e0) * 100e0) AS BIGINT) AS wq "
        "FROM edges WHERE src <> dst)",
        "e0 AS MATERIALIZED (SELECT src, dst, MAX(wq) AS wq FROM base GROUP BY src, dst)",
    ]
    for r in range(1, WMATCH_UNROLL + 1):
        ctes.append(f"k{r} AS (SELECT src, dst, wq, {key(r)} AS k FROM e{r-1})")
        ctes.append(
            f"""b{r} AS (
  SELECT id, MIN(k) AS b FROM (
    SELECT src AS id, k FROM k{r} UNION ALL SELECT dst AS id, k FROM k{r}
  ) GROUP BY id)"""
        )
        ctes.append(
            f"""s{r} AS MATERIALIZED (
  SELECT e.src, e.dst, e.wq FROM k{r} e
  JOIN b{r} bu ON bu.id = e.src AND bu.b = e.k
  JOIN b{r} bv ON bv.id = e.dst AND bv.b = e.k)"""
        )
        ctes.append(
            f"""e{r} AS MATERIALIZED (
  SELECT src, dst, wq FROM e{r-1}
  WHERE src NOT IN (SELECT src FROM s{r} UNION SELECT dst FROM s{r})
    AND dst NOT IN (SELECT src FROM s{r} UNION SELECT dst FROM s{r}))"""
        )
    union = " UNION ALL ".join(
        f"SELECT src, dst, wq FROM s{r}" for r in range(1, WMATCH_UNROLL + 1)
    )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT src, dst, wq FROM ({union})"


def q_weighted_matching(spark, sf_dir):
    """Greedy locally-heaviest maximal matching (½-approx max-weight) on
    the synthetic-weight graph."""
    from .graph import with_synthetic_weights
    from .operators.matching import maximal_weight_matching

    return maximal_weight_matching(
        with_synthetic_weights(load_edges(spark, sf_dir)), resolution=100
    )


ORACLE["weighted_matching"] = _weighted_matching_sql()
QUERIES["weighted_matching"] = q_weighted_matching


# --------------------------------------------------- event analytics

FUNNEL_STEPS = ["view", "click", "purchase"]


def q_funnel_counts(spark, sf_dir):
    """Strictly-ordered first-touch funnel over the events stream."""
    from .functions.funnel import funnel_counts

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return funnel_counts(ev, FUNNEL_STEPS)


def _funnel_sql() -> str:
    s1, s2, s3 = FUNNEL_STEPS
    return f"""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
f1 AS (SELECT user_id, MIN(t) AS t0 FROM ev WHERE event_type = '{s1}' GROUP BY user_id),
f2 AS (SELECT e.user_id, MIN(e.t) AS t0 FROM ev e JOIN f1 ON f1.user_id = e.user_id
       WHERE e.event_type = '{s2}' AND e.t > f1.t0 GROUP BY e.user_id),
f3 AS (SELECT e.user_id, MIN(e.t) AS t0 FROM ev e JOIN f2 ON f2.user_id = e.user_id
       WHERE e.event_type = '{s3}' AND e.t > f2.t0 GROUP BY e.user_id)
SELECT CAST(1 AS BIGINT) AS step_no, '{s1}' AS step, COUNT(*) AS n_users FROM f1
UNION ALL
SELECT CAST(2 AS BIGINT), '{s2}', COUNT(*) FROM f2
UNION ALL
SELECT CAST(3 AS BIGINT), '{s3}', COUNT(*) FROM f3"""


ORACLE["funnel_counts"] = _funnel_sql()
QUERIES["funnel_counts"] = q_funnel_counts


def q_daily_retention(spark, sf_dir):
    """Cohort (first-event epoch-day) × day-offset retention triangle."""
    from .functions.funnel import daily_retention

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    return daily_retention(ev)


ORACLE["daily_retention"] = """WITH ev AS (
  SELECT DISTINCT user_id, epoch_us(ts) // 86400000000 AS day FROM events),
frst AS (SELECT user_id, MIN(day) AS cohort_day FROM ev GROUP BY user_id),
grid AS (
  SELECT f.cohort_day, e.day - f.cohort_day AS day_offset, COUNT(*) AS n_users
  FROM ev e JOIN frst f ON f.user_id = e.user_id GROUP BY 1, 2),
sizes AS (SELECT cohort_day, n_users AS sz FROM grid WHERE day_offset = 0)
SELECT g.cohort_day, g.day_offset, CAST(g.n_users AS BIGINT) AS n_users,
       ROUND(g.n_users / CAST(s.sz AS DOUBLE), 6) AS retention
FROM grid g JOIN sizes s ON s.cohort_day = g.cohort_day"""
QUERIES["daily_retention"] = q_daily_retention


# --------------------------------------------------- triad census


def q_triad_census(spark, sf_dir):
    """Holland-Leinhardt 16-class MAN triad census."""
    from .operators.triads import triad_census

    return triad_census(load_edges(spark, sf_dir))


ORACLE["triad_census"] = f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
dy AS MATERIALIZED (
  SELECT LEAST(src, dst) AS a, GREATEST(src, dst) AS b,
         MAX(CASE WHEN src < dst THEN 1 ELSE 0 END) = 1 AS fwd,
         MAX(CASE WHEN src > dst THEN 1 ELSE 0 END) = 1 AS rev
  FROM edges GROUP BY 1, 2),
nodes AS MATERIALIZED ({NODES_SQL}),
nn AS (SELECT COUNT(*) AS v FROM nodes),
nb AS (SELECT a AS m, b AS o, fwd AS mo, rev AS om FROM dy
       UNION ALL SELECT b, a, rev, fwd FROM dy),
wedges AS MATERIALIZED (
  SELECT n1.m, n1.o AS x, n2.o AS y,
         n1.mo AS mx, n1.om AS xm, n2.mo AS my, n2.om AS ym
  FROM nb n1 JOIN nb n2 ON n1.m = n2.m AND n1.o < n2.o),
cm AS (SELECT x, y, COUNT(*) AS cn FROM wedges GROUP BY x, y),
paths AS (SELECT w.* FROM wedges w LEFT JOIN dy ON dy.a = w.x AND dy.b = w.y
          WHERE dy.a IS NULL),
pclass AS (
  SELECT CASE
    WHEN (mx AND xm) AND (my AND ym) THEN '201'
    WHEN (mx AND xm) OR (my AND ym) THEN
      CASE WHEN (CASE WHEN mx AND xm THEN my ELSE mx END)
           THEN '111U' ELSE '111D' END
    WHEN CAST(mx AS INT) + CAST(my AS INT) = 2 THEN '021D'
    WHEN CAST(mx AS INT) + CAST(my AS INT) = 0 THEN '021U'
    ELSE '021C' END AS triad_type
  FROM paths),
tri0 AS (
  SELECT ab.fwd AS abf, ab.rev AS abr, bc.fwd AS bcf, bc.rev AS bcr,
         ac.fwd AS acf, ac.rev AS acr
  FROM dy ab JOIN dy bc ON bc.a = ab.b
  JOIN dy ac ON ac.a = ab.a AND ac.b = bc.b),
tri1 AS (
  SELECT *,
    CAST(abf AND abr AS INT) + CAST(bcf AND bcr AS INT)
      + CAST(acf AND acr AS INT) AS m3,
    CASE WHEN abf AND abr THEN CAST(bcr AS INT) + CAST(acr AS INT)
         WHEN bcf AND bcr THEN CAST(abf AS INT) + CAST(acf AS INT)
         ELSE CAST(abr AS INT) + CAST(bcf AS INT) END AS tout,
    CASE WHEN abf AND abr THEN CAST(bcf AS INT) + CAST(acf AS INT)
         WHEN bcf AND bcr THEN CAST(abr AS INT) + CAST(acr AS INT)
         ELSE CAST(abf AS INT) + CAST(bcr AS INT) END AS tin,
    CAST(abf AS INT) + CAST(acf AS INT) AS oa,
    CAST(abr AS INT) + CAST(bcf AS INT) AS ob,
    CAST(bcr AS INT) + CAST(acr AS INT) AS oc
  FROM tri0),
tclass AS (
  SELECT CASE
    WHEN m3 = 3 THEN '300'
    WHEN m3 = 2 THEN '210'
    WHEN m3 = 1 THEN CASE WHEN tout = 2 THEN '120D'
                          WHEN tin = 2 THEN '120U' ELSE '120C' END
    WHEN GREATEST(oa, ob, oc) = 2 THEN '030T' ELSE '030C' END AS triad_type
  FROM tri1),
conn AS (SELECT triad_type, COUNT(*) AS n FROM (
  SELECT triad_type FROM pclass UNION ALL SELECT triad_type FROM tclass)
  GROUP BY 1),
udeg AS (SELECT m AS id, COUNT(*) AS ud FROM nb GROUP BY m),
dyx AS (
  SELECT (dy.fwd AND dy.rev) AS is_m,
         (SELECT v FROM nn) - 2 - (ua.ud - 1) - (ub.ud - 1)
           + COALESCE(cm.cn, 0) AS iso
  FROM dy JOIN udeg ua ON ua.id = dy.a JOIN udeg ub ON ub.id = dy.b
  LEFT JOIN cm ON cm.x = dy.a AND cm.y = dy.b),
lone AS (
  SELECT COALESCE(SUM(CASE WHEN is_m THEN iso END), 0) AS n102,
         COALESCE(SUM(CASE WHEN NOT is_m THEN iso END), 0) AS n012
  FROM dyx)
SELECT t.triad_type,
  CAST(CASE t.triad_type
    WHEN '102' THEN (SELECT n102 FROM lone)
    WHEN '012' THEN (SELECT n012 FROM lone)
    WHEN '003' THEN (SELECT (v * (v-1) * (v-2)) // 6 FROM nn)
                    - (SELECT COALESCE(SUM(n), 0) FROM conn)
                    - (SELECT n102 + n012 FROM lone)
    ELSE COALESCE(c.n, 0) END AS BIGINT) AS n
FROM (VALUES ('003'),('012'),('102'),('021D'),('021U'),('021C'),('111D'),
             ('111U'),('030T'),('030C'),('201'),('120D'),('120U'),('120C'),
             ('210'),('300')) AS t(triad_type)
LEFT JOIN conn c ON c.triad_type = t.triad_type"""
QUERIES["triad_census"] = q_triad_census


# --------------------------------------------------- attack percolation

ATTACK_CC_UNROLL = 48  # hub removal can stretch the surviving diameter
ATTACK_PCT = 5


def q_attack_percolation(spark, sf_dir):
    """Albert-Jeong-Barabasi targeted attack: drop the top 5% of nodes by
    undirected degree, census the surviving components."""
    from .operators.percolation import attack_percolation

    return attack_percolation(load_edges(spark, sf_dir), frac=ATTACK_PCT / 100.0)


def _perc_sql(ranked_cte: str, need_udeg: bool = False) -> str:
    """Shared percolation-census oracle: ``ranked_cte`` supplies the
    removal order (rn = 1..V); the rest — exact-k cut, survivor edges,
    unrolled hash-min CC, singleton folding — is identical for the attack
    and random variants."""
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "nn AS (SELECT COUNT(*) AS v FROM nodes)",
    ]
    if need_udeg:
        ctes += [
            f"und0 AS MATERIALIZED ({UND_SQL})",
            "udeg AS (SELECT src AS id, COUNT(*) AS ud FROM und0 GROUP BY src)",
        ]
    ctes += [
        ranked_cte,
        f"kk AS (SELECT ((SELECT v FROM nn) * {ATTACK_PCT}) // 100 AS k)",
        "removed AS MATERIALIZED (SELECT id FROM ranked WHERE rn <= (SELECT k FROM kk))",
        """kept AS MATERIALIZED (
  SELECT e.src, e.dst FROM edges e
  WHERE e.src NOT IN (SELECT id FROM removed)
    AND e.dst NOT IN (SELECT id FROM removed))""",
        """knodes AS MATERIALIZED (SELECT DISTINCT id FROM (
  SELECT src AS id FROM kept UNION ALL SELECT dst FROM kept))""",
        """kund AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
  SELECT src, dst FROM kept UNION ALL SELECT dst AS src, src AS dst FROM kept)
  WHERE src <> dst)""",
        "c0 AS MATERIALIZED (SELECT id, id AS component FROM knodes)",
    ]
    for i in range(1, ATTACK_CC_UNROLL + 1):
        ctes.append(
            f"""c{i} AS MATERIALIZED (
  SELECT c.id,
         CASE WHEN m.nmin IS NOT NULL AND m.nmin < c.component
              THEN m.nmin ELSE c.component END AS component
  FROM c{i-1} c LEFT JOIN (
    SELECT u.dst AS id, MIN(p.component) AS nmin
    FROM c{i-1} p JOIN kund u ON u.src = p.id
    GROUP BY u.dst
  ) m ON c.id = m.id
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f""",
sizes AS (SELECT component, COUNT(*) AS sz FROM c{ATTACK_CC_UNROLL} GROUP BY component),
stats AS (SELECT COALESCE(MAX(sz), 0) AS giant_e, COUNT(*) AS ncc,
                 COALESCE(SUM(sz), 0) AS incc FROM sizes),
surv AS (SELECT COUNT(*) AS ns FROM nodes
         WHERE id NOT IN (SELECT id FROM removed))
SELECT CAST((SELECT k FROM kk) AS BIGINT) AS n_removed,
       CAST((SELECT ns FROM surv) AS BIGINT) AS n_remaining,
       CAST(GREATEST((SELECT giant_e FROM stats),
                     CASE WHEN (SELECT ns FROM surv) > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS giant_size,
       CAST((SELECT ncc FROM stats) + (SELECT ns FROM surv)
            - (SELECT incc FROM stats) AS BIGINT) AS n_components"""
    )


ATTACK_RANKED_CTE = """ranked AS (
  SELECT n.id, ROW_NUMBER() OVER (ORDER BY COALESCE(u.ud, 0) DESC, n.id ASC) AS rn
  FROM nodes n LEFT JOIN udeg u ON u.id = n.id)"""

ORACLE["attack_percolation"] = _perc_sql(ATTACK_RANKED_CTE, need_udeg=True)
QUERIES["attack_percolation"] = q_attack_percolation


def q_random_percolation(spark, sf_dir):
    """Albert-Jeong-Barabasi RANDOM-failure census: drop a deterministic
    pseudo-random 5% of nodes (LCG rank), census the survivors — the
    error-tolerance twin of attack_percolation at the same fraction."""
    from .operators.percolation import random_percolation

    return random_percolation(load_edges(spark, sf_dir), frac=ATTACK_PCT / 100.0)


RANDOM_RANKED_CTE = """ranked AS (
  SELECT id, ROW_NUMBER() OVER (
    ORDER BY (1103515245 * (id % 65536) + 12345) % 65536 ASC, id ASC) AS rn
  FROM nodes)"""

ORACLE["random_percolation"] = _perc_sql(RANDOM_RANKED_CTE)
QUERIES["random_percolation"] = q_random_percolation


# --------------------------------------------------- community conductance


def q_community_conductance(spark, sf_dir):
    """Per-community conductance of the label-propagation communities."""
    from .operators.components import community_conductance, label_propagation

    edges = load_edges(spark, sf_dir)
    return community_conductance(edges, label_propagation(edges, max_iter=LP_ITERS))


ORACLE["community_conductance"] = f"""WITH lp AS MATERIALIZED ({_lp_sql()}),
cund AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM ({EDGES_SQL}) WHERE src <> dst),
mm AS (SELECT COUNT(*) AS m FROM cund),
lab AS MATERIALIZED (
  SELECT u.src, u.dst, la.label AS la, lb.label AS lb
  FROM cund u JOIN lp la ON la.id = u.src JOIN lp lb ON lb.id = u.dst),
intra AS (SELECT la AS community, COUNT(*) AS i FROM lab WHERE la = lb GROUP BY la),
cut AS (SELECT community, COUNT(*) AS c FROM (
  SELECT la AS community FROM lab WHERE la <> lb
  UNION ALL SELECT lb FROM lab WHERE la <> lb) GROUP BY community),
sizes AS (SELECT label AS community, COUNT(*) AS n_nodes FROM lp GROUP BY label)
SELECT s.community, CAST(s.n_nodes AS BIGINT) AS n_nodes,
       CAST(COALESCE(c.c, 0) AS BIGINT) AS cut,
       CAST(2 * COALESCE(i.i, 0) + COALESCE(c.c, 0) AS BIGINT) AS vol,
       CASE WHEN LEAST(2 * COALESCE(i.i, 0) + COALESCE(c.c, 0),
                       2 * (SELECT m FROM mm)
                       - (2 * COALESCE(i.i, 0) + COALESCE(c.c, 0))) > 0
            THEN ROUND(COALESCE(c.c, 0)
                       / CAST(LEAST(2 * COALESCE(i.i, 0) + COALESCE(c.c, 0),
                                    2 * (SELECT m FROM mm)
                                    - (2 * COALESCE(i.i, 0) + COALESCE(c.c, 0)))
                              AS DOUBLE), 6) END AS conductance
FROM sizes s
LEFT JOIN intra i ON i.community = s.community
LEFT JOIN cut c ON c.community = s.community"""
QUERIES["community_conductance"] = q_community_conductance


# --------------------------------------------------- pagerank trace


def q_pagerank_trace(spark, sf_dir):
    """Per-iteration L1 convergence residuals of the plain PageRank
    recurrence (micro-unit exact)."""
    from .operators.pagerank import pagerank_trace

    return pagerank_trace(load_edges(spark, sf_dir), damping=DAMPING, iters=PR_ITERS)


def _pagerank_trace_sql() -> str:
    # reuse the gate chain r0..r{PR_ITERS}; residual_i from the rounded
    # scaled vectors, quantized to micro-units, exact integer sums
    chain = _pagerank_sql()
    body = chain[: chain.rindex("\nSELECT id, ROUND")]
    def micro(alias: str) -> str:
        return (
            f"CAST(ROUND(ROUND({alias}.rank * (SELECT n FROM nn), 6)"
            f" * 1000000.0) AS BIGINT)"
        )
    selects = [
        f"""SELECT CAST({i} AS BIGINT) AS iter,
       COALESCE(SUM(ABS({micro('a')} - {micro('b')})), 0) / 1000000.0
         AS l1_residual
FROM r{i} a JOIN r{i-1} b ON b.id = a.id"""
        for i in range(1, PR_ITERS + 1)
    ]
    return body + "\n" + "\nUNION ALL\n".join(selects)


ORACLE["pagerank_trace"] = _pagerank_trace_sql()
QUERIES["pagerank_trace"] = q_pagerank_trace


# --------------------------------------------------- event transitions


def q_event_transitions(spark, sf_dir):
    """First-order Markov transition table of the event stream."""
    from .functions.funnel import event_transitions

    return event_transitions(spark.read.parquet(f"{sf_dir}/events.parquet"))


ORACLE["event_transitions"] = """WITH ev AS (
  SELECT user_id, event_type, epoch_us(ts) AS t, event_id FROM events),
pairs AS (
  SELECT event_type AS from_type,
         lead(event_type) OVER (PARTITION BY user_id ORDER BY t, event_id)
           AS to_type
  FROM ev),
grid AS (
  SELECT from_type, to_type, COUNT(*) AS n FROM pairs
  WHERE to_type IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT from_type, SUM(n) AS t FROM grid GROUP BY from_type)
SELECT g.from_type, g.to_type, CAST(g.n AS BIGINT) AS n,
       ROUND(g.n / CAST(t.t AS DOUBLE), 6) AS prob
FROM grid g JOIN tot t ON t.from_type = g.from_type"""
QUERIES["event_transitions"] = q_event_transitions


# --------------------------------------------------- TPC-H Q18


Q18_QTY = 300  # the spec's large-volume threshold


def q_tpch_q18(spark, sf_dir):
    """TPC-H Q18 shape (large-volume customers): the HAVING-subquery
    pattern. The qualifying-orderkey set (sum(l_quantity) > 300) comes
    from a map-side-combinable lineitem rollup and is TINY by the spec's
    selectivity at every scale, so it broadcasts into a semi-join that
    prunes lineitem BEFORE the orders/customer joins — the plan a
    100-TB run wants (never join the full fact tables first). Ordering
    key (o_totalprice DESC, o_orderkey ASC) is replicated exactly in the
    oracle so the LIMIT cut is deterministic; sum(l_quantity) is an
    integer-valued double → exact, cast to long."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("_sq"))
        .filter(F.col("_sq") > Q18_QTY)
        .select("l_orderkey")
    )
    return (
        li.join(F.broadcast(big), "l_orderkey")
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(F.sum("l_quantity").cast("long").alias("total_qty"))
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(100)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.col("o_orderdate").cast("timestamp").cast("long").alias("o_orderdate_s"),
            "o_totalprice",
            "total_qty",
        )
    )


ORACLE["tpch_q18"] = f"""
WITH big AS (
  SELECT l_orderkey FROM lineitem
  GROUP BY l_orderkey HAVING SUM(l_quantity) > {Q18_QTY})
SELECT c.c_name, c.c_custkey, o.o_orderkey,
       CAST(floor(epoch(o.o_orderdate)) AS BIGINT) AS o_orderdate_s,
       o.o_totalprice,
       CAST(SUM(l.l_quantity) AS BIGINT) AS total_qty
FROM lineitem l
JOIN big b ON l.l_orderkey = b.l_orderkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1, 2, 3, 4, 5
ORDER BY o.o_totalprice DESC, o.o_orderkey ASC LIMIT 100"""
QUERIES["tpch_q18"] = q_tpch_q18


# --------------------------------------------------- TPC-H Q13


def q_tpch_q13(spark, sf_dir):
    """TPC-H Q13 shape (customer order-count distribution): the LEFT
    OUTER join with a residual predicate on the inner side, then a
    distribution-of-counts rollup. The priority filter prunes orders
    BEFORE the join (Catalyst pushes it to the scan); the per-customer
    count is map-side combinable after the custkey shuffle; the final
    histogram is ≤ max-orders-per-customer rows."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderpriority") != "1-URGENT"
    )
    per = (
        cust.join(orders, cust["c_custkey"] == orders["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per.groupBy("c_count").agg(F.count("*").alias("custdist")).select(
        F.col("c_count").cast("long").alias("c_count"), "custdist"
    )


ORACLE["tpch_q13"] = """
WITH per AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey)
SELECT CAST(c_count AS BIGINT) AS c_count, COUNT(*) AS custdist
FROM per GROUP BY c_count"""
QUERIES["tpch_q13"] = q_tpch_q13


# --------------------------------------------------- degree correlation


def q_avg_neighbor_degree(spark, sf_dir):
    """knn(k) degree-correlation curve (Pastor-Satorras et al. 2001)."""
    from .graph import avg_neighbor_degree

    return avg_neighbor_degree(load_edges(spark, sf_dir))


ORACLE["avg_neighbor_degree"] = f"""
WITH edges AS MATERIALIZED ({EDGES_SQL}),
und AS MATERIALIZED ({UND_SQL}),
deg AS (SELECT src AS id, COUNT(*) AS d FROM und GROUP BY src),
ends AS (SELECT u.src, dg.d AS dk FROM und u JOIN deg dg ON dg.id = u.dst),
pn AS (SELECT src, SUM(dk) AS s, COUNT(*) AS c FROM ends GROUP BY src),
micro AS (
  SELECT c AS k,
         CAST(ROUND(ROUND(s / CAST(c AS DOUBLE), 6) * 1000000.0) AS BIGINT) AS m
  FROM pn)
SELECT CAST(k AS BIGINT) AS k, COUNT(*) AS n_nodes,
       ROUND((SUM(m) / CAST(COUNT(*) AS DOUBLE)) / 1000000.0, 6) AS knn
FROM micro GROUP BY k"""
QUERIES["avg_neighbor_degree"] = q_avg_neighbor_degree


# --------------------------------------------------- widest (bottleneck) path


def q_widest_path(spark, sf_dir):
    """Max-bottleneck path width from the min node over the synthetic
    capacity column — the (max, min) semiring twin of sssp_weighted."""
    from .graph import with_synthetic_weights
    from .operators.traversal import widest_paths

    edges = with_synthetic_weights(load_edges(spark, sf_dir))
    root = edges.agg(F.min(F.least("src", "dst")).alias("r")).collect()[0]["r"]
    d = widest_paths(edges, root=root, weight_col="weight", max_iter=BFS_UNROLL)
    return d.select("id", F.round("width", 6).alias("width"))


def _widest_sql() -> str:
    ctes = [
        f"edges_raw AS MATERIALIZED ({EDGES_SQL})",
        "edges AS MATERIALIZED (SELECT src, dst,"
        " 1e0 + ((src*31 + dst) % 100)/100e0 AS w FROM edges_raw)",
        "nodes AS (SELECT DISTINCT id FROM ("
        "SELECT src AS id FROM edges UNION ALL SELECT dst AS id FROM edges))",
        "root AS (SELECT MIN(id) AS r FROM nodes)",
        "d0 AS MATERIALIZED (SELECT id,"
        " CASE WHEN id = (SELECT r FROM root) THEN 999.0 END AS width FROM nodes)",
    ]
    for i in range(1, BFS_UNROLL + 1):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
  SELECT p.id,
         CASE WHEN c.cand IS NULL THEN p.width
              WHEN p.width IS NULL OR c.cand > p.width THEN c.cand
              ELSE p.width END AS width
  FROM d{i-1} p LEFT JOIN (
    SELECT e.dst AS id, MAX(LEAST(q.width, e.w)) AS cand
    FROM d{i-1} q JOIN edges e ON e.src = q.id
    WHERE q.width IS NOT NULL GROUP BY e.dst
  ) c ON p.id = c.id
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(width, 6) AS width FROM d{BFS_UNROLL}"
    )


ORACLE["widest_path"] = _widest_sql()
QUERIES["widest_path"] = q_widest_path


# --------------------------------------------------- sampled eccentricity


def q_eccentricity(spark, sf_dir):
    """Exact eccentricity for the sampled closeness roots — one
    multi-source BFS; max(ecc) is the standard diameter lower bound."""
    from .operators.traversal import eccentricity_sample

    return eccentricity_sample(load_edges(spark, sf_dir), roots=CLOSE_ROOTS)


ORACLE["eccentricity"] = _ms_bfs_with(
    f"""SELECT root AS id, CAST(MAX(depth) AS BIGINT) AS ecc,
       CAST(COUNT(*) AS BIGINT) AS n_reached
FROM m{BFS_UNROLL} WHERE depth IS NOT NULL GROUP BY root"""
)
QUERIES["eccentricity"] = q_eccentricity


# --------------------------------------------------- DOULION triangles

DOULION_BP = 2500


def q_doulion_triangles(spark, sf_dir):
    """Sampled triangle estimator (Tsourakakis et al. 2009) — exact count
    on a deterministic p=0.25 edge sample, scaled by 1/p³."""
    from .operators.triangles import doulion_triangle_estimate

    return doulion_triangle_estimate(load_edges(spark, sf_dir), p_bp=DOULION_BP)


ORACLE["doulion_triangles"] = f"""
WITH edges AS ({EDGES_SQL}),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM edges WHERE src <> dst),
s AS (
  SELECT src, dst FROM und
  WHERE CAST(('0x' || substr(md5(src || ':' || dst || ':doulion'), 1, 15))
             AS BIGINT) % 10000 < {DOULION_BP}),
tri AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS t
  FROM s e1 JOIN s e2 ON e1.dst = e2.src
  JOIN s e3 ON e3.src = e1.src AND e3.dst = e2.dst),
ne AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM s)
SELECT CAST({DOULION_BP} AS BIGINT) AS p_bp,
       ne.m AS n_sampled_edges,
       tri.t AS triangles_sampled,
       ROUND(CAST(tri.t AS DOUBLE) * 1000000000000.0
             / {float(DOULION_BP) ** 3!r}, 4) AS triangle_estimate
FROM ne, tri"""
QUERIES["doulion_triangles"] = q_doulion_triangles


# --------------------------------------------------- co-occurrence lift


def q_cooccurrence_lift(spark, sf_dir):
    """PMI-class lift over the skip-gram walk corpus (exact-ratio form)."""
    from .operators.walks import cooccurrence_lift, random_walks, skipgram_pairs

    w = random_walks(
        load_edges(spark, sf_dir), walk_length=WALK_LEN, walks_per_node=1,
        seed=WALK_SEED,
    )
    return cooccurrence_lift(skipgram_pairs(w, window=SKIPGRAM_WINDOW))


ORACLE["cooccurrence_lift"] = f"""WITH walks AS MATERIALIZED (
{_walks_sql()}
),
pairs AS (
  SELECT a.node AS center, b.node AS context, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM walks a JOIN walks b
    ON a.walk_id = b.walk_id AND a.step <> b.step
   AND abs(a.step - b.step) <= {SKIPGRAM_WINDOW}
  GROUP BY a.node, b.node),
t AS (SELECT SUM(cnt) AS t FROM pairs),
ca AS (SELECT center, SUM(cnt) AS na FROM pairs GROUP BY center),
cb AS (SELECT context, SUM(cnt) AS nb FROM pairs GROUP BY context)
SELECT p.center, p.context, p.cnt,
       ROUND(CAST(p.cnt AS DOUBLE) * t.t
             / (CAST(ca.na AS DOUBLE) * cb.nb), 6) AS lift
FROM pairs p JOIN ca ON ca.center = p.center
JOIN cb ON cb.context = p.context, t"""
QUERIES["cooccurrence_lift"] = q_cooccurrence_lift


# --------------------------------------------------- TPC-H Q4


def q_tpch_q4(spark, sf_dir):
    """TPC-H Q4 shape (order-priority checking): the correlated-EXISTS
    pattern as a LEFT SEMI join with a non-equi residual (late-shipping
    lineitem exists for the order). The date filter prunes orders at the
    scan; the semi-join deduplicates ON THE JOIN (no post-distinct pass
    over multi-lineitem orders); the final rollup is 5 rows."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01"))
        & (F.col("o_orderdate") < F.lit("1997-07-01"))
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").select(
        "l_orderkey", "l_shipdate"
    )
    late = orders.join(
        li,
        (orders["o_orderkey"] == li["l_orderkey"])
        & (li["l_shipdate"] > orders["o_orderdate"] + F.expr("INTERVAL 60 DAYS")),
        "left_semi",
    )
    return (
        late.groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


ORACLE["tpch_q4"] = """
SELECT o_orderpriority, COUNT(*) AS order_count
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o.o_orderdate < TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey
                AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority"""
QUERIES["tpch_q4"] = q_tpch_q4


# --------------------------------------------------- configuration model


def q_config_model(spark, sf_dir):
    """Degree-preserving null-model edge list (deterministic stub
    pairing); compare motif counts against it for significance."""
    from .operators.rewire import configuration_model

    return configuration_model(load_edges(spark, sf_dir))


ORACLE["config_model"] = f"""
WITH edges AS ({EDGES_SQL}),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS s, GREATEST(src, dst) AS d
  FROM edges WHERE src <> dst),
stubs AS (
  SELECT s AS node, s AS es, d AS ed, 0 AS side FROM und
  UNION ALL SELECT d, s, d, 1 FROM und),
h AS (
  SELECT node, es, ed, side,
         CAST(('0x' || substr(md5(node || ':' || es || ':' || ed || ':'
                                   || side || ':42'), 1, 15)) AS BIGINT) AS hv
  FROM stubs),
r AS (
  SELECT node,
         ROW_NUMBER() OVER (ORDER BY hv, node, es, ed, side) - 1 AS rk
  FROM h)
SELECT CAST(MIN(node) AS BIGINT) AS src, CAST(MAX(node) AS BIGINT) AS dst
FROM r GROUP BY rk // 2"""
QUERIES["config_model"] = q_config_model


# --------------------------------------------------- motif significance


def q_triangle_significance(spark, sf_dir):
    """Small-world test: the real graph's triangle count against its own
    degree sequence's expectation — exact triangles on the
    configuration-model null graph (same degree multiset, structure
    destroyed). ratio >> 1 is the clustering web graphs show and the
    null model can't explain. One row [real, null_model, ratio]."""
    from .operators.rewire import configuration_model
    from .operators.triangles import triangles_df

    edges = load_edges(spark, sf_dir)
    real = triangles_df(edges).select(F.col("triangles").alias("real"))
    null = triangles_df(configuration_model(edges)).select(
        F.col("triangles").alias("null_model")
    )
    return real.crossJoin(null).select(
        "real",
        "null_model",
        F.round(
            F.col("real").cast("double")
            / F.when(F.col("null_model") > 0, F.col("null_model")),
            6,
        ).alias("ratio"),
    )


ORACLE["triangle_significance"] = f"""
WITH nm AS MATERIALIZED ({ORACLE["config_model"]}),
real_und AS (
  SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM ({EDGES_SQL}) WHERE src <> dst),
null_und AS (
  SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM nm WHERE src <> dst),
tr AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS real
  FROM real_und e1 JOIN real_und e2 ON e1.dst = e2.src
  JOIN real_und e3 ON e3.src = e1.src AND e3.dst = e2.dst),
tn AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS null_model
  FROM null_und e1 JOIN null_und e2 ON e1.dst = e2.src
  JOIN null_und e3 ON e3.src = e1.src AND e3.dst = e2.dst)
SELECT tr.real, tn.null_model,
       ROUND(CAST(tr.real AS DOUBLE)
             / CASE WHEN tn.null_model > 0 THEN tn.null_model END, 6) AS ratio
FROM tr, tn"""
QUERIES["triangle_significance"] = q_triangle_significance


# --------------------------------------------------- ROLLUP aggregation


def q_orders_rollup(spark, sf_dir):
    """Hierarchical ROLLUP over (priority, status) with subtotal and
    grand-total rows — the OLAP grouping-sets surface; NULL markers
    replaced by 'ALL' so the gate hash is engine-neutral."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return (
        orders.rollup("o_orderpriority", "o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double"), 2).alias("total"),
        )
        .select(
            F.coalesce("o_orderpriority", F.lit("ALL")).alias("priority"),
            F.coalesce("o_orderstatus", F.lit("ALL")).alias("status"),
            "n_orders",
            "total",
        )
    )


ORACLE["orders_rollup"] = """
SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
       COALESCE(o_orderstatus, 'ALL') AS status,
       COUNT(*) AS n_orders,
       ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE), 2) AS total
FROM orders GROUP BY ROLLUP (o_orderpriority, o_orderstatus)"""
QUERIES["orders_rollup"] = q_orders_rollup


# --------------------------------------------------- moving average


def q_event_movavg(spark, sf_dir):
    """Per-user trailing moving average of event values (last 4 events,
    epoch-second + event_id ordering — the deterministic event-time key
    the sessionization gate established). Sequential window accumulation
    gives the identical double in both engines; rounded 6 dp anyway."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").cast("timestamp").cast("long"), "event_id")
        .rowsBetween(-3, 0)
    )
    return ev.select(
        "user_id",
        "event_id",
        F.round(F.avg(F.col("value")).over(w), 6).alias("movavg4"),
    )


ORACLE["event_movavg"] = """
SELECT user_id, event_id,
       ROUND(AVG(value) OVER (
         PARTITION BY user_id
         ORDER BY CAST(floor(epoch(ts)) AS BIGINT), event_id
         ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 6) AS movavg4
FROM events"""
QUERIES["event_movavg"] = q_event_movavg


# --------------------------------------------------- local bridges


def q_local_bridges(spark, sf_dir):
    """Support-0 undirected edges — Granovetter weak ties."""
    from .operators.truss import local_bridges

    return local_bridges(load_edges(spark, sf_dir))


ORACLE["local_bridges"] = f"""
WITH edges AS ({EDGES_SQL}),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM edges WHERE src <> dst),
adj AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und)
SELECT u.src, u.dst FROM und u
WHERE NOT EXISTS (
  SELECT 1 FROM adj a JOIN adj b ON a.dst = b.dst
  WHERE a.src = u.src AND b.src = u.dst)"""
QUERIES["local_bridges"] = q_local_bridges


# --------------------------------------------------- k-core collapse curve


def q_core_sizes(spark, sf_dir):
    """Cumulative k-core sizes from the coreness fixpoint."""
    from .operators.kcore import core_sizes

    return core_sizes(load_edges(spark, sf_dir), rounds=CORENESS_UNROLL)


ORACLE["core_sizes"] = f"""
WITH cr AS MATERIALIZED ({ORACLE["coreness"]}),
hist AS (SELECT coreness AS k, COUNT(*) AS c FROM cr GROUP BY coreness)
SELECT CAST(k AS BIGINT) AS k,
       CAST(SUM(c) OVER (ORDER BY k DESC ROWS UNBOUNDED PRECEDING) AS BIGINT)
         AS n_nodes
FROM hist"""
QUERIES["core_sizes"] = q_core_sizes


# --------------------------------------------------- trending events


def q_trending_events(spark, sf_dir):
    """Top-2 event types per 5-minute window (windowed top-k on the
    event stream's batch view; deterministic (n DESC, type ASC) cut)."""
    from pyspark.sql import Window

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    counts = (
        ev.withColumn(
            "bucket",
            (F.col("ts").cast("timestamp").cast("long") / 300).cast("long"),
        )
        .groupBy("bucket", "event_type")
        .agg(F.count("*").alias("n"))
    )
    w = Window.partitionBy("bucket").orderBy(F.desc("n"), F.asc("event_type"))
    return (
        counts.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("bucket", "event_type", "n", F.col("rn").cast("long").alias("rn"))
    )


ORACLE["trending_events"] = """
WITH counts AS (
  SELECT CAST(CAST(floor(epoch(ts)) AS BIGINT) // 300 AS BIGINT) AS bucket,
         event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
ranked AS (
  SELECT bucket, event_type, n,
         ROW_NUMBER() OVER (PARTITION BY bucket
                            ORDER BY n DESC, event_type ASC) AS rn
  FROM counts)
SELECT bucket, event_type, n, CAST(rn AS BIGINT) AS rn
FROM ranked WHERE rn <= 2"""
QUERIES["trending_events"] = q_trending_events


# --------------------------------------------------- friend recommendations


def q_friend_recs(spark, sf_dir):
    """Triadic-closure top-2 non-neighbor candidates per node."""
    from .operators.linkpred import friend_recommendations

    return friend_recommendations(load_edges(spark, sf_dir), top_k=2)


ORACLE["friend_recs"] = f"""
WITH edges AS MATERIALIZED ({EDGES_SQL}),
und AS MATERIALIZED ({UND_SQL}),
pairs AS (
  SELECT a.dst AS id, b.dst AS candidate, COUNT(*) AS common
  FROM und a JOIN und b ON a.src = b.src AND a.dst <> b.dst
  GROUP BY 1, 2),
ne AS (
  SELECT p.id, p.candidate, p.common FROM pairs p
  WHERE NOT EXISTS (SELECT 1 FROM und u
                    WHERE u.src = p.id AND u.dst = p.candidate)),
r AS (
  SELECT id, candidate, CAST(common AS BIGINT) AS common,
         ROW_NUMBER() OVER (PARTITION BY id
                            ORDER BY common DESC, candidate ASC) AS rank
  FROM ne)
SELECT id, candidate, common, CAST(rank AS BIGINT) AS rank
FROM r WHERE rank <= 2"""
QUERIES["friend_recs"] = q_friend_recs


# --------------------------------------------------- bond percolation

BOND_KEEP_BP = 7500


def q_bond_percolation(spark, sf_dir):
    """Edge-failure robustness census at 75% link survival."""
    from .operators.percolation import bond_percolation

    return bond_percolation(load_edges(spark, sf_dir), keep_bp=BOND_KEEP_BP)


def _bond_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        """canon AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM edges WHERE src <> dst)""",
        f"""s AS MATERIALIZED (
  SELECT src, dst FROM canon
  WHERE CAST(('0x' || substr(md5(src || ':' || dst || ':bond'), 1, 15))
             AS BIGINT) % 10000 < {BOND_KEEP_BP})""",
        """knodes AS MATERIALIZED (SELECT DISTINCT id FROM (
  SELECT src AS id FROM s UNION ALL SELECT dst FROM s))""",
        """kund AS MATERIALIZED (SELECT DISTINCT src, dst FROM (
  SELECT src, dst FROM s UNION ALL SELECT dst AS src, src AS dst FROM s))""",
        "c0 AS MATERIALIZED (SELECT id, id AS component FROM knodes)",
    ]
    for i in range(1, ATTACK_CC_UNROLL + 1):
        ctes.append(
            f"""c{i} AS MATERIALIZED (
  SELECT c.id,
         CASE WHEN m.nmin IS NOT NULL AND m.nmin < c.component
              THEN m.nmin ELSE c.component END AS component
  FROM c{i-1} c LEFT JOIN (
    SELECT u.dst AS id, MIN(p.component) AS nmin
    FROM c{i-1} p JOIN kund u ON u.src = p.id
    GROUP BY u.dst
  ) m ON c.id = m.id
)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f""",
sizes AS (SELECT component, COUNT(*) AS sz FROM c{ATTACK_CC_UNROLL} GROUP BY component),
stats AS (SELECT COALESCE(MAX(sz), 0) AS giant_e, COUNT(*) AS ncc,
                 COALESCE(SUM(sz), 0) AS incc FROM sizes),
nn AS (SELECT COUNT(*) AS v FROM nodes),
me AS (SELECT COUNT(*) AS m FROM s)
SELECT CAST({BOND_KEEP_BP} AS BIGINT) AS keep_bp,
       CAST((SELECT m FROM me) AS BIGINT) AS n_edges_kept,
       CAST(GREATEST((SELECT giant_e FROM stats),
                     CASE WHEN (SELECT v FROM nn) > 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS giant_size,
       CAST((SELECT ncc FROM stats) + (SELECT v FROM nn)
            - (SELECT incc FROM stats) AS BIGINT) AS n_components"""
    )


ORACLE["bond_percolation"] = _bond_sql()
QUERIES["bond_percolation"] = q_bond_percolation


# --------------------------------------------------- 4-node graphlet census


def q_graphlet_census(spark, sf_dir):
    """Exact non-induced 4-node graphlet counts (ESCAPE closed forms)."""
    from .operators.triangles import graphlet_census

    return graphlet_census(load_edges(spark, sf_dir))


ORACLE["graphlet_census"] = f"""
WITH c4r AS MATERIALIZED ({ORACLE["four_cycles"]}),
k4r AS MATERIALIZED ({ORACLE["four_cliques"]}),
edges AS MATERIALIZED ({EDGES_SQL}),
und AS MATERIALIZED (
  SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM edges WHERE src <> dst),
bd AS (SELECT src, dst FROM und UNION ALL SELECT dst, src FROM und),
deg AS (SELECT src AS id, COUNT(*) AS d FROM bd GROUP BY src),
tri AS MATERIALIZED (
  SELECT a.src AS u, a.dst AS v, b.dst AS w
  FROM und a JOIN und b ON b.src = a.dst
  JOIN und c ON c.src = a.src AND c.dst = b.dst),
tcnt AS (SELECT COUNT(*) AS t FROM tri),
tpn AS (SELECT id, COUNT(*) AS tv FROM (
  SELECT u AS id FROM tri UNION ALL SELECT v FROM tri
  UNION ALL SELECT w FROM tri) GROUP BY id),
se AS (SELECT src, dst, COUNT(*) AS s FROM (
  SELECT u AS src, v AS dst FROM tri UNION ALL SELECT v, w FROM tri
  UNION ALL SELECT u, w FROM tri) GROUP BY 1, 2),
cl AS (SELECT COALESCE(SUM((d * (d - 1) * (d - 2)) // 6), 0) AS claws FROM deg),
p3 AS (SELECT COALESCE(SUM((da.d - 1) * (db.d - 1)), 0) AS p
       FROM und e JOIN deg da ON da.id = e.src JOIN deg db ON db.id = e.dst),
tt AS (SELECT COALESCE(SUM(tpn.tv * (dg.d - 2)), 0) AS x
       FROM tpn JOIN deg dg ON dg.id = tpn.id),
dm AS (SELECT COALESCE(SUM((s * (s - 1)) // 2), 0) AS dd FROM se)
SELECT CAST(cl.claws AS BIGINT) AS claws,
       CAST(p3.p - 3 * tcnt.t AS BIGINT) AS paths3,
       CAST(tt.x AS BIGINT) AS tailed_triangles,
       CAST(dm.dd AS BIGINT) AS diamonds,
       CAST(c4r.four_cycles AS BIGINT) AS four_cycles,
       CAST(k4r.four_cliques AS BIGINT) AS four_cliques
FROM cl, p3, tt, dm, tcnt, c4r, k4r"""
QUERIES["graphlet_census"] = q_graphlet_census


# --------------------------------------------------- pivot / crosstab

EVENT_TYPES = ["click", "error", "purchase", "signup", "view"]


def q_event_pivot(spark, sf_dir):
    """Crosstab: per user-id bucket (user_id % 16), one COLUMN per event
    type — Spark's groupBy().pivot() with the value list pinned (never
    let pivot scan for distinct values at 100 TB; the pinned list also
    keeps the output schema static for the gate)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    out = (
        ev.withColumn("ubucket", F.col("user_id") % 16)
        .groupBy("ubucket")
        .pivot("event_type", EVENT_TYPES)
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "ubucket",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(f"n_{t}") for t in EVENT_TYPES],
    )


ORACLE["event_pivot"] = """
SELECT user_id % 16 AS ubucket,
       CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT) AS n_click,
       CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT) AS n_error,
       CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT) AS n_purchase,
       CAST(COUNT(*) FILTER (WHERE event_type = 'signup') AS BIGINT) AS n_signup,
       CAST(COUNT(*) FILTER (WHERE event_type = 'view') AS BIGINT) AS n_view
FROM events GROUP BY 1"""
QUERIES["event_pivot"] = q_event_pivot


# --------------------------------------------------- attribute assortativity


def q_attr_assortativity(spark, sf_dir):
    """Categorical class-mixing assortativity over c(v) = v mod 8."""
    from .graph import attribute_assortativity

    return attribute_assortativity(load_edges(spark, sf_dir), classes=8)


ORACLE["attr_assortativity"] = f"""
WITH edges AS MATERIALIZED ({EDGES_SQL}),
und AS MATERIALIZED ({UND_SQL}),
nm AS (SELECT src % 8 AS ci, dst % 8 AS cj, COUNT(*) AS n
       FROM und GROUP BY 1, 2),
t AS (SELECT SUM(n) AS t FROM nm),
s1 AS (SELECT COALESCE(SUM(n), 0) AS s1 FROM nm WHERE ci = cj),
s2 AS (SELECT SUM(rs * rs) AS s2 FROM
       (SELECT ci, SUM(n) AS rs FROM nm GROUP BY ci))
SELECT CAST(8 AS BIGINT) AS n_classes,
       CAST(t.t AS BIGINT) AS t_ends,
       ROUND((CAST(t.t AS DOUBLE) * s1.s1 - s2.s2)
             / (CAST(t.t AS DOUBLE) * t.t - s2.s2), 6) AS r
FROM t, s1, s2"""
QUERIES["attr_assortativity"] = q_attr_assortativity


# --------------------------------------------------- event anomaly z-scores

ANOMALY_Z = 2.0


def q_event_anomalies(spark, sf_dir):
    """Windows where an event type's count is ≥2σ from that type's
    per-window mean — the alerting rollup over the tumbling-window
    counts. z is exact-integer algebra until one sqrt+divide
    (the standardize_embeddings identity with q = the BIGINT count):
    z = (n·B − S)/√(B·S2 − S²) over the type's B observed windows."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    counts = (
        ev.withColumn(
            "bucket",
            (F.col("ts").cast("timestamp").cast("long") / 300).cast("long"),
        )
        .groupBy("bucket", "event_type")
        .agg(F.count("*").alias("n"))
    )
    stats = counts.groupBy("event_type").agg(
        F.count("*").alias("b"),
        F.sum("n").alias("s"),
        F.sum(F.col("n") * F.col("n")).alias("s2"),
    )
    var_num = (F.col("b") * F.col("s2") - F.col("s") * F.col("s")).cast("double")
    scored = counts.join(F.broadcast(stats), "event_type").select(
        "bucket",
        "event_type",
        "n",
        F.when(
            var_num > 0,
            F.round(
                (F.col("n") * F.col("b") - F.col("s")).cast("double")
                / F.sqrt(var_num),
                6,
            ),
        )
        .otherwise(F.lit(0.0))
        .alias("z"),
    )
    return scored.filter(F.abs(F.col("z")) >= ANOMALY_Z)


ORACLE["event_anomalies"] = f"""
WITH counts AS (
  SELECT CAST(CAST(floor(epoch(ts)) AS BIGINT) // 300 AS BIGINT) AS bucket,
         event_type, COUNT(*) AS n
  FROM events GROUP BY 1, 2),
st AS (SELECT event_type, COUNT(*) AS b, SUM(n) AS s, SUM(n * n) AS s2
       FROM counts GROUP BY event_type)
SELECT bucket, event_type, CAST(n AS BIGINT) AS n, z FROM (
  SELECT c.bucket, c.event_type, c.n,
         CASE WHEN CAST(st.b * st.s2 - st.s * st.s AS DOUBLE) > 0
              THEN ROUND(CAST(c.n * st.b - st.s AS DOUBLE)
                         / sqrt(CAST(st.b * st.s2 - st.s * st.s AS DOUBLE)), 6)
              ELSE 0e0 END AS z
  FROM counts c JOIN st ON st.event_type = c.event_type)
WHERE abs(z) >= {ANOMALY_Z}"""
QUERIES["event_anomalies"] = q_event_anomalies


# --------------------------------------------------- rank agreement

RANKCMP_K = 100


def q_rank_agreement(spark, sf_dir):
    """How much of PageRank does plain in-degree already buy? Top-K set
    overlap + Spearman-footrule displacement between the two rankings —
    the standard cheap-centrality-proxy evaluation. Both top-K cuts are
    distributed TakeOrdered with full deterministic keys; the position
    windows run over the two ≤K-row frames only."""
    from pyspark.sql import Window

    pr = (
        q_pagerank(spark, sf_dir)
        .orderBy(F.desc("rank_scaled"), F.asc("id"))
        .limit(RANKCMP_K)
        .withColumn(
            "pos_pr",
            F.row_number().over(
                Window.orderBy(F.desc("rank_scaled"), F.asc("id"))
            ),
        )
        .select("id", "pos_pr")
    )
    deg = (
        load_edges(spark, sf_dir)
        .groupBy(F.col("dst").alias("id"))
        .agg(F.count("*").alias("ind"))
        .orderBy(F.desc("ind"), F.asc("id"))
        .limit(RANKCMP_K)
        .withColumn(
            "pos_deg",
            F.row_number().over(Window.orderBy(F.desc("ind"), F.asc("id"))),
        )
        .select("id", "pos_deg")
    )
    j = pr.join(deg, "id")
    return j.agg(
        F.lit(RANKCMP_K).cast("long").alias("k"),
        F.count("*").cast("long").alias("overlap"),
        F.coalesce(
            F.sum(F.abs(F.col("pos_pr") - F.col("pos_deg"))), F.lit(0)
        ).cast("long").alias("footrule"),
    )


def _rank_agreement_sql() -> str:
    chain = _pagerank_sql()
    body = chain[: chain.rindex("\nSELECT id, ROUND")]
    return (
        body
        + f""",
prk AS (
  SELECT id, ROW_NUMBER() OVER (ORDER BY rs DESC, id ASC) AS pos_pr FROM (
    SELECT id, ROUND(rank * (SELECT n FROM nn), 6) AS rs FROM r{PR_ITERS}
    ORDER BY rs DESC, id ASC LIMIT {RANKCMP_K})),
dg AS (
  SELECT id, ROW_NUMBER() OVER (ORDER BY ind DESC, id ASC) AS pos_deg FROM (
    SELECT dst AS id, COUNT(*) AS ind FROM edges GROUP BY dst
    ORDER BY ind DESC, id ASC LIMIT {RANKCMP_K}))
SELECT CAST({RANKCMP_K} AS BIGINT) AS k,
       CAST(COUNT(*) AS BIGINT) AS overlap,
       CAST(COALESCE(SUM(ABS(prk.pos_pr - dg.pos_deg)), 0) AS BIGINT)
         AS footrule
FROM prk JOIN dg ON dg.id = prk.id"""
    )


ORACLE["rank_agreement"] = _rank_agreement_sql()
QUERIES["rank_agreement"] = q_rank_agreement


# --------------------------------------------------- degree relabeling


def q_relabel_by_degree(spark, sf_dir):
    """Hubs-first dense id map (WebGraph/BV compression prestep)."""
    from .graph import relabel_by_degree

    return relabel_by_degree(load_edges(spark, sf_dir))


ORACLE["relabel_by_degree"] = f"""
WITH edges AS MATERIALIZED ({EDGES_SQL}),
nodes AS MATERIALIZED ({NODES_SQL}),
und AS MATERIALIZED ({UND_SQL}),
deg AS (SELECT src AS id, COUNT(*) AS d FROM und GROUP BY src)
SELECT n.id,
       CAST(ROW_NUMBER() OVER (ORDER BY COALESCE(g.d, 0) DESC, n.id ASC) - 1
            AS BIGINT) AS new_id
FROM nodes n LEFT JOIN deg g ON g.id = n.id"""
QUERIES["relabel_by_degree"] = q_relabel_by_degree


# ----------------------------------------------- induced graphlet census


def q_graphlet_census_induced(spark, sf_dir):
    """Induced 4-node graphlet counts (integer containment-matrix inverse
    applied to the non-induced census)."""
    from .operators.triangles import graphlet_census_induced

    return graphlet_census_induced(load_edges(spark, sf_dir))


ORACLE["graphlet_census_induced"] = f"""
WITH g AS MATERIALIZED ({ORACLE["graphlet_census"]})
SELECT CAST(claws - tailed_triangles + 2 * diamonds - 4 * four_cliques
            AS BIGINT) AS claws_ind,
       CAST(paths3 - 2 * tailed_triangles - 4 * four_cycles + 6 * diamonds
            - 12 * four_cliques AS BIGINT) AS paths3_ind,
       CAST(tailed_triangles - 4 * diamonds + 12 * four_cliques
            AS BIGINT) AS tailed_ind,
       CAST(four_cycles - diamonds + 3 * four_cliques AS BIGINT)
         AS cycles4_ind,
       CAST(diamonds - 6 * four_cliques AS BIGINT) AS diamonds_ind,
       four_cliques AS cliques4_ind
FROM g"""
QUERIES["graphlet_census_induced"] = q_graphlet_census_induced


# --------------------------------------------------- TPC-H Q17

Q17_BRAND = "Brand#2"


def q_tpch_q17(spark, sf_dir):
    """TPC-H Q17 shape (small-quantity-order revenue): the correlated
    per-group scalar subquery — avg quantity per part — computed ONCE as
    a map-side-combinable rollup and joined back (never a per-row
    subquery). Decimal-exact revenue; the 0.2·avg threshold is the same
    IEEE double both engines derive from exact integer sums."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_brand") == Q17_BRAND
    )
    pa = li.groupBy("l_partkey").agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("_t")
    )
    dec = F.col("l_extendedprice").cast("decimal(18,4)")
    return (
        li.join(part, li["l_partkey"] == part["p_partkey"])
        .join(pa, "l_partkey")
        .filter(F.col("l_quantity") < F.col("_t"))
        .agg(
            F.count("*").cast("long").alias("n_items"),
            F.round((F.sum(dec) / F.lit(7.0)).cast("double"), 4).alias(
                "avg_yearly"
            ),
        )
    )


ORACLE["tpch_q17"] = f"""
WITH pa AS (
  SELECT l_partkey, 0.2 * AVG(l_quantity) AS t FROM lineitem GROUP BY 1)
SELECT CAST(COUNT(*) AS BIGINT) AS n_items,
       ROUND(CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) / 7.0
                  AS DOUBLE), 4) AS avg_yearly
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey AND p.p_brand = '{Q17_BRAND}'
JOIN pa ON pa.l_partkey = l.l_partkey
WHERE l.l_quantity < pa.t"""
QUERIES["tpch_q17"] = q_tpch_q17


# --------------------------------------------------- Dirichlet energy


def q_dirichlet_energy(spark, sf_dir):
    """Graph-signal smoothness — the Laplacian quadratic form
    E(x) = Σ_{(u,v)∈und} (x_u − x_v)² for the node signal x(v) =
    embedding[v mod |emb|].dim0 (feature-hashed lookup — the standard
    trick when the feature table is smaller than the id space). The
    graph-signal-processing primitive behind smoothing, label spreading
    and GNN over-smoothing diagnostics. Exact micro-int arithmetic:
    (q_u − q_v)² summed as BIGINTs, ONE divide at the end.

    Plan: V-row signal build (one broadcast-able embedding join), one
    E-row und join against it (twice — both endpoints), map-side
    combinable sum."""
    edges = load_edges(spark, sf_dir)
    from .graph import symmetrize

    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id",
        F.round(F.element_at(F.col("embedding").cast("array<double>"), 1) * 1e6)
        .cast("long")
        .alias("q"),
    )
    n_emb = emb.count()
    und = symmetrize(edges).filter(F.col("src") < F.col("dst"))
    sig = und.select("src", "dst", (F.col("src") % n_emb).alias("_ku"),
                     (F.col("dst") % n_emb).alias("_kv"))
    ju = sig.join(emb.select(F.col("vec_id").alias("_ku"), F.col("q").alias("qu")), "_ku")
    jv = ju.join(emb.select(F.col("vec_id").alias("_kv"), F.col("q").alias("qv")), "_kv")
    d = F.col("qu") - F.col("qv")
    return jv.agg(
        F.count("*").cast("long").alias("n_edges"),
        F.round(
            (F.sum(d * d) / F.lit(1e12)).cast("double"), 6
        ).alias("energy"),
    )


def _dirichlet_sql() -> str:
    return f"""
WITH edges AS MATERIALIZED ({EDGES_SQL}),
und AS MATERIALIZED (
  SELECT src, dst FROM ({UND_SQL}) WHERE src < dst),
emb AS (
  SELECT vec_id,
         CAST(ROUND(CAST(embedding[1] AS DOUBLE) * 1000000.0) AS BIGINT) AS q
  FROM embeddings),
ne AS (SELECT COUNT(*) AS n FROM emb)
SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
       ROUND(CAST(SUM((a.q - b.q) * (a.q - b.q)) AS DOUBLE)
             / 1000000000000.0, 6) AS energy
FROM und u
JOIN emb a ON a.vec_id = u.src % (SELECT n FROM ne)
JOIN emb b ON b.vec_id = u.dst % (SELECT n FROM ne)"""


ORACLE["dirichlet_energy"] = _dirichlet_sql()
QUERIES["dirichlet_energy"] = q_dirichlet_energy


# ------------------------------------------------- round-5e: ego / weighted /
# diffusion / inequality kernels


def q_scan_statistic(spark, sf_dir):
    """Priebe scan statistic: edges in each node's closed 1-hop ego net."""
    from .operators.linkpred import scan_statistic

    return scan_statistic(load_edges(spark, sf_dir))


ORACLE["scan_statistic"] = f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
und AS MATERIALIZED ({UND_SQL}),
ordered AS MATERIALIZED (SELECT src, dst FROM und WHERE src < dst),
deg AS (SELECT src AS id, COUNT(*) AS deg FROM und GROUP BY src),
tris AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM ordered e1 JOIN ordered e2 ON e1.dst = e2.src
  JOIN ordered e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
corners AS (
  SELECT a AS id FROM tris UNION ALL SELECT b FROM tris UNION ALL SELECT c FROM tris
),
tpn AS (SELECT id, COUNT(*) AS t FROM corners GROUP BY id)
SELECT d.id,
       CAST(d.deg AS BIGINT) AS degree,
       CAST(COALESCE(t.t, 0) AS BIGINT) AS triangles,
       CAST(d.deg + COALESCE(t.t, 0) AS BIGINT) AS scan_stat,
       ROUND(CASE WHEN d.deg >= 1
                  THEN (d.deg + COALESCE(t.t, 0)) / ((d.deg + 1) * d.deg / 2.0)
                  ELSE 0e0 END, 6) AS ego_density
FROM deg d LEFT JOIN tpn t ON d.id = t.id"""

QUERIES["scan_statistic"] = q_scan_statistic


def q_weighted_clustering(spark, sf_dir):
    """Onnela weighted local clustering over the synthetic edge weights."""
    from .graph import with_synthetic_weights
    from .operators.linkpred import weighted_clustering

    return weighted_clustering(with_synthetic_weights(load_edges(spark, sf_dir)))


ORACLE["weighted_clustering"] = f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
dw AS (SELECT src, dst, 1.0 + ((src * 31 + dst) % 100) / 100.0 AS w FROM edges),
undw AS MATERIALIZED (
  SELECT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst, MAX(w) AS w
  FROM dw GROUP BY 1, 2),
mx AS (SELECT MAX(w) AS wmax FROM undw),
deg AS (SELECT id, COUNT(*) AS deg FROM (
  SELECT src AS id FROM undw UNION ALL SELECT dst FROM undw) GROUP BY id),
e AS MATERIALIZED (
  SELECT src, dst, w / (SELECT wmax FROM mx) AS w FROM undw),
tris AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c,
         cbrt(e1.w * e2.w * e3.w) AS term
  FROM e e1 JOIN e e2 ON e1.dst = e2.src
  JOIN e e3 ON e3.src = e1.src AND e3.dst = e2.dst),
corners AS (
  SELECT a AS id, term FROM tris
  UNION ALL SELECT b, term FROM tris
  UNION ALL SELECT c, term FROM tris),
s AS (SELECT id, SUM(term) AS s FROM corners GROUP BY id)
SELECT d.id, CAST(d.deg AS BIGINT) AS degree,
       ROUND(CASE WHEN d.deg >= 2
                  THEN 2.0 * COALESCE(s.s, 0) / (d.deg * (d.deg - 1))
                  ELSE 0e0 END, 6) AS w_clustering
FROM deg d LEFT JOIN s ON s.id = d.id"""

QUERIES["weighted_clustering"] = q_weighted_clustering


HEAT_T = 3.0
HEAT_K = 6


def q_heat_kernel(spark, sf_dir):
    """Chung's heat-kernel pagerank, K-term Taylor truncation — exact
    cross-engine by construction (both sides sum the same K terms)."""
    from .operators.diffusion import heat_kernel_pagerank

    return heat_kernel_pagerank(load_edges(spark, sf_dir), t=HEAT_T, taylor_k=HEAT_K)


def _heat_sql() -> str:
    from .operators.diffusion import heat_coefficients

    coef = heat_coefficients(HEAT_T, HEAT_K)
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "od AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src)",
        "x0 AS (SELECT id, 1.0 / (SELECT n FROM nn) AS x FROM nodes)",
    ]
    for k in range(1, HEAT_K + 1):
        ctes.append(
            f"""x{k} AS MATERIALIZED (
  SELECT t.id, COALESCE(c.v, 0e0) AS x FROM nodes t LEFT JOIN (
    SELECT e.dst AS id, SUM(x.x / od.od) AS v
    FROM edges e JOIN od ON od.src = e.src JOIN x{k - 1} x ON x.id = e.src
    GROUP BY e.dst) c ON c.id = t.id)"""
        )
    # left-to-right accumulation matches the Spark loop's h += coef_k·x_k
    acc = f"{coef[0]!r} * x0.x"
    joins = ""
    for k in range(1, HEAT_K + 1):
        acc = f"({acc} + {coef[k]!r} * x{k}.x)"
        joins += f" JOIN x{k} ON x{k}.id = x0.id"
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT x0.id, ROUND({acc} * (SELECT n FROM nn), 6) AS heat_scaled
FROM x0{joins}"""
    )


ORACLE["heat_kernel"] = _heat_sql()
QUERIES["heat_kernel"] = q_heat_kernel


def q_degree_gini(spark, sf_dir):
    """Gini coefficient of the undirected degree distribution."""
    from .graph import degree_gini

    return degree_gini(load_edges(spark, sf_dir))


ORACLE["degree_gini"] = f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
und AS ({UND_SQL}),
deg AS (SELECT src AS id, COUNT(*) AS deg FROM und GROUP BY src),
hist AS (SELECT deg, COUNT(*) AS c FROM deg GROUP BY deg),
blocks AS (
  SELECT deg, c,
         COALESCE(SUM(c) OVER (ORDER BY deg
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS s
  FROM hist)
SELECT CAST(SUM(c) AS BIGINT) AS n_nodes,
       CAST(SUM(deg * c) AS BIGINT) AS total_degree,
       ROUND(2.0 * SUM(deg * (c * s + c * (c + 1) / 2.0))
               / (SUM(c) * SUM(deg * c))
             - (SUM(c) + 1.0) / SUM(c), 6) AS gini
FROM blocks"""

QUERIES["degree_gini"] = q_degree_gini


def q_tpch_q14(spark, sf_dir):
    """TPC-H Q14 shape (promo revenue share): conditional aggregate ratio
    over a date-sliced fact⨝dim join — part is the broadcast side."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    rev = F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        )
        .join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .agg(
            F.round(
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0.0)))
                / F.sum(rev),
                6,
            ).alias("promo_revenue")
        )
    )


ORACLE["tpch_q14"] = """SELECT
  ROUND(100.0 * SUM(CASE WHEN p_type = 'PROMO'
                         THEN l_extendedprice * (1 - l_discount)
                         ELSE 0 END)
        / SUM(l_extendedprice * (1 - l_discount)), 6) AS promo_revenue
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= DATE '1996-01-01' AND l_shipdate < DATE '1997-01-01'"""

QUERIES["tpch_q14"] = q_tpch_q14


Q22_PRICE = 350_000.0


def q_tpch_q22(spark, sf_dir):
    """TPC-H Q22 shape (global-customer analysis): scalar AVG subquery
    threshold + NOT EXISTS anti-join + group aggregate. Adapted to the
    synthetic schema: 'has never placed a big order' stands in for the
    canonical 'has no orders' (every synthetic customer has orders)."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    avg_bal = (
        cust.filter(F.col("c_acctbal") > 0.0)
        .agg(F.avg("c_acctbal").alias("a"))
    )
    big = orders.filter(F.col("o_totalprice") > Q22_PRICE).select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("a"))
        .join(big, cust["c_custkey"] == big["o_custkey"], "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("numcust"),
            F.round(F.sum("c_acctbal"), 2).alias("totacctbal"),
        )
    )


ORACLE["tpch_q22"] = f"""SELECT c_mktsegment,
       CAST(COUNT(*) AS BIGINT) AS numcust,
       ROUND(SUM(c_acctbal), 2) AS totacctbal
FROM customer c
WHERE c_acctbal > (SELECT AVG(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_totalprice > {Q22_PRICE!r})
GROUP BY c_mktsegment"""

QUERIES["tpch_q22"] = q_tpch_q22


# ------------------------------------------------- round-5g: landmark
# distance sketches


LMK_K = 8       # landmarks (top-degree pick, Potamias et al.)
LMK_QUERY = 24  # query set: all pairs over ids < LMK_QUERY


def q_landmark_distances(spark, sf_dir):
    """ALT-style landmark distance bounds: one K-root multi-source BFS
    precomputes the sketch; every pair query is a K-row join."""
    from .operators.traversal import landmark_distances

    return landmark_distances(
        load_edges(spark, sf_dir),
        k_landmarks=LMK_K,
        query_ids=list(range(LMK_QUERY)),
    )


def _landmark_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"und AS MATERIALIZED ({UND_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "deg AS (SELECT src AS id, COUNT(*) AS deg FROM und GROUP BY src)",
        f"lmk AS MATERIALIZED (SELECT id AS root FROM deg "
        f"ORDER BY deg DESC, id ASC LIMIT {LMK_K})",
        "m0 AS MATERIALIZED (SELECT l.root, n.id, "
        "CASE WHEN n.id = l.root THEN 0 END AS depth "
        "FROM nodes n CROSS JOIN lmk l)",
    ]
    for i in range(1, BFS_UNROLL + 1):
        ctes.append(
            f"""m{i} AS MATERIALIZED (
  SELECT p.root, p.id,
         CASE WHEN c.cand IS NULL THEN p.depth
              WHEN p.depth IS NULL OR c.cand < p.depth THEN c.cand
              ELSE p.depth END AS depth
  FROM m{i-1} p LEFT JOIN (
    SELECT q.root, e.dst AS id, MIN(q.depth + 1) AS cand
    FROM m{i-1} q JOIN und e ON e.src = q.id
    WHERE q.depth IS NOT NULL GROUP BY q.root, e.dst
  ) c ON p.root = c.root AND p.id = c.id
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f""",
sk AS (SELECT root, id, depth FROM m{BFS_UNROLL}
       WHERE depth IS NOT NULL AND id < {LMK_QUERY})
SELECT a.id AS u, b.id AS v,
       CAST(MAX(ABS(a.depth - b.depth)) AS BIGINT) AS lower,
       CAST(MIN(a.depth + b.depth) AS BIGINT) AS upper,
       CAST(COUNT(*) AS BIGINT) AS n_landmarks
FROM sk a JOIN sk b ON a.root = b.root AND a.id < b.id
GROUP BY a.id, b.id"""
    )


ORACLE["landmark_distances"] = _landmark_sql()
QUERIES["landmark_distances"] = q_landmark_distances


def q_clique_percolation(spark, sf_dir):
    """Palla k=3 clique-percolation: overlapping communities = CC over the
    triangle edge-overlap graph; (id, community) rows, hubs in several."""
    from .operators.components import clique_percolation

    return clique_percolation(load_edges(spark, sf_dir))


CPM_CC_UNROLL = 32  # link-graph diameter ~2x the node graph's; 16 under-merges


def _cpm_sql() -> str:
    b = 1 << 31
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"und AS MATERIALIZED ({UND_SQL})",
        "ordered AS MATERIALIZED (SELECT src, dst FROM und WHERE src < dst)",
        f"""tris AS MATERIALIZED (
  SELECT e1.src * {b} + e1.dst AS ab,
         e2.src * {b} + e2.dst AS bc,
         e1.src * {b} + e2.dst AS ac
  FROM ordered e1 JOIN ordered e2 ON e1.dst = e2.src
  JOIN ordered e3 ON e3.src = e1.src AND e3.dst = e2.dst)""",
        """links AS MATERIALIZED (
  SELECT ab AS src, bc AS dst FROM tris
  UNION ALL SELECT bc, ac FROM tris
  UNION ALL SELECT ab, ac FROM tris)""",
        """lund AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM links UNION ALL SELECT dst AS src, src AS dst FROM links
  ) WHERE src <> dst)""",
        """lnodes AS MATERIALIZED (SELECT DISTINCT id FROM (
  SELECT src AS id FROM links UNION ALL SELECT dst FROM links))""",
        "c0 AS MATERIALIZED (SELECT id, id AS component FROM lnodes)",
    ]
    for i in range(1, CPM_CC_UNROLL + 1):
        ctes.append(
            f"""c{i} AS MATERIALIZED (
  SELECT c.id,
         CASE WHEN m.nmin IS NOT NULL AND m.nmin < c.component
              THEN m.nmin ELSE c.component END AS component
  FROM c{i-1} c LEFT JOIN (
    SELECT u.dst AS id, MIN(p.component) AS nmin
    FROM c{i-1} p JOIN lund u ON u.src = p.id
    GROUP BY u.dst
  ) m ON c.id = m.id
)"""
        )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT DISTINCT x.id, c.component AS community
FROM c{CPM_CC_UNROLL} c CROSS JOIN LATERAL (VALUES (c.id // {b}), (c.id % {b})) AS x(id)"""
    )


ORACLE["clique_percolation"] = _cpm_sql()
QUERIES["clique_percolation"] = q_clique_percolation


def q_partition_nmi(spark, sf_dir):
    """Danon-style NMI between the CC partition and the 5-round LP
    labeling — the standard partition-agreement score, integer-micro-nat
    exact (how much of the component structure LP recovers)."""
    from .operators.components import (
        connected_components,
        label_propagation,
        partition_nmi,
    )

    e = load_edges(spark, sf_dir)
    return partition_nmi(
        connected_components(e),
        label_propagation(e, max_iter=LP_ITERS),
        label_x="component",
        label_y="label",
    )


def _nmi_sql() -> str:
    shared = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        f"und AS MATERIALIZED ({UND_SQL})",
        "c0 AS MATERIALIZED (SELECT id, id AS component FROM nodes)",
        "l0 AS MATERIALIZED (SELECT id, id AS label FROM nodes)",
    ]
    for i in range(1, CC_UNROLL + 1):
        shared.append(
            f"""c{i} AS MATERIALIZED (
  SELECT c.id,
         CASE WHEN m.nmin IS NOT NULL AND m.nmin < c.component
              THEN m.nmin ELSE c.component END AS component
  FROM c{i-1} c LEFT JOIN (
    SELECT u.dst AS id, MIN(p.component) AS nmin
    FROM c{i-1} p JOIN und u ON u.src = p.id
    GROUP BY u.dst
  ) m ON c.id = m.id
)"""
        )
    for i in range(1, LP_ITERS + 1):
        shared.append(
            f"""l{i} AS MATERIALIZED (
  SELECT p.id, COALESCE(v.label, p.label) AS label
  FROM l{i-1} p LEFT JOIN (
    SELECT id, label FROM (
      SELECT u.dst AS id, q.label, COUNT(*) AS cnt,
             ROW_NUMBER() OVER (PARTITION BY u.dst
                                ORDER BY COUNT(*) DESC, q.label ASC) AS rn
      FROM l{i-1} q JOIN und u ON u.src = q.id
      GROUP BY u.dst, q.label
    ) WHERE rn = 1
  ) v ON p.id = v.id
)"""
        )
    shared.append(
        f"""joint AS MATERIALIZED (
  SELECT c.component AS lx, l.label AS ly, COUNT(*) AS c
  FROM c{CC_UNROLL} c JOIN l{LP_ITERS} l ON l.id = c.id
  GROUP BY 1, 2)"""
    )
    mn = "CAST(ROUND({0} * ln({0}) * 1000000.0) AS BIGINT)"
    shared.append(
        f"""agg AS (
  SELECT SUM({mn.format("CAST(c AS DOUBLE)")}) AS a, SUM(c) AS n FROM joint),
bm AS (SELECT SUM({mn.format("CAST(m AS DOUBLE)")}) AS b FROM (
  SELECT SUM(c) AS m FROM joint GROUP BY lx)),
cm AS (SELECT SUM({mn.format("CAST(m AS DOUBLE)")}) AS cc FROM (
  SELECT SUM(c) AS m FROM joint GROUP BY ly))"""
    )
    return (
        "WITH "
        + ",\n".join(shared)
        + """
SELECT CAST(n AS BIGINT) AS n_nodes,
       ROUND(ln(n) - b / n * 1e-6, 6) AS h_x,
       ROUND(ln(n) - cc / n * 1e-6, 6) AS h_y,
       ROUND((a - b - cc) / n * 1e-6 + ln(n), 6) AS mutual_info,
       ROUND(CASE WHEN (ln(n) - b / n * 1e-6) + (ln(n) - cc / n * 1e-6) > 0
                  THEN 2.0 * ((a - b - cc) / n * 1e-6 + ln(n))
                       / ((ln(n) - b / n * 1e-6) + (ln(n) - cc / n * 1e-6))
                  ELSE 1.0 END, 6) AS nmi
FROM agg CROSS JOIN bm CROSS JOIN cm"""
    )


ORACLE["partition_nmi"] = _nmi_sql()
QUERIES["partition_nmi"] = q_partition_nmi


# --------------------------------------------------------------- TPC-H Q10

Q10_LO, Q10_HI = "1996-01-01", "1996-07-01"


def q_tpch_q10(spark, sf_dir):
    """TPC-H Q10 shape (returned-item revenue ranking): 4-way join with a
    half-year order window and returnflag filter, decimal-exact revenue,
    top-20 customers by (revenue desc, custkey) — full ordering key shared
    with the oracle so the LIMIT cut is deterministic. The nation dim is
    broadcast; orders⨝lineitem shuffles on the shared orderkey."""
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    nation = spark.read.parquet(f"{sf_dir}/nation.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate") >= F.lit(Q10_LO)) & (F.col("o_orderdate") < F.lit(Q10_HI))
    )
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        F.col("l_returnflag") == "R"
    )
    dec = lambda c: F.col(c).cast("decimal(18,4)")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(
            F.sum(
                (
                    dec("l_extendedprice")
                    * (F.lit(1).cast("decimal(18,4)") - dec("l_discount"))
                ).cast("decimal(28,8)")
            )
            .cast("double")
            .alias("revenue")
        )
        .select(
            "c_custkey",
            "c_name",
            F.round("revenue", 4).alias("revenue"),
            F.round("c_acctbal", 4).alias("c_acctbal"),
            "n_name",
        )
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


ORACLE["tpch_q10"] = f"""
WITH rev AS (
  SELECT c.c_custkey, c.c_name, c.c_acctbal, n.n_name,
         CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                  * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))
                  AS DECIMAL(28,8))) AS DOUBLE) AS revenue
  FROM lineitem l
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n ON c.c_nationkey = n.n_nationkey
  WHERE l.l_returnflag = 'R'
    AND o.o_orderdate >= TIMESTAMP '{Q10_LO} 00:00:00'
    AND o.o_orderdate < TIMESTAMP '{Q10_HI} 00:00:00'
  GROUP BY c.c_custkey, c.c_name, c.c_acctbal, n.n_name)
SELECT c_custkey, c_name, ROUND(revenue, 4) AS revenue,
       ROUND(c_acctbal, 4) AS c_acctbal, n_name
FROM rev ORDER BY revenue DESC, c_custkey ASC LIMIT 20"""
QUERIES["tpch_q10"] = q_tpch_q10


# --------------------------------------------- topic-sensitive PageRank

TSPR_TOPICS = 4
TSPR_MOD = 64
TSPR_ITERS = 8


def q_topic_pagerank(spark, sf_dir):
    """Haveliwala topic-sensitive PageRank: 4 seeded teleport vectors
    (seeds = id ≡ t mod 64) batched through ONE gather join per iteration."""
    from .operators.pagerank import topic_sensitive_pagerank

    out = topic_sensitive_pagerank(
        load_edges(spark, sf_dir),
        topic_of=F.when(
            (F.col("id") % TSPR_MOD) < TSPR_TOPICS, F.col("id") % TSPR_MOD
        ),
        n_topics=TSPR_TOPICS,
        max_iter=TSPR_ITERS,
    )
    n = out.count()  # scale like the other rank gates (V known: reuse rows)
    return out.select(
        "id",
        *[
            F.round(F.col(f"r{t}") * F.lit(float(n)), 6).alias(f"r{t}")
            for t in range(TSPR_TOPICS)
        ],
    )


def _topic_pagerank_sql(iters: int = TSPR_ITERS) -> str:
    K, MOD = TSPR_TOPICS, TSPR_MOD
    base = repr(1.0 - DAMPING)
    d = repr(DAMPING)
    e_cols = ",\n         ".join(
        f"CASE WHEN nodes.id % {MOD} = {t}"
        f" THEN 1e0/(SELECT c FROM sz WHERE t = {t}) ELSE 0e0 END AS e{t}"
        for t in range(K)
    )
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS od FROM edges GROUP BY src)",
        f"sz AS MATERIALIZED (SELECT id % {MOD} AS t, COUNT(*) AS c"
        f" FROM nodes WHERE id % {MOD} < {K} GROUP BY 1)",
        f"e AS MATERIALIZED (SELECT nodes.id,\n         {e_cols}\n  FROM nodes)",
        "r0 AS MATERIALIZED (SELECT id, "
        + ", ".join(f"e{t} AS r{t}" for t in range(K))
        + " FROM e)",
    ]
    for i in range(1, iters + 1):
        sums = ", ".join(
            f"SUM(r.r{t} * (1e0 / d.od)) AS c{t}" for t in range(K)
        )
        upds = ",\n         ".join(
            f"CAST({base} AS DOUBLE) * e.e{t}"
            f" + CAST({d} AS DOUBLE) * COALESCE(c.c{t}, 0e0) AS r{t}"
            for t in range(K)
        )
        ctes.append(
            f"""r{i} AS MATERIALIZED (
  SELECT e.id,
         {upds}
  FROM e LEFT JOIN (
    SELECT ed.dst AS id, {sums}
    FROM r{i-1} r JOIN edges ed ON ed.src = r.id JOIN deg d ON d.id = r.id
    GROUP BY ed.dst
  ) c ON e.id = c.id)"""
        )
    outs = ", ".join(
        f"ROUND(r{t} * (SELECT n FROM nn), 6) AS r{t}" for t in range(K)
    )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, {outs} FROM r{iters}"


ORACLE["topic_pagerank"] = _topic_pagerank_sql()
QUERIES["topic_pagerank"] = q_topic_pagerank


# --------------------------------------- normalized spectral bisection


def q_fiedler_normalized(spark, sf_dir):
    """Normalized-Laplacian Fiedler vector (Shi–Malik) — power iteration
    on I + D^{-1/2}AD^{-1/2} with exact D^{1/2}·1 deflation, 10 steps."""
    from .operators.spectral import fiedler_vector_normalized

    v = fiedler_vector_normalized(load_edges(spark, sf_dir), max_iter=FIEDLER_ITERS)
    return v.select("id", F.round("nfiedler", 6).alias("nfiedler"))


def _fiedler_normalized_sql(iters: int = FIEDLER_ITERS) -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"und AS MATERIALIZED ({UND_SQL})",
        "deg AS MATERIALIZED (SELECT src AS id, CAST(COUNT(*) AS DOUBLE) AS d"
        " FROM und GROUP BY src)",
        "s2 AS (SELECT SUM(d) AS v FROM deg)",
        "x0 AS MATERIALIZED (SELECT id, d, SQRT(d) AS sd,"
        " CAST((id * 2654435761) % 1048576 AS DOUBLE)/1048576e0 - 0.5e0 AS x"
        " FROM deg)",
    ]
    for i in range(1, iters + 1):
        pr = f"((SELECT syd FROM st{i}) / (SELECT v FROM s2))"
        ctes.append(
            f"""y{i} AS (
  SELECT s.id, s.d, s.sd, s.x + COALESCE(g.g, 0e0) / s.sd AS y
  FROM x{i-1} s LEFT JOIN (
    SELECT u.dst AS id, SUM(s2x.x / s2x.sd) AS g
    FROM x{i-1} s2x JOIN und u ON u.src = s2x.id GROUP BY u.dst
  ) g ON g.id = s.id),
st{i} AS (SELECT SUM(y*sd) AS syd, SUM(y*y) AS syy FROM y{i}),
x{i} AS MATERIALIZED (
  SELECT id, d, sd,
         (y - {pr} * sd)
         / SQRT((SELECT syy FROM st{i})
                - 2e0 * {pr} * (SELECT syd FROM st{i})
                + ({pr} * {pr}) * (SELECT v FROM s2)) AS x
  FROM y{i})"""
        )
    ctes.append(
        f"sgn AS (SELECT CASE WHEN x >= 0e0 THEN 1e0 ELSE -1e0 END AS s"
        f" FROM x{iters} ORDER BY ABS(x) DESC, id LIMIT 1)"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(x * (SELECT s FROM sgn), 6) AS nfiedler FROM x{iters}"
    )


ORACLE["fiedler_normalized"] = _fiedler_normalized_sql()
QUERIES["fiedler_normalized"] = q_fiedler_normalized


# ------------------------------------------------- SimRank (Jeh-Widom)

SIMRANK_C = 0.8
SIMRANK_TOP_K = 200


def q_simrank(spark, sf_dir):
    """Two SimRank iterations (Jeh & Widom 2002) refined over the top-K
    co-cited candidate pairs — the recursive deepening of q_cocitation.
    Uncapped wedges so the oracle sees identical pairs; the candidate cut
    is integer-exact (strength DESC, a, b)."""
    from .operators.simrank import simrank_refine

    return simrank_refine(
        load_edges(spark, sf_dir), c=SIMRANK_C, top_k=SIMRANK_TOP_K
    )


def _simrank_sql() -> str:
    c = SIMRANK_C
    return f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
din AS MATERIALIZED (SELECT dst AS x, COUNT(*) AS d FROM edges GROUP BY dst),
cocit AS MATERIALIZED (
  SELECT e1.dst AS a, e2.dst AS b, COUNT(*) AS common
  FROM edges e1 JOIN edges e2 ON e1.src = e2.src AND e1.dst < e2.dst
  GROUP BY e1.dst, e2.dst),
s1 AS MATERIALIZED (
  SELECT co.a, co.b, {c!r} * co.common / (da.d * db.d) AS s
  FROM cocit co JOIN din da ON da.x = co.a JOIN din db ON db.x = co.b),
cand AS MATERIALIZED (
  SELECT a, b, common FROM cocit
  ORDER BY common DESC, a, b LIMIT {SIMRANK_TOP_K}),
expd AS (
  SELECT cd.a, cd.b, ea.src AS i, eb.src AS j,
         LEAST(ea.src, eb.src) AS p, GREATEST(ea.src, eb.src) AS q
  FROM cand cd JOIN edges ea ON ea.dst = cd.a JOIN edges eb ON eb.dst = cd.b),
contrib AS (
  SELECT x.a, x.b,
         SUM(CASE WHEN x.i = x.j THEN 1e0 ELSE COALESCE(s1.s, 0e0) END) AS tot
  FROM expd x LEFT JOIN s1 ON s1.a = x.p AND s1.b = x.q
  GROUP BY x.a, x.b)
SELECT cd.a, cd.b, CAST(cd.common AS BIGINT) AS common,
       ROUND({c!r} * cd.common / (da.d * db.d), 6) AS s1,
       ROUND({c!r} * ct.tot / (da.d * db.d), 6) AS s2
FROM cand cd
JOIN contrib ct ON ct.a = cd.a AND ct.b = cd.b
JOIN din da ON da.x = cd.a
JOIN din db ON db.x = cd.b"""


ORACLE["simrank"] = _simrank_sql()
QUERIES["simrank"] = q_simrank


# ------------------------------ Weisfeiler-Lehman color refinement (1-WL)

WL_ROUNDS = 3


def q_wl_refinement(spark, sf_dir):
    """1-WL structural colors after 3 rounds (in/out multisets folded into
    exact-BIGINT commutative md5-lane signatures — hub-safe, no neighbor-
    list sort; see operators/wl.py)."""
    from .operators.wl import wl_colors

    return wl_colors(load_edges(spark, sf_dir), rounds=WL_ROUNDS)


def _wl_sql() -> str:
    def lane(col: str, lo: int) -> str:
        return f"CAST(('0x' || substr({col}, {lo}, 8)) AS BIGINT)"

    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "dino AS (SELECT dst AS id, COUNT(*) AS d FROM edges GROUP BY dst)",
        "douto AS (SELECT src AS id, COUNT(*) AS d FROM edges GROUP BY src)",
        """c0 AS MATERIALIZED (
  SELECT n.id,
         md5('wl0:' || CAST(COALESCE(di.d, 0) AS VARCHAR)
             || ':' || CAST(COALESCE(dou.d, 0) AS VARCHAR)) AS color
  FROM nodes n LEFT JOIN dino di ON di.id = n.id
  LEFT JOIN douto dou ON dou.id = n.id)""",
    ]
    for r in range(1, WL_ROUNDS + 1):
        ctes.append(
            f"""h{r} AS (SELECT id, {lane('color', 1)} AS ha,
  {lane('color', 9)} AS hb FROM c{r-1}),
i{r} AS (SELECT e.dst AS id, COUNT(*) AS ic, SUM(h.ha) AS ia, SUM(h.hb) AS ib
  FROM edges e JOIN h{r} h ON h.id = e.src GROUP BY e.dst),
o{r} AS (SELECT e.src AS id, COUNT(*) AS oc, SUM(h.ha) AS oa, SUM(h.hb) AS ob
  FROM edges e JOIN h{r} h ON h.id = e.dst GROUP BY e.src),
c{r} AS MATERIALIZED (
  SELECT c.id,
         md5(c.color
             || ':' || CAST(COALESCE(i.ic, 0) AS VARCHAR)
             || ':' || CAST(COALESCE(i.ia, 0) AS VARCHAR)
             || ':' || CAST(COALESCE(i.ib, 0) AS VARCHAR)
             || ':' || CAST(COALESCE(o.oc, 0) AS VARCHAR)
             || ':' || CAST(COALESCE(o.oa, 0) AS VARCHAR)
             || ':' || CAST(COALESCE(o.ob, 0) AS VARCHAR)) AS color
  FROM c{r-1} c LEFT JOIN i{r} i ON i.id = c.id
  LEFT JOIN o{r} o ON o.id = c.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT c.id, c.color, CAST(s.n AS BIGINT) AS class_size
FROM c{WL_ROUNDS} c JOIN (
  SELECT color, COUNT(*) AS n FROM c{WL_ROUNDS} GROUP BY color
) s ON s.color = c.color"""
    )


ORACLE["wl_refinement"] = _wl_sql()
QUERIES["wl_refinement"] = q_wl_refinement


# ------------------------------------------- TPC-H Q12 / Q19 shapes


def q_tpch_q12(spark, sf_dir):
    """TPC-H Q12 shape (shipping-priority line counts): fact⨝dim join +
    per-group CASE-split counts. Adapted to the synthetic schema (no
    l_shipmode/l_commitdate): group by l_returnflag, 'late' = shipped
    more than 60 days after order date, split counts by order priority
    class — the same join + conditional-count plan as the real Q12."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias("high_line_count"),
            F.sum(F.when(hi, 0).otherwise(1)).cast("long").alias("low_line_count"),
        )
    )


ORACLE["tpch_q12"] = """SELECT
  l_returnflag,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
  CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate > o_orderdate + INTERVAL 60 DAY
GROUP BY l_returnflag"""

QUERIES["tpch_q12"] = q_tpch_q12


def q_tpch_q19(spark, sf_dir):
    """TPC-H Q19 shape (disjunctive-band revenue): OR of three
    conjunctive (brand, size-band, quantity-band) predicates over the
    fact⨝dim join — the classic test that a disjunction of sargable
    conjunctions still prunes at the scan and stays a single broadcast
    join (no union-of-three-scans plan). Adapted: p_container is not in
    the synthetic schema, so the bands are (p_brand, p_size, l_quantity)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    q, s, b = F.col("l_quantity"), F.col("p_size"), F.col("p_brand")
    bands = (
        ((b == "Brand#1") & s.between(1, 10) & q.between(1, 11))
        | ((b == "Brand#2") & s.between(1, 20) & q.between(10, 20))
        | ((b == "Brand#3") & s.between(1, 30) & q.between(20, 30))
    )
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .filter(bands)
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))),
                4,
            ).alias("revenue"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


ORACLE["tpch_q19"] = """SELECT
  ROUND(SUM(l_extendedprice * (1 - l_discount)), 4) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 1 AND 11)
   OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 20 AND l_quantity BETWEEN 10 AND 20)
   OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 30 AND l_quantity BETWEEN 20 AND 30)"""

QUERIES["tpch_q19"] = q_tpch_q19


# ------------------------------------------- truncated hitting time

HT_SEEDS = [0, 42, 1234]
HT_HORIZON = 8


def q_hitting_time(spark, sf_dir):
    """Truncated hitting time to the TrustRank seed set (Sarkar-Moore
    E[min(first-hit, H)] — exact finite recursion, horizon HT_HORIZON)."""
    from .operators.diffusion import truncated_hitting_time

    out = truncated_hitting_time(
        load_edges(spark, sf_dir), seeds=HT_SEEDS, horizon=HT_HORIZON
    )
    return out.select("id", F.round(F.col("hitting"), 6).alias("hitting"))


def _hitting_sql() -> str:
    seeds = ", ".join(str(s) for s in sorted(set(HT_SEEDS)))
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS od "
        "FROM edges GROUP BY src)",
        "g0 AS MATERIALIZED (SELECT id, 0e0 AS h FROM nodes)",
    ]
    for k in range(1, HT_HORIZON + 1):
        ctes.append(
            f"""g{k} AS MATERIALIZED (
  SELECT n.id,
         CASE WHEN n.id IN ({seeds}) THEN 0e0
              ELSE 1e0 + COALESCE(c.s, p.h) END AS h
  FROM nodes n JOIN g{k-1} p ON p.id = n.id
  LEFT JOIN (
    SELECT e.src AS id, SUM(g.h * (1e0 / d.od)) AS s
    FROM g{k-1} g JOIN edges e ON e.dst = g.id JOIN deg d ON d.id = e.src
    GROUP BY e.src
  ) c ON c.id = n.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(h, 6) AS hitting FROM g{HT_HORIZON}"
    )


ORACLE["hitting_time"] = _hitting_sql()
QUERIES["hitting_time"] = q_hitting_time


def q_tpch_q6(spark, sf_dir):
    """TPC-H Q6 forecasting-revenue-change — the pure scan-predicate-agg
    shape (no join): every filter pushes to the parquet scan."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01"))
            & (F.col("l_shipdate") < F.lit("1997-01-01"))
            & (F.col("l_discount") >= 0.05)
            & (F.col("l_discount") <= 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 4).alias(
                "revenue"
            ),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


ORACLE["tpch_q6"] = """SELECT
  ROUND(SUM(l_extendedprice * l_discount), 4) AS revenue,
  CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24"""

QUERIES["tpch_q6"] = q_tpch_q6


# ------------------------------------------- bipartiteness (odd cycles)

BIP_UNROLL = 32  # doubled-graph diameter can reach ~2x the original's


def q_bipartite(spark, sf_dir):
    """Per-component bipartiteness via one hash-min CC run on the
    parity-doubled graph (odd-cycle detection, no new kernel)."""
    from .operators.components import bipartite_check

    return bipartite_check(load_edges(spark, sf_dir))


def _bipartite_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        "e AS MATERIALIZED (SELECT src, dst FROM edges WHERE src <> dst)",
        "loops AS (SELECT DISTINCT src AS u FROM edges WHERE src = dst)",
        """dd AS MATERIALIZED (
  SELECT src * 2 AS src, dst * 2 + 1 AS dst FROM e
  UNION ALL SELECT dst * 2 AS src, src * 2 + 1 AS dst FROM e
  UNION ALL SELECT u * 2 AS src, u * 2 + 1 AS dst FROM loops)""",
        """nodes AS MATERIALIZED (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM dd UNION ALL SELECT dst AS id FROM dd))""",
        """und AS MATERIALIZED (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM dd UNION ALL SELECT dst AS src, src AS dst FROM dd
  ) WHERE src <> dst)""",
        "c0 AS MATERIALIZED (SELECT id, id AS component FROM nodes)",
    ]
    for i in range(1, BIP_UNROLL + 1):
        ctes.append(
            f"""c{i} AS MATERIALIZED (
  SELECT c.id,
         CASE WHEN m.nmin IS NOT NULL AND m.nmin < c.component
              THEN m.nmin ELSE c.component END AS component
  FROM c{i-1} c LEFT JOIN (
    SELECT u.dst AS id, MIN(p.component) AS nmin
    FROM c{i-1} p JOIN und u ON u.src = p.id
    GROUP BY u.dst
  ) m ON c.id = m.id
)"""
        )
    ctes.append(
        f"""per_node AS (
  SELECT id // 2 AS id, MIN(component) AS cmin, MAX(component) AS cmax
  FROM c{BIP_UNROLL} GROUP BY id // 2)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + """
SELECT CAST(cmin // 2 AS BIGINT) AS component,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       BOOL_AND(cmin <> cmax) AS is_bipartite
FROM per_node GROUP BY 1"""
    )


ORACLE["bipartite"] = _bipartite_sql()
QUERIES["bipartite"] = q_bipartite


# ------------------------------------------- trophic levels (hierarchy)

TROPHIC_ITERS = 12
TROPHIC_OMEGA = 0.5


def q_trophic_levels(spark, sf_dir):
    """MacKay-Johnson-Jones trophic levels (PNAS 2020): damped-Jacobi
    iterate K of the hierarchy-height normal equations, weighted edges."""
    from .graph import with_synthetic_weights
    from .operators.diffusion import trophic_levels

    out = trophic_levels(
        with_synthetic_weights(load_edges(spark, sf_dir)),
        weight_col="weight",
        max_iter=TROPHIC_ITERS,
        omega=TROPHIC_OMEGA,
    )
    return out.select("id", F.round(F.col("level"), 6).alias("level"))


def _trophic_sql() -> str:
    om = repr(TROPHIC_OMEGA)
    keep = repr(1.0 - TROPHIC_OMEGA)
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        "ew AS MATERIALIZED (SELECT src, dst, "
        "1e0 + ((src*31 + dst) % 100)/100e0 AS w FROM edges)",
        """sym AS MATERIALIZED (
  SELECT src, dst, w FROM ew
  UNION ALL SELECT dst AS src, src AS dst, w FROM ew)""",
        """base AS MATERIALIZED (
  SELECT id, SUM(iw) + SUM(ow) AS d, SUM(iw) - SUM(ow) AS v FROM (
    SELECT dst AS id, w AS iw, 0e0 AS ow FROM ew
    UNION ALL
    SELECT src AS id, 0e0 AS iw, w AS ow FROM ew
  ) GROUP BY id)""",
        "h0 AS MATERIALIZED (SELECT id, 0e0 AS h FROM base)",
    ]
    for i in range(1, TROPHIC_ITERS + 1):
        ctes.append(
            f"""h{i} AS MATERIALIZED (
  SELECT b.id,
         CAST({keep} AS DOUBLE) * p.h
         + CAST({om} AS DOUBLE) * (b.v + COALESCE(c.s, 0e0)) / b.d AS h
  FROM base b JOIN h{i-1} p ON p.id = b.id
  LEFT JOIN (
    SELECT g.dst AS id, SUM(g.w * q.h) AS s
    FROM h{i-1} q JOIN sym g ON g.src = q.id
    GROUP BY g.dst
  ) c ON c.id = b.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(h, 6) AS level FROM h{TROPHIC_ITERS}"
    )


ORACLE["trophic_levels"] = _trophic_sql()
QUERIES["trophic_levels"] = q_trophic_levels


def q_trophic_incoherence(spark, sf_dir):
    """Trophic incoherence F0 — the PNAS-2020 'how directed is this
    network' scalar at the same damped-Jacobi iterate as trophic_levels."""
    from .graph import with_synthetic_weights
    from .operators.diffusion import trophic_incoherence

    out = trophic_incoherence(
        with_synthetic_weights(load_edges(spark, sf_dir)),
        weight_col="weight",
        max_iter=TROPHIC_ITERS,
        omega=TROPHIC_OMEGA,
    )
    return out.select(F.round(F.col("f0"), 6).alias("f0"))


def _trophic_f0_sql() -> str:
    body = _trophic_sql()
    # reuse the unrolled sweep CTEs; replace the final projection with the
    # edge-gap aggregate (h differences only - the free constant cancels)
    head = body[: body.rindex("\nSELECT id, ROUND(h, 6)")]
    return (
        head
        + f"""
SELECT ROUND(
  SUM(e.w * (hv.h - hu.h - 1e0) * (hv.h - hu.h - 1e0)) / SUM(e.w), 6
) AS f0
FROM ew e
JOIN h{TROPHIC_ITERS} hu ON hu.id = e.src
JOIN h{TROPHIC_ITERS} hv ON hv.id = e.dst"""
    )


ORACLE["trophic_incoherence"] = _trophic_f0_sql()
QUERIES["trophic_incoherence"] = q_trophic_incoherence


# ------------------------------------------- non-backtracking centrality

NBC_ITERS = 6


def q_nonbacktracking(spark, sf_dir):
    """Non-backtracking centrality (Martin-Zhang-Newman): Hashimoto-matrix
    power iteration over edge states — EXACT BIGINT, no rounding."""
    from .operators.centrality import nonbacktracking_centrality

    return nonbacktracking_centrality(load_edges(spark, sf_dir), max_iter=NBC_ITERS)


def _nbc_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        "x0 AS MATERIALIZED (SELECT src, dst, CAST(1 AS BIGINT) AS x FROM edges)",
    ]
    for i in range(1, NBC_ITERS + 1):
        ctes.append(
            f"""x{i} AS MATERIALIZED (
  SELECT e.src, e.dst,
         COALESCE(t.t, 0) - COALESCE(r.x, 0) AS x
  FROM edges e
  LEFT JOIN (SELECT dst AS u, SUM(x) AS t FROM x{i-1} GROUP BY dst) t
    ON t.u = e.src
  LEFT JOIN x{i-1} r ON r.src = e.dst AND r.dst = e.src)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT dst AS id, CAST(SUM(x) AS BIGINT) AS nbc FROM x{NBC_ITERS} GROUP BY dst"""
    )


ORACLE["nonbacktracking"] = _nbc_sql()
QUERIES["nonbacktracking"] = q_nonbacktracking


# ------------------------------------------- SybilRank

SYBIL_ITERS = 12  # ceil(log2(4096)) — the paper's O(log n) early stop


def q_sybilrank(spark, sf_dir):
    """SybilRank (NSDI 2012): early-terminated degree-normalized trust
    propagation from the TrustRank seed set over the undirected graph."""
    from .operators.trust import sybilrank

    return sybilrank(load_edges(spark, sf_dir), seeds=HT_SEEDS, max_iter=SYBIL_ITERS)


def _sybilrank_sql() -> str:
    seeds = sorted(set(HT_SEEDS))
    seeds_in = ", ".join(str(s) for s in seeds)
    t0 = repr(1.0 / len(seeds))
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        f"und AS MATERIALIZED ({UND_SQL})",
        "deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS deg "
        "FROM und GROUP BY src)",
        f"""t0 AS MATERIALIZED (
  SELECT id, CASE WHEN id IN ({seeds_in})
                  THEN CAST({t0} AS DOUBLE) ELSE 0e0 END AS t
  FROM nodes)""",
    ]
    for i in range(1, SYBIL_ITERS + 1):
        ctes.append(
            f"""t{i} AS MATERIALIZED (
  SELECT n.id, COALESCE(c.s, 0e0) AS t
  FROM nodes n LEFT JOIN (
    SELECT u.dst AS id, SUM(p.t * (1e0 / d.deg)) AS s
    FROM t{i-1} p JOIN und u ON u.src = p.id JOIN deg d ON d.id = u.src
    GROUP BY u.dst
  ) c ON c.id = n.id)"""
        )
    n_nodes = "(SELECT COUNT(*) FROM nodes)"
    return (
        "WITH " + ",\n".join(ctes)
        + f""",
scaled AS (SELECT id, ROUND(t * {n_nodes}, 6) AS trust_scaled FROM t{SYBIL_ITERS})
SELECT s.id, s.trust_scaled,
       ROUND(s.trust_scaled / d.deg, 6) AS rank
FROM scaled s JOIN deg d ON d.id = s.id"""
    )


ORACLE["sybilrank"] = _sybilrank_sql()
QUERIES["sybilrank"] = q_sybilrank


def q_hitting_time_weighted(spark, sf_dir):
    """Weighted truncated hitting time: the walk steps with probability
    w/sum(w) (synthetic SQL-portable weights), same exact g_k recursion."""
    from .graph import with_synthetic_weights
    from .operators.diffusion import truncated_hitting_time

    out = truncated_hitting_time(
        with_synthetic_weights(load_edges(spark, sf_dir)),
        seeds=HT_SEEDS,
        horizon=HT_HORIZON,
        weight_col="weight",
    )
    return out.select("id", F.round(F.col("hitting"), 6).alias("hitting"))


def _hitting_weighted_sql() -> str:
    seeds = ", ".join(str(s) for s in sorted(set(HT_SEEDS)))
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "ew AS MATERIALIZED (SELECT src, dst, "
        "1e0 + ((src*31 + dst) % 100)/100e0 AS w FROM edges)",
        "ow AS MATERIALIZED (SELECT src AS id, SUM(w) AS ow "
        "FROM ew GROUP BY src)",
        "g0 AS MATERIALIZED (SELECT id, 0e0 AS h FROM nodes)",
    ]
    for k in range(1, HT_HORIZON + 1):
        ctes.append(
            f"""g{k} AS MATERIALIZED (
  SELECT n.id,
         CASE WHEN n.id IN ({seeds}) THEN 0e0
              ELSE 1e0 + COALESCE(c.s, p.h) END AS h
  FROM nodes n JOIN g{k-1} p ON p.id = n.id
  LEFT JOIN (
    SELECT e.src AS id, SUM(g.h * (e.w / o.ow)) AS s
    FROM g{k-1} g JOIN ew e ON e.dst = g.id JOIN ow o ON o.id = e.src
    GROUP BY e.src
  ) c ON c.id = n.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(h, 6) AS hitting FROM g{HT_HORIZON}"
    )


ORACLE["hitting_time_weighted"] = _hitting_weighted_sql()
QUERIES["hitting_time_weighted"] = q_hitting_time_weighted


def q_collective_influence(spark, sf_dir):
    """Collective Influence CI_2 (Morone-Makse optimal percolation):
    (deg-1) x sum of (deg-1) over the exact distance-2 shell, exact BIGINT."""
    from .operators.centrality import collective_influence

    return collective_influence(load_edges(spark, sf_dir), radius=2)


ORACLE["collective_influence"] = f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
und AS MATERIALIZED ({UND_SQL}),
deg AS MATERIALIZED (
  SELECT src AS id, CAST(COUNT(*) AS BIGINT) AS deg FROM und GROUP BY src),
hop2 AS MATERIALIZED (
  SELECT DISTINCT a.src AS v, b.dst AS w
  FROM und a JOIN und b ON b.src = a.dst
  WHERE a.src <> b.dst),
shell AS MATERIALIZED (
  SELECT h.v, h.w FROM hop2 h
  LEFT JOIN und u ON u.src = h.v AND u.dst = h.w
  WHERE u.src IS NULL)
SELECT d.id, CAST((d.deg - 1) * COALESCE(s.acc, 0) AS BIGINT) AS ci
FROM deg d LEFT JOIN (
  SELECT sh.v AS id, SUM(dw.deg - 1) AS acc
  FROM shell sh JOIN deg dw ON dw.id = sh.w
  GROUP BY sh.v
) s ON s.id = d.id"""

QUERIES["collective_influence"] = q_collective_influence


# ------------------------------------------- Who-To-Follow (WWW 2013)

WTF_USER = 42
WTF_K = 64
WTF_ITERS = 8
WTF_TOPN = 20


def q_who_to_follow(spark, sf_dir):
    """Who-To-Follow (Gupta et al., WWW 2013): personalized-PageRank
    circle of trust -> personalized SALSA over its bipartite neighborhood
    -> top-N new-account recommendations. Pure kernel composition."""
    from .operators.trust import who_to_follow

    return who_to_follow(
        load_edges(spark, sf_dir),
        user=WTF_USER,
        k_trust=WTF_K,
        ppr_iters=WTF_ITERS,
        salsa_iters=WTF_ITERS,
        top_n=WTF_TOPN,
    )


def _wtf_sql() -> str:
    ev = f"(CASE WHEN nodes.id = {WTF_USER} THEN 1e0 ELSE 0e0 END)"
    base_factor = repr(1.0 - DAMPING)
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS od "
        "FROM edges GROUP BY src)",
        f"r0 AS MATERIALIZED (SELECT nodes.id, {ev} AS rank FROM nodes)",
    ]
    for i in range(1, WTF_ITERS + 1):
        ctes.append(
            f"""r{i} AS MATERIALIZED (
  SELECT nodes.id,
         CAST({base_factor} AS DOUBLE) * {ev}
         + CAST({DAMPING!r} AS DOUBLE) * COALESCE(c.contrib, 0e0) AS rank
  FROM nodes LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank / d.od) AS contrib
    FROM r{i-1} r JOIN edges e ON e.src = r.id JOIN deg d ON d.id = r.id
    GROUP BY e.dst
  ) c ON nodes.id = c.id)"""
        )
    ctes += [
        f"""cot AS MATERIALIZED (
  SELECT id FROM (
    SELECT id, ROW_NUMBER() OVER (
      ORDER BY ROUND(rank * (SELECT n FROM nn), 6) DESC, id ASC) AS rn
    FROM r{WTF_ITERS}
  ) WHERE rn <= {WTF_K})""",
        """bip AS MATERIALIZED (
  SELECT e.src, e.dst FROM edges e JOIN cot c ON c.id = e.src)""",
        """bnodes AS MATERIALIZED (
  SELECT DISTINCT id FROM (
    SELECT src AS id FROM bip UNION ALL SELECT dst AS id FROM bip))""",
        "bn AS (SELECT COUNT(*) AS n FROM bnodes)",
        "bod AS MATERIALIZED (SELECT src, COUNT(*) AS od FROM bip GROUP BY src)",
        "bidg AS MATERIALIZED (SELECT dst, COUNT(*) AS idg FROM bip GROUP BY dst)",
        "bns AS (SELECT COUNT(*) AS k FROM bod)",
        "h0 AS MATERIALIZED (SELECT src AS id, 1e0/(SELECT k FROM bns) AS hub "
        "FROM bod)",
    ]
    for i in range(1, WTF_ITERS + 1):
        ctes.append(
            f"""a{i} AS MATERIALIZED (
  SELECT e.dst AS id, SUM(h.hub / d.od) AS ar
  FROM h{i-1} h JOIN bip e ON e.src = h.id JOIN bod d ON d.src = e.src
  GROUP BY e.dst),
h{i} AS MATERIALIZED (
  SELECT e.src AS id, SUM(a.ar / g.idg) AS hub
  FROM a{i} a JOIN bip e ON e.dst = a.id JOIN bidg g ON g.dst = e.dst
  GROUP BY e.src)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT id, auth_scaled, rec_rank FROM (
  SELECT id, auth_scaled,
         ROW_NUMBER() OVER (ORDER BY auth_scaled DESC, id ASC) AS rec_rank
  FROM (
    SELECT a.id, ROUND(a.ar * (SELECT n FROM bn), 6) AS auth_scaled
    FROM a{WTF_ITERS} a
    WHERE a.ar > 0e0 AND a.id <> {WTF_USER}
      AND a.id NOT IN (SELECT dst FROM edges WHERE src = {WTF_USER})
  )
) WHERE rec_rank <= {WTF_TOPN}"""
    )


ORACLE["who_to_follow"] = _wtf_sql()
QUERIES["who_to_follow"] = q_who_to_follow


# ------------------------------------------- bridges / 2-edge-connectivity

BR_DOUBLINGS = 6  # ancestor closure covers BFS depth ≤ 2^6
BR_UNROLL = 24  # CC/BFS rounds on the sparsified graph (depth ≤ 13 measured)
# The full modulo graph is far too dense to have bridges (avg degree ~25 at
# sf0.01 → 0 cut edges, a trivially-matching gate). The bridge gates run on
# a deterministic 1-in-11 sparsified subgraph instead: ~1.3 edges/node →
# ~900 bridges at sf0.01, and 2-edge-CC genuinely differs from plain CC.
BR_SPARSE_MOD = 11
BR_EDGE_FILTER_SQL = f" AND (l_orderkey % {MODULUS} * 131 + l_partkey % {MODULUS}) % {BR_SPARSE_MOD} < 1"


def load_sparse_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_edges(spark, sf_dir)
    return e.filter((F.col("src") * 131 + F.col("dst")) % BR_SPARSE_MOD < 1)


def q_bridges(spark, sf_dir):
    """Exact cut edges via the spanning-forest + cycle-coverage
    characterisation (bridges.py module docstring) — the distributed
    replacement for the sequential DFS-lowpoint pass."""
    from .operators.bridges import bridges

    return bridges(load_sparse_edges(spark, sf_dir))


def q_two_edge_components(spark, sf_dir):
    """2-edge-connected components: CC of the graph minus its bridges."""
    from .operators.bridges import two_edge_components

    return two_edge_components(load_sparse_edges(spark, sf_dir))


def _bridge_ctes() -> list[str]:
    """Shared CTE chain: deterministic BFS forest + ancestor closure +
    exact non-tree coverage counting (mirrors operators/bridges.py 1:1 —
    both engines pick parent = MIN neighbour one level up, so the forest
    and therefore the bridge set are identical)."""
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL + BR_EDGE_FILTER_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        f"und AS MATERIALIZED ({UND_SQL})",
        "c0 AS MATERIALIZED (SELECT id, id AS component FROM nodes)",
    ]
    for i in range(1, BR_UNROLL + 1):
        ctes.append(
            f"""c{i} AS MATERIALIZED (
  SELECT c.id,
         CASE WHEN m.nmin IS NOT NULL AND m.nmin < c.component
              THEN m.nmin ELSE c.component END AS component
  FROM c{i-1} c LEFT JOIN (
    SELECT u.dst AS id, MIN(p.component) AS nmin
    FROM c{i-1} p JOIN und u ON u.src = p.id
    GROUP BY u.dst
  ) m ON c.id = m.id
)"""
        )
    ctes.append(
        f"d0 AS MATERIALIZED (SELECT id, CASE WHEN id = component THEN 0 END AS d "
        f"FROM c{BR_UNROLL})"
    )
    for i in range(1, BR_UNROLL + 1):
        ctes.append(
            f"""d{i} AS MATERIALIZED (
  SELECT p.id,
         CASE WHEN p.d IS NOT NULL THEN p.d
              ELSE m.nd END AS d
  FROM d{i-1} p LEFT JOIN (
    SELECT u.dst AS id, MIN(q.d + 1) AS nd
    FROM d{i-1} q JOIN und u ON u.src = q.id
    WHERE q.d IS NOT NULL
    GROUP BY u.dst
  ) m ON p.id = m.id
)"""
        )
    ctes += [
        f"""par AS MATERIALIZED (
  SELECT u.dst AS id, MIN(u.src) AS parent
  FROM und u JOIN d{BR_UNROLL} a ON a.id = u.src
  JOIN d{BR_UNROLL} b ON b.id = u.dst
  WHERE a.d = b.d - 1
  GROUP BY u.dst)""",
        """tree AS MATERIALIZED (
  SELECT LEAST(parent, id) AS u, GREATEST(parent, id) AS v, id AS child
  FROM par)""",
        """cund AS MATERIALIZED (
  SELECT src AS u, dst AS v FROM und WHERE src < dst)""",
        """nt AS MATERIALIZED (
  SELECT c.u, c.v FROM cund c
  LEFT JOIN tree t ON t.u = c.u AND t.v = c.v
  WHERE t.u IS NULL)""",
        """a0 AS MATERIALIZED (
  SELECT id, id AS anc FROM nodes
  UNION
  SELECT id, parent AS anc FROM par)""",
    ]
    for i in range(1, BR_DOUBLINGS + 1):
        ctes.append(
            f"""a{i} AS MATERIALIZED (
  SELECT id, anc FROM a{i-1}
  UNION
  SELECT x.id, y.anc FROM a{i-1} x JOIN a{i-1} y ON y.id = x.anc)"""
        )
    ctes += [
        f"""ep AS MATERIALIZED (
  SELECT u AS w, u, v FROM nt UNION ALL SELECT v AS w, u, v FROM nt)""",
        f"""pea AS MATERIALIZED (
  SELECT a.anc, e.u, e.v, COUNT(*) AS cnt
  FROM ep e JOIN a{BR_DOUBLINGS} a ON a.id = e.w
  GROUP BY a.anc, e.u, e.v)""",
        """cov AS MATERIALIZED (
  SELECT anc AS child,
         SUM(cnt) - 2 * SUM(CASE WHEN cnt = 2 THEN 1 ELSE 0 END) AS covered
  FROM pea GROUP BY anc)""",
        """brs AS MATERIALIZED (
  SELECT t.u, t.v FROM tree t
  LEFT JOIN cov c ON c.child = t.child
  WHERE COALESCE(c.covered, 0) = 0)""",
    ]
    return ctes


def _bridges_sql() -> str:
    return "WITH " + ",\n".join(_bridge_ctes()) + "\nSELECT u, v FROM brs"


def _two_edge_components_sql() -> str:
    ctes = _bridge_ctes()
    ctes.append(
        """kund AS MATERIALIZED (
  SELECT u AS src, v AS dst FROM (
    SELECT c.u, c.v FROM cund c
    LEFT JOIN brs b ON b.u = c.u AND b.v = c.v
    WHERE b.u IS NULL)
  UNION ALL
  SELECT v AS src, u AS dst FROM (
    SELECT c.u, c.v FROM cund c
    LEFT JOIN brs b ON b.u = c.u AND b.v = c.v
    WHERE b.u IS NULL))"""
    )
    ctes.append("k0 AS MATERIALIZED (SELECT id, id AS component FROM nodes)")
    for i in range(1, BR_UNROLL + 1):
        ctes.append(
            f"""k{i} AS MATERIALIZED (
  SELECT c.id,
         CASE WHEN m.nmin IS NOT NULL AND m.nmin < c.component
              THEN m.nmin ELSE c.component END AS component
  FROM k{i-1} c LEFT JOIN (
    SELECT u.dst AS id, MIN(p.component) AS nmin
    FROM k{i-1} p JOIN kund u ON u.src = p.id
    GROUP BY u.dst
  ) m ON c.id = m.id
)"""
        )
    return (
        "WITH " + ",\n".join(ctes) + f"\nSELECT id, component FROM k{BR_UNROLL}"
    )


ORACLE["bridges"] = _bridges_sql()
QUERIES["bridges"] = q_bridges
ORACLE["two_edge_components"] = _two_edge_components_sql()
QUERIES["two_edge_components"] = q_two_edge_components


# ------------------------------------------- temporal reachability

TR_SOURCES = [0, 7, 42]
TR_NODE_MOD = 150  # contact-partner space = the events user domain
TR_UNROLL = 12


def q_temporal_reachability(spark, sf_dir):
    """Earliest-arrival time-respecting reachability (Wu et al., VLDB 2014)
    over the events stream viewed as timestamped contacts: each event is a
    contact user_id → (user_id*31 + event_id) % 150 at unix_micros(ts)."""
    from .operators.temporal import temporal_reachability

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    contacts = ev.select(
        F.col("user_id").alias("src"),
        ((F.col("user_id") * 31 + F.col("event_id")) % TR_NODE_MOD).alias("dst"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )
    return temporal_reachability(contacts, sources=TR_SOURCES, start=0)


def _temporal_reachability_sql() -> str:
    src_rows = ", ".join(f"({s}, 0)" for s in sorted(set(TR_SOURCES)))
    ctes = [
        f"""tc AS MATERIALIZED (
  SELECT DISTINCT user_id AS src,
         (user_id * 31 + event_id) % {TR_NODE_MOD} AS dst,
         epoch_us(ts) AS t
  FROM events
  WHERE user_id <> (user_id * 31 + event_id) % {TR_NODE_MOD})""",
        f"r0 AS MATERIALIZED (SELECT * FROM (VALUES {src_rows}) AS v(id, arrival))",
    ]
    for k in range(1, TR_UNROLL + 1):
        ctes.append(
            f"""r{k} AS MATERIALIZED (
  SELECT COALESCE(p.id, c.id) AS id,
         LEAST(COALESCE(p.arrival, c.cand), COALESCE(c.cand, p.arrival)) AS arrival
  FROM r{k-1} p FULL JOIN (
    SELECT tc.dst AS id, MIN(tc.t) AS cand
    FROM r{k-1} q JOIN tc ON tc.src = q.id AND tc.t >= q.arrival
    GROUP BY tc.dst
  ) c ON c.id = p.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT CAST(id AS BIGINT) AS id, CAST(arrival AS BIGINT) AS arrival FROM r{TR_UNROLL}"
    )


ORACLE["temporal_reachability"] = _temporal_reachability_sql()
QUERIES["temporal_reachability"] = q_temporal_reachability


# ------------------------------------------- influence maximization

IM_POOL = 8
IM_K = 3
IM_HORIZON = 4  # bounded-IC cascade horizon (hops)


def q_influence_max(spark, sf_dir):
    """Greedy bounded-IC(p=1) influence maximization (Kempe-Kleinberg-
    Tardos greedy, cascade truncated at 4 rounds): top-8 out-degree
    candidate pool, one batched multi-source BFS, 3 exact
    marginal-coverage greedy picks."""
    from .operators.influence import influence_max

    return influence_max(
        load_sparse_edges(spark, sf_dir), k=IM_K, pool=IM_POOL, horizon=IM_HORIZON
    )


def _influence_max_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL + BR_EDGE_FILTER_SQL})",
        f"""cand AS MATERIALIZED (
  SELECT src AS id FROM edges GROUP BY src
  ORDER BY COUNT(*) DESC, src ASC LIMIT {IM_POOL})""",
        "q0 AS MATERIALIZED (SELECT id AS root, id FROM cand)",
    ]
    for k in range(1, IM_HORIZON + 1):
        ctes.append(
            f"""q{k} AS MATERIALIZED (
  SELECT root, id FROM q{k-1}
  UNION
  SELECT q.root, e.dst AS id FROM q{k-1} q JOIN edges e ON e.src = q.id)"""
        )
    ctes.append(f"reach AS MATERIALIZED (SELECT root, id FROM q{IM_HORIZON})")
    prev_cov = None
    prev_picks: list[str] = []
    for s in range(1, IM_K + 1):
        not_picked = (
            " AND ".join(f"r.root <> (SELECT seed FROM p{j})" for j in prev_picks)
            or "TRUE"
        )
        cand_not_picked = (
            " AND ".join(f"cand.id <> (SELECT seed FROM p{j})" for j in prev_picks)
            or "TRUE"
        )
        uncovered = (
            f"LEFT JOIN c{s-1} cv ON cv.id = r.id WHERE cv.id IS NULL AND "
            if prev_cov
            else "WHERE "
        )
        ctes.append(
            f"""g{s} AS MATERIALIZED (
  SELECT r.root, COUNT(*) AS gain
  FROM reach r {uncovered}{not_picked}
  GROUP BY r.root)"""
        )
        ctes.append(
            f"""gz{s} AS MATERIALIZED (
  SELECT cand.id AS root, COALESCE(g{s}.gain, 0) AS gain
  FROM cand LEFT JOIN g{s} ON g{s}.root = cand.id
  WHERE {cand_not_picked})"""
        )
        ctes.append(
            f"""p{s} AS MATERIALIZED (
  SELECT root AS seed, gain FROM gz{s}
  ORDER BY gain DESC, root ASC LIMIT 1)"""
        )
        if prev_cov:
            ctes.append(
                f"""c{s} AS MATERIALIZED (
  SELECT id FROM c{s-1}
  UNION
  SELECT id FROM reach WHERE root = (SELECT seed FROM p{s}))"""
            )
        else:
            ctes.append(
                f"""c{s} AS MATERIALIZED (
  SELECT DISTINCT id FROM reach WHERE root = (SELECT seed FROM p{s}))"""
            )
        prev_cov = f"c{s}"
        prev_picks.append(str(s))
    sel = "\nUNION ALL\n".join(
        f"SELECT seed, CAST({s} AS INT) AS step, CAST(gain AS BIGINT) AS gain FROM p{s}"
        for s in range(1, IM_K + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + sel


ORACLE["influence_max"] = _influence_max_sql()
QUERIES["influence_max"] = q_influence_max


# ----------------------------- biconnected blocks / articulation points

BCC_UNROLL = 16  # coverage-graph CC fixpoint measured ≤ 8 at every SF


def q_biconnected_blocks(spark, sf_dir):
    """Biconnected components per edge: blocks = CC of the tree-edge ↔
    covering-non-tree-edge bipartite graph (common-cycle equivalence;
    bridges.py docstring). Sparsified subgraph like the bridge gates."""
    from .operators.bridges import biconnected_blocks

    return biconnected_blocks(load_sparse_edges(spark, sf_dir))


def q_articulation_points(spark, sf_dir):
    """Cut vertices: ≥ 2 distinct incident blocks (block-tree rule)."""
    from .operators.bridges import articulation_points

    return articulation_points(load_sparse_edges(spark, sf_dir))


def _bcc_ctes() -> list[str]:
    ctes = _bridge_ctes()
    ctes += [
        "bbase AS (SELECT MAX(id) + 1 AS b FROM nodes)",
        """cover AS MATERIALIZED (
  SELECT anc AS x, -(u * (SELECT b FROM bbase) + v) - 1 AS y
  FROM pea WHERE cnt = 1)""",
        """coveru AS MATERIALIZED (
  SELECT x, y FROM cover UNION ALL SELECT y AS x, x AS y FROM cover)""",
        """bc0 AS MATERIALIZED (
  SELECT DISTINCT x AS id, x AS c
  FROM (SELECT x FROM cover UNION ALL SELECT y FROM cover))""",
    ]
    for i in range(1, BCC_UNROLL + 1):
        ctes.append(
            f"""bc{i} AS MATERIALIZED (
  SELECT l.id, LEAST(l.c, COALESCE(m.nmin, l.c)) AS c
  FROM bc{i-1} l LEFT JOIN (
    SELECT u.y AS id, MIN(p.c) AS nmin
    FROM bc{i-1} p JOIN coveru u ON u.x = p.id
    GROUP BY u.y
  ) m ON m.id = l.id)"""
        )
    ctes += [
        f"""blk AS MATERIALIZED (
  SELECT c AS component, MIN(id) AS block FROM bc{BCC_UNROLL}
  WHERE id >= 0 GROUP BY c)""",
        f"""tree_blocks AS MATERIALIZED (
  SELECT t.u, t.v, COALESCE(b.block, t.child) AS block
  FROM tree t
  LEFT JOIN bc{BCC_UNROLL} l ON l.id = t.child
  LEFT JOIN blk b ON b.component = l.c)""",
        f"""nt_blocks AS MATERIALIZED (
  SELECT n.u, n.v, b.block
  FROM nt n
  JOIN bc{BCC_UNROLL} l ON l.id = -(n.u * (SELECT b FROM bbase) + n.v) - 1
  JOIN blk b ON b.component = l.c)""",
        """all_blocks AS MATERIALIZED (
  SELECT u, v, block FROM tree_blocks
  UNION ALL SELECT u, v, block FROM nt_blocks)""",
    ]
    return ctes


def _biconnected_blocks_sql() -> str:
    return "WITH " + ",\n".join(_bcc_ctes()) + "\nSELECT u, v, block FROM all_blocks"


def _articulation_points_sql() -> str:
    return (
        "WITH " + ",\n".join(_bcc_ctes())
        + """
SELECT id FROM (
  SELECT id, COUNT(DISTINCT block) AS nb FROM (
    SELECT u AS id, block FROM all_blocks
    UNION SELECT v AS id, block FROM all_blocks
  ) GROUP BY id
) WHERE nb >= 2"""
    )


ORACLE["biconnected_blocks"] = _biconnected_blocks_sql()
QUERIES["biconnected_blocks"] = q_biconnected_blocks
ORACLE["articulation_points"] = _articulation_points_sql()
QUERIES["articulation_points"] = q_articulation_points


# ------------------------------------------- weighted betweenness (Brandes)

WBC_BF_UNROLL = 10  # Bellman-Ford fixpoint measured at 6 rounds (sf0.01)
WBC_SD_UNROLL = 8  # sigma/delta DAG depth measured at 6 rounds


def q_weighted_betweenness(spark, sf_dir):
    """Weighted Brandes from the first 4 node ids (same root rule as the
    unweighted `betweenness` gate), synthetic SQL-portable weights,
    exact-integer distances/path counts (bc.py::weighted_betweenness)."""
    from .graph import with_synthetic_weights
    from .operators.bc import weighted_betweenness_centrality

    edges = load_edges(spark, sf_dir)
    roots = [
        r["id"]
        for r in edges.selectExpr("src AS id")
        .union(edges.selectExpr("dst AS id"))
        .distinct()
        .orderBy("id")
        .limit(BC_ROOTS_K)
        .collect()
    ]
    bc = weighted_betweenness_centrality(with_synthetic_weights(edges), roots)
    return bc.select("id", F.round("bc", 6).alias("bc"))


def _wbc_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        """ew AS MATERIALIZED (
  SELECT src, dst,
         CAST(FLOOR((1e0 + ((src*31 + dst) % 100)/100e0) * 128e0) AS BIGINT) + 1 AS w
  FROM edges)""",
        f"wroots AS (SELECT id AS root FROM nodes ORDER BY id LIMIT {BC_ROOTS_K})",
        "b0 AS MATERIALIZED (SELECT root, root AS id, CAST(0 AS BIGINT) AS dist FROM wroots)",
    ]
    for k in range(1, WBC_BF_UNROLL + 1):
        ctes.append(
            f"""b{k} AS MATERIALIZED (
  SELECT COALESCE(p.root, c.root) AS root, COALESCE(p.id, c.id) AS id,
         LEAST(COALESCE(p.dist, c.cand), COALESCE(c.cand, p.dist)) AS dist
  FROM b{k-1} p FULL JOIN (
    SELECT q.root, e.dst AS id, MIN(q.dist + e.w) AS cand
    FROM b{k-1} q JOIN ew e ON e.src = q.id GROUP BY q.root, e.dst
  ) c ON c.root = p.root AND c.id = p.id)"""
        )
    D = f"b{WBC_BF_UNROLL}"
    ctes += [
        f"""wdag AS MATERIALIZED (
  SELECT a.root, e.src AS u, e.dst AS v
  FROM ew e
  JOIN {D} a ON a.id = e.src
  JOIN {D} b ON b.root = a.root AND b.id = e.dst
  WHERE a.dist + e.w = b.dist)""",
        f"""sg0 AS MATERIALIZED (
  SELECT root, id, CAST(CASE WHEN id = root THEN 1 ELSE 0 END AS BIGINT) AS sigma
  FROM {D})""",
    ]
    for k in range(1, WBC_SD_UNROLL + 1):
        ctes.append(
            f"""sg{k} AS MATERIALIZED (
  SELECT s.root, s.id,
         CAST(CASE WHEN s.id = s.root THEN 1 ELSE 0 END AS BIGINT)
           + COALESCE(c.acc, 0) AS sigma
  FROM (SELECT root, id FROM {D}) s LEFT JOIN (
    SELECT d.root, d.v AS id, SUM(g.sigma) AS acc
    FROM sg{k-1} g JOIN wdag d ON d.root = g.root AND d.u = g.id
    GROUP BY d.root, d.v
  ) c ON c.root = s.root AND c.id = s.id)"""
        )
    S = f"sg{WBC_SD_UNROLL}"
    ctes += [
        f"""wfac AS MATERIALIZED (
  SELECT d.root, d.u, d.v,
         CAST(su.sigma AS DOUBLE) / CAST(sv.sigma AS DOUBLE) AS f
  FROM wdag d
  JOIN {S} su ON su.root = d.root AND su.id = d.u
  JOIN {S} sv ON sv.root = d.root AND sv.id = d.v)""",
        f"dl0 AS MATERIALIZED (SELECT root, id, 0e0 AS delta FROM {D})",
    ]
    for k in range(1, WBC_SD_UNROLL + 1):
        ctes.append(
            f"""dl{k} AS MATERIALIZED (
  SELECT s.root, s.id, COALESCE(c.acc, 0e0) AS delta
  FROM (SELECT root, id FROM {D}) s LEFT JOIN (
    SELECT f.root, f.u AS id, SUM(f.f * (1e0 + g.delta)) AS acc
    FROM dl{k-1} g JOIN wfac f ON f.root = g.root AND f.v = g.id
    GROUP BY f.root, f.u
  ) c ON c.root = s.root AND c.id = s.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT n.id, ROUND(COALESCE(b.bc, 0e0), 6) AS bc
FROM nodes n LEFT JOIN (
  SELECT id, SUM(delta) AS bc FROM dl{WBC_SD_UNROLL}
  WHERE id <> root GROUP BY id
) b ON b.id = n.id"""
    )


ORACLE["weighted_betweenness"] = _wbc_sql()
QUERIES["weighted_betweenness"] = q_weighted_betweenness


# ------------------------------------------- TPC-H completion (q2 q7 q8
# q9 q11 q15 q16 q20 q21) — the remaining nine of the 22, adapted where
# the synthetic schema lacks a table/column (no partsupp, no
# l_commitdate/l_receiptdate, no comment columns; each docstring states
# the stand-in). With these the full TPC-H query-shape suite is gated.


def _dec(c):
    return F.col(c).cast("decimal(18,4)")


def _disc_price(price="l_extendedprice", disc="l_discount"):
    return (
        _dec(price) * (F.lit(1).cast("decimal(18,4)") - _dec(disc))
    ).cast("decimal(28,8)")


def q_tpch_q2(spark, sf_dir):
    """TPC-H Q2 shape (min-cost supplier per part): correlated-min over a
    part→supplier relation. Adapted: no partsupp — the supply relation is
    DISTINCT (l_partkey, l_suppkey) from lineitem, and s_acctbal stands in
    for ps_supplycost (the correlated MIN target). Dims broadcast; the
    per-part MIN is a groupBy re-joined on (partkey, bal) — the classic
    decorrelation Catalyst would emit for the subquery."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").filter(F.col("p_size") == 15)
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    reg = spark.read.parquet(f"{sf_dir}/region.parquet").filter(
        F.col("r_name") == "EUROPE"
    )
    supply = li.select("l_partkey", "l_suppkey").distinct()
    eu = (
        sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        supply.join(F.broadcast(part), F.col("l_partkey") == part["p_partkey"])
        .join(F.broadcast(eu), F.col("l_suppkey") == F.col("s_suppkey"))
        .select("p_partkey", "s_suppkey", "s_name", "n_name", "s_acctbal")
    )
    min_bal = cand.groupBy(F.col("p_partkey").alias("mb_partkey")).agg(
        F.min("s_acctbal").alias("min_bal")
    )
    return (
        cand.join(
            F.broadcast(min_bal),
            (cand["p_partkey"] == min_bal["mb_partkey"])
            & (cand["s_acctbal"] == min_bal["min_bal"]),
        )
        .select(
            "p_partkey",
            "s_suppkey",
            "s_name",
            "n_name",
            F.round("s_acctbal", 2).alias("s_acctbal"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


ORACLE["tpch_q2"] = """
WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
eu AS (SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
       FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
       JOIN region r ON n.n_regionkey = r.r_regionkey WHERE r.r_name = 'EUROPE')
SELECT p.p_partkey, e.s_suppkey, e.s_name, e.n_name,
       ROUND(e.s_acctbal, 2) AS s_acctbal
FROM part p JOIN supply sp ON sp.l_partkey = p.p_partkey
JOIN eu e ON e.s_suppkey = sp.l_suppkey
WHERE p.p_size = 15
  AND e.s_acctbal = (SELECT MIN(e2.s_acctbal) FROM supply sp2
                     JOIN eu e2 ON e2.s_suppkey = sp2.l_suppkey
                     WHERE sp2.l_partkey = p.p_partkey)
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100"""

QUERIES["tpch_q2"] = q_tpch_q2


def q_tpch_q7(spark, sf_dir):
    """TPC-H Q7 shape (volume shipping between two trade partners):
    fact⨝fact⨝4-dim join, directional (supplier-side, customer-side)
    grouping by shipment year. Adapted: the nation pair is widened to the
    ASIA↔EUROPE region pair (the synthetic 100-supplier table is too thin
    for a single nation pair at small SF); grouping stays at nation grain
    so the directional-pair shape is intact."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1998-01-01"))
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    reg = spark.read.parquet(f"{sf_dir}/region.parquet")
    n1 = nat.join(reg, nat["n_regionkey"] == reg["r_regionkey"]).select(
        F.col("n_nationkey").alias("s_nk"),
        F.col("n_name").alias("supp_nation"),
        F.col("r_name").alias("supp_region"),
    )
    n2 = nat.join(reg, nat["n_regionkey"] == reg["r_regionkey"]).select(
        F.col("n_nationkey").alias("c_nk"),
        F.col("n_name").alias("cust_nation"),
        F.col("r_name").alias("cust_region"),
    )
    pair = (F.col("supp_region") == "ASIA") & (F.col("cust_region") == "EUROPE")
    rpair = (F.col("supp_region") == "EUROPE") & (F.col("cust_region") == "ASIA")
    return (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(n1), sup["s_nationkey"] == F.col("s_nk"))
        .join(F.broadcast(n2), cust["c_nationkey"] == F.col("c_nk"))
        .filter(pair | rpair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(
            F.round(F.sum(_disc_price()).cast("double"), 4).alias("revenue"),
            F.count("*").cast("long").alias("n_lines"),
        )
    )


ORACLE["tpch_q7"] = """
SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       CAST(year(l.l_shipdate) AS BIGINT) AS l_year,
       ROUND(CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))
                AS DECIMAL(28,8))) AS DOUBLE), 4) AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
JOIN region r1 ON n1.n_regionkey = r1.r_regionkey
JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
WHERE ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
    OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
  AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3"""

QUERIES["tpch_q7"] = q_tpch_q7


def q_tpch_q8(spark, sf_dir):
    """TPC-H Q8 shape (national market share): 8-way join, share =
    conditional-sum / total-sum per order year — the canonical
    ratio-of-aggregates over a CASE split. Decimal-exact numerator and
    denominator; the division is the only float step (deterministic on
    exact operands in both engines)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_type") == "ECONOMY"
    )
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01"))
        & (F.col("o_orderdate") < F.lit("1998-01-01"))
    )
    cust = spark.read.parquet(f"{sf_dir}/customer.parquet")
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    reg = spark.read.parquet(f"{sf_dir}/region.parquet").filter(
        F.col("r_name") == "AMERICA"
    )
    am_nat = nat.join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"]).select(
        F.col("n_nationkey").alias("c_nk")
    )
    sup_nat = nat.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")
    )
    vol = (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(am_nat), cust["c_nationkey"] == F.col("c_nk"))
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(F.broadcast(sup_nat), sup["s_nationkey"] == F.col("s_nk"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _disc_price().alias("volume"),
            "supp_nation",
        )
    )
    zero = F.lit(0).cast("decimal(28,8)")
    return vol.groupBy("o_year").agg(
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == "NATION_3", F.col("volume")).otherwise(
                    zero
                )
            ).cast("double")
            / F.sum("volume").cast("double"),
            6,
        ).alias("mkt_share"),
        F.count("*").cast("long").alias("n_lines"),
    )


ORACLE["tpch_q8"] = """
WITH vol AS (
  SELECT CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
         CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
              * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))
              AS DECIMAL(28,8)) AS volume,
         n1.n_name AS supp_nation
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  JOIN orders o ON l.l_orderkey = o.o_orderkey
  JOIN customer c ON o.o_custkey = c.c_custkey
  JOIN nation n2 ON c.c_nationkey = n2.n_nationkey
  JOIN region r ON n2.n_regionkey = r.r_regionkey
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n1 ON s.s_nationkey = n1.n_nationkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
SELECT o_year,
       ROUND(CAST(SUM(CASE WHEN supp_nation = 'NATION_3' THEN volume
                           ELSE CAST(0 AS DECIMAL(28,8)) END) AS DOUBLE)
             / CAST(SUM(volume) AS DOUBLE), 6) AS mkt_share,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM vol GROUP BY o_year"""

QUERIES["tpch_q8"] = q_tpch_q8


def q_tpch_q9(spark, sf_dir):
    """TPC-H Q9 shape (product-type profit by nation and year): LIKE
    filter on the part dim, 5-way join, profit = revenue − cost. Adapted:
    no partsupp.ps_supplycost — unit cost stands in as 60% of
    p_retailprice (exact at DECIMAL scale 8, so the aggregate is
    bit-stable across engines)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        F.col("p_name").like("%widget%")
    )
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    cost = (
        F.lit(0.6).cast("decimal(18,4)")
        * F.col("p_retailprice").cast("decimal(18,4)")
        * _dec("l_quantity")
    ).cast("decimal(28,8)")
    return (
        li.join(F.broadcast(part), li["l_partkey"] == part["p_partkey"])
        .join(F.broadcast(sup), li["l_suppkey"] == sup["s_suppkey"])
        .join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
        )
        .agg(
            F.round(F.sum(_disc_price() - cost).cast("double"), 4).alias(
                "sum_profit"
            )
        )
    )


ORACLE["tpch_q9"] = """
SELECT n.n_name AS nation, CAST(year(o.o_orderdate) AS BIGINT) AS o_year,
       ROUND(CAST(SUM(CAST(CAST(l.l_extendedprice AS DECIMAL(18,4))
                * (CAST(1 AS DECIMAL(18,4)) - CAST(l.l_discount AS DECIMAL(18,4)))
                AS DECIMAL(28,8))
              - CAST(CAST(0.6 AS DECIMAL(18,4))
                     * CAST(p.p_retailprice AS DECIMAL(18,4))
                     * CAST(l.l_quantity AS DECIMAL(18,4))
                AS DECIMAL(28,8))) AS DOUBLE), 4) AS sum_profit
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%widget%'
GROUP BY 1, 2"""

QUERIES["tpch_q9"] = q_tpch_q9


def q_tpch_q11(spark, sf_dir):
    """TPC-H Q11 shape (important stock): per-key value sum filtered by a
    scalar-subquery fraction of the grand total. Adapted: no partsupp —
    value is the summed l_extendedprice of lines shipped by ASIA-region
    suppliers, per part; threshold 0.1% of the total. The grand total is
    a 1-row aggregate cross-joined into the filter (the decorrelated
    plan); sums are decimal-exact, only the final threshold compare is
    float."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    reg = spark.read.parquet(f"{sf_dir}/region.parquet").filter(
        F.col("r_name") == "ASIA"
    )
    nsup = (
        sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .select("s_suppkey")
    )
    val = (
        li.join(F.broadcast(nsup), li["l_suppkey"] == F.col("s_suppkey"))
        .groupBy("l_partkey")
        .agg(F.sum(_dec("l_extendedprice")).alias("value_dec"))
    )
    total = val.agg(F.sum("value_dec").cast("double").alias("grand_total"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("value_dec").cast("double") > F.col("grand_total") * 0.001)
        .select("l_partkey", F.round(F.col("value_dec").cast("double"), 4).alias("value"))
    )


ORACLE["tpch_q11"] = """
WITH nsup AS (SELECT s_suppkey FROM supplier s
              JOIN nation n ON s.s_nationkey = n.n_nationkey
              JOIN region r ON n.n_regionkey = r.r_regionkey
              WHERE r.r_name = 'ASIA'),
val AS (SELECT l.l_partkey, SUM(CAST(l.l_extendedprice AS DECIMAL(18,4))) AS value
        FROM lineitem l JOIN nsup ns ON l.l_suppkey = ns.s_suppkey
        GROUP BY l.l_partkey)
SELECT l_partkey, ROUND(CAST(value AS DOUBLE), 4) AS value FROM val
WHERE CAST(value AS DOUBLE) > (SELECT CAST(SUM(value) AS DOUBLE) * 0.001 FROM val)"""

QUERIES["tpch_q11"] = q_tpch_q11


def q_tpch_q15(spark, sf_dir):
    """TPC-H Q15 shape (top supplier): revenue view over one quarter,
    then suppliers whose revenue equals MAX(revenue) — the
    scalar-subquery-equality pattern. Revenue is decimal-exact so the
    equality is safe across engines; the max is a 1-row aggregate
    cross-joined into the filter."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01"))
        & (F.col("l_shipdate") < F.lit("1996-04-01"))
    )
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    rev = li.groupBy("l_suppkey").agg(F.sum(_disc_price()).alias("total_rev"))
    mx = rev.agg(F.max("total_rev").alias("max_rev"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_rev") == F.col("max_rev"))
        .join(F.broadcast(sup), F.col("l_suppkey") == sup["s_suppkey"])
        .select(
            "s_suppkey",
            "s_name",
            F.round(F.col("total_rev").cast("double"), 4).alias("total_revenue"),
        )
    )


ORACLE["tpch_q15"] = """
WITH rev AS (
  SELECT l_suppkey,
         SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,4))
             * (CAST(1 AS DECIMAL(18,4)) - CAST(l_discount AS DECIMAL(18,4)))
             AS DECIMAL(28,8))) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey)
SELECT s.s_suppkey, s.s_name, ROUND(CAST(r.total_rev AS DOUBLE), 4) AS total_revenue
FROM supplier s JOIN rev r ON s.s_suppkey = r.l_suppkey
WHERE r.total_rev = (SELECT MAX(total_rev) FROM rev)"""

QUERIES["tpch_q15"] = q_tpch_q15


def q_tpch_q16(spark, sf_dir):
    """TPC-H Q16 shape (supplier count by part attributes): distinct
    part→supplier pairs, NOT-IN exclusion subquery, COUNT(DISTINCT) per
    (brand, type, size) over an IN-list size filter. Adapted: pairs come
    from lineitem (no partsupp); 'complaint' suppliers (excluded by the
    NOT IN) are those with negative account balance (no s_comment).
    The NOT IN is an anti-join (keys are non-null)."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet").filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 3, 5, 9, 15, 25, 40, 49)
    )
    bad = (
        spark.read.parquet(f"{sf_dir}/supplier.parquet")
        .filter(F.col("s_acctbal") < 0)
        .select("s_suppkey")
    )
    pairs = li.select("l_partkey", "l_suppkey").distinct()
    return (
        pairs.join(
            F.broadcast(bad), pairs["l_suppkey"] == bad["s_suppkey"], "left_anti"
        )
        .join(F.broadcast(part), pairs["l_partkey"] == part["p_partkey"])
        .groupBy("p_brand", "p_type", F.col("p_size").cast("long").alias("p_size"))
        .agg(F.countDistinct("l_suppkey").cast("long").alias("supplier_cnt"))
    )


ORACLE["tpch_q16"] = """
WITH pairs AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_brand, p.p_type, CAST(p.p_size AS BIGINT) AS p_size,
       CAST(COUNT(DISTINCT pr.l_suppkey) AS BIGINT) AS supplier_cnt
FROM pairs pr JOIN part p ON pr.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1' AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 3, 5, 9, 15, 25, 40, 49)
  AND pr.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3"""

QUERIES["tpch_q16"] = q_tpch_q16


def q_tpch_q20(spark, sf_dir):
    """TPC-H Q20 shape (excess-stock suppliers): nested IN subqueries —
    suppliers IN (shipped-enough-of-part set), parts IN (name-prefix
    set), region filter on the outer. Adapted: no partsupp.ps_availqty —
    'enough' is SUM(l_quantity) > 25 per (supplier, part) over parts
    named 'red%'. Both INs become semi-joins; the HAVING runs on the
    shuffled (suppkey, partkey) aggregate."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    red = (
        spark.read.parquet(f"{sf_dir}/part.parquet")
        .filter(F.col("p_name").like("red%"))
        .select("p_partkey")
    )
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    nat = spark.read.parquet(f"{sf_dir}/nation.parquet")
    reg = spark.read.parquet(f"{sf_dir}/region.parquet").filter(
        F.col("r_name") == "AFRICA"
    )
    enough = (
        li.join(F.broadcast(red), li["l_partkey"] == red["p_partkey"], "left_semi")
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 25)
        .select("l_suppkey")
        .distinct()
    )
    return (
        sup.join(F.broadcast(nat), sup["s_nationkey"] == nat["n_nationkey"])
        .join(F.broadcast(reg), nat["n_regionkey"] == reg["r_regionkey"])
        .join(enough, sup["s_suppkey"] == enough["l_suppkey"], "left_semi")
        .select("s_suppkey", "s_name")
    )


ORACLE["tpch_q20"] = """
SELECT s.s_suppkey, s.s_name
FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'AFRICA'
  AND s.s_suppkey IN (
    SELECT l.l_suppkey FROM lineitem l
    WHERE l.l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'red%')
    GROUP BY l.l_suppkey, l.l_partkey HAVING SUM(l.l_quantity) > 25)"""

QUERIES["tpch_q20"] = q_tpch_q20


def q_tpch_q21(spark, sf_dir):
    """TPC-H Q21 shape (suppliers who kept orders waiting): the
    EXISTS/NOT-EXISTS double-correlation — late lines on finished
    multi-supplier orders where this supplier was the ONLY late one.
    Adapted: no l_receiptdate/l_commitdate — 'late' is shipped more than
    60 days after the order date. EXISTS → left-semi, NOT EXISTS →
    left-anti, both on (same order, different supplier); counts stay at
    line grain like the reference query."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet").filter(
        F.col("o_orderstatus") == "F"
    )
    sup = spark.read.parquet(f"{sf_dir}/supplier.parquet")
    late = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .filter(
            F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
        )
        .select("l_orderkey", "l_suppkey")
    )
    others = li.select(
        F.col("l_orderkey").alias("o2_orderkey"), F.col("l_suppkey").alias("o2_suppkey")
    ).distinct()
    late_set = late.select(
        F.col("l_orderkey").alias("l3_orderkey"), F.col("l_suppkey").alias("l3_suppkey")
    ).distinct()
    waited = (
        late.join(
            others,
            (late["l_orderkey"] == others["o2_orderkey"])
            & (late["l_suppkey"] != others["o2_suppkey"]),
            "left_semi",
        )
        .join(
            late_set,
            (late["l_orderkey"] == late_set["l3_orderkey"])
            & (late["l_suppkey"] != late_set["l3_suppkey"]),
            "left_anti",
        )
    )
    return (
        waited.join(F.broadcast(sup), waited["l_suppkey"] == sup["s_suppkey"])
        .groupBy("s_name")
        .agg(F.count("*").cast("long").alias("numwait"))
    )


ORACLE["tpch_q21"] = """
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM lineitem l1 JOIN orders o ON l1.l_orderkey = o.o_orderkey
JOIN supplier s ON l1.l_suppkey = s.s_suppkey
WHERE o.o_orderstatus = 'F'
  AND l1.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
  AND EXISTS (SELECT 1 FROM lineitem l2
              WHERE l2.l_orderkey = l1.l_orderkey
                AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (SELECT 1 FROM lineitem l3
                  WHERE l3.l_orderkey = l1.l_orderkey
                    AND l3.l_suppkey <> l1.l_suppkey
                    AND l3.l_shipdate > o.o_orderdate + INTERVAL 60 DAY)
GROUP BY s.s_name"""

QUERIES["tpch_q21"] = q_tpch_q21


def q_avg_distance(spark, sf_dir):
    """ANF mean distance — Σ t·ΔN̂(t) over the reach gains, from the same
    rounded estimates as the neighborhood_function gate."""
    from .operators.anf import average_distance

    return average_distance(load_edges(spark, sf_dir), max_t=ANF_T, registers=ANF_R)


ORACLE["avg_distance"] = f"""
WITH anf AS ({_anf_sql()}),
g AS (SELECT t, avg_reach - lag(avg_reach) OVER (ORDER BY t) AS gain FROM anf)
SELECT ROUND(SUM(CAST(t AS DOUBLE) * gain) / SUM(gain), 6) AS avg_distance
FROM g WHERE t >= 1"""
QUERIES["avg_distance"] = q_avg_distance


def q_vertex_cover(spark, sf_dir):
    """2-approx vertex cover = endpoints of the maximal matching."""
    from .operators.matching import vertex_cover

    return vertex_cover(load_edges(spark, sf_dir))


ORACLE["vertex_cover"] = f"""
SELECT DISTINCT id FROM (
  SELECT src AS id FROM ({_matching_sql()})
  UNION ALL
  SELECT dst AS id FROM ({_matching_sql()})
)"""
QUERIES["vertex_cover"] = q_vertex_cover


# ------------------------------------------- s-t max-flow / min-cut

FLOW_AUG = 8        # augmentation budget (λ(s,t) = 4 on the gate graph)
FLOW_DEPTH = 16     # final-BFS reach unroll (measured ecc 14 at sf0.01)
FLOW_BFS_UNROLL = 12  # per-augmentation BFS unroll (max path depth 9)

FLOW_EDGES_SQL = f"""
  SELECT DISTINCT l_orderkey % {MODULUS} AS src, l_partkey % {MODULUS} AS dst
  FROM lineitem
  WHERE l_linenumber = 2 AND l_orderkey % {MODULUS} <> l_partkey % {MODULUS}
"""


def flow_edges(spark, sf_dir):
    """Sparser deterministic edge table for the flow gate (second line
    per order): avg out-degree ~2.3 at sf0.01, so λ(s,t) stays in single
    digits (measured 4) and Edmonds–Karp converges inside the unroll
    budget with ~40 total BFS levels."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    return (
        li.filter(F.col("l_linenumber") == 2)
        .select(
            (F.col("l_orderkey") % MODULUS).alias("src"),
            (F.col("l_partkey") % MODULUS).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def q_max_flow(spark, sf_dir):
    """Unit-capacity Edmonds–Karp between the top out-degree hub (s) and
    the top in-degree hub (t ≠ s, min-id tie-breaks): 1 row
    (max_flow, converged, s_side, cut_edges); cut_edges == max_flow at
    convergence is Menger's theorem landing in the artifact."""
    from .operators.flow import max_flow_summary

    edges = flow_edges(spark, sf_dir).persist()
    s = (
        edges.groupBy("src")
        .count()
        .orderBy(F.desc("count"), F.asc("src"))
        .limit(1)
        .collect()[0]["src"]
    )
    t = (
        edges.filter(F.col("dst") != s)
        .groupBy("dst")
        .count()
        .orderBy(F.desc("count"), F.asc("dst"))
        .limit(1)
        .collect()[0]["dst"]
    )
    out = max_flow_summary(
        edges, int(s), int(t), max_augment=FLOW_AUG, max_depth=FLOW_DEPTH
    )
    edges.unpersist()
    return out


def _flow_sql(
    edges_sql: str,
    cap_sql: str,
    aug: int,
    bfs_unroll: int,
    depth: int,
) -> str:
    """Full Edmonds-Karp unrolled in SQL: ``aug`` augmentations, each a
    ``bfs_unroll``-level min-parent residual BFS + parent walk + residual
    update by the path bottleneck, then a ``depth``-level final reach
    BFS. ``cap_sql`` is the integer capacity as an expression of
    (src, dst) — '1' for the unit/edge-connectivity case."""
    S = "(SELECT s FROM ssel)"
    T = "(SELECT t FROM tsel)"
    ctes = [
        f"fedges AS MATERIALIZED (SELECT src, dst, {cap_sql} AS cap "
        f"FROM ({edges_sql}))",
        "ssel AS (SELECT a AS s FROM (SELECT src AS a, COUNT(*) AS c "
        "FROM fedges GROUP BY src) ORDER BY c DESC, a LIMIT 1)",
        f"tsel AS (SELECT b AS t FROM (SELECT dst AS b, COUNT(*) AS c "
        f"FROM fedges WHERE dst <> {S} GROUP BY dst) ORDER BY c DESC, b LIMIT 1)",
        "res1 AS MATERIALIZED (SELECT src AS a, dst AS b, cap FROM fedges)",
    ]
    for k in range(1, aug + 1):
        ctes.append(
            f"f{k}_0 AS (SELECT {S} AS id, CAST(NULL AS BIGINT) AS parent)"
        )
        ctes.append(f"r{k}_0 AS (SELECT id FROM f{k}_0)")
        for d in range(1, bfs_unroll + 1):
            ctes.append(
                f"""f{k}_{d} AS MATERIALIZED (
  SELECT c.b AS id, MIN(c.a) AS parent
  FROM res{k} c JOIN f{k}_{d-1} f ON c.a = f.id
  WHERE c.cap > 0 AND c.b NOT IN (SELECT id FROM r{k}_{d-1})
  GROUP BY c.b)"""
            )
            ctes.append(
                f"r{k}_{d} AS MATERIALIZED (SELECT id FROM r{k}_{d-1} "
                f"UNION ALL SELECT id FROM f{k}_{d})"
            )
        pm_union = " UNION ALL ".join(
            f"SELECT id, parent FROM f{k}_{d}" for d in range(0, bfs_unroll + 1)
        )
        ctes.append(f"pm{k} AS MATERIALIZED ({pm_union})")
        ctes.append(
            f"p{k}_1 AS (SELECT id, parent FROM pm{k} WHERE id = {T})"
        )
        for i in range(2, bfs_unroll + 1):
            ctes.append(
                f"p{k}_{i} AS (SELECT m.id, m.parent FROM pm{k} m "
                f"JOIN p{k}_{i-1} q ON m.id = q.parent)"
            )
        path_union = " UNION ALL ".join(
            f"SELECT id, parent FROM p{k}_{i}" for i in range(1, bfs_unroll + 1)
        )
        ctes.append(
            f"""path{k} AS MATERIALIZED (
  SELECT parent AS pa, id AS pb FROM ({path_union}) WHERE parent IS NOT NULL)"""
        )
        ctes.append(
            f"""bot{k} AS (
  SELECT MIN(r.cap) AS b FROM path{k} p
  JOIN res{k} r ON r.a = p.pa AND r.b = p.pb)"""
        )
        ctes.append(
            f"""res{k+1} AS MATERIALIZED (
  SELECT a, b, SUM(cap) AS cap FROM (
    SELECT a, b, cap FROM res{k}
    UNION ALL SELECT pa AS a, pb AS b, -(SELECT b FROM bot{k}) AS cap FROM path{k}
    UNION ALL SELECT pb AS a, pa AS b, (SELECT b FROM bot{k}) AS cap FROM path{k}
  ) u GROUP BY a, b HAVING SUM(cap) > 0)"""
        )
    RK = aug + 1
    ctes.append(f"fF_0 AS (SELECT {S} AS id)")
    ctes.append("rF_0 AS (SELECT id FROM fF_0)")
    for d in range(1, depth + 1):
        ctes.append(
            f"""fF_{d} AS MATERIALIZED (
  SELECT DISTINCT c.b AS id
  FROM res{RK} c JOIN fF_{d-1} f ON c.a = f.id
  WHERE c.cap > 0 AND c.b NOT IN (SELECT id FROM rF_{d-1}))"""
        )
        ctes.append(
            f"rF_{d} AS MATERIALIZED (SELECT id FROM rF_{d-1} "
            f"UNION ALL SELECT id FROM fF_{d})"
        )
    RF = f"rF_{depth}"
    bot_union = " UNION ALL ".join(
        f"SELECT b FROM bot{k}" for k in range(1, aug + 1)
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT CAST((SELECT COALESCE(SUM(b), 0) FROM ({bot_union})) AS BIGINT) AS max_flow,
       (SELECT COUNT(*) FROM {RF} WHERE id = {T}) = 0 AS converged,
       CAST((SELECT COUNT(*) FROM {RF}) AS BIGINT) AS s_side,
       CAST((SELECT COUNT(*) FROM fedges e
             WHERE e.src IN (SELECT id FROM {RF})
               AND e.dst NOT IN (SELECT id FROM {RF})) AS BIGINT) AS cut_edges,
       CAST((SELECT COALESCE(SUM(e.cap), 0) FROM fedges e
             WHERE e.src IN (SELECT id FROM {RF})
               AND e.dst NOT IN (SELECT id FROM {RF})) AS BIGINT) AS cut_capacity"""
    )


ORACLE["max_flow"] = _flow_sql(
    FLOW_EDGES_SQL, "1", FLOW_AUG, FLOW_BFS_UNROLL, FLOW_DEPTH
)
QUERIES["max_flow"] = q_max_flow


# weighted variant: integer capacities 1..4 as a pure (src, dst) formula,
# on a smaller deterministic subgraph (model: 2 augmentations, bottleneck
# 2 each -> flow 4 over a 2-edge cut of capacity 4 at sf0.01)
FLOW_W_AUG = 6
FLOW_W_DEPTH = 8
FLOW_W_BFS_UNROLL = 8
FLOW_W_CAP_SQL = "1 + (src * 31 + dst) % 4"

FLOW_W_EDGES_SQL = f"""
  SELECT DISTINCT l_orderkey % {MODULUS} AS src, l_partkey % {MODULUS} AS dst
  FROM lineitem
  WHERE l_linenumber = 3 AND l_orderkey % 2 = 0
    AND l_orderkey % {MODULUS} <> l_partkey % {MODULUS}
"""


def q_max_flow_weighted(spark, sf_dir):
    """Integer-capacity Edmonds-Karp on the small deterministic subgraph:
    cut_capacity == max_flow (weighted Menger) with cut_edges < max_flow
    in the artifact — the capacities, not the edge count, bound the flow."""
    from .operators.flow import max_flow_summary

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    edges = (
        li.filter((F.col("l_linenumber") == 3) & (F.col("l_orderkey") % 2 == 0))
        .select(
            (F.col("l_orderkey") % MODULUS).alias("src"),
            (F.col("l_partkey") % MODULUS).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
        .withColumn(
            "cap", F.lit(1) + F.pmod(F.col("src") * 31 + F.col("dst"), F.lit(4))
        )
        .persist()
    )
    s = (
        edges.groupBy("src")
        .count()
        .orderBy(F.desc("count"), F.asc("src"))
        .limit(1)
        .collect()[0]["src"]
    )
    t = (
        edges.filter(F.col("dst") != s)
        .groupBy("dst")
        .count()
        .orderBy(F.desc("count"), F.asc("dst"))
        .limit(1)
        .collect()[0]["dst"]
    )
    out = max_flow_summary(
        edges, int(s), int(t), max_augment=FLOW_W_AUG,
        max_depth=FLOW_W_DEPTH, capacity_col="cap",
    )
    edges.unpersist()
    return out


ORACLE["max_flow_weighted"] = _flow_sql(
    FLOW_W_EDGES_SQL, FLOW_W_CAP_SQL, FLOW_W_AUG, FLOW_W_BFS_UNROLL, FLOW_W_DEPTH
)
QUERIES["max_flow_weighted"] = q_max_flow_weighted


# ------------------------------------------- temporal PageRank

TPR_WINDOWS = 6
TPR_CONTACTS_SQL = f"""
  SELECT user_id AS src,
         (user_id * 31 + event_id) % {150} AS dst,
         epoch_us(ts) AS t
  FROM events
"""


def q_temporal_pagerank(spark, sf_dir):
    """Windowed time-decayed PageRank over the events contact stream
    (same contact derivation as temporal_reachability)."""
    from .operators.temporal import temporal_pagerank

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    contacts = ev.select(
        F.col("user_id").alias("src"),
        ((F.col("user_id") * 31 + F.col("event_id")) % TR_NODE_MOD).alias("dst"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )
    out = temporal_pagerank(contacts, windows=TPR_WINDOWS, damping=DAMPING)
    return out.select(
        "id", F.round(F.col("rank") * F.lit(float(TR_NODE_MOD)), 6).alias("rank_scaled")
    )


def _temporal_pagerank_sql() -> str:
    d = DAMPING
    ctes = [
        f"contacts AS MATERIALIZED ({TPR_CONTACTS_SQL})",
        "span AS (SELECT MIN(t) AS tmin, MAX(t) - MIN(t) + 1 AS den FROM contacts)",
        f"""ew AS MATERIALIZED (
  SELECT w, src, dst, 1e0 / COUNT(*) OVER (PARTITION BY w, src) AS inv
  FROM (
    SELECT DISTINCT src, dst,
           ((t - (SELECT tmin FROM span)) * {TPR_WINDOWS}) // (SELECT den FROM span) AS w
    FROM contacts WHERE src <> dst))""",
        "nodes AS MATERIALIZED (SELECT DISTINCT id FROM "
        "(SELECT src AS id FROM contacts UNION ALL SELECT dst AS id FROM contacts))",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "g0 AS (SELECT id, 1e0 / (SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for w in range(TPR_WINDOWS):
        ctes.append(
            f"""g{w+1} AS MATERIALIZED (
  SELECT n.id,
         (1e0 - {d}) / (SELECT n FROM nn)
         + {d} * COALESCE(c.g, 0e0) AS rank
  FROM nodes n LEFT JOIN (
    SELECT e.dst AS id, SUM(g.rank * e.inv) AS g
    FROM g{w} g JOIN ew e ON e.src = g.id AND e.w = {w}
    GROUP BY e.dst
  ) c ON c.id = n.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT id, ROUND(rank * {float(TR_NODE_MOD)!r}, 6) AS rank_scaled "
        f"FROM g{TPR_WINDOWS}"
    )


ORACLE["temporal_pagerank"] = _temporal_pagerank_sql()
QUERIES["temporal_pagerank"] = q_temporal_pagerank


# ------------------------------------------------- linear threshold cascade

LT_SEED_MOD = 64
LT_ROUNDS = 6
LT_TH_MOD = 100


def q_lt_cascade(spark, sf_dir):
    """Deterministic Linear Threshold cascade (KKT 2003 model #2):
    uniform weights 1/indeg, exact-BIGINT thresholds, seeds id%64=0."""
    from .operators.influence import lt_cascade

    out = lt_cascade(
        load_edges(spark, sf_dir),
        seed_mod=LT_SEED_MOD,
        rounds=LT_ROUNDS,
        threshold_mod=LT_TH_MOD,
    )
    return out.select("id", F.col("round").cast("int").alias("step"))


def _lt_cascade_sql() -> str:
    m1 = LT_TH_MOD + 1
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "ind AS MATERIALIZED (SELECT dst AS id, COUNT(*) AS ind FROM edges GROUP BY dst)",
        f"a0 AS MATERIALIZED (SELECT id, 0 AS step FROM nodes WHERE id % {LT_SEED_MOD} = 0)",
    ]
    for r in range(1, LT_ROUNDS + 1):
        ctes.append(
            f"""a{r} AS MATERIALIZED (
  SELECT id, step FROM a{r-1}
  UNION ALL
  SELECT n.id, {r} AS step
  FROM nodes n
  JOIN ind d ON d.id = n.id
  JOIN (SELECT e.dst AS id, COUNT(*) AS m
        FROM a{r-1} a JOIN edges e ON e.src = a.id
        GROUP BY e.dst) c ON c.id = n.id
  WHERE n.id NOT IN (SELECT id FROM a{r-1})
    AND c.m * {m1} >= d.ind * (1 + (n.id * 131) % {LT_TH_MOD}))"""
        )
    return "WITH " + ",\n".join(ctes) + f"\nSELECT id, step FROM a{LT_ROUNDS}"


ORACLE["lt_cascade"] = _lt_cascade_sql()
QUERIES["lt_cascade"] = q_lt_cascade


# ------------------------------------------------------ CheiRank 2-D plane


def q_cheirank(spark, sf_dir):
    """(PageRank, CheiRank) 2-D rank plane (Zhirov & Shepelyansky 2010):
    the same power iteration over the graph and its transpose."""
    from .operators.pagerank import cheirank_plane

    out = cheirank_plane(load_edges(spark, sf_dir), damping=DAMPING, max_iter=PR_ITERS)
    return out.select(
        "id",
        F.round("pagerank", 6).alias("pr_scaled"),
        F.round("cheirank", 6).alias("cr_scaled"),
    )


def _cheirank_sql() -> str:
    base_factor = repr(1.0 - DAMPING)
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "degf AS MATERIALIZED (SELECT src AS id, COUNT(*) AS od FROM edges GROUP BY src)",
        "degr AS MATERIALIZED (SELECT dst AS id, COUNT(*) AS od FROM edges GROUP BY dst)",
        "r0 AS MATERIALIZED (SELECT id, 1e0/(SELECT n FROM nn) AS rank FROM nodes)",
        "c0 AS MATERIALIZED (SELECT id, 1e0/(SELECT n FROM nn) AS rank FROM nodes)",
    ]
    for i in range(1, PR_ITERS + 1):
        ctes.append(
            f"""r{i} AS MATERIALIZED (
  SELECT nodes.id,
         CAST({base_factor} AS DOUBLE)/(SELECT n FROM nn)
         + CAST({DAMPING!r} AS DOUBLE) * COALESCE(x.contrib, 0e0) AS rank
  FROM nodes LEFT JOIN (
    SELECT e.dst AS id, SUM(r.rank / d.od) AS contrib
    FROM r{i-1} r JOIN edges e ON e.src = r.id JOIN degf d ON d.id = r.id
    GROUP BY e.dst
  ) x ON nodes.id = x.id)"""
        )
        ctes.append(
            f"""c{i} AS MATERIALIZED (
  SELECT nodes.id,
         CAST({base_factor} AS DOUBLE)/(SELECT n FROM nn)
         + CAST({DAMPING!r} AS DOUBLE) * COALESCE(x.contrib, 0e0) AS rank
  FROM nodes LEFT JOIN (
    SELECT e.src AS id, SUM(r.rank / d.od) AS contrib
    FROM c{i-1} r JOIN edges e ON e.dst = r.id JOIN degr d ON d.id = r.id
    GROUP BY e.src
  ) x ON nodes.id = x.id)"""
        )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT r.id,
       ROUND(r.rank * (SELECT n FROM nn), 6) AS pr_scaled,
       ROUND(c.rank * (SELECT n FROM nn), 6) AS cr_scaled
FROM r{PR_ITERS} r JOIN c{PR_ITERS} c ON c.id = r.id"""
    )


ORACLE["cheirank"] = _cheirank_sql()
QUERIES["cheirank"] = q_cheirank


# --------------------------------------------- signed structural balance


def q_balance_census(spark, sf_dir):
    """Cartwright-Harary balance census over deterministically signed
    triangles (sign = - iff (min·31+max) mod 7 < 3, the house
    synthetic-attribute convention; mod 7 so the census is not
    parity-degenerate)."""
    from .operators.triangles import balance_census

    return balance_census(load_edges(spark, sf_dir))


ORACLE["balance_census"] = f"""WITH edges AS ({EDGES_SQL}),
und AS (
  SELECT DISTINCT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst
  FROM edges WHERE src <> dst
),
tri AS (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM und e1 JOIN und e2 ON e1.dst = e2.src
  JOIN und e3 ON e3.src = e1.src AND e3.dst = e2.dst
)
SELECT n_neg,
       CAST(COUNT(*) AS BIGINT) AS n_triangles,
       (n_neg % 2 = 0) AS balanced
FROM (
  SELECT CAST((a*31 + b) % 7 < 3 AS BIGINT)
       + CAST((b*31 + c) % 7 < 3 AS BIGINT)
       + CAST((a*31 + c) % 7 < 3 AS BIGINT) AS n_neg
  FROM tri
) GROUP BY n_neg"""
QUERIES["balance_census"] = q_balance_census


# ------------------------------------------- temporal triangle motifs

TM_DELTA = 86_400_000_000  # 1 day in µs — calibrated: both motif classes populate at sf0.01


def q_temporal_motifs(spark, sf_dir):
    """δ-temporal triangle motif census (Paranjape-Benson-Leskovec, WSDM
    2017): cycle vs feed-forward closures of a→b→c within δ = 1 day over
    the events contact stream (same derivation as temporal_reachability)."""
    from .operators.temporal import temporal_triangle_motifs

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    contacts = ev.select(
        F.col("user_id").alias("src"),
        ((F.col("user_id") * 31 + F.col("event_id")) % TR_NODE_MOD).alias("dst"),
        F.unix_micros(F.col("ts").cast("timestamp")).alias("t"),
    )
    return temporal_triangle_motifs(contacts, delta=TM_DELTA)


ORACLE["temporal_motifs"] = f"""WITH tc AS MATERIALIZED (
  SELECT DISTINCT user_id AS src,
         (user_id * 31 + event_id) % {TR_NODE_MOD} AS dst,
         epoch_us(ts) AS t
  FROM events
  WHERE user_id <> (user_id * 31 + event_id) % {TR_NODE_MOD}),
wedge AS MATERIALIZED (
  SELECT c1.src AS a, c1.dst AS b, c2.dst AS c, c1.t AS t1, c2.t AS t2
  FROM tc c1
  JOIN tc c2 ON c2.src = c1.dst
            AND c2.t > c1.t AND c2.t <= c1.t + {TM_DELTA}
            AND c2.dst <> c1.src),
hits AS (
  SELECT CASE WHEN c3.src = w.c THEN 'cycle' ELSE 'ffl' END AS motif
  FROM wedge w
  JOIN tc c3 ON c3.t > w.t2 AND c3.t <= w.t1 + {TM_DELTA}
            AND ((c3.src = w.c AND c3.dst = w.a)
              OR (c3.src = w.a AND c3.dst = w.c)))
SELECT motif, CAST(COUNT(*) AS BIGINT) AS n FROM hits GROUP BY motif"""
QUERIES["temporal_motifs"] = q_temporal_motifs


# ---------------------------------------------- Burt network constraint


def q_burt_constraint(spark, sf_dir):
    """Burt's structural-holes constraint (uniform tie strengths) per
    vertex, 6 dp."""
    from .operators.triangles import burt_constraint

    return burt_constraint(load_edges(spark, sf_dir)).withColumnRenamed(
        "constraint", "constraint_score"
    )


ORACLE["burt_constraint"] = f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
und AS MATERIALIZED ({UND_SQL}),
deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS deg FROM und GROUP BY src),
padj AS MATERIALIZED (
  SELECT u.src AS i, u.dst AS j, 1e0 / d.deg AS p
  FROM und u JOIN deg d ON d.id = u.src),
ind AS MATERIALIZED (
  SELECT l.i, r.j, SUM(l.p * r.p) AS ind
  FROM padj l
  JOIN padj r ON r.i = l.j AND l.i <> r.j
  JOIN und u ON u.src = l.i AND u.dst = r.j
  GROUP BY l.i, r.j)
SELECT p.i AS id, ROUND(SUM(POWER(p.p + COALESCE(x.ind, 0e0), 2)), 6) AS constraint_score
FROM padj p LEFT JOIN ind x ON x.i = p.i AND x.j = p.j
GROUP BY p.i"""
QUERIES["burt_constraint"] = q_burt_constraint


# ------------------------------------------------- truncated PageRank

TPR_TRUNC_T = 2
TPR_TRUNC_MAX = 8


def q_truncated_pagerank(spark, sf_dir):
    """Becchetti et al. truncated PageRank (short-path support removed) —
    the link-farm detection feature, T=2, horizon 8."""
    from .operators.pagerank import truncated_pagerank

    return truncated_pagerank(
        load_edges(spark, sf_dir),
        damping=DAMPING,
        truncate=TPR_TRUNC_T,
        max_iter=TPR_TRUNC_MAX,
    )


def _truncated_pagerank_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        "nn AS (SELECT COUNT(*) AS n FROM nodes)",
        "deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS od FROM edges GROUP BY src)",
        "x0 AS MATERIALIZED (SELECT id, 1e0/(SELECT n FROM nn) AS x FROM nodes)",
    ]
    for t in range(1, TPR_TRUNC_MAX + 1):
        ctes.append(
            f"""x{t} AS MATERIALIZED (
  SELECT nodes.id, COALESCE(c.nx, 0e0) AS x
  FROM nodes LEFT JOIN (
    SELECT e.dst AS id, SUM(r.x / d.od) AS nx
    FROM x{t-1} r JOIN edges e ON e.src = r.id JOIN deg d ON d.id = r.id
    GROUP BY e.dst
  ) c ON nodes.id = c.id)"""
        )
    base = repr(1.0 - DAMPING)
    # same constants, same multiply/divide shape, same left-assoc addition
    # order as the Spark accumulator (coef_t · x_t added for t = T+1..Tmax)
    terms = " + ".join(
        f"(CAST({base} AS DOUBLE)/(SELECT n FROM nn))"
        f" * CAST({DAMPING ** t!r} AS DOUBLE) * x{t}.x"
        for t in range(TPR_TRUNC_T + 1, TPR_TRUNC_MAX + 1)
    )
    joins = " ".join(
        f"JOIN x{t} ON x{t}.id = nodes.id"
        for t in range(TPR_TRUNC_T + 1, TPR_TRUNC_MAX + 1)
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"\nSELECT nodes.id, ROUND(({terms}) * (SELECT n FROM nn), 6) AS trunc_rank"
        + f"\nFROM nodes {joins}"
    )


ORACLE["truncated_pagerank"] = _truncated_pagerank_sql()
QUERIES["truncated_pagerank"] = q_truncated_pagerank


# ---------------------------------------------------- Eulerian census


def q_eulerian(spark, sf_dir):
    """Eulerian circuit/path feasibility census (Euler 1736): odd-degree
    and connectivity obstructions over the undirected simple graph."""
    from .operators.components import eulerian_census

    return eulerian_census(load_edges(spark, sf_dir))


def _eulerian_sql() -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        f"und AS MATERIALIZED ({UND_SQL})",
        "c0 AS MATERIALIZED (SELECT id, id AS component FROM nodes)",
    ]
    for i in range(1, CC_UNROLL + 1):
        ctes.append(
            f"""c{i} AS MATERIALIZED (
  SELECT c.id,
         CASE WHEN m.nmin IS NOT NULL AND m.nmin < c.component
              THEN m.nmin ELSE c.component END AS component
  FROM c{i-1} c LEFT JOIN (
    SELECT u.dst AS id, MIN(p.component) AS nmin
    FROM c{i-1} p JOIN und u ON u.src = p.id
    GROUP BY u.dst
  ) m ON c.id = m.id)"""
        )
    ctes.append(
        "deg AS MATERIALIZED (SELECT src AS id, COUNT(*) AS deg FROM und GROUP BY src)"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
       CAST(SUM(deg.deg % 2) AS BIGINT) AS n_odd,
       CAST(COUNT(DISTINCT c.component) AS BIGINT) AS n_components,
       (SUM(deg.deg % 2) = 0 AND COUNT(DISTINCT c.component) = 1) AS has_circuit,
       (SUM(deg.deg % 2) <= 2 AND COUNT(DISTINCT c.component) = 1) AS has_path
FROM deg JOIN c{CC_UNROLL} c ON c.id = deg.id"""
    )


ORACLE["eulerian"] = _eulerian_sql()
QUERIES["eulerian"] = q_eulerian


# ---------------------------------------------------- Gonzalez k-center

KC_K = 3
KC_UNROLL = 10  # ≥ und diameter at every SF (verified ≤ 8)


def q_k_center(spark, sf_dir):
    """Gonzalez farthest-point k-center (TCS 1985), k=3, hop metric;
    deterministic seeding/tie-breaks documented on the operator."""
    from .operators.kcenter import k_center

    return k_center(load_edges(spark, sf_dir), k=KC_K, max_iter=KC_UNROLL)


def _k_center_sql() -> str:
    U = KC_UNROLL
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        f"und AS MATERIALIZED ({UND_SQL})",
        "sel1 AS (SELECT MIN(id) AS c FROM nodes)",
    ]

    def bfs(s: int) -> None:
        ctes.append(
            f"b{s}_0 AS MATERIALIZED (SELECT id,"
            f" CASE WHEN id = (SELECT c FROM sel{s}) THEN 0 END AS d FROM nodes)"
        )
        for i in range(1, U + 1):
            ctes.append(
                f"""b{s}_{i} AS MATERIALIZED (
  SELECT p.id,
         CASE WHEN c.cand IS NULL THEN p.d
              WHEN p.d IS NULL OR c.cand < p.d THEN c.cand
              ELSE p.d END AS d
  FROM b{s}_{i-1} p LEFT JOIN (
    SELECT u.dst AS id, MIN(q.d + 1) AS cand
    FROM b{s}_{i-1} q JOIN und u ON u.src = q.id
    WHERE q.d IS NOT NULL GROUP BY u.dst
  ) c ON p.id = c.id)"""
            )

    bfs(1)
    ctes.append(f"m1 AS (SELECT id, d AS dist FROM b1_{U})")
    for s in range(2, KC_K + 1):
        ctes.append(
            f"""sel{s} AS (
  SELECT id AS c FROM m{s-1}
  ORDER BY (dist IS NOT NULL) ASC, dist DESC, id ASC LIMIT 1)"""
        )
        bfs(s)
        if s < KC_K:
            ctes.append(
                f"""m{s} AS (
  SELECT m.id,
         CASE WHEN m.dist IS NULL THEN b.d
              WHEN b.d IS NULL OR m.dist <= b.d THEN m.dist
              ELSE b.d END AS dist
  FROM m{s-1} m JOIN b{s}_{U} b ON b.id = m.id)"""
            )
    cand = "\nUNION ALL\n".join(
        f"SELECT id, (SELECT c FROM sel{s}) AS center, d AS dist"
        f" FROM b{s}_{U} WHERE d IS NOT NULL"
        for s in range(1, KC_K + 1)
    )
    ctes.append(f"cand AS ({cand})")
    return (
        "WITH " + ",\n".join(ctes)
        + """
SELECT id, center, CAST(dist AS BIGINT) AS dist FROM (
  SELECT id, center, dist,
         ROW_NUMBER() OVER (PARTITION BY id ORDER BY dist, center) AS rn
  FROM cand) WHERE rn = 1"""
    )


ORACLE["k_center"] = _k_center_sql()
QUERIES["k_center"] = q_k_center


# ------------------------------------------------ dK-2 joint degree matrix


def q_joint_degree_matrix(spark, sf_dir):
    """dK-2 degree-correlation profile (Mahadevan et al., SIGCOMM 2006):
    histogram of sorted endpoint-degree pairs over undirected edges."""
    from .graph import joint_degree_matrix

    return joint_degree_matrix(load_edges(spark, sf_dir))


ORACLE["joint_degree_matrix"] = f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
und AS MATERIALIZED ({UND_SQL}),
ordered AS MATERIALIZED (SELECT src, dst FROM und WHERE src < dst),
deg AS (SELECT src AS id, COUNT(*) AS deg FROM und GROUP BY src)
SELECT LEAST(a.deg, b.deg) AS deg_lo,
       GREATEST(a.deg, b.deg) AS deg_hi,
       CAST(COUNT(*) AS BIGINT) AS n_edges
FROM ordered o JOIN deg a ON a.id = o.src JOIN deg b ON b.id = o.dst
GROUP BY 1, 2"""
QUERIES["joint_degree_matrix"] = q_joint_degree_matrix


# ------------------------------------------------------- c(k) curve


def q_clustering_by_degree(spark, sf_dir):
    """Ravasz-Barabási hierarchical-modularity fingerprint: mean local
    clustering coefficient per degree class."""
    from .graph import clustering_by_degree

    return clustering_by_degree(load_edges(spark, sf_dir))


ORACLE["clustering_by_degree"] = f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
und AS MATERIALIZED ({UND_SQL}),
ordered AS MATERIALIZED (SELECT src, dst FROM und WHERE src < dst),
deg AS (SELECT src AS id, COUNT(*) AS deg FROM und GROUP BY src),
tris AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM ordered e1 JOIN ordered e2 ON e1.dst = e2.src
  JOIN ordered e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
corners AS (
  SELECT a AS id FROM tris UNION ALL SELECT b FROM tris UNION ALL SELECT c FROM tris
),
tpn AS (SELECT id, COUNT(*) AS t FROM corners GROUP BY id),
coef AS (
  SELECT d.id, d.deg,
         ROUND(CASE WHEN d.deg >= 2
                    THEN 2e0 * COALESCE(t.t, 0) / (d.deg * (d.deg - 1))
                    ELSE 0e0 END, 6) AS coefficient
  FROM deg d LEFT JOIN tpn t ON d.id = t.id)
SELECT CAST(deg AS BIGINT) AS degree,
       CAST(COUNT(*) AS BIGINT) AS n_nodes,
       ROUND(AVG(coefficient), 6) AS avg_coefficient
FROM coef GROUP BY deg"""
QUERIES["clustering_by_degree"] = q_clustering_by_degree


# ------------------------------------------- 3-node graphlet orbit counts


def q_orbit_counts(spark, sf_dir):
    """Pržulj graphlet degree vector, 3-node orbits 0-3 (degree, wedge-end,
    wedge-center, triangle corner) — exact BIGINT."""
    from .operators.linkpred import orbit_counts

    return orbit_counts(load_edges(spark, sf_dir))


ORACLE["orbit_counts"] = f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
und AS MATERIALIZED ({UND_SQL}),
ordered AS MATERIALIZED (SELECT src, dst FROM und WHERE src < dst),
deg AS (SELECT src AS id, COUNT(*) AS deg FROM und GROUP BY src),
tris AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM ordered e1 JOIN ordered e2 ON e1.dst = e2.src
  JOIN ordered e3 ON e3.src = e1.src AND e3.dst = e2.dst
),
corners AS (
  SELECT a AS id FROM tris UNION ALL SELECT b FROM tris UNION ALL SELECT c FROM tris
),
tpn AS (SELECT id, COUNT(*) AS t FROM corners GROUP BY id),
nsum AS (
  SELECT u.src AS id, SUM(d.deg - 1) AS s
  FROM und u JOIN deg d ON d.id = u.dst GROUP BY u.src)
SELECT d.id,
       CAST(d.deg AS BIGINT) AS orbit0,
       CAST(COALESCE(n.s, 0) - 2 * COALESCE(t.t, 0) AS BIGINT) AS orbit1,
       CAST(d.deg * (d.deg - 1) / 2 - COALESCE(t.t, 0) AS BIGINT) AS orbit2,
       CAST(COALESCE(t.t, 0) AS BIGINT) AS orbit3
FROM deg d LEFT JOIN tpn t ON t.id = d.id LEFT JOIN nsum n ON n.id = d.id"""
QUERIES["orbit_counts"] = q_orbit_counts


# ---------------------------------------------------- edge dispersion


def q_edge_dispersion(spark, sf_dir):
    """Backstrom-Kleinberg dispersion per undirected edge (CSCW 2014),
    base distance d(s,t) = 1{not directly linked}; exact BIGINT."""
    from .operators.linkpred import edge_dispersion

    return edge_dispersion(load_edges(spark, sf_dir))


ORACLE["edge_dispersion"] = f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
und AS MATERIALIZED ({UND_SQL}),
ordered AS MATERIALIZED (SELECT src, dst FROM und WHERE src < dst),
cn AS MATERIALIZED (
  SELECT o.src, o.dst, u1.dst AS s
  FROM ordered o
  JOIN und u1 ON u1.src = o.src AND u1.dst <> o.dst
  JOIN und u2 ON u2.src = o.dst AND u2.dst = u1.dst),
ncn AS (SELECT src, dst, COUNT(*) AS n FROM cn GROUP BY src, dst),
k4 AS (
  SELECT c1.src, c1.dst, COUNT(*) AS k
  FROM cn c1
  JOIN ordered e ON e.src = c1.s
  JOIN cn c2 ON c2.src = c1.src AND c2.dst = c1.dst AND c2.s = e.dst
  GROUP BY c1.src, c1.dst)
SELECT o.src, o.dst,
       CAST(COALESCE(n.n, 0) AS BIGINT) AS n_common,
       CAST(COALESCE(n.n, 0) * (COALESCE(n.n, 0) - 1) / 2
            - COALESCE(k.k, 0) AS BIGINT) AS dispersion
FROM ordered o
LEFT JOIN ncn n ON n.src = o.src AND n.dst = o.dst
LEFT JOIN k4 k ON k.src = o.src AND k.dst = o.dst"""
QUERIES["edge_dispersion"] = q_edge_dispersion


# ------------------------------------------- motif (triangle) spectral


def q_motif_fiedler(spark, sf_dir):
    """Benson-Gleich-Leskovec motif spectral embedding (Science 2016):
    normalized Fiedler iterate over the triangle motif adjacency
    W_ij = #triangles containing (i,j); bisecting on it optimizes motif
    conductance."""
    from .operators.spectral import fiedler_vector_normalized
    from .operators.truss import motif_adjacency

    e = load_edges(spark, sf_dir)
    out = fiedler_vector_normalized(
        e, max_iter=FIEDLER_ITERS, weighted_adj=motif_adjacency(e)
    )
    return out.select(
        "id",
        F.col("d").cast("long").alias("motif_deg"),
        F.round("nfiedler", 6).alias("nfiedler"),
    )


def _motif_fiedler_sql(iters: int = FIEDLER_ITERS) -> str:
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"und AS MATERIALIZED ({UND_SQL})",
        "ordered AS MATERIALIZED (SELECT src, dst FROM und WHERE src < dst)",
        """tris AS MATERIALIZED (
  SELECT e1.src AS a, e1.dst AS b, e2.dst AS c
  FROM ordered e1 JOIN ordered e2 ON e1.dst = e2.src
  JOIN ordered e3 ON e3.src = e1.src AND e3.dst = e2.dst)""",
        """supp AS MATERIALIZED (
  SELECT src, dst, CAST(COUNT(*) AS DOUBLE) AS w FROM (
    SELECT a AS src, b AS dst FROM tris
    UNION ALL SELECT b, c FROM tris
    UNION ALL SELECT a, c FROM tris
  ) GROUP BY src, dst)""",
        """undw AS MATERIALIZED (
  SELECT src, dst, w FROM supp
  UNION ALL SELECT dst AS src, src AS dst, w FROM supp)""",
        "deg AS MATERIALIZED (SELECT src AS id, SUM(w) AS d FROM undw GROUP BY src)",
        "s2 AS (SELECT SUM(d) AS v FROM deg)",
        "x0 AS MATERIALIZED (SELECT id, d, SQRT(d) AS sd,"
        " CAST((id * 2654435761) % 1048576 AS DOUBLE)/1048576e0 - 0.5e0 AS x"
        " FROM deg)",
    ]
    for i in range(1, iters + 1):
        pr = f"((SELECT syd FROM st{i}) / (SELECT v FROM s2))"
        ctes.append(
            f"""y{i} AS (
  SELECT s.id, s.d, s.sd, s.x + COALESCE(g.g, 0e0) / s.sd AS y
  FROM x{i-1} s LEFT JOIN (
    SELECT u.dst AS id, SUM(u.w * (s2x.x / s2x.sd)) AS g
    FROM x{i-1} s2x JOIN undw u ON u.src = s2x.id GROUP BY u.dst
  ) g ON g.id = s.id),
st{i} AS (SELECT SUM(y*sd) AS syd, SUM(y*y) AS syy FROM y{i}),
x{i} AS MATERIALIZED (
  SELECT id, d, sd,
         (y - {pr} * sd)
         / SQRT((SELECT syy FROM st{i})
                - 2e0 * {pr} * (SELECT syd FROM st{i})
                + ({pr} * {pr}) * (SELECT v FROM s2)) AS x
  FROM y{i})"""
        )
    ctes.append(
        f"sgn AS (SELECT CASE WHEN x >= 0e0 THEN 1e0 ELSE -1e0 END AS s"
        f" FROM x{iters} ORDER BY ABS(x) DESC, id LIMIT 1)"
    )
    return (
        "WITH " + ",\n".join(ctes)
        + f"""
SELECT id, CAST(d AS BIGINT) AS motif_deg,
       ROUND(x * (SELECT s FROM sgn), 6) AS nfiedler FROM x{iters}"""
    )


ORACLE["motif_fiedler"] = _motif_fiedler_sql()
QUERIES["motif_fiedler"] = q_motif_fiedler


# ------------------------------------------------- small-world sigma

SW_ROOTS = CLOSE_ROOTS  # the closeness gate's sampled-root convention


def q_small_world(spark, sf_dir):
    """Humphries-Gurney small-world coefficient σ = (C/C_rand)/(L/L_rand)
    with exact transitivity C, root-sampled exact L, and closed-form ER
    baselines."""
    from .operators.traversal import small_world_sigma

    return small_world_sigma(load_edges(spark, sf_dir), roots=SW_ROOTS)


def _small_world_sql() -> str:
    roots = ", ".join(f"({r})" for r in sorted(set(SW_ROOTS)))
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        f"und AS MATERIALIZED ({UND_SQL})",
        "ord2 AS MATERIALIZED (SELECT src, dst FROM und WHERE src < dst)",
        f"roots(root) AS (VALUES {roots})",
        "m0 AS MATERIALIZED (SELECT r.root, n.id, "
        "CASE WHEN n.id = r.root THEN 0 END AS depth FROM nodes n CROSS JOIN roots r)",
    ]
    for i in range(1, BFS_UNROLL + 1):
        ctes.append(
            f"""m{i} AS MATERIALIZED (
  SELECT p.root, p.id,
         CASE WHEN c.cand IS NULL THEN p.depth
              WHEN p.depth IS NULL OR c.cand < p.depth THEN c.cand
              ELSE p.depth END AS depth
  FROM m{i-1} p LEFT JOIN (
    SELECT q.root, u.dst AS id, MIN(q.depth + 1) AS cand
    FROM m{i-1} q JOIN und u ON u.src = q.id
    WHERE q.depth IS NOT NULL GROUP BY q.root, u.dst
  ) c ON p.root = c.root AND p.id = c.id
)"""
        )
    ctes += [
        "nm AS (SELECT COUNT(DISTINCT src) AS n, CAST(COUNT(*) / 2 AS BIGINT) AS m FROM und)",
        "deg AS (SELECT src AS id, COUNT(*) AS d FROM und GROUP BY src)",
        "wed AS (SELECT CAST(COALESCE(SUM(d * (d - 1)), 0) // 2 AS BIGINT) AS wedges FROM deg)",
        """tri AS (SELECT CAST(COUNT(*) AS BIGINT) AS triangles
        FROM ord2 e1 JOIN ord2 e2 ON e1.dst = e2.src
        JOIN ord2 e3 ON e3.src = e1.src AND e3.dst = e2.dst)""",
        f"ls AS (SELECT SUM(depth) AS sd, COUNT(*) AS np FROM m{BFS_UNROLL}"
        " WHERE depth IS NOT NULL AND depth > 0)",
        "cx AS (SELECT ROUND(3e0 * triangles / wedges, 6) AS c_raw FROM wed, tri)",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + """
SELECT nm.n AS n_nodes, nm.m AS n_edges,
       ROUND(cx.c_raw, 6) AS c,
       ROUND((2e0 * nm.m / nm.n) / (nm.n - 1), 6) AS c_rand,
       ROUND(ls.sd / CAST(ls.np AS DOUBLE), 6) AS l_hat,
       ROUND(LN(CAST(nm.n AS DOUBLE)) / LN(2e0 * nm.m / nm.n), 6) AS l_rand,
       ROUND((cx.c_raw / ((2e0 * nm.m / nm.n) / (nm.n - 1)))
             / ((ls.sd / CAST(ls.np AS DOUBLE))
                / (LN(CAST(nm.n AS DOUBLE)) / LN(2e0 * nm.m / nm.n))), 6) AS sigma
FROM nm, wed, tri, ls, cx"""
    )


ORACLE["small_world"] = _small_world_sql()
QUERIES["small_world"] = q_small_world


# -------------------------------------------- Molloy-Reed robustness


def q_molloy_reed(spark, sf_dir):
    """Molloy-Reed giant-component criterion κ=⟨k²⟩/⟨k⟩ and the Cohen
    random-failure threshold f_c = 1 − 1/(κ−1)."""
    from .operators.percolation import molloy_reed

    return molloy_reed(load_edges(spark, sf_dir))


ORACLE["molloy_reed"] = f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
und AS MATERIALIZED ({UND_SQL}),
deg AS (SELECT src AS id, COUNT(*) AS d FROM und GROUP BY src),
a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d) AS BIGINT) AS s1,
             CAST(SUM(d * d) AS BIGINT) AS s2 FROM deg)
SELECT n AS n_nodes,
       ROUND(CAST(s1 AS DOUBLE) / n, 6) AS k_mean,
       ROUND(CAST(s2 AS DOUBLE) / n, 6) AS k2_mean,
       ROUND(CAST(s2 AS DOUBLE) / s1, 6) AS kappa,
       (CAST(s2 AS DOUBLE) / s1 > 2e0) AS robust,
       CASE WHEN CAST(s2 AS DOUBLE) / s1 > 1e0
            THEN ROUND(1e0 - 1e0 / (CAST(s2 AS DOUBLE) / s1 - 1e0), 6)
       END AS f_c
FROM a"""
QUERIES["molloy_reed"] = q_molloy_reed


# ---------------------------------------------- power-law KS distance

PLKS_DMIN = 4


def q_powerlaw_ks(spark, sf_dir):
    """Clauset-Shalizi-Newman KS goodness-of-fit of the Hill power-law
    fit to the degree tail (continuous CCDF form)."""
    from .graph import powerlaw_ks

    return powerlaw_ks(load_edges(spark, sf_dir), d_min=PLKS_DMIN)


ORACLE["powerlaw_ks"] = f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
und AS MATERIALIZED ({UND_SQL}),
deg AS (SELECT src AS id, COUNT(*) AS d FROM und GROUP BY src),
hist AS (SELECT d, CAST(COUNT(*) AS BIGINT) AS c FROM deg
         WHERE d >= {PLKS_DMIN} GROUP BY d),
tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tail,
               SUM(c * LN(d / {float(PLKS_DMIN)!r})) AS lg FROM hist),
ccdf AS (SELECT d, CAST(SUM(c) OVER (ORDER BY d DESC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
         FROM hist)
SELECT CAST({PLKS_DMIN} AS BIGINT) AS d_min,
       t.n_tail,
       ROUND(1e0 + t.n_tail / t.lg, 6) AS alpha,
       ROUND(MAX(ABS(CAST(cum AS DOUBLE) / t.n_tail
                 - POWER(d / {float(PLKS_DMIN)!r},
                         1e0 - (1e0 + t.n_tail / t.lg)))), 6) AS ks
FROM ccdf, tot t GROUP BY t.n_tail, t.lg"""
QUERIES["powerlaw_ks"] = q_powerlaw_ks


# -------------------------------------------- sliding event windows


def q_event_sliding_counts(spark, sf_dir):
    """Sliding windows (10-min window, 5-min slide) per event type — the
    batch replay of the streaming sliding-window aggregation (each event
    lands in exactly window/slide = 2 overlapping windows, exploded as
    epoch buckets so the oracle needs no timezone gymnastics)."""
    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    b = (F.col("ts").cast("timestamp").cast("long") / 300).cast("long")
    return (
        ev.withColumn("wstart", F.explode(F.array(b - 1, b)))
        .groupBy("wstart", "event_type")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
    )


ORACLE["event_sliding_counts"] = """WITH b AS (
  SELECT event_type, value,
         CAST(CAST(floor(epoch(ts)) AS BIGINT) // 300 AS BIGINT) AS bucket
  FROM events),
x AS (
  SELECT event_type, value, bucket - 1 AS wstart FROM b
  UNION ALL
  SELECT event_type, value, bucket AS wstart FROM b)
SELECT wstart, event_type, CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 4) AS sum_value
FROM x GROUP BY wstart, event_type"""
QUERIES["event_sliding_counts"] = q_event_sliding_counts


# ------------------------------------------- WL subtree graph kernel

WLK_ROUNDS = 2
EDGES_B_SQL = f"""
  SELECT DISTINCT l_partkey % {MODULUS} AS src, l_suppkey % {MODULUS} AS dst
  FROM lineitem
  WHERE l_partkey % {MODULUS} <> l_suppkey % {MODULUS}
"""


def q_wl_kernel(spark, sf_dir):
    """Shervashidze et al. WL subtree kernel between the order-part link
    graph and the part-supplier graph — per-round color-histogram inner
    products, exact BIGINT."""
    from .operators.wl import wl_kernel

    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    b = (
        li.select(
            (F.col("l_partkey") % MODULUS).alias("src"),
            (F.col("l_suppkey") % MODULUS).alias("dst"),
        )
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )
    return wl_kernel(load_edges(spark, sf_dir), b, rounds=WLK_ROUNDS)


def _wl_kernel_sql() -> str:
    def lane(col: str, lo: int) -> str:
        return f"CAST(('0x' || substr({col}, {lo}, 8)) AS BIGINT)"

    def chain(p: str, edges_sql: str) -> list[str]:
        ctes = [
            f"{p}edges AS MATERIALIZED ({edges_sql})",
            f"""{p}nodes AS MATERIALIZED (SELECT DISTINCT id FROM (
  SELECT src AS id FROM {p}edges UNION ALL SELECT dst AS id FROM {p}edges))""",
            f"{p}dino AS (SELECT dst AS id, COUNT(*) AS d FROM {p}edges GROUP BY dst)",
            f"{p}douto AS (SELECT src AS id, COUNT(*) AS d FROM {p}edges GROUP BY src)",
            f"""{p}c0 AS MATERIALIZED (
  SELECT n.id,
         md5('wl0:' || CAST(COALESCE(di.d, 0) AS VARCHAR)
             || ':' || CAST(COALESCE(dou.d, 0) AS VARCHAR)) AS color
  FROM {p}nodes n LEFT JOIN {p}dino di ON di.id = n.id
  LEFT JOIN {p}douto dou ON dou.id = n.id)""",
        ]
        for r in range(1, WLK_ROUNDS + 1):
            ctes.append(
                f"""{p}h{r} AS (SELECT id, {lane('color', 1)} AS ha,
  {lane('color', 9)} AS hb FROM {p}c{r-1}),
{p}i{r} AS (SELECT e.dst AS id, COUNT(*) AS ic, SUM(h.ha) AS ia, SUM(h.hb) AS ib
  FROM {p}edges e JOIN {p}h{r} h ON h.id = e.src GROUP BY e.dst),
{p}o{r} AS (SELECT e.src AS id, COUNT(*) AS oc, SUM(h.ha) AS oa, SUM(h.hb) AS ob
  FROM {p}edges e JOIN {p}h{r} h ON h.id = e.dst GROUP BY e.src),
{p}c{r} AS MATERIALIZED (
  SELECT c.id,
         md5(c.color
             || ':' || CAST(COALESCE(i.ic, 0) AS VARCHAR)
             || ':' || CAST(COALESCE(i.ia, 0) AS VARCHAR)
             || ':' || CAST(COALESCE(i.ib, 0) AS VARCHAR)
             || ':' || CAST(COALESCE(o.oc, 0) AS VARCHAR)
             || ':' || CAST(COALESCE(o.oa, 0) AS VARCHAR)
             || ':' || CAST(COALESCE(o.ob, 0) AS VARCHAR)) AS color
  FROM {p}c{r-1} c LEFT JOIN {p}i{r} i ON i.id = c.id
  LEFT JOIN {p}o{r} o ON o.id = c.id)"""
            )
        return ctes

    ctes = chain("a_", EDGES_SQL) + chain("b_", EDGES_B_SQL)
    rounds_sql = "\nUNION ALL\n".join(
        f"""SELECT CAST({h} AS BIGINT) AS round,
       CAST(COALESCE(SUM(x.na * y.nb), 0) AS BIGINT) AS k
FROM (SELECT color, COUNT(*) AS na FROM a_c{h} GROUP BY color) x
JOIN (SELECT color, COUNT(*) AS nb FROM b_c{h} GROUP BY color) y
  ON y.color = x.color"""
        for h in range(WLK_ROUNDS + 1)
    )
    return "WITH " + ",\n".join(ctes) + "\n" + rounds_sql


ORACLE["wl_kernel"] = _wl_kernel_sql()
QUERIES["wl_kernel"] = q_wl_kernel


# ------------------------------------------ directed assortativity


def q_directed_assortativity(spark, sf_dir):
    """Foster et al. (PNAS 2010) four-mode directed degree-correlation
    profile r_{αβ}, α,β ∈ {in, out}."""
    from .graph import directed_assortativity

    return directed_assortativity(load_edges(spark, sf_dir))


ORACLE["directed_assortativity"] = f"""WITH edges AS MATERIALIZED ({EDGES_SQL}),
nodes AS MATERIALIZED ({NODES_SQL}),
dg AS MATERIALIZED (
  SELECT n.id,
         COALESCE(i.d, 0) AS di, COALESCE(o.d, 0) AS do_
  FROM nodes n
  LEFT JOIN (SELECT dst AS id, COUNT(*) AS d FROM edges GROUP BY dst) i ON i.id = n.id
  LEFT JOIN (SELECT src AS id, COUNT(*) AS d FROM edges GROUP BY src) o ON o.id = n.id),
ends AS MATERIALIZED (
  SELECT s.di AS si, s.do_ AS so, t.di, t.do_ AS do2
  FROM edges e JOIN dg s ON s.id = e.src JOIN dg t ON t.id = e.dst),
m AS (SELECT CAST(COUNT(*) AS BIGINT) AS m,
             CAST(SUM(si) AS BIGINT) AS s_si, CAST(SUM(si*si) AS BIGINT) AS q_si,
             CAST(SUM(so) AS BIGINT) AS s_so, CAST(SUM(so*so) AS BIGINT) AS q_so,
             CAST(SUM(di) AS BIGINT) AS s_di, CAST(SUM(di*di) AS BIGINT) AS q_di,
             CAST(SUM(do2) AS BIGINT) AS s_do, CAST(SUM(do2*do2) AS BIGINT) AS q_do,
             CAST(SUM(si*di) AS BIGINT) AS p_ii, CAST(SUM(si*do2) AS BIGINT) AS p_io,
             CAST(SUM(so*di) AS BIGINT) AS p_oi, CAST(SUM(so*do2) AS BIGINT) AS p_oo
      FROM ends)
SELECT 'in-in' AS mode,
       CASE WHEN m*q_si - s_si*s_si > 0 AND m*q_di - s_di*s_di > 0
            THEN ROUND(CAST(m*p_ii - s_si*s_di AS DOUBLE)
                       / SQRT(CAST(m*q_si - s_si*s_si AS DOUBLE))
                       / SQRT(CAST(m*q_di - s_di*s_di AS DOUBLE)), 6) END AS r FROM m
UNION ALL
SELECT 'in-out',
       CASE WHEN m*q_si - s_si*s_si > 0 AND m*q_do - s_do*s_do > 0
            THEN ROUND(CAST(m*p_io - s_si*s_do AS DOUBLE)
                       / SQRT(CAST(m*q_si - s_si*s_si AS DOUBLE))
                       / SQRT(CAST(m*q_do - s_do*s_do AS DOUBLE)), 6) END FROM m
UNION ALL
SELECT 'out-in',
       CASE WHEN m*q_so - s_so*s_so > 0 AND m*q_di - s_di*s_di > 0
            THEN ROUND(CAST(m*p_oi - s_so*s_di AS DOUBLE)
                       / SQRT(CAST(m*q_so - s_so*s_so AS DOUBLE))
                       / SQRT(CAST(m*q_di - s_di*s_di AS DOUBLE)), 6) END FROM m
UNION ALL
SELECT 'out-out',
       CASE WHEN m*q_so - s_so*s_so > 0 AND m*q_do - s_do*s_do > 0
            THEN ROUND(CAST(m*p_oo - s_so*s_do AS DOUBLE)
                       / SQRT(CAST(m*q_so - s_so*s_so AS DOUBLE))
                       / SQRT(CAST(m*q_do - s_do*s_do AS DOUBLE)), 6) END FROM m"""
QUERIES["directed_assortativity"] = q_directed_assortativity


# ------------------------------------------------ rank-biased overlap

RBO_P = 0.9


def q_rbo(spark, sf_dir):
    """Webber-Moffat-Zobel RBO_MIN@100 between the PageRank and in-degree
    top-K rankings (the rank_agreement pair, top-weighted)."""
    from pyspark.sql import Window

    from .functions.metrics import rank_biased_overlap

    a = (
        q_pagerank(spark, sf_dir)
        .orderBy(F.desc("rank_scaled"), F.asc("id"))
        .limit(RANKCMP_K)
        .withColumn(
            "pos",
            F.row_number().over(Window.orderBy(F.desc("rank_scaled"), F.asc("id"))),
        )
        .select("id", "pos")
    )
    e = load_edges(spark, sf_dir)
    b = (
        e.groupBy(F.col("dst").alias("id"))
        .agg(F.count(F.lit(1)).alias("ind"))
        .orderBy(F.desc("ind"), F.asc("id"))
        .limit(RANKCMP_K)
        .withColumn(
            "pos", F.row_number().over(Window.orderBy(F.desc("ind"), F.asc("id")))
        )
        .select("id", "pos")
    )
    return rank_biased_overlap(a, b, p=RBO_P, k=RANKCMP_K)


def _rbo_sql() -> str:
    from .functions.metrics import rbo_coefficients

    chain = _pagerank_sql()
    body = chain[: chain.rindex("\nSELECT id, ROUND")]
    coefs = ", ".join(
        f"({d}, {c!r})" for d, c in rbo_coefficients(RBO_P, RANKCMP_K)
    )
    return (
        body
        + f""",
prk AS (
  SELECT id, ROW_NUMBER() OVER (ORDER BY rs DESC, id ASC) AS pos FROM (
    SELECT id, ROUND(rank * (SELECT n FROM nn), 6) AS rs FROM r{PR_ITERS}
    ORDER BY rs DESC, id ASC LIMIT {RANKCMP_K})),
dg AS (
  SELECT id, ROW_NUMBER() OVER (ORDER BY ind DESC, id ASC) AS pos FROM (
    SELECT dst AS id, COUNT(*) AS ind FROM edges GROUP BY dst
    ORDER BY ind DESC, id ASC LIMIT {RANKCMP_K})),
hist AS (
  SELECT GREATEST(prk.pos, dg.pos) AS m, COUNT(*) AS c
  FROM prk JOIN dg ON dg.id = prk.id
  WHERE GREATEST(prk.pos, dg.pos) <= {RANKCMP_K}
  GROUP BY 1),
coefs(d, coef) AS (VALUES {coefs}),
inter AS (
  SELECT coefs.d, coefs.coef, COALESCE(SUM(hist.c), 0) AS inter_d
  FROM coefs LEFT JOIN hist ON hist.m <= coefs.d
  GROUP BY coefs.d, coefs.coef)
SELECT CAST({RANKCMP_K} AS BIGINT) AS k,
       CAST({RBO_P!r} AS DOUBLE) AS p,
       ROUND(SUM(coef * inter_d / d), 6) AS rbo
FROM inter"""
    )


ORACLE["rbo"] = _rbo_sql()
QUERIES["rbo"] = q_rbo


# -------------------------------------------- percolation centrality

PC_STATE_MOD = 100


def q_percolation_centrality(spark, sf_dir):
    """Piraveenan-Prokopenko-Hossain percolation centrality — the
    betweenness gate's K-root Brandes with per-source infection weights
    x_s = ((s·31) mod 100)/100 folded into the final aggregation."""
    from .operators.bc import percolation_centrality

    edges = load_edges(spark, sf_dir)
    roots = [
        r["id"]
        for r in edges.selectExpr("src AS id")
        .union(edges.selectExpr("dst AS id"))
        .distinct()
        .orderBy("id")
        .limit(BC_ROOTS_K)
        .collect()
    ]
    return percolation_centrality(
        edges, roots=roots, max_depth=BC_UNROLL, state_mod=PC_STATE_MOD
    )


def _percolation_centrality_sql() -> str:
    ctes = _bc_ctes()
    all_deltas = " UNION ALL ".join(
        f"SELECT root, id, delta FROM delta{d}" for d in range(BC_UNROLL + 1)
    )
    ctes.append(f"alldelta AS MATERIALIZED ({all_deltas})")
    m = PC_STATE_MOD
    ctes.append(
        f"""wsum AS (SELECT SUM(CAST((root * 31) % {m} AS DOUBLE) / {m}) AS sx,
                  (SELECT COUNT(*) FROM nodes) AS n FROM roots)"""
    )
    return (
        "WITH "
        + ",\n".join(ctes)
        + f"""
SELECT n.id,
       CASE WHEN ((SELECT sx FROM wsum)
                  - CAST((n.id * 31) % {m} AS DOUBLE) / {m})
                 * ((SELECT n FROM wsum) - 2) > 0
            THEN ROUND(COALESCE(b.bc, 0e0)
                       / (((SELECT sx FROM wsum)
                           - CAST((n.id * 31) % {m} AS DOUBLE) / {m})
                          * ((SELECT n FROM wsum) - 2)), 6)
            ELSE 0e0 END AS pc
FROM nodes n LEFT JOIN (
  SELECT id, SUM(delta * (CAST((root * 31) % {m} AS DOUBLE) / {m})) AS bc
  FROM alldelta WHERE id <> root GROUP BY id
) b ON b.id = n.id"""
    )


ORACLE["percolation_centrality"] = _percolation_centrality_sql()
QUERIES["percolation_centrality"] = q_percolation_centrality


# ---------------------------------------------- global efficiency


def q_global_efficiency(spark, sf_dir):
    """Latora-Marchiori global efficiency, root-sampled (the closeness
    gate's root convention); unreachable pairs contribute 0."""
    from .operators.traversal import global_efficiency

    return global_efficiency(load_edges(spark, sf_dir), roots=SW_ROOTS)


def _global_efficiency_sql() -> str:
    roots = ", ".join(f"({r})" for r in sorted(set(SW_ROOTS)))
    ctes = [
        f"edges AS MATERIALIZED ({EDGES_SQL})",
        f"nodes AS MATERIALIZED ({NODES_SQL})",
        f"und AS MATERIALIZED ({UND_SQL})",
        f"roots(root) AS (VALUES {roots})",
        "m0 AS MATERIALIZED (SELECT r.root, n.id, "
        "CASE WHEN n.id = r.root THEN 0 END AS depth FROM nodes n CROSS JOIN roots r)",
    ]
    for i in range(1, BFS_UNROLL + 1):
        ctes.append(
            f"""m{i} AS MATERIALIZED (
  SELECT p.root, p.id,
         CASE WHEN c.cand IS NULL THEN p.depth
              WHEN p.depth IS NULL OR c.cand < p.depth THEN c.cand
              ELSE p.depth END AS depth
  FROM m{i-1} p LEFT JOIN (
    SELECT q.root, u.dst AS id, MIN(q.depth + 1) AS cand
    FROM m{i-1} q JOIN und u ON u.src = q.id
    WHERE q.depth IS NOT NULL GROUP BY q.root, u.dst
  ) c ON p.root = c.root AND p.id = c.id
)"""
        )
    ctes += [
        "nm AS (SELECT COUNT(*) AS n,"
        " SUM(CASE WHEN id IN (SELECT root FROM roots) THEN 1 ELSE 0 END) AS kr"
        " FROM nodes)",
        f"s AS (SELECT SUM(1e0 / depth) AS se FROM m{BFS_UNROLL}"
        " WHERE depth IS NOT NULL AND depth > 0)",
    ]
    return (
        "WITH " + ",\n".join(ctes)
        + """
SELECT CAST(nm.n AS BIGINT) AS n_nodes,
       CAST(nm.kr AS BIGINT) AS n_roots,
       CASE WHEN nm.kr > 0 AND nm.n > 1
            THEN ROUND(COALESCE(s.se, 0e0) / (nm.kr * (nm.n - 1)), 6)
            ELSE 0e0 END AS efficiency
FROM nm, s"""
    )


ORACLE["global_efficiency"] = _global_efficiency_sql()
QUERIES["global_efficiency"] = q_global_efficiency
