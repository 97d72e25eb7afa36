"""Round benchmark — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "total headline seconds", "value": N, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1, ...}

Load-awareness (this box carries bursty external tenant load, 2-28 in
/proc/loadavg, invisible in our PID namespace — an ungated single-shot
bench measures the neighbors, not the engine):
- the run start is GATED on loadavg < $SPARK_GRAFT_BENCH_GATE (default 4.0),
  waiting up to $SPARK_GRAFT_BENCH_WAIT seconds (default 1200; 0 disables)
  and recording how long it waited and at what load it started;
- repeats are spread across WHOLE-LIST PASSES, not run back-to-back: the
  full query list runs end-to-end $SPARK_GRAFT_BENCH_REPEATS times
  (default 2) and each query reports its MINIMUM across passes. A
  sub-minute tenant burst (invisible to the 1-min loadavg) lands on
  *different* queries in different passes instead of owning both samples
  of one 3-second query — the failure mode that produced the contended
  r4 artifact. After the passes, queries whose minimum is still below
  $SPARK_GRAFT_BENCH_CHEAP seconds (default 15) get ONE more sample
  (cheap by construction, ~a minute total) so every floor-dominated
  kernel has ≥3 spread-out chances at a quiet window;
- a run exceeding $SPARK_GRAFT_BENCH_REPEAT_CAP seconds (default 90)
  stops further repeats of that query (bounds total wall time) — the
  JSON carries every raw run;
- /proc/loadavg is recorded before and after every run per query, and the
  JVM is nudged to GC between queries (frees dead localCheckpoint blocks
  that otherwise pile into executor memory pressure), so a contended
  artifact is *visibly* contended instead of silently wrong.

The primary BASELINE.json metric (PageRank edges/sec per iteration) is
reported alongside; scripts/scaling.py produces the N-vs-4N-cores scaling
evidence recorded in BENCH/BASELINE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PR_ITERS = 10


def loadavg() -> float:
    try:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])
    except OSError:
        return -1.0


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "2"))
    # every headline query runs < 20s clean; the 90s cap only suppresses
    # repeats of runs so burst-poisoned that repeating them would blow the
    # wall-time budget without improving the recorded minimum
    repeat_cap = float(os.environ.get("SPARK_GRAFT_BENCH_REPEAT_CAP", "90"))
    cheap_cutoff = float(os.environ.get("SPARK_GRAFT_BENCH_CHEAP", "15"))
    gate = float(os.environ.get("SPARK_GRAFT_BENCH_GATE", "4.0"))
    max_wait = float(os.environ.get("SPARK_GRAFT_BENCH_WAIT", "1200"))
    try:
        sf = float(sf_dir.rstrip("/").split("sf")[-1])
    except ValueError:
        sf = None

    waited = 0.0
    while max_wait > 0 and loadavg() >= gate and waited < max_wait:
        time.sleep(30)
        waited += 30
    start_load = loadavg()

    from pyspark.storagelevel import StorageLevel

    from llama_spark.entry_queries import load_edges
    from llama_spark.session import get_spark

    spark = get_spark(app_name="llama_spark_bench", cores=cpus, shuffle_partitions=cpus)

    edges = load_edges(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    n_edges = edges.count()

    times: dict[str, float] = {}
    runs: dict[str, list[float]] = {}
    loads: dict[str, list[float]] = {}
    extras: dict[str, float] = {}
    plan: list[tuple[str, object]] = []

    def timed(name: str, fn) -> None:
        # register only — execution happens in whole-list passes below so
        # one sub-minute burst can't own every sample of the same query
        plan.append((name, fn))

    def run_once(name: str, fn) -> float:
        loads.setdefault(name, []).append(loadavg())
        t0 = time.time()
        fn()
        dt = time.time() - t0
        loads[name].append(loadavg())
        runs.setdefault(name, []).append(round(dt, 3))
        # free dead localCheckpoint/cache blocks before the next query's
        # timing window (ContextCleaner only acts after a JVM GC)
        try:
            spark.sparkContext._jvm.System.gc()
        except Exception:
            pass
        return dt

    from llama_spark.operators.components import connected_components, label_propagation
    from llama_spark.operators.csr import pagerank_csr
    from llama_spark.operators.pagerank import pagerank_result
    from llama_spark.operators.traversal import bfs_depths
    from llama_spark.operators.triangles import triangle_count

    from llama_spark.functions.dedup import lsh_candidate_pairs
    from llama_spark.functions.similarity import cosine_topk
    from llama_spark.operators.bc import betweenness_centrality

    pr_holder: dict[str, list[float]] = {}

    def run_pagerank():
        res = pagerank_result(edges, max_iter=PR_ITERS)
        res.state.count()
        # best (steady-state) iteration across repeats
        pr_holder.setdefault("iter_secs", []).extend(m.seconds for m in res.metrics)

    timed("pagerank10", run_pagerank)
    timed("pagerank10_csr", lambda: pagerank_csr(edges, max_iter=PR_ITERS).count())
    timed("connected_components", lambda: connected_components(edges).count())
    timed("label_propagation5", lambda: label_propagation(edges, max_iter=5).count())
    timed("triangle_count", lambda: triangle_count(edges))
    timed("bfs", lambda: bfs_depths(edges, root=0, max_iter=16).count())
    timed(
        "betweenness_k4",
        lambda: betweenness_centrality(edges, roots=[0, 1, 2, 3], max_depth=12).count(),
    )
    # reference default operating point: K=100 random roots
    # (bc_random.h, benchmark.cc:1474)
    timed(
        "betweenness_k100",
        lambda: betweenness_centrality(edges, k=100, max_depth=12).count(),
    )

    from llama_spark.operators.kcore import coreness
    from llama_spark.operators.scc import strongly_connected_components
    from llama_spark.operators.truss import k_truss

    timed("scc", lambda: strongly_connected_components(edges).count())
    timed("coreness", lambda: coreness(edges).count())
    timed("k_truss4", lambda: k_truss(edges, k=4).count())

    # K=64 sampled-root closeness — exercises the sparse multi-source BFS
    # (only reached (root,id) rows materialize; the dense K·V state this
    # replaced wrote 64×V rows per depth)
    from llama_spark.operators.bc import pick_roots
    from llama_spark.operators.traversal import closeness_centrality

    roots64 = pick_roots(edges, 64)
    timed("closeness_k64", lambda: closeness_centrality(edges, roots=roots64).count())

    from llama_spark.operators.walks import random_walks

    timed("random_walks_l4", lambda: random_walks(edges, walk_length=4).count())

    from llama_spark.graph import with_synthetic_weights
    from llama_spark.operators.mis import maximal_independent_set
    from llama_spark.operators.mst import minimum_spanning_forest

    timed("mis", lambda: maximal_independent_set(edges).count())
    timed(
        "mst",
        lambda: minimum_spanning_forest(with_synthetic_weights(edges)).count(),
    )

    from llama_spark.graph import assortativity
    from llama_spark.operators.anf import hyperball_harmonic, neighborhood_function
    from llama_spark.operators.components import louvain_communities
    from llama_spark.operators.hits import hits

    from llama_spark.operators.centrality import katz_centrality

    timed("hits8", lambda: hits(edges, max_iter=8).count())
    timed("katz8", lambda: katz_centrality(edges, max_iter=8).count())
    timed("anf_t6", lambda: neighborhood_function(edges, max_t=6).count())
    timed("hyperball_t6", lambda: hyperball_harmonic(edges, max_t=6).count())
    timed("louvain4", lambda: louvain_communities(edges, max_iter=4).count())
    timed("assortativity", lambda: assortativity(edges).count())

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    timed("minhash_lsh_dedup", lambda: lsh_candidate_pairs(docs).count())
    timed("cosine_topk", lambda: cosine_topk(emb, k=5, n_queries=20).count())

    from llama_spark.functions.similarity import ivf_ann

    timed("ivf_ann", lambda: ivf_ann(emb, k=5, n_queries=20).count())

    from llama_spark.functions.dedup import simhash_near_dup_pairs

    timed("simhash_pairs", lambda: simhash_near_dup_pairs(docs).count())

    from llama_spark.functions.dedup import segment_dedup
    from llama_spark.functions.similarity import neighbor_mean_embeddings
    from llama_spark.operators.linkpred import cocitation_pairs
    from llama_spark.operators.truss import trussness

    timed("trussness4", lambda: trussness(edges, rounds=4).count())
    timed(
        "cocitation_cap64",
        lambda: cocitation_pairs(edges, top_k=25, hub_cap=64).count(),
    )
    timed("segment_dedup", lambda: segment_dedup(docs).count())
    timed(
        "neighbor_features_d8",
        lambda: neighbor_mean_embeddings(edges, emb, dims=8).count(),
    )

    from llama_spark.functions.text import bigram_logprob
    from llama_spark.operators.densest import densest_subgraph_trace
    from llama_spark.operators.sparsify import edge_overlap
    from llama_spark.operators.sweep import ppr_sweep

    timed(
        "ppr_sweep64",
        lambda: ppr_sweep(edges, sources=[0], max_iter=6, top_r=64).count(),
    )
    timed("edge_overlap", lambda: edge_overlap(edges).count())
    timed("densest_peel", lambda: densest_subgraph_trace(edges, eps=0.5)[0].count())
    timed("bigram_nll", lambda: bigram_logprob(docs).count())

    def pages_pipeline() -> None:
        from llama_spark.api import GraphSession
        from llama_spark.sources.pages import generate_pages

        pages = generate_pages(spark, scale=13, avg_degree=8)
        g = GraphSession(spark).from_pages(pages)
        extras["pages_pipeline_edges"] = g.edges.count()
        g.pagerank(max_iter=3).count()

    from llama_spark.operators.bowtie import bowtie_census
    from llama_spark.operators.matching import maximal_matching
    from llama_spark.operators.percolation import attack_percolation
    from llama_spark.operators.triads import triad_census
    from llama_spark.operators.trust import spam_mass

    timed("triad_census", lambda: triad_census(edges).count())
    timed("bowtie", lambda: bowtie_census(edges).count())
    timed("matching", lambda: maximal_matching(edges).count())
    timed("spam_mass", lambda: spam_mass(edges, seeds=[0, 42, 1234]).count())
    timed("attack_5pct", lambda: attack_percolation(edges, frac=0.05).count())

    from llama_spark.operators.diffusion import heat_kernel_pagerank
    from llama_spark.operators.linkpred import scan_statistic
    from llama_spark.operators.traversal import landmark_distances

    timed("heat_kernel_k6", lambda: heat_kernel_pagerank(edges).count())

    from llama_spark.operators.diffusion import trophic_levels, truncated_hitting_time

    timed(
        "hitting_time_h8",
        lambda: truncated_hitting_time(edges, seeds=[0, 42, 1234]).count(),
    )
    timed("trophic12", lambda: trophic_levels(edges, max_iter=12).count())

    from llama_spark.operators.centrality import nonbacktracking_centrality

    timed(
        "nonbacktracking6",
        lambda: nonbacktracking_centrality(edges, max_iter=6).count(),
    )

    from llama_spark.operators.trust import sybilrank

    timed(
        "sybilrank12",
        lambda: sybilrank(edges, seeds=[0, 42, 1234], max_iter=12).count(),
    )
    timed(
        "landmarks_k8q64",
        lambda: landmark_distances(
            edges, k_landmarks=8, query_ids=list(range(64))
        ).count(),
    )
    timed("scan_statistic", lambda: scan_statistic(edges).count())
    # clique_percolation is deliberately NOT a headline row: the sf0.1 gate
    # graph is avg-degree ~144 (4096 ids, 589k edges), so its triangle
    # edge-overlap graph is ~30M links collapsing into one giant community
    # — a shape real web graphs don't take; the operator is gated at sf0.01

    from llama_spark.functions.cluster import embedding_covariance
    from llama_spark.functions.text import source_profile
    from llama_spark.graph import avg_neighbor_degree
    from llama_spark.operators.traversal import widest_paths

    timed(
        "widest_path",
        lambda: widest_paths(
            with_synthetic_weights(edges), root=0, max_iter=16
        ).count(),
    )
    timed("knn_curve", lambda: avg_neighbor_degree(edges).count())
    timed("embedding_cov16", lambda: embedding_covariance(emb, dims=16).count())
    timed("source_profile", lambda: source_profile(docs).count())

    from llama_spark.functions.text import dsir_weights
    from llama_spark.operators.partition import spinner_partition
    from llama_spark.operators.spectral import fiedler_vector

    from pyspark.sql import functions as FF

    from llama_spark.operators.pagerank import topic_sensitive_pagerank

    timed("fiedler10", lambda: fiedler_vector(edges, max_iter=10).count())
    timed(
        "topic_pagerank4",
        lambda: topic_sensitive_pagerank(
            edges,
            topic_of=FF.when((FF.col("id") % 64) < 4, FF.col("id") % 64),
            n_topics=4,
            max_iter=8,
        ).count(),
    )
    timed(
        "partition_k8", lambda: spinner_partition(edges, k=8, rounds=6).count()
    )
    timed("dsir_weights", lambda: dsir_weights(docs).count())

    from llama_spark.operators.textrank import (
        doc_keywords,
        keyword_textrank,
        textrank_documents,
    )

    timed("textrank8", lambda: textrank_documents(docs, max_iter=8).count())
    timed(
        "keyword_textrank8", lambda: keyword_textrank(docs, max_iter=8).count()
    )
    timed(
        "doc_keywords6", lambda: doc_keywords(docs, max_iter=6, top_k=5).count()
    )

    from llama_spark.operators.bc import weighted_betweenness_centrality

    timed(
        "weighted_betweenness_k4",
        lambda: weighted_betweenness_centrality(
            with_synthetic_weights(edges), roots=[0, 1, 2, 3]
        ).count(),
    )

    timed("pages_extract_pagerank", pages_pipeline)

    # continuation-4: cut structure, temporal, influence, web-index rows.
    # Cut-structure rows run on the 1-in-11 sparsified subgraph (same as
    # their gates): the full modulo graph is one 4-hop ball with zero
    # bridges and a single block — structurally trivial AND slower.
    from llama_spark.operators.bridges import articulation_points, bridges
    from llama_spark.operators.influence import influence_max
    from llama_spark.operators.redirects import resolve_redirects
    from llama_spark.operators.temporal import temporal_reachability

    sparse = edges.filter((FF.col("src") * 131 + FF.col("dst")) % 11 < 1)

    timed("bridges_sparse", lambda: bridges(sparse).count())
    timed("articulation_sparse", lambda: articulation_points(sparse).count())
    timed(
        "influence_k3h4",
        lambda: influence_max(sparse, k=3, pool=8, horizon=4).count(),
    )

    ev = spark.read.parquet(f"{sf_dir}/events.parquet")
    contacts = ev.select(
        FF.col("user_id").alias("src"),
        ((FF.col("user_id") * 31 + FF.col("event_id")) % 150).alias("dst"),
        FF.unix_micros(FF.col("ts").cast("timestamp")).alias("t"),
    )
    timed(
        "temporal_reach",
        lambda: temporal_reachability(contacts, [0, 7, 42]).count(),
    )

    def _redirects() -> None:
        d = docs.select("doc_id")
        url = FF.concat(FF.lit("http://site/p"), FF.col("doc_id").cast("string"))
        tgt = FF.concat(
            FF.lit("http://site/p"),
            ((FF.col("doc_id") * 13 + 7) % 500).cast("string"),
        )
        m = d.filter(FF.col("doc_id") % 3 != 0).select(
            url.alias("src"), tgt.alias("dst")
        )
        resolve_redirects(m).count()

    timed("redirect_resolution", _redirects)

    from llama_spark.functions.search import phrase_search

    timed("phrase_search", lambda: phrase_search(docs, "table hash").count())

    from llama_spark.entry_queries_docs import DOCS_QUERIES

    timed(
        "anchor_text",
        lambda: DOCS_QUERIES["anchor_text"](spark, sf_dir).count(),
    )

    # ---- round-5 continuation-6 rows ----
    from llama_spark.operators.temporal import temporal_pagerank
    from llama_spark.functions.sketch import cms_token_estimates
    from llama_spark.operators.flow import max_flow_summary

    timed(
        "temporal_pagerank6",
        lambda: temporal_pagerank(contacts, windows=6).count(),
    )
    timed("cms_tokens", lambda: cms_token_estimates(docs).count())

    def _max_flow_weighted() -> None:
        # the weighted flow gate's subgraph; budget-bounded (6 augmentations)
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        fe = (
            li.filter((FF.col("l_linenumber") == 3) & (FF.col("l_orderkey") % 2 == 0))
            .select(
                (FF.col("l_orderkey") % 4096).alias("src"),
                (FF.col("l_partkey") % 4096).alias("dst"),
            )
            .filter(FF.col("src") != FF.col("dst"))
            .distinct()
            .withColumn(
                "cap", FF.lit(1) + FF.pmod(FF.col("src") * 31 + FF.col("dst"), FF.lit(4))
            )
        )
        st = fe.groupBy("src").count().orderBy(FF.desc("count"), FF.asc("src")).limit(1).collect()[0]["src"]
        tt = (
            fe.filter(FF.col("dst") != st)
            .groupBy("dst").count().orderBy(FF.desc("count"), FF.asc("dst"))
            .limit(1).collect()[0]["dst"]
        )
        max_flow_summary(fe, int(st), int(tt), max_augment=6, max_depth=8,
                         capacity_col="cap").count()

    timed("max_flow_weighted", _max_flow_weighted)

    # ---- round-5 continuation-7 rows ----
    from llama_spark.operators.influence import lt_cascade
    from llama_spark.operators.pagerank import cheirank_plane
    from llama_spark.operators.triangles import balance_census

    timed("lt_cascade6", lambda: lt_cascade(edges, rounds=6).count())
    timed("cheirank10", lambda: cheirank_plane(edges, max_iter=PR_ITERS).count())
    timed("balance_census", lambda: balance_census(edges).count())

    # ---- round-5 continuation-8 rows ----
    from llama_spark.operators.temporal import temporal_triangle_motifs
    from llama_spark.operators.triangles import burt_constraint
    from llama_spark.operators.pagerank import truncated_pagerank

    timed(
        "temporal_motifs",
        lambda: temporal_triangle_motifs(contacts, delta=86_400_000_000).count(),
    )
    timed("burt_constraint", lambda: burt_constraint(edges).count())
    timed(
        "truncated_pagerank8",
        lambda: truncated_pagerank(edges, truncate=2, max_iter=8).count(),
    )

    # ---- round-5 continuation-9 rows ----
    from llama_spark.operators.kcenter import k_center
    from llama_spark.graph import joint_degree_matrix, clustering_by_degree

    timed("k_center3", lambda: k_center(edges, k=3).count())
    timed("joint_degree_matrix", lambda: joint_degree_matrix(edges).count())
    timed("clustering_by_degree", lambda: clustering_by_degree(edges).count())

    from llama_spark.operators.linkpred import edge_dispersion, orbit_counts

    timed("orbit_counts", lambda: orbit_counts(edges).count())
    # the sf0.1 gate graph (mod 4096) has mean degree ~270 — denser than
    # any web graph, and per-edge CN enumeration is Σ_e deg ≈ 1.6e8 wedge
    # rows there (224s measured, cap can't cut the enumeration). The op's
    # real habitat is web-sparse: bench it on the mod-65536 projection of
    # the same lineitem table (65k nodes, mean degree ~17)
    def _edge_dispersion_sparse() -> None:
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        se = (
            li.select(
                (FF.col("l_orderkey") % 65536).alias("src"),
                (FF.col("l_partkey") % 65536).alias("dst"),
            )
            .filter(FF.col("src") != FF.col("dst"))
            .distinct()
        )
        edge_dispersion(se).count()

    timed("edge_dispersion_sparse", _edge_dispersion_sparse)

    def _motif_fiedler() -> None:
        from llama_spark.operators.spectral import fiedler_vector_normalized
        from llama_spark.operators.truss import motif_adjacency

        fiedler_vector_normalized(
            edges, max_iter=16, weighted_adj=motif_adjacency(edges)
        ).count()

    timed("motif_fiedler16", _motif_fiedler)

    # ---- round-5 continuation-12 rows ----
    from llama_spark.operators.traversal import small_world_sigma

    timed(
        "small_world",
        lambda: small_world_sigma(edges, roots=[0, 42, 77, 1234]).count(),
    )

    from llama_spark.operators.percolation import molloy_reed
    from llama_spark.graph import powerlaw_ks

    timed("molloy_reed", lambda: molloy_reed(edges).count())
    timed("powerlaw_ks", lambda: powerlaw_ks(edges).count())

    def _wl_kernel() -> None:
        from llama_spark.operators.wl import wl_kernel

        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        b = (
            li.select(
                (FF.col("l_partkey") % 4096).alias("src"),
                (FF.col("l_suppkey") % 4096).alias("dst"),
            )
            .filter(FF.col("src") != FF.col("dst"))
            .distinct()
        )
        wl_kernel(edges, b, rounds=2).count()

    timed("wl_kernel2", _wl_kernel)

    from llama_spark.graph import directed_assortativity

    timed("directed_assortativity", lambda: directed_assortativity(edges).count())

    def _percolation_centrality() -> None:
        from llama_spark.operators.bc import percolation_centrality

        percolation_centrality(edges, k=8, max_depth=12).count()

    timed("percolation_centrality_k8", _percolation_centrality)

    from llama_spark.operators.traversal import global_efficiency

    timed(
        "global_efficiency",
        lambda: global_efficiency(edges, roots=[0, 42, 77, 1234]).count(),
    )

    # ---- execution: whole-list passes, then a retry pass for cheap rows ----
    # SPARK_GRAFT_BENCH_ONLY=a,b,c restricts the run to those rows (for
    # targeted quiet-window re-measurement of contested queries)
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {s.strip() for s in only.split(",") if s.strip()}
        plan = [(n, f) for n, f in plan if n in keep]
    capped: set[str] = set()
    for _pass in range(max(1, repeats)):
        for name, fn in plan:
            if name in capped:
                continue
            if run_once(name, fn) > repeat_cap:
                capped.add(name)  # bound wall time; raw runs show fewer samples
    for name, fn in plan:
        if name not in capped and min(runs[name]) < cheap_cutoff:
            run_once(name, fn)
    for name, _fn in plan:
        times[name] = min(runs[name])

    extras["n_edges"] = n_edges
    if "pagerank10" in times:
        extras["pagerank_edges_per_sec_per_iter"] = round(
            n_edges * PR_ITERS / times["pagerank10"], 1
        )
        # steady-state basis (BASELINE.md primary metric): excludes the
        # one-off cache-population cost of iteration 0 and host-noise
        # stragglers
        extras["pagerank_edges_per_sec_per_iter_steady"] = round(
            n_edges / min(pr_holder["iter_secs"]), 1
        )
    if "pagerank10_csr" in times:
        extras["pagerank_csr_edges_per_sec_per_iter"] = round(
            n_edges * PR_ITERS / times["pagerank10_csr"], 1
        )

    spark.stop()
    print(
        json.dumps(
            {
                "metric": "headline query wall seconds (sum of per-query minima)",
                "value": round(sum(times.values()), 3),
                "unit": "sec",
                "queries": times,
                "query_runs": runs,
                "query_loadavg": loads,
                "gate": {
                    "threshold": gate,
                    "waited_sec": waited,
                    "start_loadavg": start_load,
                    "end_loadavg": loadavg(),
                },
                "repeats": repeats,
                "sf": sf,
                "cpus": cpus,
                **extras,
            }
        )
    )


if __name__ == "__main__":
    main()
