"""Capture .explain("formatted") output + isolated noop-sink timing for
bench.py query rows (guide §1.4) WITHOUT touching the frozen bench.py.

Usage:
    python scripts/explain_bench.py out_suffix query [query ...]
    SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/explain_bench.py before burt_constraint trussness4

Writes plans/r06/<query>_<out_suffix>.txt and prints one JSON line with
noop-sink wall seconds per query. Only queries whose result is a DataFrame
expression (not driver-side composites) get a plan file; composites get
timing only.
"""

from __future__ import annotations

import io
import json
import os
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame
from pyspark.sql import functions as FF
from pyspark.storagelevel import StorageLevel


def build_queries(spark, sf_dir, edges, docs, emb):
    """Map bench row name -> zero-arg callable returning a DataFrame
    (mirrors bench.py rows; keep in sync by hand)."""
    from llama_spark.functions.cluster import embedding_covariance
    from llama_spark.functions.dedup import (
        lsh_candidate_pairs,
        segment_dedup,
        simhash_near_dup_pairs,
    )
    from llama_spark.functions.similarity import (
        cosine_topk,
        ivf_ann,
        neighbor_mean_embeddings,
    )
    from llama_spark.functions.sketch import cms_token_estimates
    from llama_spark.functions.text import bigram_logprob, dsir_weights, source_profile
    from llama_spark.graph import (
        assortativity,
        avg_neighbor_degree,
        clustering_by_degree,
        directed_assortativity,
        joint_degree_matrix,
        powerlaw_ks,
        with_synthetic_weights,
    )
    from llama_spark.operators.anf import hyperball_harmonic, neighborhood_function
    from llama_spark.operators.bc import (
        betweenness_centrality,
        percolation_centrality,
        pick_roots,
        weighted_betweenness_centrality,
    )
    from llama_spark.operators.bowtie import bowtie_census
    from llama_spark.operators.bridges import articulation_points, bridges
    from llama_spark.operators.centrality import (
        katz_centrality,
        nonbacktracking_centrality,
    )
    from llama_spark.operators.components import (
        connected_components,
        label_propagation,
        louvain_communities,
    )
    from llama_spark.operators.csr import pagerank_csr
    from llama_spark.operators.densest import densest_subgraph_trace
    from llama_spark.operators.diffusion import (
        heat_kernel_pagerank,
        trophic_levels,
        truncated_hitting_time,
    )
    from llama_spark.operators.hits import hits
    from llama_spark.operators.influence import influence_max, lt_cascade
    from llama_spark.operators.kcenter import k_center
    from llama_spark.operators.kcore import coreness
    from llama_spark.operators.linkpred import (
        cocitation_pairs,
        edge_dispersion,
        orbit_counts,
        scan_statistic,
    )
    from llama_spark.operators.matching import maximal_matching
    from llama_spark.operators.mis import maximal_independent_set
    from llama_spark.operators.mst import minimum_spanning_forest
    from llama_spark.operators.pagerank import (
        cheirank_plane,
        pagerank,
        topic_sensitive_pagerank,
        truncated_pagerank,
    )
    from llama_spark.operators.partition import spinner_partition
    from llama_spark.operators.percolation import attack_percolation, molloy_reed
    from llama_spark.operators.redirects import resolve_redirects
    from llama_spark.operators.scc import strongly_connected_components
    from llama_spark.operators.sparsify import edge_overlap
    from llama_spark.operators.spectral import fiedler_vector
    from llama_spark.operators.sweep import ppr_sweep
    from llama_spark.operators.temporal import (
        temporal_pagerank,
        temporal_reachability,
        temporal_triangle_motifs,
    )
    from llama_spark.operators.textrank import (
        doc_keywords,
        keyword_textrank,
        textrank_documents,
    )
    from llama_spark.operators.traversal import (
        bfs_depths,
        closeness_centrality,
        global_efficiency,
        landmark_distances,
        small_world_sigma,
        widest_paths,
    )
    from llama_spark.operators.triads import triad_census
    from llama_spark.operators.triangles import (
        balance_census,
        burt_constraint,
        triangles_df,
    )
    from llama_spark.operators.trust import spam_mass, sybilrank
    from llama_spark.operators.truss import k_truss, motif_adjacency, trussness
    from llama_spark.operators.trust import spam_mass
    from llama_spark.operators.walks import random_walks
    from llama_spark.operators.wl import wl_kernel

    sparse = edges.filter((FF.col("src") * 131 + FF.col("dst")) % 11 < 1)
    contacts_ev = spark.read.parquet(f"{sf_dir}/events.parquet").select(
        FF.col("user_id").alias("src"),
        ((FF.col("user_id") * 31 + FF.col("event_id")) % 150).alias("dst"),
        FF.unix_micros(FF.col("ts").cast("timestamp")).alias("t"),
    )

    def _motif_fiedler():
        from llama_spark.operators.spectral import fiedler_vector_normalized

        return fiedler_vector_normalized(
            edges, max_iter=16, weighted_adj=motif_adjacency(edges)
        )

    def _edge_dispersion_sparse():
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        se = (
            li.select(
                (FF.col("l_orderkey") % 65536).alias("src"),
                (FF.col("l_partkey") % 65536).alias("dst"),
            )
            .filter(FF.col("src") != FF.col("dst"))
            .distinct()
        )
        return edge_dispersion(se)

    def _wl_kernel():
        li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
        b = (
            li.select(
                (FF.col("l_partkey") % 4096).alias("src"),
                (FF.col("l_suppkey") % 4096).alias("dst"),
            )
            .filter(FF.col("src") != FF.col("dst"))
            .distinct()
        )
        return wl_kernel(edges, b, rounds=2)

    roots64 = pick_roots(edges, 64)

    return {
        "pagerank10": lambda: pagerank(edges, max_iter=10),
        "pagerank10_csr": lambda: pagerank_csr(edges, max_iter=10),
        "connected_components": lambda: connected_components(edges),
        "label_propagation5": lambda: label_propagation(edges, max_iter=5),
        "triangle_count": lambda: triangles_df(edges),
        "bfs": lambda: bfs_depths(edges, root=0, max_iter=16),
        "betweenness_k4": lambda: betweenness_centrality(
            edges, roots=[0, 1, 2, 3], max_depth=12
        ),
        "betweenness_k100": lambda: betweenness_centrality(edges, k=100, max_depth=12),
        "scc": lambda: strongly_connected_components(edges),
        "coreness": lambda: coreness(edges),
        "k_truss4": lambda: k_truss(edges, k=4),
        "closeness_k64": lambda: closeness_centrality(edges, roots=roots64),
        "random_walks_l4": lambda: random_walks(edges, walk_length=4),
        "mis": lambda: maximal_independent_set(edges),
        "mst": lambda: minimum_spanning_forest(with_synthetic_weights(edges)),
        "hits8": lambda: hits(edges, max_iter=8),
        "katz8": lambda: katz_centrality(edges, max_iter=8),
        "anf_t6": lambda: neighborhood_function(edges, max_t=6),
        "hyperball_t6": lambda: hyperball_harmonic(edges, max_t=6),
        "louvain4": lambda: louvain_communities(edges, max_iter=4),
        "assortativity": lambda: assortativity(edges),
        "minhash_lsh_dedup": lambda: lsh_candidate_pairs(docs),
        "cosine_topk": lambda: cosine_topk(emb, k=5, n_queries=20),
        "ivf_ann": lambda: ivf_ann(emb, k=5, n_queries=20),
        "simhash_pairs": lambda: simhash_near_dup_pairs(docs),
        "trussness4": lambda: trussness(edges, rounds=4),
        "cocitation_cap64": lambda: cocitation_pairs(edges, top_k=25, hub_cap=64),
        "segment_dedup": lambda: segment_dedup(docs),
        "neighbor_features_d8": lambda: neighbor_mean_embeddings(edges, emb, dims=8),
        "ppr_sweep64": lambda: ppr_sweep(edges, sources=[0], max_iter=6, top_r=64),
        "edge_overlap": lambda: edge_overlap(edges),
        "densest_peel": lambda: densest_subgraph_trace(edges, eps=0.5)[0],
        "bigram_nll": lambda: bigram_logprob(docs),
        "triad_census": lambda: triad_census(edges),
        "bowtie": lambda: bowtie_census(edges),
        "matching": lambda: maximal_matching(edges),
        "spam_mass": lambda: spam_mass(edges, seeds=[0, 42, 1234]),
        "attack_5pct": lambda: attack_percolation(edges, frac=0.05),
        "heat_kernel_k6": lambda: heat_kernel_pagerank(edges),
        "hitting_time_h8": lambda: truncated_hitting_time(edges, seeds=[0, 42, 1234]),
        "trophic12": lambda: trophic_levels(edges, max_iter=12),
        "nonbacktracking6": lambda: nonbacktracking_centrality(edges, max_iter=6),
        "sybilrank12": lambda: sybilrank(edges, seeds=[0, 42, 1234], max_iter=12),
        "landmarks_k8q64": lambda: landmark_distances(
            edges, k_landmarks=8, query_ids=list(range(64))
        ),
        "scan_statistic": lambda: scan_statistic(edges),
        "widest_path": lambda: widest_paths(
            with_synthetic_weights(edges), root=0, max_iter=16
        ),
        "knn_curve": lambda: avg_neighbor_degree(edges),
        "embedding_cov16": lambda: embedding_covariance(emb, dims=16),
        "source_profile": lambda: source_profile(docs),
        "fiedler10": lambda: fiedler_vector(edges, max_iter=10),
        "topic_pagerank4": lambda: topic_sensitive_pagerank(
            edges,
            topic_of=FF.when((FF.col("id") % 64) < 4, FF.col("id") % 64),
            n_topics=4,
            max_iter=8,
        ),
        "partition_k8": lambda: spinner_partition(edges, k=8, rounds=6),
        "dsir_weights": lambda: dsir_weights(docs),
        "textrank8": lambda: textrank_documents(docs, max_iter=8),
        "keyword_textrank8": lambda: keyword_textrank(docs, max_iter=8),
        "doc_keywords6": lambda: doc_keywords(docs, max_iter=6, top_k=5),
        "weighted_betweenness_k4": lambda: weighted_betweenness_centrality(
            with_synthetic_weights(edges), roots=[0, 1, 2, 3]
        ),
        "bridges_sparse": lambda: bridges(sparse),
        "articulation_sparse": lambda: articulation_points(sparse),
        "influence_k3h4": lambda: influence_max(sparse, k=3, pool=8, horizon=4),
        "temporal_reach": lambda: temporal_reachability(contacts_ev, [0, 7, 42]),
        "temporal_pagerank6": lambda: temporal_pagerank(contacts_ev, windows=6),
        "cms_tokens": lambda: cms_token_estimates(docs),
        "lt_cascade6": lambda: lt_cascade(edges, rounds=6),
        "cheirank10": lambda: cheirank_plane(edges, max_iter=10),
        "balance_census": lambda: balance_census(edges),
        "temporal_motifs": lambda: temporal_triangle_motifs(
            contacts_ev, delta=86_400_000_000
        ),
        "burt_constraint": lambda: burt_constraint(edges),
        "truncated_pagerank8": lambda: truncated_pagerank(edges, truncate=2, max_iter=8),
        "k_center3": lambda: k_center(edges, k=3),
        "joint_degree_matrix": lambda: joint_degree_matrix(edges),
        "clustering_by_degree": lambda: clustering_by_degree(edges),
        "orbit_counts": lambda: orbit_counts(edges),
        "edge_dispersion_sparse": _edge_dispersion_sparse,
        "motif_fiedler16": _motif_fiedler,
        "small_world": lambda: small_world_sigma(edges, roots=[0, 42, 77, 1234]),
        "molloy_reed": lambda: molloy_reed(edges),
        "powerlaw_ks": lambda: powerlaw_ks(edges),
        "wl_kernel2": _wl_kernel,
        "directed_assortativity": lambda: directed_assortativity(edges),
        "percolation_centrality_k8": lambda: percolation_centrality(
            edges, k=8, max_depth=12
        ),
        "global_efficiency": lambda: global_efficiency(edges, roots=[0, 42, 77, 1234]),
    }


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    reps = int(os.environ.get("SPARK_GRAFT_EXPLAIN_REPS", "2"))

    from llama_spark.entry_queries import load_edges
    from llama_spark.session import get_spark

    spark = get_spark(
        app_name="explain_bench", cores=cpus, shuffle_partitions=cpus
    )
    edges = load_edges(spark, sf_dir).persist(StorageLevel.MEMORY_AND_DISK)
    edges.count()
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")

    qmap = build_queries(spark, sf_dir, edges, docs, emb)
    os.makedirs("plans/r06", exist_ok=True)

    def loadavg() -> float:
        with open("/proc/loadavg") as f:
            return float(f.read().split()[0])

    out: dict[str, object] = {}
    for name in names:
        fn = qmap[name]
        runs = []
        for rep in range(reps):
            la = loadavg()
            spark.sparkContext.setJobDescription(f"{name}[{suffix}] rep{rep}")
            t0 = time.time()
            df = fn()
            df.write.format("noop").mode("overwrite").save()
            runs.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            out.setdefault("load", {})[name] = la  # type: ignore[index]
            try:
                spark.sparkContext._jvm.System.gc()
            except Exception:
                pass
        out[name] = runs
        # plan of the final DataFrame (post-run; iterative kernels return a
        # checkpointed frame, so also record the per-iteration step plan when
        # the operator exposes one via the module-level LAST_STEP_PLAN hook)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        with open(f"plans/r06/{name}_{suffix}.txt", "w") as f:
            f.write(f"# {name} [{suffix}] noop-sink secs: {runs}\n")
            f.write(buf.getvalue())
    print(json.dumps({"suffix": suffix, "sf_dir": sf_dir, "runs": out}))
    spark.stop()


if __name__ == "__main__":
    main()
