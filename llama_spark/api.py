"""GraphSession — the library-embedding surface (SURVEY §3.3).

The reference's embedding entry point is ``ll_database`` open → ``ro_graph``
→ kernel (examples/llama-pagerank.cc). The Spark-native equivalent:

    from llama_spark.api import GraphSession
    g = GraphSession(spark).from_pages(pages_df)      # or .from_edges(df)
    g.pagerank(max_iter=10).show()
    g.top_pages(k=10).show()                          # urls, not ids

Run via ``spark-submit --py-files llama_spark.zip job.py`` on a cluster;
identical code on local[N].
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class GraphSession:
    def __init__(self, spark: SparkSession):
        self.spark = spark
        self.edges: DataFrame | None = None
        self.dictionary: DataFrame | None = None  # url → id (when from pages)

    # ---- loading --------------------------------------------------------

    def from_edges(self, edges: DataFrame) -> "GraphSession":
        if not {"src", "dst"} <= set(edges.columns):
            raise ValueError(f"edge table needs src/dst columns, got {edges.columns}")
        self.edges = edges
        return self

    def from_pages(self, pages: DataFrame, dedup: bool = True) -> "GraphSession":
        from .sources.edges import edges_from_pages

        edges, dictionary = edges_from_pages(pages, dedup=dedup)
        # both come back eagerly checkpointed — no extra persist layer
        self.edges = edges
        self.dictionary = dictionary
        return self

    def from_parquet(self, path: str) -> "GraphSession":
        return self.from_edges(self.spark.read.parquet(path))

    def from_snap(self, path: str, weight: bool = False) -> "GraphSession":
        """SNAP/Pajek text edge list (.net/.snap — ll_load_net.h analog)."""
        from .sources.files import read_snap

        return self.from_edges(read_snap(self.spark, path, weight=weight))

    def from_xstream1(self, path: str) -> "GraphSession":
        """X-Stream type-1 binary edge list (.dat — ll_load_xstream1.h)."""
        from .sources.files import read_xstream1

        return self.from_edges(read_xstream1(self.spark, path))

    def from_fgf(self, path: str) -> "GraphSession":
        """FGF v1 typed-property graph file(s) (ll_load_fgf.h analog);
        node/edge property tables via sources.files.read_fgf directly."""
        from .sources.files import read_fgf

        return self.from_edges(read_fgf(self.spark, path, "edges").select("src", "dst"))

    def from_erdos_renyi(
        self, nodes: int, edges: int, seed: int = 42
    ) -> "GraphSession":
        """ER(nodes, edges, seed) generator (ll_gen_erdosrenyi.h analog)."""
        from .sources.files import erdos_renyi

        return self.from_edges(erdos_renyi(self.spark, nodes, edges, seed=seed))

    # ---- kernels --------------------------------------------------------

    def _e(self) -> DataFrame:
        if self.edges is None:
            raise ValueError("no graph loaded — call from_edges/from_pages first")
        return self.edges

    def pagerank(self, engine: str = "dataframe", **kw) -> DataFrame:
        if engine == "csr":
            from .operators.csr import pagerank_csr

            return pagerank_csr(self._e(), **kw)
        from .operators.pagerank import pagerank

        return pagerank(self._e(), **kw)

    def personalized_pagerank(self, sources: list[int], **kw) -> DataFrame:
        from .operators.pagerank import personalized_pagerank

        return personalized_pagerank(self._e(), sources, **kw)

    def connected_components(self, algorithm: str = "hashmin", **kw) -> DataFrame:
        """``algorithm="hashmin"`` (O(diameter) rounds, delta-iterated,
        warm-startable via initial_components) or ``"alternating"``
        (large-star/small-star, O(log² n) rounds — huge-diameter graphs)."""
        if algorithm == "alternating":
            from .operators.components import connected_components_alternating

            return connected_components_alternating(self._e(), **kw)
        from .operators.components import connected_components

        return connected_components(self._e(), **kw)

    def label_propagation(self, **kw) -> DataFrame:
        from .operators.components import label_propagation

        return label_propagation(self._e(), **kw)

    def triangle_count(self, **kw) -> int:
        from .operators.triangles import triangle_count

        return triangle_count(self._e(), **kw)

    def bfs(self, root: int = 0, **kw) -> DataFrame:
        from .operators.traversal import bfs_depths

        return bfs_depths(self._e(), root=root, **kw)

    def sssp(self, root: int = 0, weight_col: str | None = None, **kw) -> DataFrame:
        from .operators.traversal import sssp

        return sssp(self._e(), root=root, weight_col=weight_col, **kw)

    def strongly_connected_components(self, **kw) -> DataFrame:
        from .operators.scc import strongly_connected_components

        return strongly_connected_components(self._e(), **kw)

    def betweenness(self, roots: list[int] | None = None, k: int = 8, **kw) -> DataFrame:
        from .operators.bc import betweenness_centrality

        return betweenness_centrality(self._e(), roots=roots, k=k, **kw)

    def k_core(self, k: float, **kw) -> DataFrame:
        """Degree peel; pass ``weight_col=`` for weighted (s-core) peeling."""
        from .operators.kcore import k_core

        return k_core(self._e(), k=k, **kw)

    def coreness(self, **kw) -> DataFrame:
        from .operators.kcore import coreness

        return coreness(self._e(), **kw)

    def k_truss(self, k: int, **kw) -> DataFrame:
        from .operators.truss import k_truss

        return k_truss(self._e(), k=k, **kw)

    def closeness(self, roots: list[int], **kw) -> DataFrame:
        from .operators.traversal import closeness_centrality

        return closeness_centrality(self._e(), roots, **kw)

    def harmonic(self, roots: list[int], **kw) -> DataFrame:
        from .operators.traversal import harmonic_centrality

        return harmonic_centrality(self._e(), roots, **kw)

    def node2vec_walks(self, walk_length: int = 4, **kw) -> DataFrame:
        """Deterministic node2vec-biased walks (p/q return/explore bias)."""
        from .operators.walks import node2vec_walks

        return node2vec_walks(self._e(), walk_length=walk_length, **kw)

    def random_walks(self, walk_length: int = 4, **kw) -> DataFrame:
        """Deterministic DeepWalk-style sampling (operators/walks.py)."""
        from .operators.walks import random_walks

        return random_walks(self._e(), walk_length=walk_length, **kw)

    def skipgram_pairs(
        self, walk_length: int = 4, window: int = 2, **kw
    ) -> DataFrame:
        """Skip-gram co-occurrence counts over the deterministic walk
        corpus — the DeepWalk training-input stage."""
        from .operators.walks import random_walks, skipgram_pairs

        return skipgram_pairs(
            random_walks(self._e(), walk_length=walk_length, **kw), window=window
        )

    def transitivity(self) -> DataFrame:
        """Global clustering coefficient (3·triangles / wedges)."""
        from .operators.triangles import transitivity

        return transitivity(self._e())

    def katz(self, alpha: float = 0.05, beta: float = 1.0, max_iter: int = 8) -> DataFrame:
        """Katz centrality → DataFrame[id, katz]."""
        from .operators.centrality import katz_centrality

        return katz_centrality(self._e(), alpha=alpha, beta=beta, max_iter=max_iter)

    def eigenvector(self, max_iter: int = 8) -> DataFrame:
        """Eigenvector centrality (L1 power method) → DataFrame[id, score]."""
        from .operators.centrality import eigenvector_centrality

        return eigenvector_centrality(self._e(), max_iter=max_iter).state

    def salsa(self, max_iter: int = 8, **kw) -> DataFrame:
        """SALSA auth/hub scores → [id, auth, hub] (mass-conserving)."""
        from .operators.hits import salsa

        return salsa(self._e(), max_iter=max_iter, **kw)

    def hits(self, max_iter: int = 8, **kw) -> DataFrame:
        """Kleinberg hubs & authorities → DataFrame[id, auth, hub]."""
        from .operators.hits import hits

        return hits(self._e(), max_iter=max_iter, **kw)

    def neighborhood_function(self, max_t: int = 6, **kw) -> DataFrame:
        """ANF: estimated avg #nodes within t hops, t = 0..max_t."""
        from .operators.anf import neighborhood_function

        return neighborhood_function(self._e(), max_t=max_t, **kw)

    def effective_diameter(self, max_t: int = 6, quantile: float = 0.9) -> DataFrame:
        """ANF effective diameter: smallest t reaching quantile·N(max_t)."""
        from .operators.anf import effective_diameter

        return effective_diameter(self._e(), max_t=max_t, quantile=quantile)

    def hyperball_harmonic(self, max_t: int = 6, **kw) -> DataFrame:
        """All-nodes harmonic centrality estimates (HyperBall sketches)."""
        from .operators.anf import hyperball_harmonic

        return hyperball_harmonic(self._e(), max_t=max_t, **kw)

    def hyperball_closeness(self, max_t: int = 6, **kw) -> DataFrame:
        """All-nodes closeness estimates from the same HyperBall pass."""
        from .operators.anf import hyperball_closeness

        return hyperball_closeness(self._e(), max_t=max_t, **kw)

    def hyperball_eccentricity(self, max_t: int = 6, **kw) -> DataFrame:
        """Per-node eccentricity lower bounds (last ball-growth round)."""
        from .operators.anf import hyperball_eccentricity

        return hyperball_eccentricity(self._e(), max_t=max_t, **kw)

    def rich_club(self, ks: tuple[int, ...] = (1, 2, 4, 8, 16, 32)) -> DataFrame:
        """Rich-club coefficient ladder φ(k) → [k, n_rich, e_rich, phi]."""
        from .graph import rich_club

        return rich_club(self._e(), ks=ks)

    def transitivity_and_cycles(self) -> DataFrame:
        """Global transitivity crossed with the 4-cycle count — the two
        whole-graph cohesion statistics in one frame."""
        from .operators.triangles import four_cycle_count, transitivity

        return transitivity(self._e()).crossJoin(four_cycle_count(self._e()))

    def assortativity(self) -> DataFrame:
        """One row [assortativity, reciprocity] (graph.assortativity)."""
        from .graph import assortativity

        return assortativity(self._e())

    def greedy_coloring(self, max_rounds: int = 512) -> DataFrame:
        """Jones–Plassmann greedy coloring → DataFrame[id, color]."""
        from .operators.coloring import greedy_coloring

        return greedy_coloring(self._e(), max_rounds=max_rounds)

    def louvain(self, max_iter: int = 4, **kw) -> DataFrame:
        """Staged-synchronous Louvain phase-1 communities → [id, comm]."""
        from .operators.components import louvain_communities

        return louvain_communities(self._e(), max_iter=max_iter, **kw)

    def louvain_multilevel(
        self, levels: int = 2, rounds_per_level: int = 4
    ) -> DataFrame:
        """Full multi-level Louvain (move rounds + contraction) → [id, comm]."""
        from .operators.components import louvain_multilevel

        return louvain_multilevel(
            self._e(), levels=levels, rounds_per_level=rounds_per_level
        )

    def modularity(self, communities: DataFrame, label_col: str = "label") -> DataFrame:
        """Newman Q of a community assignment (components.modularity)."""
        from .operators.components import modularity

        return modularity(self._e(), communities, label_col=label_col)

    def modularity_weighted(
        self, communities: DataFrame, label_col: str = "label", **kw
    ) -> DataFrame:
        """Weighted Newman Q on quantized integer masses
        (components.modularity_weighted)."""
        from .operators.components import modularity_weighted

        return modularity_weighted(self._e(), communities, label_col=label_col, **kw)

    def trussness(self, **kw) -> DataFrame:
        """Full truss decomposition — per-edge max k (truss.trussness)."""
        from .operators.truss import trussness

        return trussness(self._e(), **kw)

    def cocitation(self, mode: str = "cocitation", **kw) -> DataFrame:
        """Directed co-citation / bibliographic coupling pair strengths
        (linkpred.cocitation_pairs)."""
        from .operators.linkpred import cocitation_pairs

        return cocitation_pairs(self._e(), mode=mode, **kw)

    def degree_powerlaw(self, d_min: int = 4) -> DataFrame:
        """Hill MLE of the degree-tail exponent (graph.degree_powerlaw)."""
        from .graph import degree_powerlaw

        return degree_powerlaw(self._e(), d_min=d_min)

    def degrees(self) -> DataFrame:
        from .graph import degrees

        return degrees(self._e())

    def degree_distribution(self) -> DataFrame:
        from .graph import degree_distribution

        return degree_distribution(self._e())

    # ---- snapshot store ---------------------------------------------------

    def open_store(self, path: str):
        """Versioned snapshot store at ``path`` (streaming/snapshots.py);
        ``from_edges(store.read_at(level))`` pins an RO clone of a level."""
        from .streaming.snapshots import VersionedEdgeStore

        return VersionedEdgeStore(self.spark, path)

    # ---- url-level conveniences ------------------------------------------

    def bowtie(self, **kw) -> DataFrame:
        """Broder bow-tie census → [region, n_nodes, share] (operators.bowtie)."""
        from .operators.bowtie import bowtie_census

        return bowtie_census(self._e(), **kw)

    def condensation_levels(self, **kw) -> DataFrame:
        """SCC-condensation longest-path depths (scc.condensation_levels)."""
        from .operators.scc import condensation_levels

        return condensation_levels(self._e(), **kw)

    def spam_mass(self, seeds: list[int], **kw) -> DataFrame:
        """TrustRank relative spam mass per node (operators.trust)."""
        from .operators.trust import spam_mass

        return spam_mass(self._e(), seeds=seeds, **kw)

    def matching(self, weighted: bool = False, **kw) -> DataFrame:
        """Maximal matching; weighted=True runs the locally-heaviest
        greedy over kw['weight_col'] (operators.matching)."""
        from .operators.matching import maximal_matching, maximal_weight_matching

        if weighted:
            return maximal_weight_matching(self._e(), **kw)
        return maximal_matching(self._e(), **kw)

    def triad_census(self) -> DataFrame:
        """Holland-Leinhardt 16-class MAN census (operators.triads)."""
        from .operators.triads import triad_census

        return triad_census(self._e())

    def attack_percolation(self, frac: float = 0.05) -> DataFrame:
        """Targeted hub-removal robustness census (operators.percolation)."""
        from .operators.percolation import attack_percolation

        return attack_percolation(self._e(), frac=frac)

    def random_percolation(self, frac: float = 0.05, **kw) -> DataFrame:
        """Random-failure robustness census — the AJB error-tolerance twin
        (operators.percolation.random_percolation)."""
        from .operators.percolation import random_percolation

        return random_percolation(self._e(), frac=frac, **kw)

    def widest_paths(self, root: int = 0, **kw) -> DataFrame:
        """Max-bottleneck path widths from root — the (max, min) semiring
        (operators.traversal.widest_paths); expects the edge table to
        carry kw['weight_col'] (default 'weight')."""
        from .operators.traversal import widest_paths

        return widest_paths(self._e(), root=root, **kw)

    def eccentricity(self, roots: list[int], **kw) -> DataFrame:
        """Exact eccentricity of sampled roots via one multi-source BFS
        (operators.traversal.eccentricity_sample)."""
        from .operators.traversal import eccentricity_sample

        return eccentricity_sample(self._e(), roots=roots, **kw)

    def avg_neighbor_degree(self) -> DataFrame:
        """knn(k) degree-correlation curve (graph.avg_neighbor_degree)."""
        from .graph import avg_neighbor_degree

        return avg_neighbor_degree(self._e())

    def doulion_triangles(self, p_bp: int = 2500) -> DataFrame:
        """Sampled triangle estimate (triangles.doulion_triangle_estimate)."""
        from .operators.triangles import doulion_triangle_estimate

        return doulion_triangle_estimate(self._e(), p_bp=p_bp)

    def local_bridges(self) -> DataFrame:
        """Support-0 weak ties (operators.truss.local_bridges)."""
        from .operators.truss import local_bridges

        return local_bridges(self._e())

    def core_sizes(self, **kw) -> DataFrame:
        """k-core collapse curve (operators.kcore.core_sizes)."""
        from .operators.kcore import core_sizes

        return core_sizes(self._e(), **kw)

    def friend_recommendations(self, top_k: int = 2, **kw) -> DataFrame:
        """Triadic-closure candidates (operators.linkpred)."""
        from .operators.linkpred import friend_recommendations

        return friend_recommendations(self._e(), top_k=top_k, **kw)

    def bond_percolation(self, keep_bp: int = 7500, **kw) -> DataFrame:
        """Edge-failure robustness census (operators.percolation)."""
        from .operators.percolation import bond_percolation

        return bond_percolation(self._e(), keep_bp=keep_bp, **kw)

    def graphlet_census(self) -> DataFrame:
        """Exact non-induced 4-node graphlet counts (operators.triangles)."""
        from .operators.triangles import graphlet_census

        return graphlet_census(self._e())

    def configuration_model(self, seed: int = 42, **kw) -> DataFrame:
        """Degree-preserving null-model edge list (operators.rewire)."""
        from .operators.rewire import configuration_model

        return configuration_model(self._e(), seed=seed, **kw)

    def attribute_assortativity(self, classes: int = 8) -> DataFrame:
        """Categorical class-mixing coefficient (graph module)."""
        from .graph import attribute_assortativity

        return attribute_assortativity(self._e(), classes=classes)

    def relabel_by_degree(self, **kw) -> DataFrame:
        """Hubs-first dense id map (graph.relabel_by_degree)."""
        from .graph import relabel_by_degree

        return relabel_by_degree(self._e(), **kw)

    def graphlet_census_induced(self) -> DataFrame:
        """Induced 4-node graphlet counts (operators.triangles)."""
        from .operators.triangles import graphlet_census_induced

        return graphlet_census_induced(self._e())

    def cooccurrence_lift(self, walk_length: int = 4, window: int = 2, **kw):
        """PMI-class lift over the skip-gram walk corpus
        (operators.walks.cooccurrence_lift ∘ skipgram_pairs)."""
        from .operators.walks import cooccurrence_lift, random_walks, skipgram_pairs

        return cooccurrence_lift(
            skipgram_pairs(
                random_walks(self._e(), walk_length=walk_length, **kw),
                window=window,
            )
        )

    def scan_statistic(self) -> DataFrame:
        """Priebe ego-net edge counts + densities (linkpred.scan_statistic)."""
        from .operators.linkpred import scan_statistic

        return scan_statistic(self._e())

    def motif_fiedler(self, max_iter: int = 16, **kw) -> DataFrame:
        """Motif (triangle) spectral embedding: normalized Fiedler over the
        triangle motif adjacency (truss.motif_adjacency +
        spectral.fiedler_vector_normalized)."""
        from .operators.spectral import fiedler_vector_normalized
        from .operators.truss import motif_adjacency

        return fiedler_vector_normalized(
            self._e(), max_iter=max_iter,
            weighted_adj=motif_adjacency(self._e()), **kw
        )

    def wl_kernel(self, other: DataFrame, rounds: int = 2) -> DataFrame:
        """WL subtree graph kernel vs another edge table (wl.wl_kernel)."""
        from .operators.wl import wl_kernel

        return wl_kernel(self._e(), other, rounds=rounds)

    def directed_assortativity(self) -> DataFrame:
        """Four-mode directed degree-correlation profile
        (graph.directed_assortativity)."""
        from .graph import directed_assortativity

        return directed_assortativity(self._e())

    def percolation_centrality(self, roots: list[int] | None = None, **kw) -> DataFrame:
        """Percolation centrality — infection-weighted Brandes
        (bc.percolation_centrality)."""
        from .operators.bc import percolation_centrality

        return percolation_centrality(self._e(), roots=roots, **kw)

    def rbo(self, a: DataFrame, b: DataFrame, p: float = 0.9, k: int = 100) -> DataFrame:
        """Rank-biased overlap of two [id, pos] rankings
        (metrics.rank_biased_overlap)."""
        from .functions.metrics import rank_biased_overlap

        return rank_biased_overlap(a, b, p=p, k=k)

    def molloy_reed(self) -> DataFrame:
        """Molloy-Reed robustness criterion + Cohen random-failure
        threshold (percolation.molloy_reed)."""
        from .operators.percolation import molloy_reed

        return molloy_reed(self._e())

    def powerlaw_ks(self, d_min: int = 4) -> DataFrame:
        """CSN KS goodness-of-fit of the Hill power-law fit
        (graph.powerlaw_ks)."""
        from .graph import powerlaw_ks

        return powerlaw_ks(self._e(), d_min=d_min)

    def normalize_urls(self, df: DataFrame, url_col: str = "url") -> DataFrame:
        """RFC 3986 URL canonicalization (search.normalize_urls)."""
        from .functions.search import normalize_urls

        return normalize_urls(df, url_col=url_col)

    def global_efficiency(self, roots: list[int], **kw) -> DataFrame:
        """Latora-Marchiori global efficiency (traversal.global_efficiency)."""
        from .operators.traversal import global_efficiency

        return global_efficiency(self._e(), roots=roots, **kw)

    def small_world_sigma(self, roots: list[int], **kw) -> DataFrame:
        """Humphries-Gurney small-world coefficient
        (traversal.small_world_sigma)."""
        from .operators.traversal import small_world_sigma

        return small_world_sigma(self._e(), roots=roots, **kw)

    def orbit_counts(self) -> DataFrame:
        """3-node graphlet orbit counts / GDV (linkpred.orbit_counts)."""
        from .operators.linkpred import orbit_counts

        return orbit_counts(self._e())

    def edge_dispersion(self) -> DataFrame:
        """Backstrom-Kleinberg per-edge dispersion (linkpred.edge_dispersion)."""
        from .operators.linkpred import edge_dispersion

        return edge_dispersion(self._e())

    def weighted_clustering(self, weight_col: str = "weight") -> DataFrame:
        """Onnela weighted local clustering (linkpred.weighted_clustering)."""
        from .operators.linkpred import weighted_clustering

        return weighted_clustering(self._e(), weight_col=weight_col)

    def heat_kernel_pagerank(self, t: float = 3.0, taylor_k: int = 6) -> DataFrame:
        """Chung heat-kernel diffusion rank (diffusion.heat_kernel_pagerank)."""
        from .operators.diffusion import heat_kernel_pagerank

        return heat_kernel_pagerank(self._e(), t=t, taylor_k=taylor_k)

    def hitting_time(self, seeds: list[int], horizon: int = 8) -> DataFrame:
        """Truncated hitting time E[min(first-hit of seeds, horizon)]
        (diffusion.truncated_hitting_time)."""
        from .operators.diffusion import truncated_hitting_time

        return truncated_hitting_time(self._e(), seeds=seeds, horizon=horizon)

    def trophic_levels(
        self, weight_col: str | None = None, max_iter: int = 12
    ) -> DataFrame:
        """MacKay-Johnson-Jones hierarchy heights (diffusion.trophic_levels);
        compare differences, not absolutes."""
        from .operators.diffusion import trophic_levels

        return trophic_levels(self._e(), weight_col=weight_col, max_iter=max_iter)

    def bipartite(self) -> DataFrame:
        """Per-component bipartiteness via parity-doubled CC
        (components.bipartite_check)."""
        from .operators.components import bipartite_check

        return bipartite_check(self._e())

    def trophic_incoherence(
        self, weight_col: str | None = None, max_iter: int = 12
    ) -> DataFrame:
        """1-row F0 'how directed' scalar (diffusion.trophic_incoherence)."""
        from .operators.diffusion import trophic_incoherence

        return trophic_incoherence(
            self._e(), weight_col=weight_col, max_iter=max_iter
        )

    def nonbacktracking(self, max_iter: int = 6) -> DataFrame:
        """Non-backtracking (Hashimoto) centrality, exact BIGINT
        (centrality.nonbacktracking_centrality)."""
        from .operators.centrality import nonbacktracking_centrality

        return nonbacktracking_centrality(self._e(), max_iter=max_iter)

    def sybilrank(
        self, seeds: list[int], max_iter: int | None = None
    ) -> DataFrame:
        """Early-terminated degree-normalized trust from verified seeds
        (trust.sybilrank)."""
        from .operators.trust import sybilrank

        return sybilrank(self._e(), seeds=seeds, max_iter=max_iter)

    def collective_influence(self, radius: int = 2) -> DataFrame:
        """Morone-Makse CI over the exact distance-`radius` shell
        (centrality.collective_influence)."""
        from .operators.centrality import collective_influence

        return collective_influence(self._e(), radius=radius)

    def who_to_follow(
        self, user: int, k_trust: int = 64, top_n: int = 20
    ) -> DataFrame:
        """PPR circle-of-trust -> personalized-SALSA recommendations
        (trust.who_to_follow)."""
        from .operators.trust import who_to_follow

        return who_to_follow(self._e(), user=user, k_trust=k_trust, top_n=top_n)

    def degree_gini(self) -> DataFrame:
        """Gini coefficient of the degree distribution (graph.degree_gini)."""
        from .graph import degree_gini

        return degree_gini(self._e())

    def landmark_distances(self, **kw) -> DataFrame:
        """ALT-style distance-sketch bounds (traversal.landmark_distances)."""
        from .operators.traversal import landmark_distances

        return landmark_distances(self._e(), **kw)

    def clique_percolation(self, **kw) -> DataFrame:
        """Overlapping k=3 CPM communities (components.clique_percolation)."""
        from .operators.components import clique_percolation

        return clique_percolation(self._e(), **kw)

    def conductance(self, communities: DataFrame) -> DataFrame:
        """Per-community conductance of any [id, label] table
        (components.community_conductance)."""
        from .operators.components import community_conductance

        return community_conductance(self._e(), communities)

    def simrank(self, **kw) -> DataFrame:
        """Top-K co-cited pairs refined with two SimRank iterations
        (simrank.simrank_refine)."""
        from .operators.simrank import simrank_refine

        return simrank_refine(self._e(), **kw)

    def wl_colors(self, rounds: int = 3) -> DataFrame:
        """1-WL structural color refinement (wl.wl_colors)."""
        from .operators.wl import wl_colors

        return wl_colors(self._e(), rounds=rounds)

    def pagerank_trace(self, **kw) -> DataFrame:
        """Per-iteration L1 convergence residuals (pagerank.pagerank_trace)."""
        from .operators.pagerank import pagerank_trace

        return pagerank_trace(self._e(), **kw)

    def max_flow(
        self, source: int, sink: int, capacity_col: str | None = None, **kw
    ):
        """Unit- or integer-capacity s-t max-flow / min-cut
        (flow.max_flow_unit) — returns FlowResult(flow, converged,
        s_side, cut_edges)."""
        from .operators.flow import max_flow_unit

        return max_flow_unit(
            self._e(), source, sink, capacity_col=capacity_col, **kw
        )

    def temporal_pagerank(
        self, contacts: DataFrame, windows: int = 6, **kw
    ) -> DataFrame:
        """Windowed time-decayed PageRank over a (src, dst, t) contact
        stream (temporal.temporal_pagerank)."""
        from .operators.temporal import temporal_pagerank

        return temporal_pagerank(contacts, windows=windows, **kw)

    def average_distance(self, max_t: int = 6, **kw) -> DataFrame:
        """ANF mean-distance estimate (anf.average_distance)."""
        from .operators.anf import average_distance

        return average_distance(self._e(), max_t=max_t, **kw)

    def vertex_cover(self, **kw) -> DataFrame:
        """2-approx minimum vertex cover (matching.vertex_cover)."""
        from .operators.matching import vertex_cover

        return vertex_cover(self._e(), **kw)

    def lt_cascade(self, **kw) -> DataFrame:
        """Deterministic Linear Threshold cascade (influence.lt_cascade)."""
        from .operators.influence import lt_cascade

        return lt_cascade(self._e(), **kw)

    def cheirank(self, **kw) -> DataFrame:
        """(PageRank, CheiRank) 2-D rank plane (pagerank.cheirank_plane)."""
        from .operators.pagerank import cheirank_plane

        return cheirank_plane(self._e(), **kw)

    def balance_census(self) -> DataFrame:
        """Structural-balance triangle census (triangles.balance_census)."""
        from .operators.triangles import balance_census

        return balance_census(self._e())

    def temporal_motifs(self, contacts: DataFrame, delta: int) -> DataFrame:
        """δ-temporal triangle motif census over a (src, dst, t) contact
        stream (temporal.temporal_triangle_motifs)."""
        from .operators.temporal import temporal_triangle_motifs

        return temporal_triangle_motifs(contacts, delta=delta)

    def burt_constraint(self) -> DataFrame:
        """Burt structural-holes constraint per vertex (triangles.burt_constraint)."""
        from .operators.triangles import burt_constraint

        return burt_constraint(self._e())

    def truncated_pagerank(self, **kw) -> DataFrame:
        """Becchetti truncated PageRank — short-path support removed
        (pagerank.truncated_pagerank)."""
        from .operators.pagerank import truncated_pagerank

        return truncated_pagerank(self._e(), **kw)

    def eulerian_census(self, **kw) -> DataFrame:
        """Eulerian circuit/path feasibility census (components.eulerian_census)."""
        from .operators.components import eulerian_census

        return eulerian_census(self._e(), **kw)

    def k_center(self, k: int = 3, **kw) -> DataFrame:
        """Gonzalez farthest-point k-center on the hop metric
        (kcenter.k_center)."""
        from .operators.kcenter import k_center

        return k_center(self._e(), k=k, **kw)

    def joint_degree_matrix(self) -> DataFrame:
        """dK-2 joint degree matrix (graph.joint_degree_matrix)."""
        from .graph import joint_degree_matrix

        return joint_degree_matrix(self._e())

    def clustering_by_degree(self) -> DataFrame:
        """c(k) clustering-by-degree curve (graph.clustering_by_degree)."""
        from .graph import clustering_by_degree

        return clustering_by_degree(self._e())

    def textrank(self, pairs: DataFrame, **kw) -> DataFrame:
        """TextRank scores over a weighted similarity pair list
        (operators/textrank.textrank_from_pairs — N x the weighted
        PageRank kernel; isolated ids via all_ids= at exactly 1-d)."""
        from .operators.textrank import textrank_from_pairs

        return textrank_from_pairs(pairs, **kw)

    def top_pages(self, k: int = 10, **kw) -> DataFrame:
        """Top-k urls by PageRank (flagship query: llama-pagerank.cc:253-270)."""
        ranks = self.pagerank(**kw)
        if self.dictionary is None:
            return ranks.orderBy(F.desc("rank"), F.asc("id")).limit(k)
        return (
            ranks.join(self.dictionary, "id")
            .select("url", "rank")
            .orderBy(F.desc("rank"), F.asc("url"))
            .limit(k)
        )
