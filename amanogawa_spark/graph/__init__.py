from amanogawa_spark.graph.build import (
    build_edges,
    build_graph,
    build_vertices,
    degrees,
)
from amanogawa_spark.graph.pagerank import katz_centrality, pagerank
from amanogawa_spark.graph.components import connected_components, connected_components_minlabel
from amanogawa_spark.graph.lpa import label_propagation
from amanogawa_spark.graph.triangles import (
    clustering_coefficient,
    k_truss,
    triangle_count,
)
from amanogawa_spark.graph.cocitation import bibliographic_coupling, cocitation
from amanogawa_spark.graph.community import louvain, modularity
from amanogawa_spark.graph.mis import luby_mis
from amanogawa_spark.graph.scc import strongly_connected_components
from amanogawa_spark.graph.condensation import condensation_edges, topological_levels
from amanogawa_spark.graph.localcluster import local_cluster, ppr_sweep_cut
from amanogawa_spark.graph.sssp import bfs_levels, shortest_paths
from amanogawa_spark.graph.walks import node2vec_walks, random_walks, skipgram_pairs
from amanogawa_spark.graph.generate import rmat_edges
from amanogawa_spark.graph.blockrank import blockrank, blockrank_init
from amanogawa_spark.graph.montecarlo import pagerank_montecarlo
from amanogawa_spark.graph.anchors import anchor_edges, anchor_top_terms
from amanogawa_spark.graph.coloring import jp_coloring
from amanogawa_spark.graph.diff import degree_deltas, diff_summary, edge_diff
from amanogawa_spark.graph.incremental import (
    incremental_components,
    incremental_pagerank,
    incremental_triangles,
)
from amanogawa_spark.graph.frontier import (
    crawl_budget,
    crawl_frontier,
    frontier_priorities,
)
from amanogawa_spark.graph.landmarks import (
    estimate_distances,
    landmark_distances,
    select_landmarks,
)
from amanogawa_spark.graph.salsa import salsa
from amanogawa_spark.graph.trustrank import spam_mass, spam_mass_scores, trustrank
from amanogawa_spark.graph.host import host_graph, host_rank, host_vertices
from amanogawa_spark.graph.build import degree_assortativity, reciprocity
from amanogawa_spark.graph.metrics import (
    avg_neighbor_degree,
    community_conductance,
    rich_club,
)
from amanogawa_spark.graph.densest import densest_subgraph, peel_profile, peel_profile_df
from amanogawa_spark.graph.eigen import eigenvector_centrality, truncated_hitting_time
from amanogawa_spark.graph.simrank import simrank_pairs
from amanogawa_spark.graph.compress import adjacency_gap_bits, compression_summary
from amanogawa_spark.graph.wl import wl_class_sizes, wl_labels
from amanogawa_spark.graph.robustness import hub_knockout, top_hubs
from amanogawa_spark.graph.butterflies import (
    butterfly_total,
    vertex_butterflies,
    wedge_codegrees,
)
from amanogawa_spark.graph.bowtie import (
    bowtie_decomposition,
    bowtie_summary,
    giant_scc,
)
from amanogawa_spark.graph.matching import contract_matching, maximal_matching
from amanogawa_spark.graph.rankcorr import rank_positions, spearman_rho, top_k_overlap
from amanogawa_spark.graph.sparsify import sparsify_stats, top_k_out_edges
from amanogawa_spark.graph.redirects import (
    redirect_pointers,
    resolve_redirects,
    rewrite_edges,
)
from amanogawa_spark.graph.partition import (
    community_partition,
    edge_cut,
    multilevel_partition,
    spinner_partition,
)
from amanogawa_spark.graph.propagate import aggregate_neighbor_features, sample_neighbors
from amanogawa_spark.graph.labelspread import label_spreading
from amanogawa_spark.graph.negsample import degree_negative_samples

__all__ = [
    "aggregate_neighbor_features",
    "sample_neighbors",
    "label_spreading",
    "degree_negative_samples",
    "build_edges",
    "build_graph",
    "build_vertices",
    "degrees",
    "bibliographic_coupling",
    "cocitation",
    "pagerank",
    "incremental_pagerank",
    "incremental_components",
    "incremental_triangles",
    "katz_centrality",
    "connected_components",
    "connected_components_minlabel",
    "label_propagation",
    "louvain",
    "luby_mis",
    "modularity",
    "clustering_coefficient",
    "k_truss",
    "strongly_connected_components",
    "condensation_edges",
    "topological_levels",
    "local_cluster",
    "ppr_sweep_cut",
    "shortest_paths",
    "bfs_levels",
    "random_walks",
    "skipgram_pairs",
    "node2vec_walks",
    "anchor_edges",
    "anchor_top_terms",
    "jp_coloring",
    "edge_diff",
    "degree_deltas",
    "diff_summary",
    "crawl_budget",
    "crawl_frontier",
    "frontier_priorities",
    "landmark_distances",
    "estimate_distances",
    "select_landmarks",
    "salsa",
    "trustrank",
    "spam_mass",
    "spam_mass_scores",
    "host_graph",
    "host_vertices",
    "host_rank",
    "maximal_matching",
    "contract_matching",
    "bowtie_decomposition",
    "bowtie_summary",
    "giant_scc",
    "redirect_pointers",
    "resolve_redirects",
    "rewrite_edges",
    "top_k_out_edges",
    "sparsify_stats",
    "rank_positions",
    "spearman_rho",
    "top_k_overlap",
    "community_partition",
    "spinner_partition",
    "multilevel_partition",
    "edge_cut",
    "triangle_count",
    "reciprocity",
    "degree_assortativity",
    "avg_neighbor_degree",
    "community_conductance",
    "rich_club",
    "hub_knockout",
    "top_hubs",
    "wl_class_sizes",
    "wl_labels",
    "butterfly_total",
    "vertex_butterflies",
    "wedge_codegrees",
    "densest_subgraph",
    "peel_profile",
    "peel_profile_df",
    "eigenvector_centrality",
    "truncated_hitting_time",
    "simrank_pairs",
    "adjacency_gap_bits",
    "compression_summary",
    "rmat_edges",
    "blockrank",
    "blockrank_init",
    "pagerank_montecarlo",
]
