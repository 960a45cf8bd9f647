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
from amanogawa_spark.graph.sssp import bfs_levels, shortest_paths
from amanogawa_spark.graph.walks import random_walks

__all__ = [
    "build_edges",
    "build_graph",
    "build_vertices",
    "degrees",
    "bibliographic_coupling",
    "cocitation",
    "pagerank",
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
    "shortest_paths",
    "bfs_levels",
    "random_walks",
    "triangle_count",
]
