"""cugraph_spark — a PySpark-native graph analytics engine.

Re-expresses rapidsai/cugraph's API surface (see SURVEY.md) as DataFrame
plans: a Graph abstraction over an edges DataFrame plus a library of graph
operators implemented as joins/aggregations with an IterLoop runner for
iterative algorithms. Everything composes with Spark SQL.
"""

from .structure.graph import Graph, MultiGraph, Tree, BiPartiteGraph
from .structure.symmetrize import symmetrize_df
from .link_analysis.pagerank import pagerank, pagerank_with_flag

__version__ = "0.1.0"

__all__ = [
    "Graph",
    "MultiGraph",
    "Tree",
    "BiPartiteGraph",
    "symmetrize_df",
    "pagerank",
    "pagerank_with_flag",
]


def __getattr__(name):
    # Lazy imports keep `import cugraph_spark` cheap and avoid circular
    # imports as the operator library grows; mirrors cugraph's flat
    # top-level namespace (python/cugraph/cugraph/__init__.py).
    import importlib

    lazy = {
        "bfs": ".traversal.bfs",
        "bfs_edges": ".traversal.bfs",
        "multi_source_bfs": ".traversal.bfs",
        "sssp": ".traversal.sssp",
        "shortest_path": ".traversal.sssp",
        "shortest_path_length": ".traversal.sssp",
        "filter_unreachable": ".traversal.sssp",
        "weakly_connected_components": ".components.connectivity",
        "strongly_connected_components": ".components.connectivity",
        "connected_components": ".components.connectivity",
        "triangle_count": ".community.triangle_count",
        "edge_triangle_count": ".community.triangle_count",
        "core_number": ".cores.core_number",
        "k_core": ".cores.k_core",
        "ktruss_subgraph": ".community.ktruss_subgraph",
        "k_truss": ".community.ktruss_subgraph",
        "induced_subgraph": ".community.induced_subgraph",
        "ego_graph": ".community.egonet",
        "batched_ego_graphs": ".community.egonet",
        "louvain": ".community.louvain",
        "leiden": ".community.leiden",
        "ecg": ".community.ecg",
        "analyzeClustering_modularity": ".community.clustering_scores",
        "analyzeClustering_edge_cut": ".community.clustering_scores",
        "analyzeClustering_ratio_cut": ".community.clustering_scores",
        "jaccard": ".link_prediction.jaccard",
        "jaccard_coefficient": ".link_prediction.jaccard",
        "all_pairs_jaccard": ".link_prediction.jaccard",
        "overlap": ".link_prediction.overlap",
        "overlap_coefficient": ".link_prediction.overlap",
        "all_pairs_overlap": ".link_prediction.overlap",
        "sorensen": ".link_prediction.sorensen",
        "sorensen_coefficient": ".link_prediction.sorensen",
        "all_pairs_sorensen": ".link_prediction.sorensen",
        "cosine": ".link_prediction.cosine",
        "cosine_coefficient": ".link_prediction.cosine",
        "all_pairs_cosine": ".link_prediction.cosine",
        "katz_centrality": ".centrality.katz_centrality",
        "eigenvector_centrality": ".centrality.eigenvector_centrality",
        "degree_centrality": ".centrality.degree_centrality",
        "betweenness_centrality": ".centrality.betweenness_centrality",
        "edge_betweenness_centrality": ".centrality.betweenness_centrality",
        "hits": ".link_analysis.hits",
        "get_two_hop_neighbors": ".structure.two_hop",
        "uniform_random_walks": ".sampling.random_walks",
        "biased_random_walks": ".sampling.random_walks",
        "node2vec_random_walks": ".sampling.random_walks",
        "random_walks": ".sampling.random_walks",
        "homogeneous_neighbor_sample": ".sampling.neighbor_sample",
        "heterogeneous_neighbor_sample": ".sampling.neighbor_sample",
        "negative_sampling": ".sampling.negative_sampling",
        "rmat": ".generators.rmat",
        "multi_rmat": ".generators.rmat",
        "minimum_spanning_tree": ".tree.minimum_spanning_tree",
        "maximum_spanning_tree": ".tree.minimum_spanning_tree",
        "topological_sort": ".dag.topological_sort",
        "maximal_independent_set": ".components.mis",
        "approximate_weighted_matching": ".community.matching",
        "vertex_coloring": ".components.vertex_coloring",
        "hypergraph": ".structure.hypergraph",
        "extract_bfs_paths": ".traversal.path_retrieval",
        "get_traversed_cost": ".traversal.path_retrieval",
        "get_traversed_path": ".traversal.path_retrieval",
        "get_traversed_path_list": ".traversal.path_retrieval",
        "k_hop_nbrs": ".traversal.k_hop",
        "od_shortest_distances": ".traversal.k_hop",
        "relabel": ".structure.utils_ops",
        "replicate_edgelist": ".structure.utils_ops",
        "remove_self_loops": ".structure.utils_ops",
        "remove_multi_edges": ".structure.utils_ops",
        "count_multi_edges": ".structure.utils_ops",
        "coarsen_graph": ".structure.utils_ops",
        "transpose_graph": ".structure.utils_ops",
        "edge_id_lookup": ".structure.utils_ops",
        "renumber_arbitrary_edgelist": ".structure.utils_ops",
        "sample_groups": ".structure.utils_ops",
        "from_adjlist": ".structure.convert_matrix",
        "from_pandas_adjacency": ".structure.convert_matrix",
        "to_pandas_adjacency": ".structure.convert_matrix",
        "from_numpy_array": ".structure.convert_matrix",
        "to_numpy_array": ".structure.convert_matrix",
        "from_numpy_matrix": ".structure.convert_matrix",
        "to_numpy_matrix": ".structure.convert_matrix",
        "to_pandas_edgelist": ".structure.convert_matrix",
        "from_edgelist": ".structure.convert_matrix",
        "from_adjlist": ".structure.convert_matrix",
        "from_pandas_edgelist": ".structure.convert_matrix",
        "to_pandas_edgelist": ".structure.convert_matrix",
        "force_atlas2": ".layout.force_atlas2",
        "find_bicliques": ".structure.bicliques",
        "spectralBalancedCutClustering": ".community.spectral_clustering",
        "spectralModularityMaximizationClustering": ".community.spectral_clustering",
        "hungarian": ".linear_assignment.lap",
        "dense_hungarian": ".linear_assignment.lap",
        "symmetrize": ".structure.symmetrize",
        "NumberMap": ".structure.number_map",
        "concurrent_bfs": ".traversal.bfs",
        "select_random_vertices": ".structure.graph",
        # training-data pipeline operators (beyond-reference family)
        "exact_duplicates": ".pipelines.dedup",
        "shingles": ".pipelines.dedup",
        "minhash_signatures": ".pipelines.dedup",
        "minhash_lsh_candidates": ".pipelines.dedup",
        "verify_jaccard": ".pipelines.dedup",
        "minhash_lsh_duplicates": ".pipelines.dedup",
        "ngram_jaccard_pairs": ".pipelines.dedup",
        "simhash_fingerprints": ".pipelines.dedup",
        "simhash_near_duplicates": ".pipelines.dedup",
        "brute_force_topk": ".pipelines.similarity_search",
        "lsh_topk": ".pipelines.similarity_search",
        "ivf_topk": ".pipelines.similarity_search",
        "semantic_duplicates": ".pipelines.similarity_search",
        "embedding_near_duplicates": ".pipelines.similarity_search",
        "with_cosine": ".pipelines.similarity_search",
        "decontaminate": ".pipelines.decontaminate",
        "token_counts": ".pipelines.text",
        "quality_scores": ".pipelines.text",
        "language_id": ".pipelines.text",
        "document_fingerprints": ".pipelines.text",
        "repetition_scores": ".pipelines.text",
        "redact_pii": ".pipelines.text",
    }
    if name in lazy:
        mod = importlib.import_module(lazy[name], __name__)
        return getattr(mod, name)
    raise AttributeError(f"module 'cugraph_spark' has no attribute {name!r}")
