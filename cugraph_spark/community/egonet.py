"""Ego graph (subgraph within a radius of seed vertices).

Reference: community/egonet.py:30 / cpp/src/community/egonet_impl.cuh.
Spark: BFS to depth ``radius`` then induced subgraph (SURVEY §2.A).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..structure.graph import Graph
from ..traversal.bfs import bfs, INT_MAX
from .induced_subgraph import induced_subgraph


def ego_graph(G: Graph, n, radius: int = 1, center: bool = True,
              undirected=None, distance=None) -> Graph:
    """Returns the ego net of vertex (or vertices) ``n`` as a Graph.
    ``undirected``/``distance`` are NetworkX-compat and ignored, exactly
    as the reference documents (egonet.py:44-47)."""
    res = bfs(G, n, depth_limit=radius)
    reached = res.filter(F.col("distance") != INT_MAX).select("vertex")
    if not center:
        seeds = n if isinstance(n, list) else [n]
        reached = reached.filter(~F.col("vertex").isin(seeds))
    return induced_subgraph(G, reached)


def batched_ego_graphs(G: Graph, seeds, radius: int = 1) -> DataFrame:
    """One ego net per seed: returns (seed, src, dst[, weight]) using the
    multi-source BFS machinery (the reference returns an offsets array;
    a seed column is the DataFrame-native equivalent)."""
    from ..traversal.bfs import multi_source_bfs
    from ..constants import SRC, DST

    seeds = seeds if isinstance(seeds, list) else [seeds]
    reach = multi_source_bfs(G, seeds, depth_limit=radius)  # (source, vertex, ...)
    edges = G.edges()
    r1 = reach.select(F.col("source").alias("seed"), F.col("vertex").alias(SRC))
    r2 = reach.select(F.col("source").alias("seed"), F.col("vertex").alias(DST))
    return edges.join(r1, SRC).join(r2, ["seed", DST]).select("seed", *edges.columns)


def ego_graph_edges(G: Graph, n, radius: int = 1) -> "DataFrame":
    """Unique (src < dst) pairs of the ego net — edge-list query surface
    (BFS reach + induced edges, no Graph rebuild)."""
    from .induced_subgraph import induced_subgraph_edges

    res = bfs(G, n, depth_limit=radius)
    reached = res.filter(F.col("distance") != INT_MAX).select("vertex")
    return induced_subgraph_edges(G, reached)
