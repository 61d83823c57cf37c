"""Clustering quality scores.

Reference: community/spectral_clustering.py:216,300,384 —
``analyzeClustering_modularity / _edge_cut / _ratio_cut(G, n_clusters,
clustering_df)``. Pure aggregations (SURVEY §2.D):

- modularity: Σ_C [in_C/2m − (σ_C/2m)²]
- edge cut: total weight of edges crossing clusters (each undirected
  edge once)
- ratio cut: Σ_C cut(C)/|C|
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST, WEIGHT
from ..structure.graph import Graph


def _edges_with_clusters(G: Graph, clustering: DataFrame, vertex_col: str, cluster_col: str):
    assign = clustering.select(
        F.col(vertex_col).alias("vertex"), F.col(cluster_col).alias("cluster")
    )
    assign = G.renumber_vertices(assign, "vertex")
    w = F.col(WEIGHT) if G.is_weighted() else F.lit(1.0)
    e = G.edgelist.select(SRC, DST, w.alias("_w"))
    e = e.join(assign.select(F.col("vertex").alias(SRC), F.col("cluster").alias("_cs")), SRC)
    e = e.join(assign.select(F.col("vertex").alias(DST), F.col("cluster").alias("_cd")), DST)
    return e, assign


def analyzeClustering_modularity(
    G: Graph, n_clusters: int, clustering: DataFrame,
    vertex_col_name: str = "vertex", cluster_col_name: str = "cluster",
) -> float:
    e, _ = _edges_with_clusters(G, clustering, vertex_col_name, cluster_col_name)
    two_m = e.agg(F.sum("_w")).collect()[0][0]
    if not two_m:
        return 0.0
    internal = e.filter(F.col("_cs") == F.col("_cd")).groupBy("_cs").agg(F.sum("_w").alias("_in"))
    sigma = (
        e.groupBy(SRC, "_cs").agg(F.sum("_w").alias("_k")).groupBy("_cs").agg(F.sum("_k").alias("_sig"))
    )
    q = (
        sigma.join(internal, "_cs", "left")
        .select(
            (F.coalesce("_in", F.lit(0.0)) / two_m - F.pow(F.col("_sig") / two_m, 2)).alias("_q")
        )
        .agg(F.sum("_q"))
        .collect()[0][0]
    )
    return float(q or 0.0)


def analyzeClustering_edge_cut(
    G: Graph, n_clusters: int, clustering: DataFrame,
    vertex_col_name: str = "vertex", cluster_col_name: str = "cluster",
) -> float:
    e, _ = _edges_with_clusters(G, clustering, vertex_col_name, cluster_col_name)
    cut = e.filter(F.col("_cs") != F.col("_cd")).agg(F.sum("_w")).collect()[0][0] or 0.0
    return float(cut) / 2.0  # symmetrized edges count each crossing twice


def analyzeClustering_ratio_cut(
    G: Graph, n_clusters: int, clustering: DataFrame,
    vertex_col_name: str = "vertex", cluster_col_name: str = "cluster",
) -> float:
    e, assign = _edges_with_clusters(G, clustering, vertex_col_name, cluster_col_name)
    # rows with _cs = C already count each crossing edge exactly once from
    # C's side, so cut(C) needs no halving (unlike the global edge cut)
    cut_per = (
        e.filter(F.col("_cs") != F.col("_cd"))
        .groupBy("_cs")
        .agg(F.sum("_w").alias("_cut"))
    )
    size_per = assign.groupBy(F.col("cluster").alias("_cs")).agg(F.count("*").alias("_n"))
    val = (
        size_per.join(cut_per, "_cs", "left")
        .select((F.coalesce("_cut", F.lit(0.0)) / F.col("_n")).alias("_r"))
        .agg(F.sum("_r"))
        .collect()[0][0]
    )
    return float(val or 0.0)
