"""Induced subgraph.

Reference: community/induced_subgraph.py:33 (returns the subgraph edge
list on the given vertex set) / cpp/src/structure/induced_subgraph_impl.cuh.
Spark: two semi-joins against the vertex set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST, WEIGHT
from ..structure.graph import Graph


def induced_subgraph(G: Graph, vertices) -> Graph:
    """Returns the induced subgraph as a new Graph (external ids).
    ``vertices``: list or single-column DataFrame of external ids."""
    spark = G.edgelist.sparkSession
    if isinstance(vertices, DataFrame):
        vdf = vertices.select(F.col(vertices.columns[0]).alias("_v"))
    else:
        vdf = spark.createDataFrame([(v,) for v in vertices], ["_v"])

    edges = G.edges()
    edges = edges.join(vdf.withColumnRenamed("_v", SRC), SRC, "left_semi")
    edges = edges.join(vdf.withColumnRenamed("_v", DST), DST, "left_semi")

    out = Graph(directed=G.is_directed())
    weight = WEIGHT if WEIGHT in edges.columns else None
    out.from_edgelist(
        edges, SRC, DST, weight=weight, symmetrize=False if not G.is_directed() else None
    )
    return out


def subgraph(G: Graph, vertices) -> Graph:
    """Alias kept for the reference's older name."""
    return induced_subgraph(G, vertices)
