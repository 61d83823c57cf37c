"""Degree centrality — degree/(n-1).

Reference: centrality/degree_centrality.py:7 (pure python over G.degree()).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..structure.graph import Graph


def degree_centrality(G: Graph, normalized: bool = True) -> DataFrame:
    """Returns (vertex, degree_centrality)."""
    n = G.number_of_vertices()
    d = G.degree()
    c = F.col("degree").cast("double")
    if normalized and n > 1:
        c = c / (n - 1)
    return d.select("vertex", c.alias("degree_centrality"))
