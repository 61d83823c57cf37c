"""Two-hop neighbor pairs.

Reference: simpleGraph.py:774 ``get_two_hop_neighbors(start_vertices)`` —
pairs of vertices with a path of exactly two edges between them (both
orientations, self-pairs excluded). Spark mapping (SURVEY §2.A): one
self-join on the symmetrized edge list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST
from ..structure.graph import Graph


def two_hop_pairs_internal(G: Graph, start_internal: list | None = None) -> DataFrame:
    e1 = G.edgelist.select(F.col(SRC).alias("first"), F.col(DST).alias("_mid"))
    if start_internal is not None:
        e1 = e1.filter(F.col("first").isin(start_internal))
    e2 = G.edgelist.select(F.col(SRC).alias("_mid"), F.col(DST).alias("second"))
    return (
        e1.join(e2, "_mid")
        .filter(F.col("first") != F.col("second"))
        .select("first", "second")
        .distinct()
    )


def get_two_hop_neighbors(G: Graph, start_vertices=None) -> DataFrame:
    start_internal = None
    if start_vertices is not None:
        if not isinstance(start_vertices, list):
            start_vertices = [start_vertices]
        start_internal = G.lookup_internal_vertex_id(start_vertices)
    out = two_hop_pairs_internal(G, start_internal)
    out = G.unrenumber(out, "first")
    out = G.unrenumber(out, "second")
    return out
