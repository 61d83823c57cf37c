"""k-core subgraph.

Reference: cores/k_core.py:28 — maximal subgraph with minimum degree >= k;
built from core numbers (cpp/src/cores/k_core_impl.cuh just filters).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST
from ..structure.graph import Graph
from .core_number import core_number


def k_core(
    G: Graph,
    k: Optional[int] = None,
    core_number_df: Optional[DataFrame] = None,
    degree_type: str = "bidirectional",
    **kwargs,
) -> Graph:
    """Returns the k-core as a new Graph. ``k`` defaults to the maximum
    core number (reference semantics); a precomputed (vertex,
    core_number) DataFrame may be passed as ``core_number_df`` or the
    reference's ``core_number=`` keyword (k_core.py:28); ``degree_type``
    is forwarded to the core-number computation."""
    ref_cn = kwargs.pop("core_number", None)
    if kwargs:
        raise TypeError(f"unexpected kwargs: {sorted(kwargs)}")
    if core_number_df is None:
        core_number_df = ref_cn
    if G.is_directed():
        raise ValueError("input graph must be undirected")
    if core_number_df is None:
        core_number_df = core_number(G, degree_type)
    if k is None:
        k = core_number_df.agg(F.max("core_number")).collect()[0][0]

    keep = core_number_df.filter(F.col("core_number") >= k).select("vertex")
    edges = G.edges()  # external ids
    edges = edges.join(keep.withColumnRenamed("vertex", SRC), SRC, "left_semi")
    edges = edges.join(keep.withColumnRenamed("vertex", DST), DST, "left_semi")

    out = Graph(directed=False)
    weight = "weight" if "weight" in edges.columns else None
    # already symmetrized rows — don't re-symmetrize (pass symmetrize=False)
    out.from_edgelist(edges, SRC, DST, weight=weight, symmetrize=False)
    return out


def k_core_edges(G: Graph, k: Optional[int] = None) -> DataFrame:
    """Edge list of the k-core deduped to src<dst pairs (query surface).

    Computes the vertex filter + two semi-joins directly — the Graph
    surface (k_core) wraps the same rows in a full from_edgelist build
    (repartition + persist + count + vertex set) that the edge-list
    consumer immediately flattens away. The parent graph's edge view is
    already canonical/deduped, so the rebuilt graph's edges() equals
    these rows exactly."""
    if G.is_directed():
        raise ValueError("input graph must be undirected")
    cn = core_number(G)
    if k is None:
        k = cn.agg(F.max("core_number")).collect()[0][0]
    keep = cn.filter(F.col("core_number") >= k).select("vertex")
    edges = G.edges()
    edges = edges.join(keep.withColumnRenamed("vertex", SRC), SRC, "left_semi")
    edges = edges.join(keep.withColumnRenamed("vertex", DST), DST, "left_semi")
    return edges.filter(F.col(SRC) < F.col(DST)).select(SRC, DST)
