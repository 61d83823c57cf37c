"""k-truss subgraph.

Reference: community/ktruss_subgraph.py:11,50 /
cpp/src/community/k_truss_impl.cuh: maximal subgraph in which every edge
participates in at least k-2 triangles.

Spark mapping (SURVEY §2.A): IterLoop — per-edge triangle support via the
oriented wedge join, delete edges below k-2, repeat until fixpoint. Each
round's wedge join runs on the shrinking survivor edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST, WEIGHT
from ..plans import iterloop
from ..structure.graph import Graph


def _edge_support(und: DataFrame) -> DataFrame:
    """und: undirected unique pairs (src < dst). Returns (src, dst, sup)."""
    ab = und.select(F.col(SRC).alias("a"), F.col(DST).alias("b"))
    bc = und.select(F.col(SRC).alias("b"), F.col(DST).alias("c"))
    ac = und.select(F.col(SRC).alias("a"), F.col(DST).alias("c"))
    tri = ab.join(bc, "b").join(ac, ["a", "c"])  # a < b < c
    sides = (
        tri.select(F.col("a").alias(SRC), F.col("b").alias(DST))
        .unionAll(tri.select(F.col("b").alias(SRC), F.col("c").alias(DST)))
        .unionAll(tri.select(F.col("a").alias(SRC), F.col("c").alias(DST)))
    )
    sup = sides.groupBy(SRC, DST).agg(F.count("*").alias("_sup"))
    return und.join(sup, [SRC, DST], "left").select(
        SRC, DST, F.coalesce("_sup", F.lit(0)).alias("_sup")
    )


def ktruss_subgraph(G: Graph, k: int, use_weights: bool = True) -> Graph:
    """Returns the k-truss as a Graph (undirected input only).
    ``use_weights`` is deprecated in the reference (ktruss_subgraph.py:53)
    and ignored there too."""
    if G.is_directed():
        raise ValueError("input graph must be undirected")
    if k < 3:
        raise ValueError("k must be >= 3")

    und = (
        G.edgelist.filter(F.col(SRC) < F.col(DST)).select(SRC, DST)
    )
    und = iterloop.materialize(und)
    it = 0
    # loop state is the (halved) edge list itself — small-plan applies
    # while it fits the broadcast-size regime
    with iterloop.small_plan(
        und.sparkSession, (G.number_of_edges(directed_edges=True) or 0) // 2
    ):
        while True:
            it += 1
            sup = _edge_support(und)
            keep = iterloop.materialize(sup.filter(F.col("_sup") >= k - 2).select(SRC, DST))
            n_before, n_after = und.count(), keep.count()
            und = keep
            if n_after == n_before or n_after == 0:
                break

    # back to external ids via the parent graph's map, keep weights
    pairs = und
    edges = G.edgelist.join(pairs, [SRC, DST], "left_semi")
    edges = edges.unionByName(
        G.edgelist.join(
            pairs.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)), [SRC, DST], "left_semi"
        )
    )
    ext = G.unrenumber(G.unrenumber(edges, SRC), DST)
    out = Graph(directed=False)
    weight = WEIGHT if WEIGHT in ext.columns else None
    out.from_edgelist(ext, SRC, DST, weight=weight, symmetrize=False)
    return out


def k_truss(G: Graph, k: int) -> Graph:
    """community/ktruss_subgraph.py:11 — top-level alias (the reference
    passes use_weights=False here; both values are no-ops)."""
    return ktruss_subgraph(G, k, use_weights=False)


def k_truss_edges(G: Graph, k: int) -> DataFrame:
    """Unique (src < dst) pairs of the k-truss (query surface)."""
    sub = ktruss_subgraph(G, k)
    return sub.edges().filter(F.col(SRC) < F.col(DST)).select(SRC, DST)
