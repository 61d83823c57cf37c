"""Triangle counting (per-vertex and per-edge).

Reference: community/triangle_count.py:34 (output ``(vertex, counts)``,
undirected only, optional start_list) and
cpp/src/community/triangle_count_impl.cuh (per-edge neighbor
intersection over degree-ordered adjacency).

Spark mapping (SURVEY §2.D): orient each undirected edge from the
lower-(degree, id) endpoint to the higher (heavy-hitter vertices get few
out-edges — the same load-balancing the reference gets from
degree-ordered intersection), then close each oriented edge (a, b) by
intersecting the out-neighbor ARRAYS of its endpoints:

    c ∈ N+(a) ∩ N+(b)   via  array_intersect(collect_list per vertex)

This is the plan that survives scale: the naive wedge self-join
O(a,b) ⋈ O(b,c) ⋈ O(a,c) shuffles one row per WEDGE — measured
super-linear on R-MAT (scale-16 31.6s → scale-18 197.7s for 4.2× the
edges; wedge counts grow ~m^1.5 on power-law graphs) — while the
intersection form shuffles O(E) rows whose array payloads sum to O(E)
ids, and the per-edge intersection runs JVM-side inside one codegen
stage (measured scale-18: 197.7s → ~8s). Per-vertex counts use the
intersection SIZE for the a/b corners and explode only the c side —
one T-row shuffle instead of three.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST
from ..plans import iterloop
from ..structure.graph import Graph


def _oriented(G: Graph) -> DataFrame:
    """Each undirected edge once, low-(degree,id) -> high-(degree,id)."""
    e = G.edgelist.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    deg = e.groupBy(F.col(SRC).alias("_v")).agg(F.count("*").alias("_d"))
    e = (
        e.join(deg.select(F.col("_v").alias(SRC), F.col("_d").alias("_ds")), SRC)
        .join(deg.select(F.col("_v").alias(DST), F.col("_d").alias("_dd")), DST)
    )
    return e.filter(
        (F.col("_ds") < F.col("_dd"))
        | ((F.col("_ds") == F.col("_dd")) & (F.col(SRC) < F.col(DST)))
    ).select(SRC, DST)


def _closed_edges(G: Graph) -> tuple[DataFrame, DataFrame]:
    """Each oriented edge (a, b) with the array of closing vertices
    ``_cs`` = N+(a) ∩ N+(b): every triangle appears exactly once, as one
    element of one edge's array. Returns (closed, oriented_persisted) —
    the caller MUST unpersist the second element after materializing its
    result: a leaked E-sized cache with array payloads squats in the
    storage pool (protected from eviction up to the storage fraction)
    and was measured to slow the NEXT operator in the session 5×
    (louvain 3-pass at R-MAT scale-20: 172.9s after a leaky triangle
    count vs 35.7s clean)."""
    o = iterloop.persist(_oriented(G))
    adj = o.groupBy(SRC).agg(F.collect_list(DST).alias("_n"))
    closed = (
        o.select(F.col(SRC).alias("a"), F.col(DST).alias("b"))
        .join(adj.select(F.col(SRC).alias("a"), F.col("_n").alias("_na")), "a")
        .join(adj.select(F.col(SRC).alias("b"), F.col("_n").alias("_nb")), "b")
        .select("a", "b", F.array_intersect("_na", "_nb").alias("_cs"))
    )
    return closed, o


def _triangles(G: Graph) -> DataFrame:
    """All triangles as (a, b, c) rows, each exactly once (oriented),
    materialized (no caches left behind)."""
    closed, o = _closed_edges(G)
    tri = iterloop.materialize(closed.select("a", "b", F.explode("_cs").alias("c")))
    o.unpersist()
    return tri


def triangle_count(G: Graph, start_list=None) -> DataFrame:
    """Returns (vertex, counts) for every vertex (0 for triangle-free)."""
    if G.is_directed():
        raise ValueError("input graph must be undirected")
    closed, o = _closed_edges(G)
    closed = iterloop.persist(closed.filter(F.size("_cs") > 0))
    corners = (
        closed.select(F.col("a").alias("vertex"), F.size("_cs").alias("_t"))
        .unionAll(closed.select(F.col("b").alias("vertex"), F.size("_cs").alias("_t")))
        .unionAll(closed.select(F.explode("_cs").alias("vertex"), F.lit(1).alias("_t")))
    )
    cnt = corners.groupBy("vertex").agg(F.sum("_t").alias("counts"))
    out = G.vertices_internal.join(cnt, "vertex", "left").select(
        "vertex", F.coalesce("counts", F.lit(0)).cast("long").alias("counts")
    )
    # V-sized: materialize eagerly so the E-sized intermediates (oriented
    # edges + closing arrays) can be dropped before returning
    out = iterloop.materialize(G.unrenumber(out, "vertex"))
    closed.unpersist()
    o.unpersist()
    if start_list is not None:
        if not isinstance(start_list, list):
            start_list = [start_list]
        out = out.filter(F.col("vertex").isin(start_list))
    return out


def edge_triangle_count(G: Graph) -> DataFrame:
    """Per-edge triangle counts (C++ community/edge_triangle_count_impl.cuh).
    Returns (src, dst, counts) over the oriented (src < dst by degree)
    representation of each undirected edge."""
    if G.is_directed():
        raise ValueError("input graph must be undirected")
    closed, o = _closed_edges(G)
    tri = iterloop.materialize(closed.select("a", "b", F.explode("_cs").alias("c")))
    sides = (
        tri.select(F.col("a").alias(SRC), F.col("b").alias(DST))
        .unionAll(tri.select(F.col("b").alias(SRC), F.col("c").alias(DST)))
        .unionAll(tri.select(F.col("a").alias(SRC), F.col("c").alias(DST)))
    )
    cnt = sides.groupBy(SRC, DST).agg(F.count("*").alias("counts"))
    out = o.join(cnt, [SRC, DST], "left").select(
        SRC, DST, F.coalesce("counts", F.lit(0)).cast("long").alias("counts")
    )
    out = G.unrenumber(out, SRC)
    out = iterloop.materialize(G.unrenumber(out, DST))
    o.unpersist()
    return out
