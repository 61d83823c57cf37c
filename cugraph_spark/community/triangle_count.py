"""Triangle counting (per-vertex and per-edge).

Reference: community/triangle_count.py:34 (output ``(vertex, counts)``,
undirected only, optional start_list) and
cpp/src/community/triangle_count_impl.cuh (per-edge neighbor
intersection over degree-ordered adjacency).

Spark mapping (SURVEY §2.D): orient each undirected edge from the
lower-(degree, id) endpoint to the higher — the classic wedge-count
reduction (heavy-hitter vertices get few out-edges, so the wedge join
stays near-linear on skewed graphs; this is exactly the load-balancing
the reference gets from degree-ordered intersection). Then

    triangles = O(a,b) ⋈ O(b,c) ⋈ O(a,c)

finds each triangle exactly once; per-vertex counts explode the three
corners, per-edge counts group each of the three sides.
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


def _triangles(G: Graph) -> DataFrame:
    """All triangles as (a, b, c) rows, each exactly once (oriented)."""
    o = iterloop.persist(_oriented(G))
    ab = o.select(F.col(SRC).alias("a"), F.col(DST).alias("b"))
    bc = o.select(F.col(SRC).alias("b"), F.col(DST).alias("c"))
    ac = o.select(F.col(SRC).alias("a"), F.col(DST).alias("c"))
    return ab.join(bc, "b").join(ac, ["a", "c"]).select("a", "b", "c")


def triangle_count(G: Graph, start_list=None) -> DataFrame:
    """Returns (vertex, counts) for every vertex (0 for triangle-free)."""
    if G.is_directed():
        raise ValueError("input graph must be undirected")
    tri = _triangles(G)
    corners = (
        tri.select(F.col("a").alias("vertex"))
        .unionAll(tri.select(F.col("b").alias("vertex")))
        .unionAll(tri.select(F.col("c").alias("vertex")))
    )
    cnt = corners.groupBy("vertex").agg(F.count("*").alias("counts"))
    out = G.vertices_internal.join(cnt, "vertex", "left").select(
        "vertex", F.coalesce("counts", F.lit(0)).cast("long").alias("counts")
    )
    out = G.unrenumber(out, "vertex")
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
    tri = iterloop.materialize(_triangles(G))
    sides = (
        tri.select(F.col("a").alias(SRC), F.col("b").alias(DST))
        .unionAll(tri.select(F.col("b").alias(SRC), F.col("c").alias(DST)))
        .unionAll(tri.select(F.col("a").alias(SRC), F.col("c").alias(DST)))
    )
    cnt = sides.groupBy(SRC, DST).agg(F.count("*").alias("counts"))
    out = _oriented(G).join(cnt, [SRC, DST], "left").select(
        SRC, DST, F.coalesce("counts", F.lit(0)).cast("long").alias("counts")
    )
    out = G.unrenumber(out, SRC)
    out = G.unrenumber(out, DST)
    return out
