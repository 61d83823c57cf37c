"""Approximate weighted matching (handshaking).

Reference: C++ only — cpp/src/community/approx_weighted_matching_impl.cuh
(SURVEY §2.A: "IterLoop: mutual-best-edge handshaking"): each vertex
points at its heaviest incident edge; mutual pointers become matched
pairs; matched vertices drop out; repeat.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST, WEIGHT
from ..plans import iterloop
from ..structure.graph import Graph


def approximate_weighted_matching(G: Graph) -> DataFrame:
    """Returns (vertex, match) for matched vertices (external ids); 1/2-
    approximation of maximum weight matching."""
    if G.is_directed():
        raise ValueError("input graph must be undirected")
    if not G.is_weighted():
        raise ValueError("input graph must be weighted")
    edges = iterloop.materialize(
        G.edgelist.select(SRC, DST, WEIGHT).filter(F.col(SRC) != F.col(DST))
    )
    matched = None

    with iterloop.small_plan(edges.sparkSession, G.number_of_vertices()):
      while True:
        if edges.count() == 0:
            break
        best = (
            edges.groupBy(SRC)
            .agg(F.max(F.struct(F.col(WEIGHT), F.col(DST))).alias("_b"))
            .select(F.col(SRC).alias("a"), F.col("_b.dst").alias("b"))
        )
        mutual = (
            best.alias("x")
            .join(
                best.alias("y"),
                (F.col("x.a") == F.col("y.b")) & (F.col("x.b") == F.col("y.a")),
            )
            .select(F.col("x.a").alias("a"), F.col("x.b").alias("b"))
            .filter(F.col("a") < F.col("b"))
        )
        mutual = iterloop.materialize(mutual)
        if mutual.count() == 0:
            break
        pairs = mutual.select(F.col("a").alias("vertex"), F.col("b").alias("match")).unionByName(
            mutual.select(F.col("b").alias("vertex"), F.col("a").alias("match"))
        )
        matched = pairs if matched is None else matched.unionByName(pairs)
        matched = iterloop.materialize(matched)
        gone = matched.select("vertex")
        edges = iterloop.materialize(
            edges.join(gone.withColumnRenamed("vertex", SRC), SRC, "left_anti")
            .join(gone.withColumnRenamed("vertex", DST), DST, "left_anti")
        )

    if matched is None:
        matched = G.edgelist.sparkSession.createDataFrame([], "vertex long, match long")
    out = G.unrenumber(matched, "vertex")
    return G.unrenumber(out, "match")
