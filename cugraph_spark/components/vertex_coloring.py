"""Greedy vertex coloring via MIS rounds.

Reference: C++ only — cpp/src/components/vertex_coloring_impl.cuh
(SURVEY §2.A: "IterLoop over MIS rounds"): color k = a maximal
independent set of the still-uncolored subgraph.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST
from ..plans import iterloop
from ..structure.graph import Graph
from ..structure.symmetrize import add_reverse_edges


def vertex_coloring(G: Graph, seed: int = 42, max_colors: int = 1 << 20) -> DataFrame:
    """Returns (vertex, color) — adjacent vertices get different colors."""
    base_edges = G.edgelist.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    if G.is_directed():
        base_edges = add_reverse_edges(base_edges).distinct()
    edges = iterloop.materialize(base_edges)
    active = iterloop.materialize(G.vertices_internal.select("vertex"))
    out = None
    color = 0

    while active.count() > 0 and color < max_colors:
        # one Luby round-set = one color class (a MIS of the active subgraph)
        mis = _mis_internal(edges, active, seed + color * 7919)
        layer = mis.select("vertex", F.lit(color).cast("int").alias("color"))
        out = layer if out is None else out.unionByName(layer)
        out = iterloop.materialize(out)
        active = iterloop.materialize(active.join(mis, "vertex", "left_anti"))
        edges = iterloop.materialize(
            edges.join(active.withColumnRenamed("vertex", SRC), SRC, "left_semi")
            .join(active.withColumnRenamed("vertex", DST), DST, "left_semi")
        )
        color += 1

    return G.unrenumber(out, "vertex")


def _mis_internal(edges: DataFrame, active: DataFrame, seed: int) -> DataFrame:
    mis = None
    act = active
    while act.count() > 0:
        pri = act.select("vertex", F.xxhash64("vertex", F.lit(seed)).alias("_p"))
        nbr_min = (
            edges.join(pri.select(F.col("vertex").alias(SRC), "_p"), SRC)
            .join(act.withColumnRenamed("vertex", DST), DST, "left_semi")
            .groupBy(F.col(DST).alias("vertex"))
            .agg(F.min("_p").alias("_np"))
        )
        winners = iterloop.materialize(
            pri.join(nbr_min, "vertex", "left")
            .filter(F.col("_np").isNull() | (F.col("_p") < F.col("_np")))
            .select("vertex")
        )
        mis = winners if mis is None else iterloop.materialize(mis.unionByName(winners))
        nbrs = (
            edges.join(winners.withColumnRenamed("vertex", SRC), SRC, "left_semi")
            .select(F.col(DST).alias("vertex"))
            .distinct()
        )
        act = iterloop.materialize(
            act.join(winners, "vertex", "left_anti").join(nbrs, "vertex", "left_anti")
        )
        seed += 1
    return mis
