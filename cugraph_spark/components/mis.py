"""Maximal independent set (Luby's algorithm).

Reference: C++ only — cpp/src/components/mis_impl.cuh (SURVEY §2.A:
"IterLoop (Luby's): rand priority per vertex, keep local maxima, remove
neighbors"). Priorities are ``xxhash64(vertex, seed)`` — deterministic
given the seed, fully parallel.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST
from ..plans import iterloop
from ..structure.graph import Graph


def maximal_independent_set(G: Graph, seed: int = 42) -> DataFrame:
    """Returns a single-column (vertex) DataFrame — a maximal independent
    set (no two members adjacent; every non-member has a member neighbor)."""
    edges = G.edgelist.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    if G.is_directed():
        from ..structure.symmetrize import add_reverse_edges

        edges = add_reverse_edges(edges).distinct()
    edges = iterloop.persist(edges)
    active = iterloop.materialize(G.vertices_internal.select("vertex"))
    mis = None

    n_v = G.number_of_vertices()
    # One fused job per round: winners/mis are lazy leaf-swaps (defer) and
    # the active-set swap's fused count agg is the round's single action.
    fs = iterloop.FusedSwap()
    (n_active,) = iterloop.collect_scalars(active, [F.count(F.lit(1))])
    with iterloop.small_plan(edges.sparkSession, n_v):
      while n_active > 0:
        pri = active.select("vertex", F.xxhash64("vertex", F.lit(seed)).alias("_p"))
        nbr_min = (
            edges.join(
                iterloop.hint_state_join(pri.select(F.col("vertex").alias(SRC), "_p"), n_v),
                SRC,
            )
            .join(
                iterloop.hint_state_join(active.withColumnRenamed("vertex", DST), n_v),
                DST,
                "left_semi",
            )
            .groupBy(F.col(DST).alias("vertex"))
            .agg(F.min("_p").alias("_np"))
        )
        winners = (
            pri.join(nbr_min, "vertex", "left")
            .filter(F.col("_np").isNull() | (F.col("_p") < F.col("_np")))
            .select("vertex")
        )
        winners = fs.defer(winners)
        mis = winners if mis is None else fs.defer(mis.unionByName(winners))
        # remove winners and their neighbors
        nbrs = (
            edges.join(winners.withColumnRenamed("vertex", SRC), SRC, "left_semi")
            .select(F.col(DST).alias("vertex"))
            .distinct()
        )
        active, (n_active,) = fs.swap(
            active.join(winners, "vertex", "left_anti").join(nbrs, "vertex", "left_anti"),
            [F.count(F.lit(1))],
        )
        seed += 1

    edges.unpersist()
    return G.unrenumber(mis, "vertex")
