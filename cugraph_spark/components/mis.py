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
    # On symmetrized storage flip the message direction so the per-round
    # aggregations (neighbor-min priority, winner-neighbor distinct) key
    # on the cached edge table's src partitioning — same identity and
    # gate as the headline loops (iterloop.sym_aligned_agg).
    m_pri, m_agg = (
        (DST, SRC) if iterloop.sym_aligned_agg(G, n_v) else (SRC, DST)
    )
    # One fused job per round: winners/mis are lazy leaf-swaps (defer) and
    # the active-set swap's fused count agg is the round's single action.
    fs = iterloop.FusedSwap()
    (n_active,) = iterloop.collect_scalars(active, [F.count(F.lit(1))])
    with iterloop.small_plan(edges.sparkSession, n_v):
      while n_active > 0:
        pri = active.select("vertex", F.xxhash64("vertex", F.lit(seed)).alias("_p"))
        nbr_min = (
            edges.join(
                iterloop.hint_state_join(pri.select(F.col("vertex").alias(m_pri), "_p"), n_v),
                m_pri,
            )
            .join(
                iterloop.hint_state_join(active.withColumnRenamed("vertex", m_agg), n_v),
                m_agg,
                "left_semi",
            )
            .groupBy(F.col(m_agg).alias("vertex"))
            .agg(F.min("_p").alias("_np"))
        )
        winners = (
            pri.join(iterloop.hint_state_join(nbr_min, n_v), "vertex", "left")
            .filter(F.col("_np").isNull() | (F.col("_p") < F.col("_np")))
            .select("vertex")
        )
        winners = fs.defer(winners)
        mis = winners if mis is None else fs.defer(mis.unionByName(winners))
        # remove winners and their neighbors
        nbrs = (
            edges.join(
                iterloop.hint_state_join(winners.withColumnRenamed("vertex", m_pri), n_v),
                m_pri,
                "left_semi",
            )
            .select(F.col(m_agg).alias("vertex"))
            .distinct()
        )
        active, (n_active,) = fs.swap(
            active.join(iterloop.hint_state_join(winners, n_v), "vertex", "left_anti")
            .join(iterloop.hint_state_join(nbrs, n_v), "vertex", "left_anti"),
            [F.count(F.lit(1))],
        )
        seed += 1

    edges.unpersist()
    return G.unrenumber(mis, "vertex")
