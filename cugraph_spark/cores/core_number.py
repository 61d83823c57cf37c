"""k-core decomposition numbers.

Reference: cores/core_number.py:10 (output ``(vertex, core_number)``,
``degree_type`` in {incoming, outgoing, bidirectional}) and
cpp/src/cores/core_number_impl.cuh (bucketed peeling).

Spark mapping: instead of sequential peeling (O(k_max) rounds of global
coordination), use the h-index fixpoint iteration (Lü, Zhou et al.,
"The H-index of a network node and its relation to degree and coreness",
Nature Comm. 2016 — public result): start with c(v) = degree(v) and
repeatedly set c(v) = H({c(u) : u ∈ N(v)}), the largest h such that at
least h neighbors have value ≥ h. The sequence is non-increasing and
converges to the core number in a handful of fully-parallel rounds —
a far better fit for BSP execution than peeling, and every round is one
join + groupBy with a JVM-side array expression (no Python UDF).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST
from ..plans import iterloop
from ..structure.graph import Graph
from ..structure.symmetrize import add_reverse_edges


# Probe surface for scale diagnostics (same pattern as
# connectivity._last_scc_stats): rounds + per-round changed-vertex counts
# of the most recent core_number call in this process.
_last_stats: dict | None = None

# A frontier recompute (recompute h only for neighbors-of-changed once
# the changed set is small — exact, since c(v) can only change when a
# neighbor's c changed) was implemented and A/B'd at R-MAT scale-18
# (42 rounds, changed counts < 1k of 174k from round ~14): interleaved
# arms read full 37.4/44.2 s vs frontier 44.2/50.7 s with identical
# outputs. The loop is SCAN-bound, not agg-bound — the frontier's two
# extra per-round semi-join passes over E cost more than the shrunken
# collect_list saves — so the full-recompute round body below is the
# measured winner and the frontier was reverted (r6).
#
# r7 (verdict #4) attacks the scan itself with the PEELING invariant
# instead: at any point all values satisfy c(v) <= deg(v) and
# c(v) >= m := min over active c, so the whole remaining graph has
# minimum degree >= m — it IS an m-core — and every vertex sitting AT
# the minimum has core exactly m: FINAL. A final vertex never updates
# again (its recompute satisfies H >= core, so least(c, h) is a no-op),
# which licenses deleting the edge rows that FEED its aggregation (rows
# with src final; rows pointing AT it stay — neighbors still read its
# frozen value from the state). Deletions are batched AND
# row-mass-gated: the edge cache is re-filtered+re-persisted only when
# the finalized vertices' summed DEGREE since the last shrink is >=
# _SHRINK_FRACTION of the current cached rows (each vertex's degree is
# its initial c — free), so the shrink's own E-scan amortizes over many
# subsequent smaller round scans — exactly the cost the per-round
# frontier semi-joins could not amortize. On power-law R-MAT the gate
# simply never opens (finalized-early vertices are low-degree: four
# vertex-count-triggered shrinks at scale-18 removed only 11% of rows
# and cost 43 s vs 34.6 s base — the r7 A/B that motivated the degree
# weighting); on graphs whose peel mass is real (pendant-heavy web
# shapes, meshes) it removes most of the scan.
# SPARK_GRAFT_CORE_SHRINK=0 disables for A/B.
_SHRINK_FRACTION = 0.3


def core_number(G: Graph, degree_type: str = "bidirectional") -> DataFrame:
    """Returns (vertex, core_number). Multigraphs are rejected
    (reference: core_number.py input checks); self-loops ignored."""
    if G.is_multigraph():
        raise ValueError("input graph must not be a multigraph")
    if degree_type not in ("incoming", "outgoing", "bidirectional"):
        raise ValueError(f"invalid degree_type {degree_type!r}")

    e = G.edgelist.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    e_private = None  # our own (shrunken) persisted cache — never the graph's
    if G.is_directed():
        if degree_type == "bidirectional":
            # persist: the union+distinct would otherwise re-shuffle E on
            # EVERY round's scan (the undirected path reads the graph
            # cache through a narrow filter and needs nothing here)
            e = e_private = iterloop.persist(add_reverse_edges(e).distinct())
        elif degree_type == "incoming":
            e = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    # undirected graphs are already symmetrized: neighbor lists = out edges

    deg = e.groupBy(F.col(SRC).alias("vertex")).agg(
        F.count("*").cast("int").alias("c")
    )
    # _d: the vertex's (constant) degree = its row count in e, carried so
    # the shrink gate can weigh finalized vertices by the rows they feed
    state = iterloop.materialize(
        deg.select("vertex", "c", F.col("c").alias("_d"), F.lit(False).alias("_fin"))
    )

    # h-index of the multiset of neighbor values, computed JVM-side:
    # sort desc, count positions i (1-based) with value >= i
    h_expr = F.expr(
        "size(filter(transform(sort_array(collect_list(_nc), false),"
        " (x, i) -> x >= i + 1), b -> b))"
    ).cast("int")

    it = 0
    changed_curve: list[int] = []
    shrink_log: list[tuple[int, int]] = []
    n_v = G.number_of_vertices()
    shrink_on = os.environ.get("SPARK_GRAFT_CORE_SHRINK", "1") != "0"
    m_prev = None  # min over active c after the previous round
    fin_deg_last_shrink = 0
    rows_cur = None  # rows in the current edge cache (set after round 1)
    fs = iterloop.FusedSwap()  # swap + changed-count fused into one job
    with iterloop.small_plan(e.sparkSession, n_v):
      while True:
        it += 1
        if shrink_on and m_prev is not None:
            # peel invariant (module note): active vertices at the
            # previous round's minimum are FINAL — fold the flag in as a
            # projection over the checkpointed state (no extra job)
            state = state.select(
                "vertex", "c", "_d",
                (F.col("_fin") | (F.col("c") == F.lit(int(m_prev)))).alias("_fin"),
            )
        nbr = (
            e.join(
                iterloop.hint_state_join(
                    state.select(F.col("vertex").alias(DST), F.col("c").alias("_nc")),
                    n_v,
                ),
                DST,
            )
            .groupBy(F.col(SRC).alias("vertex"))
            .agg(h_expr.alias("_h"))
        )
        new_state = (
            state.join(
                iterloop.hint_state_join(nbr, n_v),
                "vertex",
                "left",
            )
            .select(
                "vertex",
                # coalesce to the CURRENT value: after a shrink, final
                # vertices have no feeding rows and must keep their core
                # (identical pre-shrink: every state vertex then has rows)
                F.least(F.col("c"), F.coalesce("_h", F.col("c"))).alias("c"),
                F.col("c").alias("_old"),
                "_d",
                "_fin",
            )
        )
        new_state, (changes, m_act, fin_deg, rows_all) = fs.swap(
            new_state,
            [
                F.sum((F.col("c") != F.col("_old")).cast("long")),
                F.min(F.when(~F.col("_fin"), F.col("c"))),
                F.sum(F.when(F.col("_fin"), F.col("_d")).otherwise(0).cast("long")),
                F.sum(F.col("_d").cast("long")),
            ],
        )
        state = new_state.select("vertex", "c", "_d", "_fin")
        changed_curve.append(int(changes or 0))
        if not changes:
            break
        m_prev = m_act
        fin_deg = int(fin_deg or 0)
        if rows_cur is None:
            rows_cur = int(rows_all or 0)
        if (
            shrink_on
            and (fin_deg - fin_deg_last_shrink)
            >= _SHRINK_FRACTION * max(1, rows_cur)
        ):
            # drop the rows that feed finalized vertices' aggregations;
            # a broadcast semi-join preserves the cached src partitioning
            active = state.filter(~F.col("_fin")).select(F.col("vertex").alias(SRC))
            new_e = iterloop.persist(
                e.join(iterloop.hint_state_join(active, n_v), SRC, "semi")
            )
            rows = new_e.count()
            if e_private is not None:
                e_private.unpersist()
            e = e_private = new_e
            fin_deg_last_shrink = fin_deg
            rows_cur = rows
            shrink_log.append((it, rows))

    if e_private is not None:
        e_private.unpersist()
    global _last_stats
    _last_stats = {"rounds": it, "changed": changed_curve, "shrinks": shrink_log}

    out = G.vertices_internal.join(state, "vertex", "left").select(
        "vertex", F.coalesce("c", F.lit(0)).cast("long").alias("core_number")
    )
    return G.unrenumber(out, "vertex")
