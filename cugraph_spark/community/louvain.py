"""Louvain community detection.

Reference: community/louvain.py:17 (API: ``louvain(G, max_level, max_iter,
resolution, threshold)`` → ((vertex, partition), modularity_score),
undirected only) and cpp/src/community/louvain_impl.cuh: outer dendrogram
levels (:74), inner delta-modularity passes (:191), ``compute_modularity``
(:175), contraction via ``graph_contraction`` (:267).

Spark mapping (SURVEY §2.D): synchronous parallel local-move variant —
the sequential visit order of classic Louvain has no BSP equivalent, so
each inner pass computes every vertex's best neighbor community from the
*previous* pass's assignment and applies all improving moves at once.
Two standard distributed-Louvain safeguards (both public knowledge from
the distributed-Louvain literature):

- oscillation damping: on odd passes only vertices moving to a *smaller*
  community id may move, on even passes only to a larger one — a 2-vertex
  swap cycle cannot persist;
- moves require strictly positive modularity gain.

Validation is by modularity score, not exact labels (the reference's own
tests do the same: tests/community/test_louvain.py:39-40 asserts
``modularity > 0``; label sets differ run-to-run even on GPU).

Scale: every pass is join + groupBy (struct-max argmax, map-side
partial aggregation) on the edge list;
contraction shrinks the graph geometrically between levels.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST, WEIGHT
from ..plans import iterloop
from ..structure.graph import Graph


def modularity_of(edges: DataFrame, assign: DataFrame, resolution: float = 1.0) -> float:
    """Q over a symmetrized weighted edge list and (vertex, community).

    Q = Σ_C [ Σ_in(C)/2m − γ·(σ_C/2m)² ] with Σ_in counting both
    directions of each intra-community edge (edges are symmetrized).
    """
    e = edges.join(assign.select(F.col("vertex").alias(SRC), F.col("community").alias("_cs")), SRC)
    e = e.join(assign.select(F.col("vertex").alias(DST), F.col("community").alias("_cd")), DST)
    two_m = e.agg(F.sum("_w")).collect()[0][0]
    if not two_m:
        return 0.0
    internal = (
        e.filter(F.col("_cs") == F.col("_cd"))
        .groupBy("_cs")
        .agg(F.sum("_w").alias("_in"))
    )
    sigma = (
        e.groupBy(F.col(SRC).alias("_v"), F.col("_cs").alias("_c"))
        .agg(F.sum("_w").alias("_k"))
        .groupBy("_c")
        .agg(F.sum("_k").alias("_sig"))
    )
    row = (
        sigma.join(internal, sigma["_c"] == internal["_cs"], "left")
        .select(
            (
                F.coalesce("_in", F.lit(0.0)) / two_m
                - F.lit(resolution) * F.pow(F.col("_sig") / two_m, 2)
            ).alias("_q")
        )
        .agg(F.sum("_q"))
        .collect()[0][0]
    )
    return float(row or 0.0)


def _one_level(edges: DataFrame, resolution: float, max_iter: int, threshold: float):
    """Local-move passes on one graph level.

    edges: symmetrized (src, dst, _w). Returns (assign DF (vertex,
    community), modularity). Communities are labeled by min member vertex.
    """
    spark = edges.sparkSession
    deg = edges.groupBy(F.col(SRC).alias("vertex")).agg(F.sum("_w").alias("_k"))
    deg = iterloop.persist(deg)
    # deg sums == edge-weight sum on a symmetrized list: one job for both
    n_verts_hint, two_m = iterloop.collect_scalars(
        deg, [F.count("*"), F.sum("_k")]
    )

    assign = deg.select("vertex", F.col("vertex").alias("community"))
    assign = iterloop.materialize(assign)

    for it in range(max_iter):
        a_dst = assign.select(F.col("vertex").alias(DST), F.col("community").alias("_cj"))
        hint = lambda df: iterloop.hint_state_join(df, n_verts_hint)
        sigma = (
            assign.join(hint(deg), "vertex")
            .groupBy(F.col("community").alias("_cj"))
            .agg(F.sum("_k").alias("_sig"))
        )
        # w_iC: weight from vertex i to each neighbor community C
        wic = (
            edges.filter(F.col(SRC) != F.col(DST))
            .join(iterloop.hint_state_join(a_dst, n_verts_hint), DST)
            .groupBy(F.col(SRC).alias("vertex"), "_cj")
            .agg(F.sum("_w").alias("_wic"))
        )
        cand = (
            wic.join(hint(assign), "vertex")
            .join(hint(deg), "vertex")
            .join(hint(sigma), "_cj")
            .select(
                "vertex",
                "community",
                "_cj",
                (
                    F.col("_wic")
                    - F.lit(resolution)
                    * F.col("_k")
                    * (F.col("_sig") - F.when(F.col("_cj") == F.col("community"), F.col("_k")).otherwise(0.0))
                    / F.lit(two_m)
                ).alias("_gain"),
            )
        )
        # argmax(gain, tie: smallest community) + current-community gain in
        # ONE partial-aggregated groupBy — replaces the window sort (full
        # shuffle + per-partition sort) and the separate `cur` self-join
        best = (
            cand.groupBy("vertex", "community")
            .agg(
                F.max(
                    F.struct(F.col("_gain"), (-F.col("_cj")).alias("_ncj"))
                ).alias("_bp"),
                F.max(
                    F.when(F.col("_cj") == F.col("community"), F.col("_gain"))
                ).alias("_curgain"),
            )
            .select(
                "vertex", "community",
                (-F.col("_bp._ncj")).alias("_best"),
                F.col("_bp._gain").alias("_gain"),
                "_curgain",
            )
        )
        moves = best.filter(
            (F.col("_best") != F.col("community"))
            & (F.col("_gain") > F.coalesce("_curgain", F.lit(0.0)) + 1e-12)
        )
        # oscillation damping: alternate move direction by pass parity
        if it % 2 == 0:
            moves = moves.filter(F.col("_best") < F.col("community"))
        else:
            moves = moves.filter(F.col("_best") > F.col("community"))
        moves = iterloop.materialize(
            moves.select(
                "vertex",
                F.col("_best").alias("community"),
                (F.col("_gain") - F.coalesce("_curgain", F.lit(0.0))).alias("_dq"),
            )
        )
        # gain-based stop (cheap agg on the small moves DF) replaces the
        # 2-extra-jobs-per-pass full modularity recomputation; ΔQ of the
        # applied moves upper-bounds the modularity improvement scale
        n_moves, gain_sum = iterloop.collect_scalars(
            moves, [F.count("*"), F.coalesce(F.sum("_dq"), F.lit(0.0))]
        )
        if not n_moves or (gain_sum or 0.0) / two_m < threshold:
            break
        new_assign = (
            assign.join(
                hint(moves.select("vertex", F.col("community").alias("_new"))),
                "vertex",
                "left",
            )
            .select("vertex", F.coalesce("_new", F.col("community")).alias("community"))
        )
        assign = iterloop.materialize(new_assign)

    # canonical community ids: min member vertex
    canon = assign.groupBy("community").agg(F.min("vertex").alias("_canon"))
    assign = assign.join(
        iterloop.hint_state_join(canon, n_verts_hint), "community"
    ).select("vertex", F.col("_canon").alias("community"))
    assign = iterloop.materialize(assign)
    q_final = modularity_of(edges, assign, resolution)  # once per level
    deg.unpersist()
    return assign, q_final


def louvain(
    G: Graph,
    max_level: Optional[int] = None,
    max_iter: Optional[int] = None,
    resolution: float = 1.0,
    threshold: float = 1e-7,
) -> tuple[DataFrame, float]:
    """Returns ((vertex, partition) DataFrame, modularity_score)."""
    if G.is_directed():
        raise ValueError("input graph must be undirected")
    max_level = max_level if max_level is not None else 10
    max_iter = max_iter if max_iter is not None else 20

    w = F.col(WEIGHT) if G.is_weighted() else F.lit(1.0)
    edges = G.edgelist.select(SRC, DST, w.alias("_w"))
    edges = iterloop.materialize(edges)

    # overall mapping: original vertex -> current-level vertex
    mapping = G.vertices_internal.select("vertex", F.col("vertex").alias("community"))
    q_final = 0.0

    # every table in the level loop is vertex- or community-sized (the
    # coarsened edge list shrinks level over level), so the small-state
    # loop regime (AQE off, few shuffle partitions, broadcast hints)
    # applies to the whole dendrogram walk
    with iterloop.small_plan(
        G.edgelist.sparkSession,
        G.number_of_vertices(),
        shuffled_rows=G.number_of_edges(directed_edges=True),
    ):
        for level in range(max_level):
            assign, q = _one_level(edges, resolution, max_iter, threshold)
            mapping = iterloop.materialize(
                mapping.join(
                    assign.select(F.col("vertex").alias("community"), F.col("community").alias("_next")),
                    "community",
                ).select("vertex", F.col("_next").alias("community"))
            )
            n_comms, n_verts = iterloop.collect_scalars(
                assign, [F.countDistinct("community"), F.count("*")]
            )
            q_final = q
            if n_comms == n_verts or level == max_level - 1:
                break
            # coarsen: contract communities (cpp graph_contraction :267)
            edges = iterloop.materialize(
                edges.join(assign.select(F.col("vertex").alias(SRC), F.col("community").alias("_cs")), SRC)
                .join(assign.select(F.col("vertex").alias(DST), F.col("community").alias("_cd")), DST)
                .groupBy(F.col("_cs").alias(SRC), F.col("_cd").alias(DST))
                .agg(F.sum("_w").alias("_w"))
            )

    out = mapping.select("vertex", F.col("community").alias("partition"))
    return G.unrenumber(out, "vertex"), q_final
