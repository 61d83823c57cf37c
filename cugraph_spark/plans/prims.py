"""Graph primitives as DataFrame combinators.

The reference's physical operators live in
/root/reference/cpp/include/cugraph/prims/ (per_v_transform_reduce_incoming_e,
transform_reduce_e, transform_reduce_v_frontier_outgoing_e_by_dst, ...).
Each is a fused gather-apply-scatter kernel; the Spark equivalent of every
one of them is a join + groupBy/agg that Catalyst fuses via whole-stage
codegen. This module implements them once so every algorithm shares the
same (tuned) plan shape.

Plan shape at scale: ``edges`` is pre-partitioned on ``src`` (Graph build);
``aggregate_messages`` in the 'out' direction therefore shuffles only the
vertex-state side into the edge partitioning, and the result comes back
grouped on the opposite endpoint — exactly one shuffle of V-sized data per
round, never the E-sized table.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, functions as F

from ..constants import SRC, DST


def aggregate_messages(
    edges: DataFrame,
    vertex_state: DataFrame,
    msg: Column,
    aggs: Sequence[Column],
    direction: str = "out",
    state_key: str = "vertex",
) -> DataFrame:
    """per_v_transform_reduce_{incoming,outgoing}_e on DataFrames.

    direction='out': join state onto edge *source*, aggregate per *dst*
    (push / scatter along edge direction). direction='in' is the reverse
    (pull). ``msg`` is an expression over edge columns + joined state
    columns; ``aggs`` aggregate the per-edge ``_msg`` per target vertex.

    Returns one row per target vertex that received >= 1 message, with
    column ``vertex`` plus the agg columns.
    """
    if direction == "out":
        join_col, group_col = SRC, DST
    elif direction == "in":
        join_col, group_col = DST, SRC
    else:
        raise ValueError("direction must be 'in' or 'out'")

    st = vertex_state.withColumnRenamed(state_key, join_col)
    joined = edges.join(st, join_col)
    return (
        joined.withColumn("_msg", msg)
        .groupBy(F.col(group_col).alias("vertex"))
        .agg(*aggs)
    )


def transform_reduce_e(edges: DataFrame, expr: Column, agg: Column):
    """Edge-wise transform + global reduce (prims/transform_reduce_e.cuh)."""
    return edges.select(expr.alias("_e")).agg(agg).collect()[0][0]


def frontier_expand(
    edges: DataFrame,
    frontier: DataFrame,
    visited: Optional[DataFrame] = None,
    frontier_key: str = "vertex",
    extra_cols: Sequence[str] = (),
) -> DataFrame:
    """transform_reduce_v_frontier_outgoing_e_by_dst: expand a frontier one
    hop and drop already-visited targets.

    Returns distinct (vertex, *extra_cols) rows for newly reached vertices.
    ``extra_cols`` are carried from the frontier (e.g. distance, source id
    for multi-source traversals).
    """
    fr = frontier.withColumnRenamed(frontier_key, SRC)
    nxt = edges.join(fr, SRC).select(F.col(DST).alias("vertex"), *extra_cols)
    if visited is not None:
        nxt = nxt.join(visited.select("vertex"), "vertex", "left_anti")
    return nxt
