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

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST
from ..plans import iterloop
from ..structure.graph import Graph
from ..structure.symmetrize import add_reverse_edges


def core_number(G: Graph, degree_type: str = "bidirectional") -> DataFrame:
    """Returns (vertex, core_number). Multigraphs are rejected
    (reference: core_number.py input checks); self-loops ignored."""
    if G.is_multigraph():
        raise ValueError("input graph must not be a multigraph")
    if degree_type not in ("incoming", "outgoing", "bidirectional"):
        raise ValueError(f"invalid degree_type {degree_type!r}")

    e = G.edgelist.select(SRC, DST).filter(F.col(SRC) != F.col(DST))
    if G.is_directed():
        if degree_type == "bidirectional":
            e = add_reverse_edges(e).distinct()
        elif degree_type == "incoming":
            e = e.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST))
    # undirected graphs are already symmetrized: neighbor lists = out edges

    deg = e.groupBy(F.col(SRC).alias("vertex")).agg(F.count("*").cast("int").alias("c"))
    state = iterloop.materialize(deg)

    # h-index of the multiset of neighbor values, computed JVM-side:
    # sort desc, count positions i (1-based) with value >= i
    h_expr = F.expr(
        "size(filter(transform(sort_array(collect_list(_nc), false),"
        " (x, i) -> x >= i + 1), b -> b))"
    ).cast("int")

    it = 0
    fs = iterloop.FusedSwap()  # swap + changed-count fused into one job
    with iterloop.small_plan(e.sparkSession, G.number_of_vertices()):
      while True:
        it += 1
        nbr = (
            e.join(
                iterloop.hint_state_join(
                    state.select(F.col("vertex").alias(DST), F.col("c").alias("_nc")),
                    G.number_of_vertices(),
                ),
                DST,
            )
            .groupBy(F.col(SRC).alias("vertex"))
            .agg(h_expr.alias("_h"))
        )
        new_state = (
            state.join(
                iterloop.hint_state_join(nbr, G.number_of_vertices()),
                "vertex",
                "left",
            )
            .select(
                "vertex",
                F.least(F.col("c"), F.coalesce("_h", F.lit(0))).alias("c"),
                F.col("c").alias("_old"),
            )
        )
        new_state, (changes,) = fs.swap(
            new_state, [F.sum((F.col("c") != F.col("_old")).cast("long"))]
        )
        state = new_state.select("vertex", "c")
        if not changes:
            break

    out = G.vertices_internal.join(state, "vertex", "left").select(
        "vertex", F.coalesce("c", F.lit(0)).cast("long").alias("core_number")
    )
    return G.unrenumber(out, "vertex")
