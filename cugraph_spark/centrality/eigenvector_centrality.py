"""Eigenvector centrality.

Reference: centrality/eigenvector_centrality.py:13 and
cpp/src/centrality/eigenvector_centrality_impl.cuh:60-140: power
iteration on (A + I) — ``new(v) = Σ_in old(u)·w  then new += old`` (the
+I shift damps bipartite oscillation), L2-normalize every round,
L1 convergence ``Σ|Δ| < n·tol``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST, WEIGHT
from ..plans import iterloop
from ..structure.graph import Graph
from ..link_analysis.pagerank import FailedToConvergeError


def eigenvector_centrality(
    G: Graph,
    max_iter: int = 100,
    tol: float = 1e-6,
    nstart: Optional[DataFrame] = None,
    fail_on_nonconvergence: bool = True,
) -> DataFrame:
    """Returns (vertex, eigenvector_centrality) (L2-normalized)."""
    edges = G.edgelist
    w = F.col(WEIGHT) if G.is_weighted() else F.lit(1.0)
    e = iterloop.persist(edges.select(SRC, DST, w.alias("_w")))
    verts = G.vertices_internal
    n = G.number_of_vertices()

    if nstart is not None:
        ns = G.renumber_vertices(nstart, "vertex")
        state = verts.join(ns, "vertex", "left").select(
            "vertex", F.coalesce("values", F.lit(1.0 / n)).alias("_c")
        )
    else:
        state = verts.select("vertex", F.lit(1.0 / n).alias("_c"))
    state = iterloop.materialize(state)

    converged = False
    # Two fused jobs per pass instead of four: the pre-normalization state
    # is swapped with its L2 norm in ONE job (FusedSwap); the normalized
    # state is then a pure projection over that leaf (no second
    # checkpoint needed — the leaf already bounds the plan), and the L1
    # delta is one cheap agg over the materialized blocks with the norm
    # inlined as a literal.
    fs = iterloop.FusedSwap()
    with iterloop.small_plan(edges.sparkSession, n):
        for _ in range(max_iter):
            msgs = (
                e.join(
                    iterloop.hint_state_join(
                        state.select(F.col("vertex").alias(SRC), "_c"), n
                    ),
                    SRC,
                )
                .groupBy(F.col(DST).alias("vertex"))
                .agg(F.sum(F.col("_c") * F.col("_w")).alias("_in"))
            )
            pre = state.join(iterloop.hint_state_join(msgs, n), "vertex", "left").select(
                "vertex",
                F.col("_c").alias("_old"),
                (F.coalesce("_in", F.lit(0.0)) + F.col("_c")).alias("_raw"),
            )
            pre, (l2,) = fs.swap(pre, [F.sqrt(F.sum(F.col("_raw") * F.col("_raw")))])
            state = pre.select("vertex", (F.col("_raw") / F.lit(l2)).alias("_c"))
            if tol > 0:
                # tol=0 can never satisfy delta < n*tol — skip the dead
                # convergence job on fixed-iteration runs
                (delta,) = iterloop.collect_scalars(
                    pre, [F.sum(F.abs(F.col("_raw") / F.lit(l2) - F.col("_old")))]
                )
                if delta < n * tol:
                    converged = True
                    break

    e.unpersist()
    if not converged and fail_on_nonconvergence:
        raise FailedToConvergeError(
            f"eigenvector centrality did not converge in {max_iter} iterations"
        )
    out = state.select("vertex", F.col("_c").alias("eigenvector_centrality"))
    return G.unrenumber(out, "vertex")
