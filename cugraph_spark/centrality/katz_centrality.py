"""Katz centrality.

Reference: centrality/katz_centrality.py:10 (API; alpha default =
1/(max_degree)) and cpp/src/centrality/katz_centrality_impl.cuh:100-175:
pull-mode ``c'(v) = Σ_in α·c(u)·w + β``, L1 convergence ``Σ|Δ| < tol``,
CUGRAPH_FAIL on non-convergence, optional final L2 normalization.

Spark: same IterLoop shape as pagerank — edges stay partitioned, the
centrality vector shuffles.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST, WEIGHT
from ..plans import iterloop
from ..structure.graph import Graph
from ..link_analysis.pagerank import FailedToConvergeError


def katz_centrality(
    G: Graph,
    alpha: Optional[float] = None,
    beta: float = 1.0,
    max_iter: int = 100,
    tol: float = 1e-6,
    nstart: Optional[DataFrame] = None,
    normalized: bool = True,
    fail_on_nonconvergence: bool = True,
) -> DataFrame:
    """Returns (vertex, katz_centrality)."""
    edges = G.edgelist
    w = F.col(WEIGHT) if G.is_weighted() else F.lit(1.0)
    e = iterloop.persist(edges.select(SRC, DST, w.alias("_w")))

    if alpha is None:
        dmax = (
            e.groupBy(SRC).agg(F.count("*").alias("d")).agg(F.max("d")).collect()[0][0]
        )
        alpha = 1.0 / dmax

    verts = G.vertices_internal
    n = G.number_of_vertices()
    if nstart is not None:
        ns = G.renumber_vertices(nstart, "vertex")
        state = verts.join(ns, "vertex", "left").select(
            "vertex", F.coalesce("values", F.lit(0.0)).alias("_c")
        )
    else:
        state = verts.select("vertex", F.lit(0.0).alias("_c"))
    state = iterloop.materialize(state)

    converged = False
    if tol <= 0:
        # Fixed-iteration path (tol=0 can never satisfy delta < tol): no
        # per-pass convergence scalar, no per-pass driver sync at all —
        # the update is a pure function of the messages (alpha*in + beta
        # over the STATIC vertex set), so the state chain has a single
        # consumer per pass and can stay lazy between interval
        # checkpoints, exactly like pagerank's fast path (one job per 4
        # passes instead of one per pass). Arithmetic is identical.
        with iterloop.small_plan(edges.sparkSession, n):
            for it in range(max_iter):
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
                state = verts.join(iterloop.hint_state_join(msgs, n), "vertex", "left").select(
                    "vertex",
                    (F.lit(alpha) * F.coalesce("_in", F.lit(0.0)) + F.lit(beta)).alias("_c"),
                )
                state = iterloop.truncate_lineage(state, it + 1, 4)
            state = iterloop.materialize(state)
    else:
      fs = iterloop.FusedSwap()  # swap + L1-delta fused into one job per pass
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
            new_state = (
                state.join(iterloop.hint_state_join(msgs, n), "vertex", "left")
                .select(
                    "vertex",
                    F.col("_c").alias("_old"),
                    (F.lit(alpha) * F.coalesce("_in", F.lit(0.0)) + F.lit(beta)).alias("_c"),
                )
            )
            new_state, (delta,) = fs.swap(
                new_state, [F.sum(F.abs(F.col("_c") - F.col("_old")))]
            )
            state = new_state.select("vertex", "_c")
            if delta < tol:
                converged = True
                break

    e.unpersist()
    if not converged and fail_on_nonconvergence:
        raise FailedToConvergeError(f"katz did not converge in {max_iter} iterations")

    if normalized:
        (l2,) = iterloop.collect_scalars(state, [F.sqrt(F.sum(F.col("_c") * F.col("_c")))])
        state = state.select("vertex", (F.col("_c") / F.lit(l2)).alias("_c"))

    out = state.select("vertex", F.col("_c").alias("katz_centrality"))
    return G.unrenumber(out, "vertex")
