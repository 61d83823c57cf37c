"""HITS (hubs & authorities).

Reference: link_analysis/hits.py:11 and cpp/src/link_analysis/
hits_impl.cuh:60-160: init hubs = 1/n; per round
``auth(v) = Σ_{u→v} hub(u)``, ``hub(v) = Σ_{v→w} auth(w)``, then both
vectors are MAX-normalized; converge when ``Σ|hub−prev| < n·tol``;
final sum-normalization when ``normalized=True``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST
from ..plans import iterloop
from ..structure.graph import Graph


def hits(
    G: Graph,
    max_iter: int = 100,
    tol: float = 1.0e-5,
    nstart: Optional[DataFrame] = None,
    normalized: bool = True,
) -> DataFrame:
    """Returns (vertex, hubs, authorities)."""
    e = iterloop.persist(G.edgelist.select(SRC, DST))
    verts = G.vertices_internal
    n = G.number_of_vertices()

    if nstart is not None:
        ns = G.renumber_vertices(nstart, "vertex")
        total = ns.agg(F.sum("values")).collect()[0][0]
        state = verts.join(ns, "vertex", "left").select(
            "vertex", (F.coalesce("values", F.lit(0.0)) / F.lit(total)).alias("_h")
        )
    else:
        state = verts.select("vertex", F.lit(1.0 / n).alias("_h"))
    state = iterloop.materialize(state)

    auth = None
    with iterloop.small_plan(e.sparkSession, n):
        for _ in range(max_iter):
            auth = (
                e.join(
                    iterloop.hint_state_join(
                        state.select(F.col("vertex").alias(SRC), "_h"), n
                    ),
                    SRC,
                )
                .groupBy(F.col(DST).alias("vertex"))
                .agg(F.sum("_h").alias("_a"))
            )
            auth = verts.join(auth, "vertex", "left").select(
                "vertex", F.coalesce("_a", F.lit(0.0)).alias("_a")
            )
            auth = iterloop.materialize(auth)
            hub = (
                e.join(
                    iterloop.hint_state_join(
                        auth.select(F.col("vertex").alias(DST), "_a"), n
                    ),
                    DST,
                )
                .groupBy(F.col(SRC).alias("vertex"))
                .agg(F.sum("_a").alias("_hraw"))
            )
            new_state = (
                state.join(hub, "vertex", "left")
                .select(
                    "vertex",
                    F.col("_h").alias("_old"),
                    F.coalesce("_hraw", F.lit(0.0)).alias("_hraw"),
                )
            )
            new_state = iterloop.materialize(new_state)
            hmax, amax = (
                new_state.agg(F.max("_hraw")).collect()[0][0],
                auth.agg(F.max("_a")).collect()[0][0],
            )
            hmax = hmax or 1.0
            amax = amax or 1.0
            new_state = iterloop.materialize(
                new_state.select(
                    "vertex", "_old", (F.col("_hraw") / F.lit(hmax)).alias("_h")
                )
            )
            auth = auth.select("vertex", (F.col("_a") / F.lit(amax)).alias("_a"))
            (delta,) = iterloop.collect_scalars(
                new_state, [F.sum(F.abs(F.col("_h") - F.col("_old")))]
            )
            state = new_state.select("vertex", "_h")
            if delta < n * tol:
                break

    out = state.join(iterloop.materialize(auth), "vertex").select(
        "vertex", F.col("_h").alias("hubs"), F.col("_a").alias("authorities")
    )
    if normalized:
        hsum, asum = iterloop.collect_scalars(out, [F.sum("hubs"), F.sum("authorities")])
        out = out.select(
            "vertex",
            (F.col("hubs") / F.lit(hsum or 1.0)).alias("hubs"),
            (F.col("authorities") / F.lit(asum or 1.0)).alias("authorities"),
        )
    e.unpersist()
    return G.unrenumber(out, "vertex")
