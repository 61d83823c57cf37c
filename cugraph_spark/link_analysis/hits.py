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

    combined = None
    hmax = amax = 1.0
    # Swap + both normalizers fused into one job (FusedSwap); the
    # optional tol delta stays a second cheap agg over the leaf because
    # it needs hmax as a literal.
    fs = iterloop.FusedSwap()
    with iterloop.small_plan(e.sparkSession, n):
        for _ in range(max_iter):
            auth_raw = (
                e.join(
                    iterloop.hint_state_join(
                        state.select(F.col("vertex").alias(SRC), "_h"), n
                    ),
                    SRC,
                )
                .groupBy(F.col(DST).alias("vertex"))
                .agg(F.sum("_h").alias("_ar"))
            )
            auth_full = verts.join(iterloop.hint_state_join(auth_raw, n), "vertex", "left").select(
                "vertex", F.coalesce("_ar", F.lit(0.0)).alias("_ar")
            )
            hub_raw = (
                e.join(
                    iterloop.hint_state_join(
                        auth_full.select(F.col("vertex").alias(DST), "_ar"), n
                    ),
                    DST,
                )
                .groupBy(F.col(SRC).alias("vertex"))
                .agg(F.sum("_ar").alias("_hraw"))
            )
            # One vertex-keyed frame carries prev hub, raw hub and raw auth,
            # so a single agg yields both normalizers (the auth_full subtree
            # appears twice but its shuffle is deduped by exchange reuse).
            combined, (hmax, amax) = fs.swap(
                state.join(iterloop.hint_state_join(hub_raw, n), "vertex", "left")
                .join(iterloop.hint_state_join(auth_full, n), "vertex")
                .select(
                    "vertex",
                    F.col("_h").alias("_old"),
                    F.coalesce("_hraw", F.lit(0.0)).alias("_hraw"),
                    "_ar",
                ),
                [F.max("_hraw"), F.max("_ar")],
            )
            hmax = hmax or 1.0
            amax = amax or 1.0
            state = combined.select(
                "vertex", (F.col("_hraw") / F.lit(hmax)).alias("_h")
            )
            if tol > 0.0:
                (delta,) = iterloop.collect_scalars(
                    combined,
                    [F.sum(F.abs(F.col("_hraw") / F.lit(hmax) - F.col("_old")))],
                )
                if delta < n * tol:
                    break

    if combined is None:  # max_iter == 0: hubs = init, authorities = 0
        out = state.select(
            "vertex", F.col("_h").alias("hubs"), F.lit(0.0).alias("authorities")
        )
    else:
        out = combined.select(
            "vertex",
            (F.col("_hraw") / F.lit(hmax)).alias("hubs"),
            (F.col("_ar") / F.lit(amax)).alias("authorities"),
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
