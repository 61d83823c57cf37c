"""PageRank (standard + personalized) on DataFrames.

Reference semantics: /root/reference/python/cugraph/cugraph/link_analysis/
pagerank.py:69 (API) and cpp/src/link_analysis/pagerank_impl.cuh (449 LoC):
power method, weighted edges (contribution = rank * w / out_weight_sum),
dangling mass redistributed through the reset vector (pagerank_impl.cuh:228),
L1 convergence check against ``tol`` (pagerank_impl.cuh:311).

Spark plan per iteration (the reference's pull-mode
``per_v_transform_reduce_incoming_e`` becomes a push-style join+agg —
identical result, and it reuses the edge table's build-time ``src``
partitioning so only the V-sized rank table shuffles):

    contribs = norm_edges ⋈ ranks ON src          -- edges stay in place
    sums     = contribs.groupBy(dst).sum(coef*rank) -- partial agg map-side
    ranks'   = (1-α)·p + α·(sums + dangling·p)      -- per-vertex expression

One scalar job per iteration collects BOTH the L1 delta and the next
dangling sum (single agg pass), then lineage is truncated via
localCheckpoint — constant plan size over 100 iterations.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST, WEIGHT
from ..plans import iterloop
from ..structure.graph import Graph


# The fast-path rank state feeds exactly ONE consumer per pass (the
# message join), so lineage can safely span several rounds between
# localCheckpoints — one job then executes the whole chain with no
# recompute. Measured at sf0.1 (1.17M edges, 30 iters, 3 reps): interval
# 4 median 5.6s vs 6.2s at 1 (and 8 regresses: too-deep codegen plans).
_FAST_PATH_CHECKPOINT_INTERVAL = 4


class FailedToConvergeError(RuntimeError):
    """Raised when fail_on_nonconvergence=True and max_iter is exhausted
    (reference: pagerank.py fail_on_nonconvergence semantics)."""


def pagerank(
    G: Graph,
    alpha: float = 0.85,
    personalization: Optional[DataFrame] = None,
    precomputed_vertex_out_weight: Optional[DataFrame] = None,
    max_iter: int = 100,
    tol: float = 1e-5,
    nstart: Optional[DataFrame] = None,
    weight: str = WEIGHT,
    dangling=None,
    fail_on_nonconvergence: bool = True,
) -> DataFrame:
    """Returns (vertex, pagerank) with external vertex ids. ``dangling``
    is NetworkX-compat and ignored, as in the reference
    (pagerank.py:147: "here for NetworkX compatibility and ignored").

    personalization: DataFrame (vertex, values); nstart: (vertex, values).
    With fail_on_nonconvergence=False also adds a constant ``converged``
    column? No — the reference returns (df, bool); we attach the flag as
    ``pagerank.converged`` attribute on the returned DataFrame's metadata
    via a companion return, keeping the DataFrame schema identical to the
    reference's (vertex, pagerank).
    """
    df, converged = _pagerank_impl(
        G, alpha, personalization, precomputed_vertex_out_weight, max_iter, tol, nstart, weight
    )
    if not converged and fail_on_nonconvergence:
        raise FailedToConvergeError(f"pagerank did not converge in {max_iter} iterations")
    return df


def pagerank_with_flag(G: Graph, **kwargs) -> tuple[DataFrame, bool]:
    """(df, converged) — the reference's fail_on_nonconvergence=False shape."""
    kwargs.setdefault("fail_on_nonconvergence", False)
    kwargs.pop("fail_on_nonconvergence")
    return _pagerank_impl(
        G,
        kwargs.pop("alpha", 0.85),
        kwargs.pop("personalization", None),
        kwargs.pop("precomputed_vertex_out_weight", None),
        kwargs.pop("max_iter", 100),
        kwargs.pop("tol", 1e-5),
        kwargs.pop("nstart", None),
        kwargs.pop("weight", WEIGHT),
    )


def _pagerank_impl(
    G: Graph,
    alpha: float,
    personalization: Optional[DataFrame],
    precomputed_vertex_out_weight: Optional[DataFrame],
    max_iter: int,
    tol: float,
    nstart: Optional[DataFrame],
    weight: str,
) -> tuple[DataFrame, bool]:
    edges = G.edgelist
    weighted = weight in edges.columns and G.is_weighted()
    w = F.col(weight) if weighted else F.lit(1.0)

    verts = G.vertices_internal  # (vertex)
    n = G.number_of_vertices()

    # out-weight sums (precomputed_vertex_out_weight: pagerank.py:69 kwarg)
    if precomputed_vertex_out_weight is not None:
        out_w = G.renumber_vertices(precomputed_vertex_out_weight, "vertex").select(
            F.col("vertex").alias(SRC), F.col("out_weight").alias("_ow")
        )
    else:
        out_w = edges.groupBy(SRC).agg(F.sum(w).alias("_ow"))

    # Message direction (iterloop.sym_aligned_agg): on a symmetrized edge
    # list in the broadcast-state regime, join the rank state on DST and
    # aggregate by SRC so the per-pass groupBy reuses the cached edge
    # partitioning and plans with NO Exchange (the row (s,d) then carries
    # the d->s contribution, so its coefficient is w/out_w(d)). Identical
    # addend multiset per vertex — (u,v) and (v,u) twins carry the same
    # weight — so the result is unchanged.
    if iterloop.sym_aligned_agg(G, n):
        msg_join, msg_group = DST, SRC
        norm_edges = (
            edges.join(
                iterloop.hint_state_join(
                    out_w.select(F.col(SRC).alias(DST), "_ow"), n
                ),
                DST,
            )
            .select(SRC, DST, (w / F.col("_ow")).alias("_coef"))
        )
    else:
        msg_join, msg_group = SRC, DST
        norm_edges = (
            edges.join(out_w, SRC)
            .select(SRC, DST, (w / F.col("_ow")).alias("_coef"))
        )
    norm_edges = iterloop.persist(norm_edges)

    # reset vector p
    if personalization is not None:
        pers = G.renumber_vertices(personalization, "vertex")
        total = pers.agg(F.sum("values")).collect()[0][0]
        p = verts.join(pers, "vertex", "left").select(
            "vertex", (F.coalesce(F.col("values"), F.lit(0.0)) / F.lit(total)).alias("_p")
        )
    else:
        p = verts.select("vertex", F.lit(1.0 / n).alias("_p"))

    # dangling flag: vertices with no outgoing edges
    dangling = verts.join(out_w.select(F.col(SRC).alias("vertex")), "vertex", "left_anti")
    state = p.join(dangling.select("vertex", F.lit(True).alias("_dang")), "vertex", "left")
    state = state.select("vertex", "_p", F.coalesce("_dang", F.lit(False)).alias("_dang"))

    # initial ranks (nstart normalized to sum 1, as the reference does)
    if nstart is not None:
        ns = G.renumber_vertices(nstart, "vertex")
        total = ns.agg(F.sum("values")).collect()[0][0]
        state = state.join(ns, "vertex", "left").select(
            "vertex", "_p", "_dang",
            (F.coalesce(F.col("values"), F.lit(0.0)) / F.lit(total)).alias("_rank"),
        )
    else:
        state = state.withColumn("_rank", F.lit(1.0 / n))

    # has_dangling decided once: symmetrized undirected graphs never have
    # dangling vertices, and without them (and with tol=0, i.e. a fixed
    # iteration count) the loop needs NO per-iteration driver sync — just
    # the per-pass checkpoint, with no convergence-scalar job. The init
    # checkpoint and the dangling-count scalar fuse into one job.
    state, (n_dangling, dangling_sum) = iterloop.FusedSwap().swap(
        state,
        [
            F.sum(F.col("_dang").cast("long")),
            F.sum(F.when(F.col("_dang"), F.col("_rank")).otherwise(0.0)),
        ],
    )
    has_dangling = bool(n_dangling)
    if not has_dangling:
        dangling_sum = 0.0

    need_sync_every_iter = has_dangling or tol > 0
    converged = False
    spark = edges.sparkSession
    if need_sync_every_iter:
        # Swap + (delta, dangling) scalars fused into ONE job per pass
        # (iterloop.FusedSwap): lazy checkpoint, the convergence agg
        # materializes the blocks; both next-pass consumers (message join
        # + rank update) then read them. Reliable mode stays eager.
        fs = iterloop.FusedSwap()
        with iterloop.small_plan(spark, n):
            for it in range(max_iter):
                msgs = (
                    norm_edges.join(
                        iterloop.hint_state_join(
                            state.select(F.col("vertex").alias(msg_join), "_rank"), n
                        ),
                        msg_join,
                    )
                    .groupBy(F.col(msg_group).alias("vertex"))
                    .agg(F.sum(F.col("_coef") * F.col("_rank")).alias("_in"))
                )
                new_state = (
                    # msgs is V-bounded: broadcast it so the state leaf
                    # is not re-shuffled for a sort-merge join each pass
                    state.join(iterloop.hint_state_join(msgs, n), "vertex", "left")
                    .select(
                        "vertex", "_p", "_dang", F.col("_rank").alias("_prev"),
                        (
                            (1.0 - alpha) * F.col("_p")
                            + alpha * (F.coalesce(F.col("_in"), F.lit(0.0)) + F.lit(dangling_sum or 0.0) * F.col("_p"))
                        ).alias("_rank"),
                    )
                )
                # the state feeds two places per pass (message join + rank
                # update), so it must become a leaf every pass or the lazy
                # chain re-executes prior passes once per downstream use
                new_state, (delta, dangling_sum) = fs.swap(
                    new_state,
                    [
                        F.sum(F.abs(F.col("_rank") - F.col("_prev"))),
                        F.sum(F.when(F.col("_dang"), F.col("_rank")).otherwise(0.0)),
                    ],
                )
                if tol > 0 and delta is not None and delta < tol:
                    state = new_state.select("vertex", "_p", "_dang", "_rank")
                    converged = True
                    break
                state = new_state.select("vertex", "_p", "_dang", "_rank")
        out = state.select("vertex", F.col("_rank").alias("pagerank"))
    else:
        # Fixed-iteration, no-dangling path (tol=0): split the static
        # per-vertex columns (_p) into a persisted base table so the loop
        # state is just (vertex, _rank) and is consumed exactly ONCE per
        # pass (inside the message join).
        #
        # Leanest variant: when the reset vector is uniform AND every
        # vertex has an incoming edge (always true for symmetrized
        # undirected graphs in this path — no dangling ⇒ every vertex has
        # out-edges ⇒ symmetry gives it in-edges), the per-pass static
        # join disappears entirely: the groupBy over messages already
        # emits every vertex, so rank' = (1-α)/n + α·Σ folds into the
        # aggregate (15-iter at sf0.1: 4.2s -> 2.8s with the edge-side
        # partition floor).
        uniform_p = personalization is None
        if uniform_p:
            # Symmetrized storage guarantees in-edges wherever there are
            # out-edges; an undirected graph built with symmetrize=False
            # does NOT carry that guarantee, so gate on the recorded
            # symmetrized flag, not on ``directed``, and otherwise run the
            # one-time O(E) left-anti probe.
            if getattr(G.properties, "symmetrized", False):
                all_have_in = True
            else:
                no_in = verts.join(
                    edges.select(F.col(DST).alias("vertex")).distinct(), "vertex", "left_anti"
                )
                all_have_in = no_in.limit(1).count() == 0
        else:
            all_have_in = False
        ranks = state.select("vertex", "_rank")
        if uniform_p and all_have_in:
            with iterloop.small_plan(spark, n):
                for it in range(max_iter):
                    ranks = (
                        norm_edges.join(
                            iterloop.hint_state_join(
                                ranks.select(F.col("vertex").alias(msg_join), "_rank"), n
                            ),
                            msg_join,
                        )
                        .groupBy(F.col(msg_group).alias("vertex"))
                        .agg(
                            (
                                F.lit((1.0 - alpha) / n)
                                + alpha * F.sum(F.col("_coef") * F.col("_rank"))
                            ).alias("_rank")
                        )
                    )
                    ranks = iterloop.truncate_lineage(ranks, it + 1, _FAST_PATH_CHECKPOINT_INTERVAL)
                ranks = iterloop.materialize(ranks)
        else:
            base = iterloop.persist(state.select("vertex", "_p"))
            base.count()
            with iterloop.small_plan(spark, n):
                for it in range(max_iter):
                    msgs = (
                        norm_edges.join(
                            iterloop.hint_state_join(
                                ranks.select(F.col("vertex").alias(msg_join), "_rank"), n
                            ),
                            msg_join,
                        )
                        .groupBy(F.col(msg_group).alias("vertex"))
                        .agg(F.sum(F.col("_coef") * F.col("_rank")).alias("_in"))
                    )
                    ranks = base.join(
                        iterloop.hint_state_join(msgs, n), "vertex", "left"
                    ).select(
                        "vertex",
                        (
                            (1.0 - alpha) * F.col("_p")
                            + alpha * F.coalesce(F.col("_in"), F.lit(0.0))
                        ).alias("_rank"),
                    )
                    ranks = iterloop.truncate_lineage(ranks, it + 1, _FAST_PATH_CHECKPOINT_INTERVAL)
                ranks = iterloop.materialize(ranks)
            base.unpersist()
        out = ranks.select("vertex", F.col("_rank").alias("pagerank"))

    norm_edges.unpersist()
    return G.unrenumber(out, "vertex"), converged
