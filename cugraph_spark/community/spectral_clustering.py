"""Spectral clustering (Lanczos) + clustering analysis entry points.

Reference: community/spectral_clustering.py:18,118 —
``spectralBalancedCutClustering`` / ``spectralModularityMaximizationClustering``
backed by legacy nvgraph Lanczos+kmeans (cpp legacy
community/legacy/spectral_clustering.cu). Matching algorithm here:
**distributed Lanczos with full reorthogonalization** on the symmetric
normalized Laplacian ``L_sym = I - D^{-1/2} A D^{-1/2}``. Each Lanczos
step is one SpMV (edge join + groupBy sum — the same shape as a pagerank
pass), one batched dot-product agg against ALL stored basis vectors
(full reorthogonalization, numerically textbook-stable for the small
step counts involved), and one norm agg; the m×m tridiagonal
eigenproblem is solved on the driver with numpy (m ≤ ~40 — driver-sized
at any graph scale) and the Ritz eigenvectors are rebuilt as literal
linear combinations of the stored basis columns. The Lanczos basis
lives as columns of ONE vertex-keyed DataFrame, so state stays a single
V-row table regardless of step count.

Followed by Lloyd k-means in DataFrame ops with broadcast centroid
literals. Deterministic given the seed; validated by Ritz-value parity
vs dense numpy eigendecomposition (tests) plus cut/modularity quality,
not exact labels (the reference's own tests use score thresholds,
tests/community/test_balanced_cut.py).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST, WEIGHT
from ..plans import iterloop
from ..structure.graph import Graph


def _lanczos_embedding(
    G: Graph,
    k: int,
    max_steps: int,
    tol: float,
    seed: int,
    which: str = "smallest",
) -> DataFrame:
    """(vertex, e0..e{k-1}): Ritz eigenvectors of L_sym = I - D^{-1/2} A
    D^{-1/2} for the ``which`` ("smallest"/"largest") end of the spectrum.

    Classical Lanczos with full reorthogonalization; the basis vectors
    are columns v1..vj of one vertex-keyed DataFrame. Per step: one SpMV
    job, one batched-dots job (alpha + all reorth coefficients in a
    single agg), one norm job. Early exit on invariant-subspace
    breakdown or when the target Ritz values move < tol between steps.
    """
    import numpy as np

    w = F.col(WEIGHT) if G.is_weighted() else F.lit(1.0)
    edges = G.edgelist.select(SRC, DST, w.alias("_w"))
    degw = edges.groupBy(SRC).agg(F.sum("_w").alias("_d"))
    # D^{-1/2} A D^{-1/2} coefficients (isolated vertices have no rows)
    norm = iterloop.persist(
        edges.join(degw.withColumnRenamed(SRC, SRC), SRC)
        .join(
            degw.select(F.col(SRC).alias(DST), F.col("_d").alias("_dd")), DST
        )
        .select(SRC, DST, (F.col("_w") / F.sqrt(F.col("_d") * F.col("_dd"))).alias("_c"))
    )
    n_v = G.number_of_vertices()
    m = min(max(n_v - 1, 1), max_steps)

    # v1: seeded pseudo-random, normalized
    raw = (
        F.pmod(F.xxhash64("vertex", F.lit(seed)), F.lit(1 << 20)) / float(1 << 20)
        - 0.5
    )
    fs = iterloop.FusedSwap()  # per-step swap + scalar agg fused (one job)
    state, (nrm0,) = fs.swap(
        G.vertices_internal.select("vertex", raw.alias("v1")),
        [F.sqrt(F.sum(F.col("v1") ** 2))],
    )
    # pure projection over the checkpointed leaf — no second job needed
    state = state.select("vertex", (F.col("v1") / F.lit(nrm0 or 1.0)).alias("v1"))

    # Basis columns are stored UNNORMALIZED: ||u_j|| is measured inside
    # the NEXT step's reorth-dots aggregation (beta_{j-1} == ||u_j||
    # because each residual is pre-scaled by the previous measured norm),
    # folding the per-step norm job into the dots job — 2 jobs per step
    # plus the basis checkpoint instead of 3. Numerics are IDENTICAL to
    # explicit per-step normalization: every norm is measured, never
    # derived. (The analytic shortcut ||o||^2 = ||w||^2 - sum d^2 was
    # tried and drifts once basis orthogonality decays to ~1e-8 —
    # ghost-eigenvalue territory by step ~17.)
    alphas: list[float] = []
    betas: list[float] = []  # beta_j links v_j and v_{j+1}
    nsqs: list[float] = []  # nsqs[b-1] = ||u_b||^2, measured at step b
    prev_ritz = None
    n_basis = 1
    with iterloop.small_plan(edges.sparkSession, n_v):
        for j in range(1, m + 1):
            vj = f"v{j}"
            basis = [f"v{i}" for i in range(1, j + 1)]
            # SpMV: (L u)(x) = u(x) - sum_nbr c_xy u(y) — linear, so it
            # commutes with the deferred normalization
            av = (
                norm.join(
                    iterloop.hint_state_join(
                        state.select(F.col("vertex").alias(SRC), F.col(vj).alias("_x")),
                        n_v,
                    ),
                    SRC,
                )
                .groupBy(F.col(DST).alias("vertex"))
                .agg(F.sum(F.col("_c") * F.col("_x")).alias("_av"))
            )
            # swap + (reorth coefficients, ||u_j||^2) fused into ONE job
            # (FusedSwap): the agg materializes the checkpoint blocks
            work, res = fs.swap(
                state.join(av, "vertex", "left").withColumn(
                    "_w", F.col(vj) - F.coalesce("_av", F.lit(0.0))
                ),
                [F.sum(F.col("_w") * F.col(b)) for b in basis]
                + [F.sum(F.col(vj) ** 2)],
            )
            dots = [float(d) for d in res[:-1]]
            nsq_j = float(res[-1] or 0.0)
            if j >= 2:
                beta_prev = math.sqrt(nsq_j)  # == beta_{j-1}
                if beta_prev < 1e-10:
                    # invariant subspace: u_j is numerically zero — the
                    # usable basis ends at u_{j-1}
                    n_basis = j - 1
                    state = state.select(
                        "vertex", *[f"v{i}" for i in range(1, j)]
                    )
                    break
                betas.append(beta_prev)
            nsqs.append(nsq_j)
            alphas.append(dots[-1] / nsq_j)

            # driver-side tridiagonal Ritz values for the convergence test
            T = np.diag(alphas)
            for i, b in enumerate(betas):
                T[i, i + 1] = T[i + 1, i] = b
            evals = np.linalg.eigvalsh(T)
            ritz = np.sort(evals)[:k] if which == "smallest" else np.sort(evals)[-k:]
            done = (
                prev_ritz is not None
                and len(prev_ritz) == len(ritz)
                and float(np.max(np.abs(ritz - prev_ritz))) < tol
            )
            prev_ritz = ritz

            if j == m or done:
                state = work.select("vertex", *basis)
                n_basis = j
                break
            # residual, fully reorthogonalized (coefficients scaled by
            # the stored columns' measured norms) and pre-scaled by n_j
            # so ||u_{j+1}|| = beta_j — norms stay O(beta), no geometric
            # collapse across steps
            ortho = F.col("_w")
            for b, d, nb in zip(basis, dots, nsqs):
                ortho = ortho - F.lit(d / nb) * F.col(b)
            # work is already a checkpointed leaf: the next step's two
            # consumers re-derive this pure column projection for free,
            # so no extra checkpoint job is needed here
            state = work.select(
                "vertex",
                *basis,
                (ortho / F.lit(math.sqrt(nsq_j))).alias(f"v{j + 1}"),
            )
    norm.unpersist()

    # Ritz vectors: y_i = sum_j S[j, i] u_j / ||u_j||
    T = np.diag(alphas[:n_basis])
    for i, b in enumerate(betas[: n_basis - 1]):
        T[i, i + 1] = T[i + 1, i] = b
    evals, evecs = np.linalg.eigh(T)
    order = np.argsort(evals)
    idx = order[:k] if which == "smallest" else order[-k:][::-1]
    basis = [f"v{i}" for i in range(1, n_basis + 1)]
    out_cols = []
    for out_i, ti in enumerate(idx):
        expr = F.lit(0.0)
        for bj, b in enumerate(basis):
            expr = expr + F.lit(float(evecs[bj, ti]) / math.sqrt(nsqs[bj])) * F.col(b)
        out_cols.append(expr.alias(f"e{out_i}"))
    return iterloop.materialize(state.select("vertex", *out_cols))


def _kmeans(
    emb: DataFrame, k: int, iters: int, seed: int, tol: float = 1e-6
) -> DataFrame:
    cols = [c for c in emb.columns if c != "vertex"]
    cents = (
        emb.orderBy(F.xxhash64("vertex", F.lit(seed)))
        .limit(k)
        .collect()
    )
    centroids = [[float(r[c]) for c in cols] for r in cents]
    assign = None
    for _ in range(iters):
        dist_exprs = [
            sum((F.col(c) - F.lit(cent[j])) ** 2 for j, c in enumerate(cols)).alias(f"_d{i}")
            for i, cent in enumerate(centroids)
        ]
        scored = emb.select("vertex", *cols, *dist_exprs)
        best = F.array_position(
            F.array(*[F.col(f"_d{i}") for i in range(k)]),
            F.least(*[F.col(f"_d{i}") for i in range(k)]),
        ) - 1
        assign = scored.select("vertex", *cols, best.cast("int").alias("cluster"))
        new_cents = (
            assign.groupBy("cluster").agg(*[F.avg(c).alias(c) for c in cols]).collect()
        )
        by_id = {r["cluster"]: [float(r[c]) for c in cols] for r in new_cents}
        new_centroids = [by_id.get(i, centroids[i]) for i in range(k)]
        moved = max(
            abs(a - b)
            for cent, old in zip(new_centroids, centroids)
            for a, b in zip(cent, old)
        )
        centroids = new_centroids
        if moved < tol:  # Lloyd fixpoint — skip the remaining iterations
            break
    return assign.select("vertex", "cluster")


def spectralBalancedCutClustering(
    G: Graph,
    num_clusters: int,
    num_eigen_vects: int = 2,
    evs_tolerance: float = 1e-5,
    evs_max_iter: int = 100,
    kmean_tolerance: float = 1e-5,
    kmean_max_iter: int = 100,
    seed: int = 42,
    random_state: Optional[int] = None,
) -> DataFrame:
    """Returns (vertex, cluster). Lanczos eigenvectors of the normalized
    Laplacian + DataFrame k-means (see module docstring).
    ``random_state`` is the reference's name for the seed and takes
    precedence over ``seed`` when given."""
    if random_state is not None:
        seed = random_state
    if G.is_directed():
        raise ValueError("input graph must be undirected")
    k = max(num_eigen_vects, 2)
    steps = min(evs_max_iter, max(2 * k + 12, 20))
    emb = _lanczos_embedding(G, k, steps, evs_tolerance, seed, which="smallest")
    out = _kmeans(emb, num_clusters, min(kmean_max_iter, 10), seed, tol=kmean_tolerance)
    return G.unrenumber(out, "vertex")


def spectralModularityMaximizationClustering(
    G: Graph, num_clusters: int, num_eigen_vects: int = 2, **kwargs
) -> DataFrame:
    """Same Lanczos machinery: the reference factors the modularity
    matrix B = A - d d^T/2m; the dominant eigenspace of the normalized
    adjacency (== smallest of L_sym, identical eigenvectors up to the
    shift) is the standard proxy for B's dominant space, so both entry
    points share the L_sym Lanczos."""
    return spectralBalancedCutClustering(G, num_clusters, num_eigen_vects, **kwargs)
