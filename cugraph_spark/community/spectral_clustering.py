"""Spectral clustering (approximate) + clustering analysis entry points.

Reference: community/spectral_clustering.py:18,118 —
``spectralBalancedCutClustering`` / ``spectralModularityMaximizationClustering``
backed by legacy nvgraph Lanczos+kmeans (cpp legacy
community/legacy/spectral_clustering.cu). SURVEY §2.D flags an exact port
as out-of-scope; this is the documented approximation: a power-iteration
spectral embedding (k seeded random vectors smoothed by repeated
normalized-adjacency multiplication — converging toward the dominant
eigenspace) followed by Lloyd k-means expressed in DataFrame ops with
broadcast centroid literals. Deterministic given the seed; validated by
cut/modularity quality, not exact labels (the reference's own tests use
score thresholds, tests/community/test_balanced_cut.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST, WEIGHT
from ..plans import iterloop
from ..structure.graph import Graph


def _embedding(G: Graph, dim: int, iters: int, seed: int) -> DataFrame:
    """(vertex, e0..e{dim-1}) power-iteration embedding over D^-1 A."""
    w = F.col(WEIGHT) if G.is_weighted() else F.lit(1.0)
    edges = G.edgelist.select(SRC, DST, w.alias("_w"))
    degw = edges.groupBy(SRC).agg(F.sum("_w").alias("_d"))
    norm = iterloop.persist(
        edges.join(degw, SRC).select(SRC, DST, (F.col("_w") / F.col("_d")).alias("_c"))
    )
    cols = [f"e{i}" for i in range(dim)]
    state = G.vertices_internal.select(
        "vertex",
        *[
            (F.pmod(F.xxhash64("vertex", F.lit(seed + i)), F.lit(1 << 20)) / float(1 << 20) - 0.5).alias(c)
            for i, c in enumerate(cols)
        ],
    )
    state = iterloop.materialize(state)
    n_v = G.number_of_vertices()
    with iterloop.small_plan(edges.sparkSession, n_v):
      for it in range(iters):
        msgs = (
            norm.join(
                iterloop.hint_state_join(
                    state.select(F.col("vertex").alias(SRC), *cols), n_v
                ),
                SRC,
            )
            .groupBy(F.col(DST).alias("vertex"))
            .agg(*[F.sum(F.col(c) * F.col("_c")).alias(c) for c in cols])
        )
        # mix with self (lazy random-walk) to damp oscillation
        state = (
            state.join(msgs.select("vertex", *[F.col(c).alias(f"_m{c}") for c in cols]), "vertex", "left")
            .select(
                "vertex",
                *[
                    (0.5 * F.col(c) + 0.5 * F.coalesce(F.col(f"_m{c}"), F.col(c))).alias(c)
                    for c in cols
                ],
            )
        )
        # state is read twice per pass (message join + self-mix): checkpoint
        # every pass or the lazy chain re-executes prior passes per use
        state = iterloop.materialize(state)
    norm.unpersist()
    return iterloop.materialize(state)


def _kmeans(emb: DataFrame, k: int, iters: int, seed: int) -> DataFrame:
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
        centroids = [by_id.get(i, centroids[i]) for i in range(k)]
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
) -> DataFrame:
    """Returns (vertex, cluster). Approximate (see module docstring)."""
    if G.is_directed():
        raise ValueError("input graph must be undirected")
    emb = _embedding(G, max(num_eigen_vects, 2), min(evs_max_iter, 20), seed)
    out = _kmeans(emb, num_clusters, min(kmean_max_iter, 10), seed)
    return G.unrenumber(out, "vertex")


def spectralModularityMaximizationClustering(
    G: Graph, num_clusters: int, num_eigen_vects: int = 2, **kwargs
) -> DataFrame:
    """Same embedding machinery; the modularity-flavored variant of the
    reference differs only in the matrix it factors (B vs L) — the
    power-embedding approximation serves both entry points."""
    return spectralBalancedCutClustering(G, num_clusters, num_eigen_vects, **kwargs)
