"""Leiden community detection.

Reference: community/leiden.py:11 and cpp/src/community/leiden_impl.cuh
(731 LoC) — Louvain plus a refinement phase that guarantees communities
are internally connected.

Spark mapping (SURVEY §2.D): the louvain level machinery plus the key
Leiden property enforced between levels: after each local-move phase,
every community is split into its connected components (WCC restricted
to intra-community edges) before contraction — a disconnected "community"
can never survive a level, which is the defect of plain Louvain that
Leiden fixes (Traag et al. 2019, public algorithm). The stochastic
theta-refinement of the paper is replaced by this deterministic variant;
validation is by modularity + connectivity invariants, as for louvain.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST, WEIGHT
from ..plans import iterloop
from ..structure.graph import Graph
from ._local_tail import LOCAL_TAIL_MAX_EDGES, local_tail
from .louvain import _apply_tail, _one_level, modularity_of


def _split_disconnected(
    edges: DataFrame, assign: DataFrame, n_hint: int | None = None
) -> DataFrame:
    """Refinement: relabel each community to its connected components
    (labels become min member vertex of each connected piece).

    Same hash-min + two-hop label shortcut as WCC (labels also propagate
    label->min(member), squaring the radius per round — O(log d) rounds
    instead of O(d); components/connectivity.py:114). ``n_hint`` is an
    upper bound on the vertex count for the broadcast-hint decision."""
    from ..components.connectivity import _skew_safe_hint

    hint = lambda df: iterloop.hint_state_join(df, n_hint)
    intra = (
        edges.join(hint(assign.select(F.col("vertex").alias(SRC), F.col("community").alias("_cs"))), SRC)
        .join(hint(assign.select(F.col("vertex").alias(DST), F.col("community").alias("_cd"))), DST)
        .filter(F.col("_cs") == F.col("_cd"))
        .select(SRC, DST)
    )
    labels = assign.select("vertex", F.col("vertex").alias("label"))
    labels = iterloop.materialize(labels)
    while True:
        nbr = (
            intra.join(hint(labels.select(F.col("vertex").alias(SRC), "label")), SRC)
            .groupBy(F.col(DST).alias("vertex"))
            .agg(F.min("label").alias("_n"))
        )
        prop = labels.join(nbr, "vertex", "left").select(
            "vertex",
            F.least(F.col("label"), F.coalesce("_n", F.col("label"))).alias("label"),
            F.col("label").alias("_o"),
        )
        # two-hop shortcut: label -> min vertex currently holding it
        # (skew-safe hint: labels consolidate toward one value per piece)
        lab_min = prop.groupBy(F.col("label").alias("_lab")).agg(
            F.min("vertex").alias("_root")
        )
        upd = (
            prop.join(_skew_safe_hint(lab_min, n_hint), prop["label"] == lab_min["_lab"], "left")
            .select(
                "vertex",
                F.least(F.col("label"), F.coalesce("_root", F.col("label"))).alias("label"),
                "_o",
            )
        )
        upd = iterloop.materialize(upd)
        (ch,) = iterloop.collect_scalars(upd, [F.sum((F.col("label") != F.col("_o")).cast("long"))])
        labels = upd.select("vertex", "label")
        if not ch:
            break
    return labels.withColumnRenamed("label", "community")


def leiden(
    G: Graph,
    max_iter: int = 100,
    resolution: float = 1.0,
    random_state: Optional[int] = None,
    theta: float = 1.0,
    max_level: int = 10,
    threshold: float = 1e-7,
) -> tuple[DataFrame, float]:
    """Returns ((vertex, partition), modularity_score)."""
    if G.is_directed():
        raise ValueError("input graph must be undirected")
    w = F.col(WEIGHT) if G.is_weighted() else F.lit(1.0)
    edges = iterloop.materialize(G.edgelist.select(SRC, DST, w.alias("_w")))
    mapping = G.vertices_internal.select("vertex", F.col("vertex").alias("community"))
    q_final = 0.0

    # vertex/community-sized state throughout -> small-state loop regime
    # (AQE off, few shuffle partitions) for the whole dendrogram walk
    n_level_edges = G.number_of_edges(directed_edges=True)
    # total edge weight is contraction-invariant: one job serves every
    # level's modularity computation
    (two_m,) = iterloop.collect_scalars(edges, [F.sum("_w")])
    with iterloop.small_plan(
        G.edgelist.sparkSession,
        G.number_of_vertices(),
        shuffled_rows=n_level_edges,
    ):
        n_hint = G.number_of_vertices()
        for level in range(max_level):
            # skip _one_level's modularity pass: the split below changes
            # the partition, so Q is only meaningful post-refinement;
            # skip its canonicalization too — the split relabels every
            # community to its min member anyway
            assign, _ = _one_level(
                edges,
                resolution,
                min(max_iter, 20),
                threshold,
                compute_q=False,
                n_edges=n_level_edges,
                canonical=False,
            )
            # the Leiden guarantee
            assign = _split_disconnected(edges, assign, n_hint=n_hint)
            mapping = iterloop.materialize(
                mapping.join(
                    assign.select(F.col("vertex").alias("community"), F.col("community").alias("_n")),
                    "community",
                ).select("vertex", F.col("_n").alias("community"))
            )
            n_comms, n_verts = iterloop.collect_scalars(
                assign, [F.countDistinct("community"), F.count("*")]
            )
            if n_comms == n_verts or level == max_level - 1:
                # only the exit level's modularity is reported — skip
                # the two-job Q pass on intermediate levels (the local
                # tail below reports its own Q when it takes over)
                q_final = modularity_of(edges, assign, resolution, two_m=two_m)
                break
            edges = iterloop.materialize(
                edges.join(assign.select(F.col("vertex").alias(SRC), F.col("community").alias("_cs")), SRC)
                .join(assign.select(F.col("vertex").alias(DST), F.col("community").alias("_cd")), DST)
                .groupBy(F.col("_cs").alias(SRC), F.col("_cd").alias(DST))
                .agg(F.sum("_w").alias("_w"))
            )
            # dendrogram tail (see louvain.py): driver-sized coarsened
            # levels finish locally, with the Leiden connectivity split
            # applied after each local level
            (n_level_edges,) = iterloop.collect_scalars(edges, [F.count("*")])
            if n_level_edges <= LOCAL_TAIL_MAX_EDGES:
                rows = [(r[0], r[1], r[2]) for r in edges.collect()]
                comm, q_final = local_tail(
                    rows,
                    resolution,
                    max_level - level - 1,
                    min(max_iter, 20),
                    threshold,
                    leiden_split=True,
                )
                mapping = _apply_tail(mapping, comm)
                break

    out = mapping.select("vertex", F.col("community").alias("partition"))
    return G.unrenumber(out, "vertex"), q_final
