"""Connected components.

Reference: /root/reference/python/cugraph/cugraph/components/connectivity.py:86
(``weakly_connected_components`` → (vertex, labels)), :185 (scc), :283
(dispatcher). C++: components/weakly_connected_components_impl.cuh.

Spark mapping (SURVEY §2.E):

- WCC: hash-min label propagation with the *two-hop shortcut* from the
  HashToMin / large-star-small-star family (Rastogi et al., "Finding
  Connected Components in MapReduce", ICDE 2013 — public algorithm): each
  round every vertex adopts the min label in its closed neighborhood, and
  labels also propagate label->label, which squares the propagation radius
  and converges in O(log d) rounds instead of O(d). Labels are the MIN
  vertex id in the component — deterministic, unlike the reference's
  arbitrary representative, and SQL-checkable.

- SCC: iterative forward-backward trim (experimental python reference:
  experimental/components/scc.py) — BFS reachability intersection per
  pivot on the condensed remainder. Adequate for graphs whose SCC count
  is modest; documented limitation for adversarial chains.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST
from ..plans import iterloop
from ..structure.graph import Graph
from ..structure.symmetrize import add_reverse_edges


def weakly_connected_components(G: Graph) -> DataFrame:
    """Returns (vertex, labels); label = min vertex id in the component."""
    edges = G.edgelist.select(SRC, DST)
    if G.is_directed():
        edges = add_reverse_edges(edges)

    labels = G.vertices_internal.select("vertex", F.col("vertex").alias("label"))
    labels = iterloop.materialize(labels)
    it = 0
    with iterloop.small_plan(edges.sparkSession, G.number_of_vertices()):
        while True:
            it += 1
            # min label over closed neighborhood (vertex itself + in-neighbors)
            nbr_min = (
                edges.join(
                    iterloop.hint_state_join(
                        labels.select(F.col("vertex").alias(SRC), "label"),
                        G.number_of_vertices(),
                    ),
                    SRC,
                )
                .groupBy(F.col(DST).alias("vertex"))
                .agg(F.min("label").alias("_nbr"))
            )
            prop = (
                labels.join(nbr_min, "vertex", "left")
                .select(
                    "vertex",
                    F.least(F.col("label"), F.coalesce("_nbr", F.col("label"))).alias("label"),
                    F.col("label").alias("_old"),
                )
            )
            # two-hop shortcut: each vertex also adopts the min label currently
            # pointing at its label (label -> min(labels that share it))
            lab_min = prop.groupBy(F.col("label").alias("_lab")).agg(F.min("vertex").alias("_root"))
            new_labels = (
                prop.join(lab_min, prop["label"] == lab_min["_lab"], "left")
                .select(
                    "vertex",
                    F.least(F.col("label"), F.coalesce("_root", F.col("label"))).alias("label"),
                    "_old",
                )
            )
            new_labels = iterloop.materialize(new_labels)
            (changes,) = iterloop.collect_scalars(
                new_labels, [F.sum((F.col("label") != F.col("_old")).cast("long"))]
            )
            labels = new_labels.select("vertex", "label")
            if not changes:
                break

    out = labels.withColumnRenamed("label", "labels")
    out = G.unrenumber(out, "vertex")
    if G.is_renumbered():
        # labels are internal ids of representatives; map them back too
        out = G.unrenumber(out, "labels")
    return out


def strongly_connected_components(G: Graph) -> DataFrame:
    """FW-BW-Trim SCC (SURVEY §2.E, flagged hard). Returns (vertex, labels),
    label = min vertex id in the SCC.

    Strategy: repeat {trim trivial SCCs (in/out-degree 0 within the
    remainder), pick the min remaining vertex as pivot, label
    FWD(pivot) ∩ BWD(pivot)}. Each round removes >=1 SCC; fine for graphs
    with few large SCCs (the common analytic case), documented as slow for
    long SCC chains.
    """
    if not G.is_directed():
        return weakly_connected_components(G)

    spark = G.edgelist.sparkSession
    edges = iterloop.materialize(G.edgelist.select(SRC, DST).distinct())
    remaining = iterloop.materialize(G.vertices_internal.select("vertex"))
    results = []  # small driver-side list of label DataFrames

    while True:
        # trim: vertices with no in- or no out-edges in the remainder are
        # singleton SCCs (iterate to fixpoint)
        while True:
            srcs = edges.select(F.col(SRC).alias("vertex")).distinct()
            dsts = edges.select(F.col(DST).alias("vertex")).distinct()
            core = srcs.join(dsts, "vertex")  # has both in and out
            trivial = remaining.join(core, "vertex", "left_anti")
            trivial = iterloop.materialize(trivial)
            if trivial.count() == 0:
                break
            results.append(trivial.select("vertex", F.col("vertex").alias("labels")))
            remaining = iterloop.materialize(remaining.join(core, "vertex"))
            edges = iterloop.materialize(
                edges.join(remaining.select(F.col("vertex").alias(SRC)), SRC)
                .join(remaining.select(F.col("vertex").alias(DST)), DST)
                .select(SRC, DST)
            )
        if remaining.count() == 0:
            break
        pivot = remaining.agg(F.min("vertex")).collect()[0][0]
        fwd = _reach(spark, edges, pivot, SRC, DST)
        bwd = _reach(spark, edges, pivot, DST, SRC)
        scc = iterloop.materialize(fwd.join(bwd, "vertex"))
        results.append(scc.select("vertex", F.lit(pivot).cast("long").alias("labels")))
        remaining = iterloop.materialize(remaining.join(scc, "vertex", "left_anti"))
        edges = iterloop.materialize(
            edges.join(scc.select(F.col("vertex").alias(SRC)), SRC, "left_anti")
            .join(scc.select(F.col("vertex").alias(DST)), DST, "left_anti")
        )

    out = results[0]
    for r in results[1:]:
        out = out.unionByName(r)
    # the pivot is the min vertex of its remainder, and trim emits
    # singletons labeled by themselves — labels are already the min vertex
    # id of each SCC, deterministic
    out = G.unrenumber(out, "vertex")
    if G.is_renumbered():
        out = G.unrenumber(out, "labels")
    return out


def _reach(spark, edges: DataFrame, start: int, from_col: str, to_col: str) -> DataFrame:
    """Vertices reachable from ``start`` following from_col->to_col."""
    visited = spark.createDataFrame([(start,)], "vertex long")
    frontier = visited
    it = 0
    while True:
        nxt = (
            edges.join(frontier.withColumnRenamed("vertex", from_col), from_col)
            .select(F.col(to_col).alias("vertex"))
            .distinct()
            .join(visited, "vertex", "left_anti")
        )
        nxt = iterloop.materialize(nxt)
        if nxt.count() == 0:
            return visited
        visited = visited.unionByName(nxt)
        it += 1
        visited = iterloop.truncate_lineage(visited, it, 4)
        frontier = nxt


def connected_components(G: Graph, connection: str = "weak") -> DataFrame:
    """Dispatcher (connectivity.py:283)."""
    if connection == "weak":
        return weakly_connected_components(G)
    if connection == "strong":
        return strongly_connected_components(G)
    raise ValueError(f"unknown connection type {connection!r}")
