"""k-truss subgraph.

Reference: community/ktruss_subgraph.py:11,50 /
cpp/src/community/k_truss_impl.cuh: maximal subgraph in which every edge
participates in at least k-2 triangles.

Spark mapping (SURVEY §2.A): IterLoop — per-edge triangle support via
degree-oriented neighbor-array intersection (triangle_count's plan),
delete edges below k-2, repeat until fixpoint. Each round recomputes
support and orientation on the shrinking survivor edge set.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST, WEIGHT
from ..plans import iterloop
from ..structure.graph import Graph


def _edge_support(und: DataFrame, n_edges: int | None = None) -> DataFrame:
    """und: undirected unique pairs (src < dst). Returns (src, dst, sup).

    ``n_edges``: current survivor count, known exactly by the peeling
    loop. Inside the small-plan regime (AQE off, checkpoint leaves carry
    no stats) every join here would otherwise plan as SortMergeJoin;
    the degree/adjacency/support sides are all bounded by n_edges rows,
    so they are broadcast-hinted whenever that bound fits the state
    threshold — above it the hints are withheld and the sort-merge plan
    (with AQE back on) is the scalable path.

    Same array-intersection plan as triangle_count (one shuffled row per
    EDGE whose array payloads sum to O(E) ids, intersection inside one
    codegen stage) — NOT the wedge self-join, which shuffles one row per
    wedge and melted super-linearly on skewed graphs (measured 31.6 s ->
    197.7 s for 4.2x edges at R-MAT scale 16 -> 18 before triangle_count
    dropped it). Degree-orientation is recomputed on each round's
    survivor set, so the neighbor-array bound holds as edges fall out."""
    hint = lambda df: iterloop.hint_state_join(df, n_edges)
    deg = (
        und.select(F.col(SRC).alias("_v"))
        .unionAll(und.select(F.col(DST).alias("_v")))
        .groupBy("_v")
        .agg(F.count("*").alias("_d"))
    )
    e = und.join(
        hint(deg.select(F.col("_v").alias(SRC), F.col("_d").alias("_ds"))), SRC
    ).join(hint(deg.select(F.col("_v").alias(DST), F.col("_d").alias("_dd"))), DST)
    fwd = (F.col("_ds") < F.col("_dd")) | (
        (F.col("_ds") == F.col("_dd")) & (F.col(SRC) < F.col(DST))
    )
    o = e.select(
        F.when(fwd, F.col(SRC)).otherwise(F.col(DST)).alias("a"),
        F.when(fwd, F.col(DST)).otherwise(F.col(SRC)).alias("b"),
    )
    adj = o.groupBy("a").agg(F.collect_list("b").alias("_n"))
    tri = (
        o.join(hint(adj.select(F.col("a"), F.col("_n").alias("_na"))), "a")
        .join(hint(adj.select(F.col("a").alias("b"), F.col("_n").alias("_nb"))), "b")
        .select("a", "b", F.explode(F.array_intersect("_na", "_nb")).alias("c"))
    )
    # sides come back degree-oriented; canonicalize to the id-ordered
    # pair representation the survivor list uses
    sides = (
        tri.select(F.col("a").alias("_x"), F.col("b").alias("_y"))
        .unionAll(tri.select(F.col("b").alias("_x"), F.col("c").alias("_y")))
        .unionAll(tri.select(F.col("a").alias("_x"), F.col("c").alias("_y")))
    ).select(
        F.least("_x", "_y").alias(SRC), F.greatest("_x", "_y").alias(DST)
    )
    sup = sides.groupBy(SRC, DST).agg(F.count("*").alias("_sup"))
    return und.join(hint(sup), [SRC, DST], "left").select(
        SRC, DST, F.coalesce("_sup", F.lit(0)).alias("_sup")
    )


def _ktruss_pairs(G: Graph, k: int) -> DataFrame:
    """Peeling loop shared by the Graph and edge-list surfaces: returns
    the surviving unique (src < dst) INTERNAL-id pairs."""
    if G.is_directed():
        raise ValueError("input graph must be undirected")
    if k < 3:
        raise ValueError("k must be >= 3")

    und = (
        G.edgelist.filter(F.col(SRC) < F.col(DST)).select(SRC, DST)
    )
    und = iterloop.materialize(und)
    n_before = und.count()
    it = 0
    # loop state is the (halved) edge list itself — small-plan applies
    # while it fits the broadcast-size regime
    fs = iterloop.FusedSwap()  # swap + survivor count fused into one job
    with iterloop.small_plan(und.sparkSession, n_before):
        while True:
            it += 1
            sup = _edge_support(und, n_before)
            keep, (n_after,) = fs.swap(
                sup.filter(F.col("_sup") >= k - 2).select(SRC, DST),
                [F.count(F.lit(1))],
            )
            und = keep
            if n_after == n_before or n_after == 0:
                break
            n_before = n_after
    return und


def ktruss_subgraph(G: Graph, k: int, use_weights: bool = True) -> Graph:
    """Returns the k-truss as a Graph (undirected input only).
    ``use_weights`` is deprecated in the reference (ktruss_subgraph.py:53)
    and ignored there too."""
    # back to external ids via the parent graph's map, keep weights
    pairs = _ktruss_pairs(G, k)
    edges = G.edgelist.join(pairs, [SRC, DST], "left_semi")
    edges = edges.unionByName(
        G.edgelist.join(
            pairs.select(F.col(DST).alias(SRC), F.col(SRC).alias(DST)), [SRC, DST], "left_semi"
        )
    )
    ext = G.unrenumber(G.unrenumber(edges, SRC), DST)
    out = Graph(directed=False)
    weight = WEIGHT if WEIGHT in ext.columns else None
    out.from_edgelist(ext, SRC, DST, weight=weight, symmetrize=False)
    return out


def k_truss(G: Graph, k: int) -> Graph:
    """community/ktruss_subgraph.py:11 — top-level alias (the reference
    passes use_weights=False here; both values are no-ops)."""
    return ktruss_subgraph(G, k, use_weights=False)


def k_truss_edges(G: Graph, k: int) -> DataFrame:
    """Unique (src < dst) pairs of the k-truss (query surface).

    Goes straight from the peeling loop's survivor pairs to external ids
    — the old path built a full Graph (repartition + persist + count +
    vertex set) around the result only to immediately flatten it back to
    an edge list (r6: one whole graph build removed from the query)."""
    pairs = _ktruss_pairs(G, k)
    out = G.unrenumber(G.unrenumber(pairs, SRC), DST)
    # canonicalize on EXTERNAL ids (internal ordering need not survive
    # unrenumbering) — matches the old Graph-rebuild path's output
    return out.select(
        F.least(SRC, DST).alias(SRC), F.greatest(SRC, DST).alias(DST)
    )
