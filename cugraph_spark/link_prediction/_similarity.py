"""Shared implementation of the link-prediction similarity family.

Reference (SURVEY §2.F): jaccard/overlap/sorensen/cosine all share one
3-call shape over the neighbor-intersection primitive
(cpp/include/cugraph/prims/per_v_pair_transform_src_dst_nbr_intersection.cuh);
only the denominator differs:

    jaccard  |∩| / |∪|
    overlap  |∩| / min(|A|,|B|)
    sorensen 2|∩| / (|A|+|B|)
    cosine   |∩| / sqrt(|A|·|B|)

Weighted variants (use_weight=True) replace |∩| with Σ min(w_a(x), w_b(x))
over common neighbors, |A| with Σ_x w_a(x), and |∪| with |A|+|B|−|∩|.

Spark mapping: the intersection for a pair list is
``E(first,x) ⋈ E(second,x)`` grouped by pair — a single shuffle join that
reuses the edge table's src partitioning; degrees/weight-sums are one
groupBy joined in. All-pairs mode feeds the wedge-pair set (two-hop
neighbors) through the same path. Undirected, non-multi graphs only
(reference raises for directed — so do we).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F

from ..constants import SRC, DST, WEIGHT
from ..structure.graph import Graph
from ..structure.two_hop import two_hop_pairs_internal

FORMULAS = {
    "jaccard": lambda i, da, db: i / (da + db - i),
    "overlap": lambda i, da, db: i / F.least(da, db),
    "sorensen": lambda i, da, db: (2 * i) / (da + db),
    "cosine": lambda i, da, db: i / F.sqrt(da * db),
}


def _check(G: Graph, use_weight: bool):
    if G.is_directed():
        raise ValueError("Input must be an undirected Graph.")
    if G.is_multigraph():
        raise ValueError("Input must be a non-multi Graph.")
    if use_weight and not G.is_weighted():
        raise ValueError("input_graph must be weighted if use_weight=True")


def _pair_base(G: Graph, pairs_internal: DataFrame, use_weight: bool) -> DataFrame:
    """Shared similarity base: (first, second, _i, _da, _db) — the
    intersection size and the two endpoint degrees, computed with ONE
    intersection join. Every metric is a pure expression over these three
    columns, so computing several metrics at once (similarity_matrix) costs
    the same single shuffle as one metric."""
    e = G.edgelist

    if use_weight:
        ea = e.select(F.col(SRC).alias("first"), F.col(DST).alias("_x"), F.col(WEIGHT).alias("_wa"))
        eb = e.select(F.col(SRC).alias("second"), F.col(DST).alias("_x"), F.col(WEIGHT).alias("_wb"))
        inter = (
            pairs_internal.join(ea, "first")
            .join(eb, ["second", "_x"])
            .groupBy("first", "second")
            .agg(F.sum(F.least("_wa", "_wb")).alias("_i"))
        )
        deg = e.groupBy(F.col(SRC).alias("_v")).agg(F.sum(WEIGHT).alias("_d"))
    else:
        ea = e.select(F.col(SRC).alias("first"), F.col(DST).alias("_x"))
        eb = e.select(F.col(SRC).alias("second"), F.col(DST).alias("_x"))
        inter = (
            pairs_internal.join(ea, "first")
            .join(eb, ["second", "_x"])
            .groupBy("first", "second")
            .agg(F.count("*").cast("double").alias("_i"))
        )
        deg = e.groupBy(F.col(SRC).alias("_v")).agg(F.count("*").cast("double").alias("_d"))

    da = deg.select(F.col("_v").alias("first"), F.col("_d").alias("_da"))
    db = deg.select(F.col("_v").alias("second"), F.col("_d").alias("_db"))
    return (
        pairs_internal.join(inter, ["first", "second"], "left")
        .join(da, "first")
        .join(db, "second")
        .select(
            "first",
            "second",
            F.coalesce(F.col("_i"), F.lit(0.0)).alias("_i"),
            "_da",
            "_db",
        )
    )


def _pair_similarity(
    G: Graph, pairs_internal: DataFrame, metric: str, use_weight: bool
) -> DataFrame:
    """pairs_internal: (first, second) internal ids. Returns
    (first, second, {metric}_coeff) — still internal ids."""
    base = _pair_base(G, pairs_internal, use_weight)
    return base.select(
        "first",
        "second",
        FORMULAS[metric](F.col("_i"), F.col("_da"), F.col("_db")).alias(
            f"{metric}_coeff"
        ),
    )


def similarity_matrix(
    G: Graph,
    metrics=("jaccard", "overlap", "sorensen", "cosine"),
    vertex_pair: Optional[DataFrame] = None,
    use_weight: bool = False,
) -> DataFrame:
    """All requested similarity coefficients in ONE pass: the
    neighbor-intersection join and the degree aggregation run once, and
    each metric is a column expression over (|∩|, d_a, d_b). At scale this
    replaces N intersection shuffles with 1 — use it whenever more than one
    metric is needed on the same pair set."""
    _check(G, use_weight)
    if vertex_pair is None:
        pairs = two_hop_pairs_internal(G)
    else:
        c1, c2 = vertex_pair.columns[:2]
        pairs = vertex_pair.select(F.col(c1).alias("first"), F.col(c2).alias("second"))
        pairs = G.renumber_vertices(pairs, "first")
        pairs = G.renumber_vertices(pairs, "second")
    base = _pair_base(G, pairs, use_weight)
    out = base.select(
        "first",
        "second",
        *[
            FORMULAS[m](F.col("_i"), F.col("_da"), F.col("_db")).alias(f"{m}_coeff")
            for m in metrics
        ],
    )
    out = G.unrenumber(out, "first")
    out = G.unrenumber(out, "second")
    return out


def similarity(
    G: Graph,
    metric: str,
    vertex_pair: Optional[DataFrame] = None,
    use_weight: bool = False,
) -> DataFrame:
    """jaccard/overlap/sorensen/cosine(G, vertex_pair, use_weight)."""
    _check(G, use_weight)
    if vertex_pair is None:
        pairs = two_hop_pairs_internal(G)
    else:
        c1, c2 = vertex_pair.columns[:2]
        pairs = vertex_pair.select(F.col(c1).alias("first"), F.col(c2).alias("second"))
        pairs = G.renumber_vertices(pairs, "first")
        pairs = G.renumber_vertices(pairs, "second")
    out = _pair_similarity(G, pairs, metric, use_weight)
    out = G.unrenumber(out, "first")
    out = G.unrenumber(out, "second")
    return out


def all_pairs_similarity(
    G: Graph,
    metric: str,
    vertices=None,
    use_weight: bool = False,
    topk: Optional[int] = None,
) -> DataFrame:
    """all_pairs_{metric}(G, vertices, use_weight, topk) — wedge pairs,
    optional restriction to ``vertices`` (as pair 'first'), optional global
    top-k by coefficient (deterministic ties: order by coeff desc, first,
    second — the reference's tie order is unspecified)."""
    _check(G, use_weight)
    start = None
    if vertices is not None:
        if not isinstance(vertices, list):
            vertices = list(vertices)
        start = G.lookup_internal_vertex_id(vertices)
    pairs = two_hop_pairs_internal(G, start)
    out = _pair_similarity(G, pairs, metric, use_weight)
    coeff = f"{metric}_coeff"
    if topk is not None:
        out = out.orderBy(F.desc(coeff), F.asc("first"), F.asc("second")).limit(topk)
    out = G.unrenumber(out, "first")
    out = G.unrenumber(out, "second")
    return out
