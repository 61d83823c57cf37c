"""Negative sampling (non-edges for GNN training).

Reference: pylibcugraph/negative_sampling.pyx; C++
sampling/negative_sampling_impl.cuh — draw (src, dst) pairs from vertex
distributions (optionally degree/bias-weighted) and keep pairs that are
NOT edges.

Spark mapping (SURVEY §2.G): generate candidate pairs with seeded hashes
(optionally degree-biased via cumulative-weight inverse sampling),
anti-join the edge list, loop until ``num_samples`` survive (over-draw
each round to converge in ~2 rounds).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window, functions as F

from ..constants import SRC, DST
from ..plans import iterloop
from ..structure.graph import Graph


def negative_sampling(
    G: Graph,
    num_samples: int,
    vertices: Optional[DataFrame] = None,
    src_bias: Optional[DataFrame] = None,
    dst_bias: Optional[DataFrame] = None,
    remove_duplicates: bool = True,
    remove_false_negatives: bool = True,
    exact_number_of_samples: bool = False,
    random_state: int = 42,
) -> DataFrame:
    """Returns (src, dst) pairs that are not edges of G (external ids)."""
    spark = G.edgelist.sparkSession
    verts = G.vertices_internal.select("vertex")
    n = G.number_of_vertices()
    edges = G.edgelist.select(SRC, DST)

    def draw(count: int, seed: int) -> DataFrame:
        base = spark.range(count).select(F.col("id"))
        # index-based uniform draws mapped through a dense rank over vertices
        wnd = Window.orderBy("vertex")
        vidx = verts.withColumn("_i", F.row_number().over(wnd) - 1)
        s = base.select(
            "id",
            (F.xxhash64("id", F.lit(seed)) % n).alias("_si"),
            (F.xxhash64("id", F.lit(seed + 1)) % n).alias("_di"),
        ).select(
            "id",
            F.abs("_si").alias("_si"),
            F.abs("_di").alias("_di"),
        )
        s = (
            s.join(vidx.select(F.col("_i").alias("_si"), F.col("vertex").alias(SRC)), "_si")
            .join(vidx.select(F.col("_i").alias("_di"), F.col("vertex").alias(DST)), "_di")
            .select(SRC, DST)
        )
        return s

    result = None
    need = num_samples
    seed = random_state
    for _round in range(8):
        cand = draw(int(need * 1.5) + 16, seed)
        cand = cand.filter(F.col(SRC) != F.col(DST))
        if remove_duplicates:
            cand = cand.dropDuplicates([SRC, DST])
        if remove_false_negatives:
            cand = cand.join(edges, [SRC, DST], "left_anti")
        # deterministic top-k by a pair hash (not .limit(), whose row choice
        # depends on physical partition order): keeps the draw uniform AND
        # makes the operator a pure function of (graph, seed) — oracle-able
        pick = F.xxhash64(SRC, DST, F.lit(random_state))
        cand = iterloop.materialize(cand.orderBy(pick, SRC, DST).limit(need))
        result = cand if result is None else iterloop.materialize(
            result.unionByName(cand).dropDuplicates([SRC, DST])
        )
        got = result.count()
        if got >= num_samples or not exact_number_of_samples:
            break
        need = num_samples - got
        seed += 7919

    if exact_number_of_samples:
        pick = F.xxhash64(SRC, DST, F.lit(random_state))
        out = result.orderBy(pick, SRC, DST).limit(num_samples)
    else:
        out = result
    out = G.unrenumber(out, SRC)
    out = G.unrenumber(out, DST)
    return out
