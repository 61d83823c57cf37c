"""R-MAT (Graph500) random graph generator.

Reference: generators/rmat.py:407 (``rmat(scale, num_edges, a, b, c,
seed, clip_and_flip, scramble_vertex_ids, include_edge_weights,
minimum_weight, maximum_weight, dtype, include_edge_ids,
include_edge_types, min/max_edge_type_value, mg)``), C++
cpp/src/generators/.

Spark mapping (SURVEY §2.H): ``spark.range(num_edges)`` plus ``scale``
per-level quadrant draws from ``F.rand`` columns — one pure select
expression, embarrassingly parallel, no shuffle at all. Vertex-id
scrambling uses a multiply-by-odd-constant bijection mod 2^scale (a
deterministic permutation, standing in for the reference's bit
scramble).
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F


_SCRAMBLE_MULT = 0x27220A95  # odd -> bijective mod 2^scale


def rmat(
    scale: int,
    num_edges: int,
    a: float = 0.57,
    b: float = 0.19,
    c: float = 0.19,
    seed: int = 42,
    clip_and_flip: bool = False,
    scramble_vertex_ids: bool = False,
    include_edge_weights: bool = False,
    minimum_weight: Optional[float] = None,
    maximum_weight: Optional[float] = None,
    include_edge_ids: bool = False,
    include_edge_types: bool = False,
    min_edge_type_value: int = 0,
    max_edge_type_value: int = 0,
    dtype=None,
    create_using=None,
    spark: Optional[SparkSession] = None,
    mg: bool = False,
) -> DataFrame:
    """Returns an edge DataFrame (src, dst[, weight][, edge_id][, edge_type]).

    ``dtype`` (reference rmat.py:76-85): weight dtype, 'float32' or
    'float64' (default). ``create_using``: None returns the raw edge
    DataFrame (this module's default — algorithms here consume either);
    pass a Graph instance/class to get a built Graph like the reference's
    default ``create_using=cugraph.Graph``."""
    if a + b + c > 1.0:
        raise ValueError("a + b + c must be <= 1.0")
    if include_edge_weights and (minimum_weight is None or maximum_weight is None):
        raise ValueError("weight range required when include_edge_weights=True")
    import numpy as np

    if dtype in (None, np.float64, "float64", float):
        w_type = "double"
    elif dtype in (np.float32, "float32"):
        w_type = "float"
    else:
        raise ValueError("dtype must be either 'float32' or 'float64'")
    spark = spark or SparkSession.getActiveSession()

    # per-(row, level) uniforms from xxhash64 — deterministic regardless of
    # partitioning (F.rand's per-partition seeding is layout-dependent)
    df = spark.range(num_edges)
    src = F.lit(0).cast("long")
    dst = F.lit(0).cast("long")
    denom = float(1 << 30)
    for level in range(scale):
        u = F.pmod(F.xxhash64("id", F.lit(seed + level)), F.lit(1 << 30)) / denom
        src_bit = (u >= a + b).cast("long")
        dst_bit = ((u >= a) & (u < a + b) | (u >= a + b + c)).cast("long")
        src = src + F.shiftleft(src_bit, level)
        dst = dst + F.shiftleft(dst_bit, level)
    df = df.select(F.col("id"), src.alias("src"), dst.alias("dst"))

    if clip_and_flip:
        df = df.select(
            "id", F.least("src", "dst").alias("src"), F.greatest("src", "dst").alias("dst")
        )
    if scramble_vertex_ids:
        mask = (1 << scale) - 1
        df = df.select(
            "id",
            ((F.col("src") * _SCRAMBLE_MULT) % (mask + 1)).alias("src"),
            ((F.col("dst") * _SCRAMBLE_MULT) % (mask + 1)).alias("dst"),
        )
    cols = [F.col("src"), F.col("dst")]
    if include_edge_weights:
        lo, hi = float(minimum_weight), float(maximum_weight)
        u = F.pmod(F.xxhash64("id", F.lit(seed + 7919)), F.lit(1 << 30)) / denom
        cols.append((u * (hi - lo) + lo).cast(w_type).alias("weight"))
    if include_edge_ids:
        cols.append(F.col("id").alias("edge_id"))
    if include_edge_types:
        span = max_edge_type_value - min_edge_type_value + 1
        u = F.pmod(F.xxhash64("id", F.lit(seed + 104729)), F.lit(1 << 30)) / denom
        cols.append(
            (F.floor(u * span) + min_edge_type_value).cast("int").alias("edge_type")
        )
    out = df.select(*cols)
    if create_using is None:
        return out
    from ..structure.graph import Graph

    if isinstance(create_using, Graph):
        g = create_using
    else:
        g = create_using()
    weight = "weight" if include_edge_weights else None
    edge_id = "edge_id" if include_edge_ids else None
    edge_type = "edge_type" if include_edge_types else None
    g.from_edgelist(
        out, "src", "dst", weight=weight, edge_id=edge_id, edge_type=edge_type
    )
    return g


def multi_rmat(
    n_edgelists: int,
    min_scale: int,
    max_scale: int,
    edge_factor: int,
    size_distribution: int = 0,
    edge_distribution: int = 0,
    seed: int = 42,
    clip_and_flip: bool = False,
    scramble_vertex_ids: bool = False,
    include_edge_weights: bool = False,
    minimum_weight: Optional[float] = None,
    maximum_weight: Optional[float] = None,
    dtype=None,
    include_edge_ids: bool = False,
    include_edge_types: bool = False,
    min_edge_type_value: int = 0,
    max_edge_type_value: int = 0,
    spark: Optional[SparkSession] = None,
    mg: bool = False,
) -> list[DataFrame]:
    """generators/rmat.py:598 — a list of rmat edge lists; the edge-attr
    options mirror single rmat and apply to every generated list."""
    import random

    rng = random.Random(seed)
    out = []
    for i in range(n_edgelists):
        sc = rng.randint(min_scale, max_scale)
        out.append(
            rmat(
                sc,
                (1 << sc) * edge_factor,
                seed=seed + i * 1000,
                clip_and_flip=clip_and_flip,
                scramble_vertex_ids=scramble_vertex_ids,
                include_edge_weights=include_edge_weights,
                minimum_weight=minimum_weight,
                maximum_weight=maximum_weight,
                dtype=dtype,
                include_edge_ids=include_edge_ids,
                include_edge_types=include_edge_types,
                min_edge_type_value=min_edge_type_value,
                max_edge_type_value=max_edge_type_value,
                spark=spark,
            )
        )
    return out
