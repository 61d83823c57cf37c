"""GNN minibatch neighbor sampling (homogeneous / heterogeneous).

Reference: sampling/homogeneous_neighbor_sample.py:44 (output columns
``majors, minors, weight, edge_id, edge_type, batch_id, hop_id``,
homogeneous_neighbor_sample.py:143-171), heterogeneous_neighbor_sample.py:44
(per-edge-type fanouts); C++ sampling/neighbor_sampling_impl.cuh.

Spark mapping (SURVEY §2.G): per hop, join the frontier with the
src-partitioned edge table and keep ``fanout[hop]`` neighbors per
(batch, seed vertex) via a window ``row_number`` ordered by a seeded
xxhash64 — deterministic sampling, no Python in the loop.
``with_replacement=True`` draws k independent hash orderings by exploding
a k-sequence. Temporal variant: pass ``time_column`` and per-seed
``seed_times`` to only follow edges with time < seed time (the reference's
temporal_sampling_impl.cuh behavior).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, Window, functions as F

from ..constants import SRC, DST, WEIGHT, EDGE_ID, EDGE_TYPE
from ..plans import iterloop
from ..structure.graph import Graph


def homogeneous_neighbor_sample(
    G: Graph,
    start_list: DataFrame | list,
    fanout_vals: Sequence[int],
    with_replacement: bool = False,
    random_state: int = 42,
    with_batch_ids: bool = False,
    time_column: Optional[str] = None,
    seed_times: Optional[DataFrame] = None,
) -> DataFrame:
    """Returns (majors, minors[, weight][, edge_id][, edge_type],
    batch_id, hop_id) with external ids."""
    spark = G.edgelist.sparkSession
    if isinstance(start_list, list):
        ids = G.lookup_internal_vertex_id(start_list)
        seeds = spark.createDataFrame(
            [(int(v), i if with_batch_ids else 0) for i, v in enumerate(ids)],
            "vertex long, batch_id int",
        )
    else:
        cols = start_list.columns
        seeds = start_list.select(
            F.col(cols[0]).alias("vertex"),
            (F.col(cols[1]) if with_batch_ids and len(cols) > 1 else F.lit(0)).cast("int").alias("batch_id"),
        )
        seeds = G.renumber_vertices(seeds, "vertex")

    extra = [c for c in (WEIGHT, EDGE_ID, EDGE_TYPE) if c in G.edgelist.columns]
    ecols = [SRC, DST, *extra] + ([time_column] if time_column else [])
    edges = iterloop.persist(G.edgelist.select(*ecols))

    if time_column and seed_times is not None:
        st = G.renumber_vertices(seed_times, "vertex")
        seeds = seeds.join(st, "vertex", "left")
    frontier = seeds
    out = None

    # The loop state scales with n_seeds × cumulative fanout product, not
    # |V|: a small-vertex graph with many seed batches can carry
    # far-larger-than-|V| candidate shuffles, so the forced AQE-off /
    # few-partition regime must be gated on the frontier bound.
    if isinstance(start_list, list):
        n_seeds = len(start_list)
    else:
        n_seeds = seeds.count()
    frontier_bound = n_seeds
    for f_ in fanout_vals:
        frontier_bound *= max(int(f_), 1)
    with iterloop.small_plan(spark, min(G.number_of_vertices(), frontier_bound),
                             shuffled_rows=frontier_bound):
      for hop, fanout in enumerate(fanout_vals):
        cand = edges.join(frontier.withColumnRenamed("vertex", SRC), SRC)
        if time_column and seed_times is not None:
            cand = cand.filter(F.col(time_column) < F.col("seed_time"))
        h = F.xxhash64(SRC, DST, F.lit(hop), F.lit(random_state), F.col("batch_id"))
        if with_replacement and fanout > 0:
            cand = cand.withColumn("_k", F.explode(F.sequence(F.lit(1), F.lit(int(fanout)))))
            h = F.xxhash64(SRC, DST, F.lit(hop), F.lit(random_state), F.col("batch_id"), F.col("_k"))
            w = Window.partitionBy("batch_id", SRC, "_k").orderBy(F.asc(h))
        else:
            w = Window.partitionBy("batch_id", SRC).orderBy(F.asc(h))
        picked = cand.withColumn("_rn", F.row_number().over(w))
        picked = picked.filter(F.col("_rn") <= 1 if with_replacement else F.col("_rn") <= fanout)
        layer = picked.select(
            F.col(SRC).alias("majors"), F.col(DST).alias("minors"), *extra,
            F.col("batch_id"), F.lit(hop).cast("int").alias("hop_id"),
            *( [F.col("seed_time")] if (time_column and seed_times is not None) else [] ),
        )
        layer = iterloop.materialize(layer)
        out = layer if out is None else out.unionByName(layer)
        frontier = layer.select(F.col("minors").alias("vertex"), "batch_id",
                                *( ["seed_time"] if (time_column and seed_times is not None) else [] )
                                ).distinct()

    edges.unpersist()
    if out is None:
        out = spark.createDataFrame([], "majors long, minors long, batch_id int, hop_id int")
    if "seed_time" in out.columns:
        out = out.drop("seed_time")
    out = G.unrenumber(out, "majors")
    out = G.unrenumber(out, "minors")
    return out


def heterogeneous_neighbor_sample(
    G: Graph,
    start_list: DataFrame | list,
    fanout_vals: dict[int, Sequence[int]] | Sequence[int],
    **kwargs,
) -> DataFrame:
    """Per-edge-type fanouts: ``fanout_vals`` maps edge_type -> per-hop
    fanout list (reference passes a flattened per-type array). Falls back
    to homogeneous behavior when given a flat list."""
    if not isinstance(fanout_vals, dict):
        return homogeneous_neighbor_sample(G, start_list, fanout_vals, **kwargs)
    if EDGE_TYPE not in G.edgelist.columns:
        raise ValueError("graph has no edge_type column")
    spark = G.edgelist.sparkSession
    n_hops = max(len(v) for v in fanout_vals.values())
    frames = []
    for et, fans in fanout_vals.items():
        sub = Graph(directed=G.is_directed())
        sub._edges = G.edgelist.filter(F.col(EDGE_TYPE) == et)
        sub._nm, sub._vertices, sub._spark = G._nm, G._vertices, G._spark
        sub.properties.renumbered = G.properties.renumbered
        sub.properties.weighted = G.properties.weighted
        frames.append(
            homogeneous_neighbor_sample(sub, start_list, fans, **kwargs)
        )
    out = frames[0]
    for fdf in frames[1:]:
        out = out.unionByName(fdf)
    return out
