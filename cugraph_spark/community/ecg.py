"""ECG — ensemble clustering for graphs.

Reference: community/ecg.py:10 and cpp/src/community/ecg_impl.cuh (170
LoC): run an ensemble of one-level Louvains, re-weight each edge by the
fraction of ensemble runs that co-cluster its endpoints (floored at
``min_weight``), then run full Louvain on the re-weighted graph.

Spark mapping: each ensemble member is one ``_one_level`` pass with a
different hash-jittered tie-break; co-cluster counts accumulate on the
edge list; the ensemble loop is the only sequential part.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST, WEIGHT
from ..plans import iterloop
from ..structure.graph import Graph
from .louvain import _one_level, louvain


def ecg(
    input_graph: Graph,
    min_weight: float = 0.05,
    ensemble_size: int = 16,
    max_level: int = 10,
    max_iter: int = 20,
    threshold: float = 1e-7,
    resolution: float = 1.0,
    random_state: int = 42,
    weight: str | None = None,
) -> tuple[DataFrame, float]:
    """Returns ((vertex, partition), modularity_score). ``weight`` names
    an edge column to use (reference ecg.py:18); weights are already
    canonicalized to ``weight`` at graph construction, so any other
    existing column is selected here."""
    G = input_graph
    if G.is_directed():
        raise ValueError("input graph must be undirected")
    if weight is not None and weight not in G.edgelist.columns:
        raise ValueError(f"weight column {weight!r} not on the edge list")
    if weight is not None:
        w = F.col(weight).cast("double")
    else:
        w = F.col(WEIGHT) if G.is_weighted() else F.lit(1.0)
    base = iterloop.materialize(G.edgelist.select(SRC, DST, w.alias("_w")))

    votes = base.select(SRC, DST, F.lit(0).alias("_votes"))
    _small = iterloop.small_plan(
        G.edgelist.sparkSession,
        G.number_of_vertices(),
        shuffled_rows=G.number_of_edges(directed_edges=True),
    )
    with _small:
      # Shared-degree ensemble (r7, guide §2.3 "aggregate once"): each
      # member's weighted degree is deg_0(v) * (1 + jitter_i(v)) — the
      # jitter factor is per-vertex, so it distributes out of the
      # per-vertex sum. One topology-only E-sized degree aggregate serves
      # all ensemble_size members; each member's degree table is a
      # V-sized projection over it. The iso set (vertices with no
      # non-loop edge) falls out of the same aggregate, replacing the
      # old anti-join + count jobs.
      deg0 = base.groupBy(F.col(SRC).alias("vertex")).agg(
          F.sum("_w").alias("_k0"),
          F.max((F.col(SRC) != F.col(DST)).cast("int")).alias("_nl"),
      )
      deg0 = iterloop.persist(deg0)
      n_verts0, n_iso = iterloop.collect_scalars(
          deg0, [F.count("*"), F.count(F.when(F.col("_nl") == 0, 1))]
      )
      iso_arg = deg0.filter(F.col("_nl") == 0).select("vertex") if n_iso else False
      for i in range(ensemble_size):
        # jitter: permute effective tie-breaks by hashing vertex ids with
        # the run index (one-level louvain is tie-break sensitive, which
        # is exactly the ensemble diversity ECG exploits)
        jitter = (
            F.pmod(F.xxhash64(SRC, F.lit(random_state + i)), F.lit(1000)).cast("double")
            / 1e9
        )
        jittered = base.select(SRC, DST, (F.col("_w") * (1.0 + jitter)).alias("_w"))
        jitter_v = (
            F.pmod(F.xxhash64("vertex", F.lit(random_state + i)), F.lit(1000)).cast("double")
            / 1e9
        )
        deg_i = deg0.select(
            "vertex", (F.col("_k0") * (1.0 + jitter_v)).alias("_k"), "_nl"
        )
        # canonical=False: the vote only compares label EQUALITY within
        # one member's assignment, so the min-member relabel is skipped
        assign, _ = _one_level(
            jittered, resolution, 3, threshold,
            compute_q=False, canonical=False, precomputed_iso=iso_arg,
            precomputed_deg=(deg_i, n_verts0, n_iso),
        )
        co = (
            base.select(SRC, DST)
            .join(assign.select(F.col("vertex").alias(SRC), F.col("community").alias("_ca")), SRC)
            .join(assign.select(F.col("vertex").alias(DST), F.col("community").alias("_cb")), DST)
            .select(SRC, DST, (F.col("_ca") == F.col("_cb")).cast("int").alias("_co"))
        )
        # votes accumulate LAZILY over the checkpointed member assigns —
        # one E-sized checkpoint at the end instead of one per member
        # (lineage depth = ensemble_size joins over checkpointed inputs)
        votes = (
            votes.join(co, [SRC, DST])
            .select(SRC, DST, (F.col("_votes") + F.col("_co")).alias("_votes"))
        )
      votes = iterloop.materialize(votes)
      deg0.unpersist()

    reweighted = votes.select(
        SRC, DST,
        (F.lit(min_weight) + (1.0 - min_weight) * F.col("_votes") / ensemble_size).alias(
            "weight"
        ),
    )
    ext = G.unrenumber(G.unrenumber(reweighted, SRC), DST)
    g2 = Graph(directed=False)
    g2.from_edgelist(ext, SRC, DST, weight="weight", symmetrize=False)
    return louvain(g2, max_level=max_level, max_iter=max_iter,
                   resolution=resolution, threshold=threshold)
