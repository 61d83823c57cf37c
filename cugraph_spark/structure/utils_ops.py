"""Small structural operators.

Reference citations per function below (SURVEY §2.A rows: relabel,
replicate_edgelist, remove_multi_edges, remove_self_loops,
count_multi_edges, coarsen_graph, transpose_graph, edge-id lookup,
renumber_arbitrary_edgelist).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST, WEIGHT, EDGE_ID, EDGE_TYPE
from .graph import Graph


def relabel(df: DataFrame, mapping: DataFrame, cols: list[str]) -> DataFrame:
    """Apply old->new label pairs (C++ structure/relabel_impl.cuh).
    mapping: (old, new)."""
    out = df
    for c in cols:
        out = (
            out.join(mapping.select(F.col("old").alias(c), F.col("new").alias(f"_n_{c}")), c, "left")
            .withColumn(c, F.coalesce(f"_n_{c}", F.col(c)))
            .drop(f"_n_{c}")
        )
    return out


def replicate_edgelist(
    edgelist_ddf: DataFrame = None,
    source: str = "src",
    destination: str = "dst",
    weight: str | None = None,
    edge_id: str | None = None,
    edge_type: str | None = None,
) -> DataFrame:
    """structure/replicate_edgelist.py:154 — make the edge list available
    on every worker. In Spark that is a broadcast hint, not a copy; the
    column-name kwargs select/rename to the canonical layout first, as
    the reference's signature does."""
    cols = [F.col(source).alias(SRC), F.col(destination).alias(DST)]
    for name, canon in ((weight, "weight"), (edge_id, "edge_id"), (edge_type, "edge_type")):
        if name is not None:
            cols.append(F.col(name).alias(canon))
    if (source, destination) == (SRC, DST) and weight is edge_id is edge_type is None:
        return F.broadcast(edgelist_ddf)  # already canonical: keep all columns
    return F.broadcast(edgelist_ddf.select(*cols))


def remove_self_loops(edges: DataFrame) -> DataFrame:
    """C++ structure/remove_self_loops_impl.cuh."""
    return edges.filter(F.col(SRC) != F.col(DST))


def remove_multi_edges(edges: DataFrame, keep_min_weight: bool = True) -> DataFrame:
    """C++ structure/remove_multi_edges_impl.cuh; keep-min-weight matches
    symmetrize's dedup policy (structure/symmetrize.py:74-77)."""
    if WEIGHT in edges.columns and keep_min_weight:
        others = [c for c in edges.columns if c not in (SRC, DST)]
        return edges.groupBy(SRC, DST).agg(*[F.min(c).alias(c) for c in others])
    return edges.dropDuplicates([SRC, DST])


def count_multi_edges(edges: DataFrame) -> int:
    """c_api graph_functions.h count_multi_edges: number of edges beyond
    the first per (src, dst) pair."""
    row = (
        edges.groupBy(SRC, DST)
        .agg(F.count("*").alias("c"))
        .agg(F.sum(F.col("c") - 1))
        .collect()[0][0]
    )
    return int(row or 0)


def coarsen_graph(G: Graph, labels: DataFrame) -> DataFrame:
    """C++ structure/coarsen_graph_impl.cuh — contract vertices by label
    (Louvain's inner step). labels: (vertex, label) external ids. Returns
    contracted weighted edge list (src, dst, weight)."""
    lab = G.renumber_vertices(labels.select("vertex", "label"), "vertex")
    w = F.col(WEIGHT) if G.is_weighted() else F.lit(1.0)
    e = G.edgelist.select(SRC, DST, w.alias("_w"))
    out = (
        e.join(lab.select(F.col("vertex").alias(SRC), F.col("label").alias("_ls")), SRC)
        .join(lab.select(F.col("vertex").alias(DST), F.col("label").alias("_ld")), DST)
        .groupBy(F.col("_ls").alias(SRC), F.col("_ld").alias(DST))
        .agg(F.sum("_w").alias(WEIGHT))
    )
    return out


def transpose_graph(G: Graph) -> Graph:
    """C++ structure/transpose_graph_impl.cuh — reverse all edges. No
    physical work: a projection swap."""
    from ..traversal.bfs import _transposed

    return _transposed(G)


def edge_id_lookup(G: Graph, edge_ids: list[int], edge_type: int) -> DataFrame:
    """pylibcugraph/edge_id_lookup_table.pyx / lookup_src_dst_impl.cuh:
    (edge_id, edge_type) -> (src, dst). A plain join."""
    if EDGE_ID not in G.edgelist.columns:
        raise ValueError("graph has no edge_id column")
    e = G.edgelist.filter(F.col(EDGE_TYPE) == edge_type) if EDGE_TYPE in G.edgelist.columns else G.edgelist
    out = e.filter(F.col(EDGE_ID).isin(edge_ids)).select(EDGE_ID, SRC, DST)
    out = G.unrenumber(out, SRC)
    return G.unrenumber(out, DST)


def renumber_arbitrary_edgelist(edges: DataFrame, mapping: DataFrame) -> DataFrame:
    """pylibcugraph/renumber_arbitrary_edgelist.pyx — renumber with a
    user-fixed external->internal mapping: two joins."""
    m = mapping.select(F.col(mapping.columns[0]).alias("_ext"), F.col(mapping.columns[1]).alias("_int"))
    out = (
        edges.join(m.withColumnRenamed("_ext", SRC), SRC)
        .withColumn(SRC, F.col("_int"))
        .drop("_int")
        .join(m.withColumnRenamed("_ext", DST), DST)
        .withColumn(DST, F.col("_int"))
        .drop("_int")
    )
    return out


def sample_groups(df: DataFrame, by: str, n_samples: int, seed: int = 42) -> DataFrame:
    """Up to ``n_samples`` rows per ``by`` group (utilities/utils.py:398).

    The reference shuffles then ranks within groups; here the shuffle is
    a deterministic xxhash64 order over all columns (physical-layout
    independence, the engine-wide PRNG policy), and the rank is a
    windowed row_number — one shuffle on the group key. ``n_samples=-1``
    returns the input unchanged, as the reference does.
    """
    if n_samples == -1:
        return df
    from pyspark.sql import Window

    order = [F.xxhash64(*[F.col(c) for c in df.columns], F.lit(seed))] + [
        F.col(c) for c in df.columns
    ]
    w = Window.partitionBy(by).orderBy(*order)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_samples)
        .drop("_rn")
    )
