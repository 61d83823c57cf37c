"""Edge-list symmetrization.

Reference semantics (/root/reference/python/cugraph/cugraph/structure/
symmetrize.py:9,68-75 and _add_reverse_edges :265): an undirected graph is
physically stored with both edge directions; duplicate (src, dst) pairs
after adding reverse edges are collapsed keeping the MINIMUM weight.

Spark mapping: ``union`` of the reversed selection followed by a
``groupBy(src, dst).min(weight)`` — one shuffle on (src, dst), map-side
partial aggregation for free.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from ..constants import SRC, DST, WEIGHT


def add_reverse_edges(edges: DataFrame) -> DataFrame:
    """Append the reversed copy of every edge (keeps other columns)."""
    cols = edges.columns
    swapped = [
        F.col(DST).alias(SRC) if c == SRC else F.col(SRC).alias(DST) if c == DST else F.col(c)
        for c in cols
    ]
    return edges.select(*cols).unionByName(edges.select(*swapped))


def symmetrize(
    df: DataFrame,
    src_name: str = SRC,
    dst_name: str = DST,
    weight_name: str | None = None,
    multi: bool = False,
    symmetrize: bool = True,
) -> DataFrame:
    """Reference-parity entry point over arbitrary column names
    (structure/symmetrize.py:9: ``symmetrize_df(df, src_name, dst_name,
    weight_name=None, multi=False, symmetrize=True)``): add the reverse of
    every edge, then (non-multi) dedup keeping the minimum of each other
    column. Returns the same column names it was given."""
    rename = {src_name: SRC, dst_name: DST}
    if weight_name:
        rename[weight_name] = WEIGHT
    canon = df.select(
        *[F.col(c).alias(rename.get(c, c)) for c in df.columns]
    )
    out = symmetrize_df(canon, multi=multi, dedup=symmetrize)
    back = {v: k for k, v in rename.items()}
    return out.select(*[F.col(c).alias(back.get(c, c)) for c in out.columns])


def symmetrize_df(
    edges: DataFrame,
    src_name: str = SRC,
    dst_name: str = DST,
    weight_name: str | None = None,
    multi: bool = False,
    dedup: bool | None = None,
    symmetrize: bool = True,
) -> DataFrame:
    """Symmetrize an edge list (reference signature:
    ``symmetrize_df(df, src_name, dst_name, weight_name=None, multi=False,
    symmetrize=True)``; ``dedup`` is this module's historical alias for
    ``symmetrize``).

    multi=True (MultiGraph) keeps parallel edges (reference passes
    ``multi`` through and skips the groupby dedup).
    """
    if dedup is not None:
        symmetrize = dedup
    if src_name != SRC or dst_name != DST or weight_name:
        return globals()["symmetrize"](
            edges, src_name, dst_name, weight_name, multi=multi, symmetrize=symmetrize
        )
    both = add_reverse_edges(edges)
    if multi or not symmetrize:
        return both
    if WEIGHT in edges.columns:
        others = [c for c in edges.columns if c not in (SRC, DST)]
        aggs = [F.min(c).alias(c) for c in others]
        return both.groupBy(SRC, DST).agg(*aggs)
    return both.dropDuplicates([SRC, DST])


# reference dask alias (structure/symmetrize.py symmetrize_ddf): Spark
# DataFrames are always distributed, so the ddf form is the df form
symmetrize_ddf = symmetrize_df
