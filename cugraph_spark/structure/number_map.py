"""External <-> internal vertex id mapping.

Re-expresses the reference's ``NumberMap``
(/root/reference/python/cugraph/cugraph/structure/number_map.py:12,480-599):

- integer single-column ids pass through (cast to long) — *identity* map,
  zero cost, no shuffle (the reference likewise skips real renumbering work
  when ids are already integral and renumber=False is legal);
- non-integer or multi-column ids are *forced* through renumbering
  (number_map.py:513-522): we build a distinct-vertex DataFrame and assign
  dense long ids with ``zipWithIndex`` — fully distributed (one count job +
  one map), no global sort, no single-partition window. Dense longs keep
  the vertex state tables compact for the iterative algorithms.

``unrenumber`` is a join against the map (number_map.py:599) — broadcast
when the map is small, shuffle-hash otherwise (Catalyst/AQE decides).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F, types as T

from ..plans import iterloop

_INTEGRAL_TYPES = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)

INTERNAL = "_internal_id"


def _is_integral(df: DataFrame, cols: Sequence[str]) -> bool:
    fields = {f.name: f.dataType for f in df.schema.fields}
    return all(isinstance(fields[c], _INTEGRAL_TYPES) for c in cols)


class NumberMap:
    """Maps tuples of external id columns to a dense internal long id.

    identity=True means external ids were already a single integral column:
    internal id == external id cast to long, and ``unrenumber`` only
    renames/casts — no join.
    """

    def __init__(
        self,
        map_df: Optional[DataFrame],
        external_cols: Sequence[str],
        external_types: Sequence[T.DataType],
        identity: bool,
    ):
        self.map_df = map_df  # columns: *external_cols, _internal_id
        self.external_cols = list(external_cols)
        self.external_types = list(external_types)
        self.identity = identity

    # -- construction -----------------------------------------------------

    @staticmethod
    def renumber_edgelist(
        edges: DataFrame,
        src_cols: Sequence[str],
        dst_cols: Sequence[str],
        extra_vertices: Optional[DataFrame] = None,
        force: bool = False,
    ) -> tuple[DataFrame, "NumberMap"]:
        """Return (edges with long ``src``/``dst``, NumberMap).

        ``extra_vertices``: optional DataFrame of external ids (same shape
        as src_cols) contributing isolated vertices to the map.
        """
        src_cols, dst_cols = list(src_cols), list(dst_cols)
        if len(src_cols) != len(dst_cols):
            raise ValueError("source and destination column lists differ in length")

        passthrough = [c for c in edges.columns if c not in src_cols + dst_cols]

        if len(src_cols) == 1 and _is_integral(edges, src_cols + dst_cols) and not force:
            fields = {f.name: f.dataType for f in edges.schema.fields}
            out = edges.select(
                F.col(src_cols[0]).cast("long").alias("src"),
                F.col(dst_cols[0]).cast("long").alias("dst"),
                *passthrough,
            )
            nm = NumberMap(None, src_cols, [fields[src_cols[0]]], identity=True)
            return out, nm

        # canonical external column names: one per id component
        ext_names = [f"_ext_{i}" for i in range(len(src_cols))]
        srcs = edges.select(*[F.col(c).alias(n) for c, n in zip(src_cols, ext_names)])
        dsts = edges.select(*[F.col(c).alias(n) for c, n in zip(dst_cols, ext_names)])
        verts = srcs.union(dsts)
        if extra_vertices is not None:
            verts = verts.union(
                extra_vertices.select(
                    *[F.col(c).alias(n) for c, n in zip(extra_vertices.columns, ext_names)]
                )
            )
        verts = verts.distinct()

        # dense ids without a global sort: zipWithIndex is distributed
        # (per-partition offsets from one lightweight count job)
        schema = T.StructType(
            [f for f in verts.schema.fields] + [T.StructField(INTERNAL, T.LongType(), False)]
        )
        map_df = verts.rdd.zipWithIndex().map(lambda pair: (*pair[0], pair[1])).toDF(schema)
        # freeze ids (zipWithIndex is layout-dependent; a recompute after
        # executor loss could permute them) — reliable storage when the
        # cluster knob is set, since the map is consumed again by the
        # final unrenumber
        map_df = iterloop.freeze(map_df)

        fields = {f.name: f.dataType for f in verts.schema.fields}
        nm = NumberMap(map_df, ext_names, [fields[n] for n in ext_names], identity=False)

        out = nm.add_internal_vertex_id(edges, src_cols, "src")
        out = nm.add_internal_vertex_id(out, dst_cols, "dst")
        out = out.select("src", "dst", *passthrough)
        return out, nm

    # -- lookups -----------------------------------------------------------

    def add_internal_vertex_id(
        self, df: DataFrame, ext_cols: Sequence[str], out_col: str
    ) -> DataFrame:
        """Join df's external id columns to the internal id (reference:
        number_map.py:350 ``add_internal_vertex_id``)."""
        ext_cols = list(ext_cols)
        if self.identity:
            return df.withColumn(out_col, F.col(ext_cols[0]).cast("long")).drop(
                *[c for c in ext_cols if c != out_col]
            )
        cond = [df[c] == self.map_df[n] for c, n in zip(ext_cols, self.external_cols)]
        joined = df.join(self.map_df, cond, "inner")
        keep = [c for c in df.columns if c not in ext_cols]
        return joined.select(*keep, F.col(INTERNAL).alias(out_col))

    def to_internal_vertex_ids(self, df: DataFrame, col: str) -> DataFrame:
        """Replace a single external id column with its internal id, keeping
        the column name."""
        if self.identity:
            return df.withColumn(col, F.col(col).cast("long"))
        cond = [df[col] == self.map_df[self.external_cols[0]]]
        keep = [c for c in df.columns if c != col]
        return df.join(self.map_df, cond, "inner").select(
            F.col(INTERNAL).alias(col), *keep
        )

    def unrenumber(self, df: DataFrame, col: str) -> DataFrame:
        """Replace internal id column ``col`` with the external id(s).

        Single-component external ids keep the name ``col``; multi-column
        ids expand to ``{col}_0, {col}_1, ...`` (the reference's convention
        for multi-column vertices, number_map.py:599 region).
        """
        if self.identity:
            return df
        keep = [c for c in df.columns if c != col]
        joined = df.join(self.map_df, df[col] == self.map_df[INTERNAL], "left")
        if len(self.external_cols) == 1:
            return joined.select(F.col(self.external_cols[0]).alias(col), *keep)
        exts = [
            F.col(n).alias(f"{col}_{i}") for i, n in enumerate(self.external_cols)
        ]
        return joined.select(*exts, *keep)

    def vertices_internal(self) -> Optional[DataFrame]:
        """All mapped vertices as a single-column ``vertex`` DataFrame."""
        if self.identity:
            return None
        return self.map_df.select(F.col(INTERNAL).alias("vertex"))
