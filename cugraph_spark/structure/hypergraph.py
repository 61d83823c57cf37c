"""Hypergraph transform: tabular rows -> bipartite / direct graph.

Reference: structure/hypergraph.py:33-545 (the Graphistry transform):
one node per row ("event") plus one node per unique (column, value);
edges attrib->event for every selected column; ``direct=True`` instead
connects the value nodes of each row pairwise (column-chain shape by
default, ``EDGES`` to restrict), skipping event nodes.

Spark mapping (SURVEY §1.4): melt via explode of a struct array +
``concat_ws`` composite string ids — pure DataFrame ops, linear, one
shuffle for the dedup of entity nodes. Deviation from the reference
(documented): event ids default to a content hash (md5 of all row
values) instead of a sequential RangeIndex — deterministic without a
global row_number shuffle, the 100-TB-safe choice; pass an existing
``EVENTID`` column (or ``event_id_col``) for explicit ids. The bundle
is returned as a dict (the reference returns a positional 5-tuple
``(nodes, edges, graph, events, entities)``).
``categorical_metadata`` is accepted and ignored: cuDF categorical
dtypes are a GPU memory optimization; Spark strings are dictionary-
encoded by parquet/Tungsten already.
"""

from __future__ import annotations

from functools import reduce
from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from .graph import Graph

DELIM = "::"


def _entity_val(col: str, dropna: bool):
    v = F.col(col).cast("string")
    return v if dropna else F.coalesce(v, F.lit("null"))


def hypergraph(
    values: DataFrame,
    columns: Optional[Sequence[str]] = None,
    dropna: bool = True,
    direct: bool = False,
    graph_class=None,
    categories: Optional[dict] = None,
    drop_edge_attrs: bool = False,
    categorical_metadata: bool = False,
    SKIP: Optional[Sequence[str]] = None,
    EDGES: Optional[dict] = None,
    DELIM: str = DELIM,
    SOURCE: str = "src",
    TARGET: str = "dst",
    WEIGHTS: Optional[str] = None,
    NODEID: str = "node_id",
    EVENTID: str = "event_id",
    ATTRIBID: str = "attrib_id",
    CATEGORY: str = "category",
    NODETYPE: str = "node_type",
    EDGETYPE: str = "edge_type",
    event_id_col: Optional[str] = None,
) -> dict:
    """Returns {'graph': Graph, 'nodes': DF, 'edges': DF, 'events': DF,
    'entities': DF} (reference signature hypergraph.py:33-53; column
    pairing, naming knobs, SKIP/EDGES/categories semantics match the
    reference builders _create_hyper_edges/_create_direct_edges)."""
    categories = categories or {}
    cols = sorted(
        list(columns)
        if columns is not None
        else [c for c in values.columns if SKIP is None or c not in SKIP]
    )
    for c in cols:
        if c not in values.columns:
            raise ValueError(f"column {c!r} not in DataFrame")

    # event id: explicit column if present, else deterministic content hash
    id_src = event_id_col or (EVENTID if EVENTID in values.columns else None)
    if id_src:
        raw_id = F.col(id_src).cast("string")
    else:
        raw_id = F.md5(
            F.concat_ws("\x1f", *[F.col(c).cast("string") for c in values.columns])
        )
    df = values.withColumn("_event_id", F.concat(F.lit(EVENTID + DELIM), raw_id))
    # the id-source column would collide with the EVENTID output column
    attr_cols = [c for c in values.columns if c != id_src]

    def cat_of(c: str) -> str:
        return categories.get(c, c)

    def entity_id(c: str):
        return F.concat(F.lit(cat_of(c) + DELIM), _entity_val(c, dropna))

    # entity nodes: one frame per column, unioned by name (reference
    # _create_entity_nodes: NODEID, CATEGORY=cat, NODETYPE=col, value col)
    ent_frames = []
    for c in cols:
        f = df
        if dropna:
            f = f.filter(F.col(c).isNotNull())
        ent_frames.append(
            f.select(
                entity_id(c).alias(NODEID),
                F.lit(cat_of(c)).alias(CATEGORY),
                F.lit(c).alias(NODETYPE),
                _entity_val(c, dropna).alias(c),
            ).distinct()
        )
    entities = reduce(
        lambda a, b: a.unionByName(b, allowMissingColumns=True), ent_frames
    )

    events_nodes = df.select(
        F.col("_event_id").alias(NODEID),
        F.lit("event").alias(CATEGORY),
        F.lit("event").alias(NODETYPE),
    ).distinct()

    keep_attrs = [] if drop_edge_attrs else attr_cols
    w_col = WEIGHTS if (WEIGHTS in keep_attrs if WEIGHTS else False) else None

    if direct:
        # column-chain pairing by default (hypergraph.py _create_direct_edges:
        # edge_shape[name] = columns[i+1:]), EDGES dict to restrict
        shape = EDGES
        if shape is None:
            shape = {c: cols[i + 1:] for i, c in enumerate(cols)}
        else:
            shape = {
                k: ([v] if isinstance(v, str) else sorted(v)) for k, v in shape.items()
            }
        e_frames = []
        for k1 in sorted(shape):
            for k2 in shape[k1]:
                f = df
                if dropna:
                    f = f.filter(F.col(k1).isNotNull() & F.col(k2).isNotNull())
                sel = [
                    F.col("_event_id").alias(EVENTID),
                    F.lit(cat_of(k1) + DELIM + cat_of(k2)).alias(EDGETYPE),
                    entity_id(k1).alias(SOURCE),
                    entity_id(k2).alias(TARGET),
                ]
                if categories:
                    sel.append(F.lit(k1 + DELIM + k2).alias(CATEGORY))
                sel += [F.col(a) for a in keep_attrs]
                e_frames.append(f.select(*sel))
        edges = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), e_frames)
        nodes = entities
        events_out = events_nodes.limit(0)
        src_col, dst_col = SOURCE, TARGET
    else:
        e_frames = []
        for c in cols:
            f = df
            if dropna:
                f = f.filter(F.col(c).isNotNull())
            sel = [
                F.col("_event_id").alias(EVENTID),
                F.lit(cat_of(c)).alias(EDGETYPE),
                entity_id(c).alias(ATTRIBID),
            ]
            if categories:
                sel.append(F.lit(c).alias(CATEGORY))
            sel += [F.col(a) for a in keep_attrs]
            e_frames.append(f.select(*sel))
        edges = reduce(lambda a, b: a.unionByName(b, allowMissingColumns=True), e_frames)
        nodes = entities.select(NODEID, CATEGORY, NODETYPE).unionByName(events_nodes)
        events_out = events_nodes
        # reference: SOURCE = ATTRIBID, TARGET = EVENTID in hyper mode
        src_col, dst_col = ATTRIBID, EVENTID

    if graph_class is None:
        g = Graph(directed=True)
    elif isinstance(graph_class, Graph):
        g = graph_class
    else:
        g = graph_class()
    g.from_edgelist(edges, source=src_col, destination=dst_col, weight=w_col)
    return {
        "graph": g,
        "nodes": nodes,
        "edges": edges,
        "events": events_out,
        "entities": entities,
    }
