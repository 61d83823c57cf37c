"""Hypergraph transform: tabular rows -> bipartite / direct graph.

Reference: structure/hypergraph.py:33-545 (the Graphistry transform):
one node per row ("event") plus one node per unique (column, value);
edges event->value for every selected column; ``direct=True`` instead
connects the value nodes of each row pairwise, skipping event nodes.

Spark mapping (SURVEY §1.4): melt via explode of a struct array +
``concat_ws`` composite string ids — pure DataFrame ops, linear, one
shuffle for the dedup of entity nodes. Event ids default to a content
hash (md5 of all selected values) so the transform is deterministic
without a global row_number.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, functions as F

from .graph import Graph

DELIM = "::"


def hypergraph(
    values: DataFrame,
    columns: Optional[Sequence[str]] = None,
    dropna: bool = True,
    direct: bool = False,
    graph_attributes: Optional[dict] = None,
    event_id_col: Optional[str] = None,
) -> dict:
    """Returns {'graph': Graph, 'nodes': DF, 'edges': DF, 'events': DF,
    'entities': DF} (the reference returns the same bundle)."""
    cols = list(columns) if columns else list(values.columns)
    for c in cols:
        if c not in values.columns:
            raise ValueError(f"column {c!r} not in DataFrame")

    if event_id_col and event_id_col in values.columns:
        evid = F.concat(F.lit("event" + DELIM), F.col(event_id_col).cast("string"))
    else:
        evid = F.concat(
            F.lit("event" + DELIM),
            F.md5(F.concat_ws("\x1f", *[F.col(c).cast("string") for c in values.columns])),
        )
    df = values.withColumn("_event_id", evid)

    # melt: (event_id, column, value)
    pairs = F.array(
        *[
            F.struct(F.lit(c).alias("col"), F.col(c).cast("string").alias("val"))
            for c in cols
        ]
    )
    melted = df.select("_event_id", F.explode(pairs).alias("_p")).select(
        "_event_id", F.col("_p.col").alias("col"), F.col("_p.val").alias("val")
    )
    if dropna:
        melted = melted.filter(F.col("val").isNotNull())
    melted = melted.withColumn(
        "entity_id", F.concat(F.col("col"), F.lit(DELIM), F.col("val"))
    )

    entities = melted.select(F.col("entity_id").alias("node_id"), "col", "val").distinct()
    events = df.select(F.col("_event_id").alias("node_id")).distinct()

    if direct:
        a = melted.select("_event_id", F.col("entity_id").alias("src"), F.col("col").alias("_ca"))
        b = melted.select("_event_id", F.col("entity_id").alias("dst"), F.col("col").alias("_cb"))
        edges = (
            a.join(b, "_event_id")
            .filter(F.col("src") < F.col("dst"))
            .select("src", "dst")
            .distinct()
        )
        nodes = entities
    else:
        edges = melted.select(
            F.col("_event_id").alias("src"), F.col("entity_id").alias("dst")
        ).distinct()
        nodes = events.select("node_id").unionByName(entities.select("node_id"))

    g = Graph(directed=True)
    g.from_edgelist(edges, "src", "dst")
    return {
        "graph": g,
        "nodes": nodes,
        "edges": edges,
        "events": events,
        "entities": entities,
    }
