"""Composed streaming graph maintenance pipeline.

Beyond-reference (SURVEY §2.I — the brief's "streaming ingestion into an
incrementally updated graph" as ONE documented path, not parts):

    events parquet dir (readStream)
      -> exactly-once dedup (dropDuplicatesWithinWatermark on event_id —
         bounded state, duplicates across micro-batches within the
         watermark horizon are dropped)
      -> edge projection (``events_to_edges`` — the same code path batch
         uses)
      -> append sink: the incrementally maintained edge table
      -> ``pagerank_snapshot`` — periodic analytic refresh that reads
         the maintained table as a batch DataFrame, aggregates parallel
         edges, and runs PageRank

Equivalence contract (tested in tests/test_streaming_stateful.py):
PageRank after N micro-batches equals batch PageRank over the deduped
union of the same N batches — the streaming path maintains exactly the
graph the batch path would build.

Scale: the dedup state is bounded by the watermark; the sink is an
append-only parquet table (partition by ingest date in production); the
snapshot reads it back with ordinary predicate/column pruning. Nothing
driver-sided anywhere.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F

from .edge_stream import events_to_edges, incremental_edge_table


def start_graph_pipeline(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema=None,
    watermark: str = "24 hours",
    dedup_keys: Sequence[str] = ("event_id",),
    available_now: bool = True,
    reader_options: Optional[dict] = None,
):
    """Launch the composed stream: events -> dedup -> edges -> maintained
    edge table. Returns the StreamingQuery. ``trigger(availableNow=True)``
    processes everything currently in ``input_dir`` exactly once (the
    checkpoint remembers processed files across calls), which is both the
    test mode and the scheduled-refresh mode. ``reader_options`` passes
    source options through (e.g. ``maxFilesPerTrigger`` to bound
    micro-batch size — availableNow still drains everything, split into
    that many files per batch)."""
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    for k, v in (reader_options or {}).items():
        reader = reader.option(k, v)
    events = reader.parquet(input_dir)
    deduped = (
        events.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .dropDuplicatesWithinWatermark(list(dedup_keys))
    )
    edges = events_to_edges(deduped)
    writer = (
        edges.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def pagerank_snapshot(
    spark: SparkSession, output_dir: str, **pagerank_kwargs
) -> Optional[DataFrame]:
    """Periodic analytic refresh: read the maintained edge table, collapse
    parallel edges (sum of weights), run PageRank. Returns None when the
    stream has not committed anything yet."""
    from .. import Graph, pagerank

    edges = incremental_edge_table(spark, output_dir)
    if edges is None:
        return None
    agg = edges.groupBy("src", "dst").agg(F.sum("weight").alias("weight"))
    g = Graph(directed=True)
    g.from_edgelist(agg, "src", "dst", weight="weight")
    pagerank_kwargs.setdefault("fail_on_nonconvergence", False)
    return pagerank(g, **pagerank_kwargs)
