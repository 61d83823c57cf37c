"""Structured Streaming ingestion into an incrementally-maintained graph.

Beyond-reference (SURVEY §2.I: the reference has temporal *columns* but no
streaming; our `events` test table models an edge stream). Pattern:

    readStream (parquet/json dir or rate source)
      -> events_to_edges projection (same code path as batch)
      -> watermarked windowed aggregation of edge weights
      -> writeStream to a parquet edge table (append) or in-memory sink

The maintained table is the standard "edge list + updated weights"
incremental graph: downstream Graph.from_edgelist reads it as a batch
DataFrame at any time. ``trigger(availableNow=True)`` gives exactly-once
batch-ish refresh semantics for tests and scheduled jobs.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F


def events_to_edges(events: DataFrame) -> DataFrame:
    """Project the events table into temporal edges:
    user --(event_type)--> type-node, weighted by value, timestamped.
    Works identically for batch and streaming DataFrames."""
    # type-node ids via an engine-portable hash (md5 prefix, same formula
    # DuckDB/any ANSI engine can compute) rather than Spark-only xxhash64,
    # so downstream tables are reproducible outside Spark
    type_node = F.conv(F.substring(F.md5("event_type"), 1, 7), 16, 10).cast("long")
    return events.select(
        F.col("user_id").alias("src"),
        type_node.alias("dst"),
        F.col("event_type").alias("edge_label"),
        F.coalesce(F.col("value"), F.lit(1.0)).alias("weight"),
        # watermarks require TIMESTAMP (with tz), not TIMESTAMP_NTZ
        F.col("ts").cast("timestamp").alias("ts"),
    )


def windowed_edge_weights(
    edges: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked per-window edge weight aggregation (late data beyond
    the watermark is dropped — Structured Streaming's contract)."""
    return (
        edges.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "src", "dst", "edge_label")
        .agg(F.sum("weight").alias("weight"), F.count("*").alias("n_events"))
        .select(
            F.col("w.start").alias("window_start"),
            "src", "dst", "edge_label", "weight", "n_events",
        )
    )


def start_edge_stream(
    spark: SparkSession,
    input_dir: str,
    checkpoint_dir: str,
    output_dir: str,
    schema=None,
    window: str = "1 hour",
    watermark: str = "2 hours",
    available_now: bool = True,
):
    """Launch the ingestion stream: parquet-dir source -> windowed edge
    weights -> parquet sink. Returns the StreamingQuery."""
    reader = spark.readStream
    if schema is not None:
        reader = reader.schema(schema)
    events = reader.parquet(input_dir)
    out = windowed_edge_weights(events_to_edges(events), window, watermark)
    writer = (
        out.writeStream.outputMode("append")
        .format("parquet")
        .option("path", output_dir)
        .option("checkpointLocation", checkpoint_dir)
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def incremental_edge_table(
    spark: SparkSession, output_dir: str
) -> Optional[DataFrame]:
    """Read the maintained edge table back as a batch DataFrame (returns
    None when nothing has been committed yet)."""
    try:
        return spark.read.parquet(output_dir)
    except Exception:
        return None
