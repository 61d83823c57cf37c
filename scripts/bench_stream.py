"""Streaming throughput probe: sustained micro-batch rate through the
composed graph-maintenance pipeline and the stateful per-vertex path.

Feed: the sf events table replicated REPLICAS x with distinct event_ids,
plus a 10% cross-batch duplicate tail per replica (so the watermarked
dedup state does real work), written as N_FILES parquet files. The
pipeline streams them availableNow with maxFilesPerTrigger=1 — one
micro-batch per file — so the wall clock measures steady-state
micro-batch throughput (source listing + dedup state + edge projection +
parquet sink + checkpoint commit per batch), not one giant batch.

Usage: python scripts/bench_stream.py  [sf_dir]   (default /root/testdata/sf0.1)
Env: SPARK_GRAFT_STREAM_REPLICAS (default 20), SPARK_GRAFT_STREAM_FILES
(default 16), SPARK_GRAFT_CPUS (default 32).

Prints ONE JSON line, bench.py-style.
"""

import json
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import SparkSession, functions as F

sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
replicas = int(os.environ.get("SPARK_GRAFT_STREAM_REPLICAS", "20"))
n_files = int(os.environ.get("SPARK_GRAFT_STREAM_FILES", "16"))
cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")

spark = (
    SparkSession.builder.master(f"local[{cpus}]")
    .appName("bench_stream")
    .config("spark.sql.shuffle.partitions", cpus)
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from cugraph_spark.streaming.edge_stream import events_to_edges  # noqa: E402
from cugraph_spark.streaming.pipeline import (  # noqa: E402
    pagerank_snapshot,
    start_graph_pipeline,
)
from cugraph_spark.streaming.stateful import vertex_stats_stream  # noqa: E402

work = tempfile.mkdtemp(prefix="stream_bench_")
feed_dir = os.path.join(work, "feed")
res = {"metric": "stream_probe", "unit": "sec", "sf_dir": sf_dir,
       "replicas": replicas, "files": n_files}

try:
    # ---- build the feed: replicas x events, one file per traffic hour ----
    # Event time must ADVANCE across micro-batches (file f = hour f of
    # traffic), otherwise the 24h watermark correctly classifies most of a
    # replayed historical range as late and drops it — the first draft of
    # this probe measured exactly that semantic. 10% of each hour's rows
    # are duplicated VERBATIM (same event_id, same ts) into the next
    # hour's file: genuinely cross-micro-batch, one hour late, inside the
    # watermark — the dedup state must drop every one of them.
    events = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
    rep = (
        events.crossJoin(spark.range(replicas).select(F.col("id").alias("_r")))
        .select(
            (F.col("event_id") + F.col("_r") * F.lit(10_000_000_000)).alias(
                "event_id"
            ),
            "user_id", "event_type", "value", "props",
        )
        .withColumn(
            "_f", F.pmod(F.xxhash64("event_id"), F.lit(n_files)).cast("int")
        )
        .withColumn(
            "ts",
            F.expr(
                "timestamp'2026-01-01 00:00:00' + make_interval(0, 0, 0, 0,"
                " _f, 0, pmod(xxhash64(event_id, 42), 3600))"
            ),
        )
    )
    dupes = (
        rep.filter(F.pmod(F.xxhash64("event_id", F.lit(7)), F.lit(10)) == 0)
        .filter(F.col("_f") < n_files - 1)
        .withColumn("_f", F.col("_f") + 1)
    )
    feed = rep.unionByName(dupes).persist()
    n_input = feed.count()
    n_unique = rep.count()
    cols = ["event_id", "ts", "user_id", "event_type", "value", "props"]
    for f in range(n_files):  # ascending mtime = source arrival order
        feed.filter(F.col("_f") == f).select(*cols).coalesce(2).write.mode(
            "append"
        ).parquet(feed_dir)
    feed.unpersist()
    res["input_rows"] = n_input
    res["unique_rows"] = n_unique
    schema = spark.read.parquet(feed_dir).schema

    # ---- composed pipeline: dedup -> edges -> maintained table ----------
    out_dir = os.path.join(work, "edges")
    ckpt = os.path.join(work, "ckpt")
    t0 = time.time()
    q = start_graph_pipeline(
        spark, feed_dir, ckpt, out_dir, schema=schema,
        reader_options={"maxFilesPerTrigger": "1"},
    )
    q.awaitTermination()
    wall = time.time() - t0
    batches = [p for p in q.recentProgress if p and p.get("numInputRows", 0) > 0]
    res["pipeline_wall"] = round(wall, 1)
    res["pipeline_micro_batches"] = len(batches)
    res["pipeline_events_per_s"] = int(n_input / wall)
    maintained = spark.read.parquet(out_dir)
    res["maintained_rows"] = maintained.count()  # == unique if dedup held

    # ---- analytic refresh off the maintained table ----------------------
    t0 = time.time()
    pr = pagerank_snapshot(spark, out_dir, max_iter=10)
    n_pr = pr.count()
    res["snapshot_pagerank"] = round(time.time() - t0, 1)
    res["snapshot_vertices"] = n_pr

    # ---- stateful per-vertex path (applyInPandasWithState) --------------
    ckpt2 = os.path.join(work, "ckpt_state")
    reader = spark.readStream.schema(schema).option("maxFilesPerTrigger", "1")
    edges = events_to_edges(reader.parquet(feed_dir))
    stats = vertex_stats_stream(edges)
    t0 = time.time()
    q2 = (
        stats.writeStream.outputMode("update")
        .format("noop")
        .option("checkpointLocation", ckpt2)
        .trigger(availableNow=True)
        .start()
    )
    q2.awaitTermination()
    wall2 = time.time() - t0
    res["stateful_wall"] = round(wall2, 1)
    res["stateful_events_per_s"] = int(n_input / wall2)
finally:
    shutil.rmtree(work, ignore_errors=True)

print(json.dumps(res))
