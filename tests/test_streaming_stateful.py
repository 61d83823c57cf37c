"""Stateful streaming operators: watermarked streaming dedup and
applyInPandasWithState per-vertex stats."""

import datetime as dt
import os

import pytest
from pyspark.sql import functions as F

from cugraph_spark.streaming.stateful import dedup_stream, vertex_stats_stream

TS = dt.datetime(2026, 1, 1, 12, 0, 0)


def _write_parquet(spark, rows, schema, path):
    os.makedirs(path, exist_ok=True)
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(path)
    return spark.read.parquet(path).schema


def test_dedup_stream(spark, tmp_path):
    rows = [
        (1, "alpha text", TS),
        (2, "alpha text", TS + dt.timedelta(minutes=1)),   # dup of 1
        (3, "beta text", TS + dt.timedelta(minutes=2)),
        (4, "alpha text", TS + dt.timedelta(minutes=3)),   # dup of 1
        (5, "gamma text", TS + dt.timedelta(minutes=4)),
    ]
    in_dir = str(tmp_path / "docs_in")
    schema = _write_parquet(spark, rows, "doc_id long, text string, ts timestamp", in_dir)
    stream = spark.readStream.schema(schema).parquet(in_dir)
    q = (
        dedup_stream(stream)
        .writeStream.format("memory")
        .queryName("dedup_t")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql("SELECT * FROM dedup_t").collect()
    texts = sorted(r["text"] for r in out)
    assert texts == ["alpha text", "beta text", "gamma text"]
    # first occurrence survives
    kept = {r["text"]: r["doc_id"] for r in out}
    assert kept["alpha text"] == 1


def test_vertex_stats_stream(spark, tmp_path):
    rows = [
        (10, 20, 1.0, TS),
        (10, 21, 2.5, TS + dt.timedelta(minutes=5)),
        (11, 20, 4.0, TS + dt.timedelta(minutes=1)),
        (10, 22, 0.5, TS + dt.timedelta(minutes=9)),
    ]
    in_dir = str(tmp_path / "edges_in")
    schema = _write_parquet(
        spark, rows, "src long, dst long, weight double, ts timestamp", in_dir
    )
    stream = spark.readStream.schema(schema).parquet(in_dir)
    q = (
        vertex_stats_stream(stream)
        .writeStream.format("memory")
        .queryName("vstats_t")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.sql(
        "SELECT * FROM vstats_t ORDER BY last_seen"
    ).collect()
    # last emitted row per vertex carries the running totals
    latest = {r["vertex"]: r for r in out}
    v10 = latest[10]
    assert v10["out_degree"] == 3
    assert v10["total_weight"] == pytest.approx(4.0)
    assert v10["first_seen"] == TS
    assert v10["last_seen"] == TS + dt.timedelta(minutes=9)
    v11 = latest[11]
    assert v11["out_degree"] == 1 and v11["total_weight"] == pytest.approx(4.0)
