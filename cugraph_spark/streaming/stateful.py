"""Custom stateful streaming operators.

Beyond-reference (SURVEY §2.I): the reference has no streaming at all;
these cover the two Structured Streaming patterns a training-data
pipeline needs beyond windowed aggregation:

- :func:`dedup_stream` — streaming exact dedup: first occurrence of each
  content hash within the watermark horizon passes, later copies drop.
  Pure built-in ``dropDuplicatesWithinWatermark`` on a watermarked
  stream — Spark evicts a hash's state once the watermark passes its
  event time, so state stays bounded and the query runs forever at
  100 TB/day. (Plain ``dropDuplicates(subset)`` would NOT evict: Spark
  only ages out dropDuplicates state when the event-time column is part
  of the subset, and keying on (hash, ts) would defeat the dedup.)

- :func:`vertex_stats_stream` — per-vertex running degree/weight stats
  via ``applyInPandasWithState`` (Arrow-batched, grouped state): the
  escape hatch for operators whose per-key state genuinely isn't a
  windowed aggregate (here: monotone counters + first/last-seen over an
  unbounded key lifetime, emitted per batch). State per key is O(1);
  keys shard across executors by groupBy hash — the scale path.

Both work identically under ``trigger(availableNow=True)`` for
batch-ish replays and tests.
"""

from __future__ import annotations

from typing import Iterable

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    DoubleType,
    LongType,
    StructField,
    StructType,
    TimestampType,
)


def dedup_stream(
    docs: DataFrame,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "24 hours",
) -> DataFrame:
    """Streaming exact dedup: keeps the first occurrence of each md5
    content hash; duplicates arriving within the watermark horizon are
    dropped, and state for hashes older than the watermark is evicted
    (bounded memory — the property that makes this run unbounded).

    Uses ``dropDuplicatesWithinWatermark`` so eviction actually happens
    without putting the event-time column in the dedup key: duplicates
    whose event times fall within one watermark delay of the first
    occurrence are guaranteed dropped; copies arriving after the state
    expired re-emit (the standard bounded-state trade-off).

    Same content-hash rule as the batch ``pipelines.dedup
    .exact_duplicates``; a doc deduped here hashes identically there.
    """
    hashed = docs.withColumn("_content_hash", F.md5(F.col(text_col)))
    return (
        hashed.withWatermark(ts_col, watermark)
        .dropDuplicatesWithinWatermark(["_content_hash"])
    )


_VERTEX_STATS_SCHEMA = StructType(
    [
        StructField("vertex", LongType()),
        StructField("out_degree", LongType()),
        StructField("total_weight", DoubleType()),
        StructField("first_seen", TimestampType()),
        StructField("last_seen", TimestampType()),
    ]
)

_VERTEX_STATE_SCHEMA = StructType(
    [
        StructField("out_degree", LongType()),
        StructField("total_weight", DoubleType()),
        StructField("first_seen", TimestampType()),
        StructField("last_seen", TimestampType()),
    ]
)


def _update_vertex_stats(
    key, pdfs: Iterable[pd.DataFrame], state: GroupState
) -> Iterable[pd.DataFrame]:
    """Per-vertex state update: fold this batch's edges into the running
    counters and emit one updated row. Runs executor-side over Arrow
    batches; state round-trips through the state store."""
    deg, wt, first, last = (
        state.get if state.exists else (0, 0.0, None, None)
    )
    for pdf in pdfs:
        deg += len(pdf)
        wt += float(pdf["weight"].sum())
        lo, hi = pdf["ts"].min(), pdf["ts"].max()
        first = lo if first is None or lo < first else first
        last = hi if last is None or hi > last else last
    state.update((deg, wt, first, last))
    yield pd.DataFrame(
        {
            "vertex": [key[0]],
            "out_degree": [deg],
            "total_weight": [wt],
            "first_seen": [first],
            "last_seen": [last],
        }
    )


def vertex_stats_stream(edges: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Running per-vertex out-degree / weight-sum / first- and last-seen
    over a (src, dst, weight, ts) edge stream — the incremental
    degree-table a continuously-ingested graph needs.

    ``applyInPandasWithState``: grouped map with explicit per-key state
    (SURVEY §2.I custom stateful operator path). Output mode "update":
    each micro-batch emits rows only for vertices it touched.
    """
    return (
        edges.withWatermark("ts", watermark)
        .groupBy("src")
        .applyInPandasWithState(
            _update_vertex_stats,
            outputStructType=_VERTEX_STATS_SCHEMA,
            stateStructType=_VERTEX_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
