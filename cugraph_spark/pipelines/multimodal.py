"""Multimodal (image/audio/video) column plumbing.

Beyond-reference (SURVEY §7 Phase 4). Binary payloads ride as opaque
``binary`` columns with typed metadata; decode / feature-extraction /
resize / frame-sampling run as Arrow-batched ``mapInPandas`` stages.

The actual codecs (PIL/ffmpeg/torchaudio) are NOT in this container, so
the decode kernels are STUBBED — clearly marked below — behind a
deterministic fake driven by the payload bytes, keeping every Spark-side
contract real and testable: schemas, batch iteration, partitioning, and
UDF signatures are exactly what a codec-backed deployment would use (swap
``_decode_image_stub`` for a real decoder and nothing else changes).
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T


IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("format", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("feature", T.ArrayType(T.FloatType()), True),
    ]
)


def _decode_image_stub(payload: bytes) -> tuple[int, int, str]:
    """STUB: deterministic fake decode (no image libs in container).

    A real deployment replaces this body with e.g. PIL.Image.open —
    signature and caller stay identical. The fake derives (width, height,
    format) from a stable digest of the bytes.
    """
    d = hashlib.md5(payload or b"").digest()
    return 16 + d[0] % 1024, 16 + d[1] % 1024, ["jpeg", "png", "webp"][d[2] % 3]


def _feature_stub(payload: bytes, dim: int = 8) -> list[float]:
    """STUB: deterministic fake embedding from payload bytes (stands in
    for a vision encoder)."""
    d = hashlib.sha256(payload or b"").digest()
    return [round(b / 255.0, 6) for b in d[:dim]]


def decode_images(
    df: DataFrame, id_col: str = "media_id", payload_col: str = "payload", feature_dim: int = 8
) -> DataFrame:
    """binary payloads -> typed metadata + feature vector via Arrow-batched
    mapInPandas (the real plumbing; decode kernel stubbed)."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf[id_col], pdf[payload_col]):
                raw = bytes(payload) if payload is not None else b""
                w, h, fmt = _decode_image_stub(raw)
                rows.append(
                    {
                        "media_id": int(mid),
                        "width": w,
                        "height": h,
                        "format": fmt,
                        "n_bytes": len(raw),
                        "feature": _feature_stub(raw, feature_dim),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields])

    return df.select(id_col, payload_col).mapInPandas(batches, IMAGE_META_SCHEMA)


def resize_images(df: DataFrame, max_side: int, width_col: str = "width", height_col: str = "height") -> DataFrame:
    """Pure-expression resize planning: target dims preserving aspect
    ratio (the byte-level resample would live in the decode kernel)."""
    scale = F.least(
        F.lit(1.0), F.lit(max_side) / F.greatest(F.col(width_col), F.col(height_col))
    )
    return df.withColumn("target_width", F.ceil(F.col(width_col) * scale).cast("int")).withColumn(
        "target_height", F.ceil(F.col(height_col) * scale).cast("int")
    )


def sample_video_frames(
    df: DataFrame,
    id_col: str = "media_id",
    duration_col: str = "duration_s",
    fps: float = 1.0,
) -> DataFrame:
    """One row per sampled frame timestamp: (media_id, frame_idx, ts_s).
    Frame extraction itself would run in the decode kernel; the explode
    keeps per-frame rows distributed."""
    n = F.greatest(F.floor(F.col(duration_col) * fps).cast("int"), F.lit(1))
    return df.select(
        F.col(id_col),
        F.explode(F.sequence(F.lit(0), n - 1)).alias("frame_idx"),
    ).withColumn("ts_s", F.round(F.col("frame_idx") / fps, 6))
