"""Multimodal (image/audio/video) column plumbing.

Media are opaque ``binary`` payload columns + a typed metadata struct —
the Spark-side schema, partitioning, UDF signatures, and Arrow batch
shapes are real and tested; the actual codec calls are stubbed because no
image/audio library ships in this container. Each decode seam is one
clearly-marked function: swap ``_decode_image_stub`` for a PIL/ffmpeg call
and nothing else changes.

Design rules for 100 TB of media:
- payloads never enter a shuffle: feature extraction runs ``mapInPandas``
  on the scan, emitting only small feature rows;
- batch size is bounded by ``spark.sql.execution.arrow.maxRecordsPerBatch``
  (payload rows are huge — set it low for media tables);
- deterministic "fake decode" (byte-histogram features) keeps the whole
  pipeline testable end-to-end without codecs.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),      # image | audio | video
        StructField("payload", BinaryType()),
        StructField(
            "meta",
            StructType(
                [
                    StructField("mime", StringType()),
                    StructField("width", IntegerType()),
                    StructField("height", IntegerType()),
                    StructField("duration_ms", IntegerType()),
                ]
            ),
        ),
    ]
)

FEATURE_DIM = 32


def _decode_image_stub(payload: bytes) -> np.ndarray:
    """DECODE SEAM — replace with a real codec (PIL.Image.open etc.).

    Raises NotImplementedError if real decoding is requested; the
    deterministic fake (byte histogram, 32 bins, L1-normalized) keeps the
    plumbing testable."""
    try:
        import PIL.Image  # noqa: F401

        raise NotImplementedError(
            "real image decode not wired; container has no codec libs"
        )
    except ImportError:
        pass
    if payload is None or len(payload) == 0:
        return np.zeros(FEATURE_DIM, dtype=np.float64)
    arr = np.frombuffer(payload, dtype=np.uint8)
    hist, _ = np.histogram(arr, bins=FEATURE_DIM, range=(0, 256))
    total = hist.sum()
    return (hist / total if total else hist).astype(np.float64)


def extract_features(media: DataFrame, batch_limit: int = 64) -> DataFrame:
    """media → (media_id, kind, feature: array<double>, n_bytes).

    One ``mapInPandas`` pass; payloads are dropped before any shuffle."""
    out_schema = StructType(
        [
            StructField("media_id", LongType()),
            StructField("kind", StringType()),
            StructField("feature", ArrayType(DoubleType())),
            StructField("n_bytes", LongType()),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # bound working set: media rows are big; sub-chunk the batch
            for start in range(0, len(pdf), batch_limit):
                chunk = pdf.iloc[start : start + batch_limit]
                feats = [
                    _decode_image_stub(p).tolist() for p in chunk["payload"]
                ]
                yield pd.DataFrame(
                    {
                        "media_id": chunk["media_id"].to_numpy(),
                        "kind": chunk["kind"].to_numpy(),
                        "feature": feats,
                        "n_bytes": [
                            len(p) if p is not None else 0 for p in chunk["payload"]
                        ],
                    }
                )

    return media.mapInPandas(run, out_schema)


def frame_sample(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """video rows → one row per sampled frame timestamp (schema plumbing;
    frame bytes stubbed as sliced payload windows — deterministic)."""
    frames = media.filter(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.coalesce(F.col("meta.duration_ms"), F.lit(0)) - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("ts_ms"),
        "payload",
    )
    # stub frame extraction: a deterministic 64-byte window per timestamp
    return frames.select(
        "media_id",
        "ts_ms",
        F.substring(
            F.col("payload"), (F.col("ts_ms") % F.lit(997)).cast("int") + 1, 64
        ).alias("frame_bytes"),
    )


def resize_stub(media: DataFrame, width: int, height: int) -> DataFrame:
    """Schema-level resize: updates meta dims, payload passes through the
    decode seam (stub keeps bytes; a real impl re-encodes)."""
    return media.withColumn(
        "meta",
        F.struct(
            F.col("meta.mime").alias("mime"),
            F.lit(width).alias("width"),
            F.lit(height).alias("height"),
            F.col("meta.duration_ms").alias("duration_ms"),
        ),
    )


def synthetic_media_df(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media corpus for tests/benches."""
    import random

    rows = []
    kinds = ("image", "audio", "video")
    for i in range(n):
        rng = random.Random((seed << 16) ^ i)
        kind = kinds[i % 3]
        payload = bytes(rng.randrange(256) for _ in range(128 + (i % 64) * 7))
        rows.append(
            (
                i,
                kind,
                payload,
                {
                    "mime": f"{kind}/x-fake",
                    "width": 64 + i % 32,
                    "height": 48 + i % 24,
                    "duration_ms": 3000 + 100 * (i % 10) if kind == "video" else None,
                },
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
