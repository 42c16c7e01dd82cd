"""Multimodal columns: image/audio/video as opaque ``binary`` + typed
metadata; decode / feature-extract / resize / frame-sample as Arrow-batched
``mapInPandas`` stages.

The Spark-side plumbing (schemas, batch iteration, partition-preserving
pass-through, deterministic fake features) is REAL and tested; the actual
codec calls are STUBBED behind ``decode_image_bytes`` raising
NotImplementedError (no image/audio libs in this container) with a
deterministic fake used by default so pipelines are end-to-end runnable.
Swapping in a real decoder = replacing one pure function; the distributed
shape (batch sizes, schema, partitioning) does not change.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BinaryType,
    FloatType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),  # image | audio | video
        StructField("payload", BinaryType()),
        StructField("width", IntegerType()),
        StructField("height", IntegerType()),
        StructField("duration_ms", LongType()),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("kind", StringType()),
        StructField("feature", ArrayType(FloatType())),
        StructField("feat_dim", IntegerType()),
    ]
)


def decode_image_bytes(payload: bytes) -> np.ndarray:
    """REAL decoder stub — no codec libraries in this container."""
    raise NotImplementedError(
        "image decode requires PIL/opencv (not installed); use "
        "fake_decode_features for the deterministic test path"
    )


def fake_decode_features(payload: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic fake 'decoded features': md5-seeded floats in [0,1).
    Stands in for decode→embed so the distributed plumbing is testable."""
    h = hashlib.md5(payload).digest()
    vals = np.frombuffer((h * ((dim * 4) // len(h) + 1))[: dim * 4], dtype=np.uint32)
    return (vals % 10_000).astype(np.float32) / 10_000.0


def synthetic_media(spark, n: int, kind: str = "image") -> DataFrame:
    """Deterministic opaque payloads (md5-derived bytes) + metadata."""
    return spark.range(n).select(
        F.col("id").alias("media_id"),
        F.lit(kind).alias("kind"),
        F.encode(F.md5(F.concat(F.lit("payload"), F.col("id"))), "UTF-8").alias(
            "payload"
        ),
        (F.pmod(F.xxhash64("id", F.lit(1)), 1920) + 1).cast("int").alias("width"),
        (F.pmod(F.xxhash64("id", F.lit(2)), 1080) + 1).cast("int").alias("height"),
        (F.pmod(F.xxhash64("id", F.lit(3)), 60000)).alias("duration_ms"),
    )


def extract_features(media: DataFrame, dim: int = 8, use_real_decoder: bool = False) -> DataFrame:
    """mapInPandas feature extraction: Arrow batches in, feature rows out.
    Batch shape is (n_rows, payload bytes) — numpy per batch, no per-row
    Python at the Spark boundary."""

    def _batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [
                (
                    decode_image_bytes(p) if use_real_decoder else fake_decode_features(p, dim)
                ).tolist()
                for p in pdf["payload"]
            ]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "feature": feats,
                    "feat_dim": dim,
                }
            )

    return media.mapInPandas(_batches, schema=FEATURE_SCHEMA)


def frame_sample_plan(media: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling PLAN: one output row per sampled frame timestamp
    (pure native expressions — the decode of each frame is the stubbed part).
    Demonstrates the explode-by-sequence shape used at scale."""
    return media.where(F.col("kind") == "video").select(
        "media_id",
        F.explode(
            F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))
        ).alias("frame_ts_ms"),
    )
