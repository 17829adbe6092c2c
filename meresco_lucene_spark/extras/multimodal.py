"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata.

The Spark-side contract is real and tested — schemas, partition-friendly
batch iteration, Arrow-batched UDF signatures, deterministic fake
feature extraction — while the actual codec step is STUBBED because this
container ships no image/audio libraries. Each stub either raises
NotImplementedError (decode_image_real) or produces a clearly-marked
deterministic fake (extract_features) so pipelines exercise the full
dataflow shape.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("content", T.BinaryType(), True),
    ]
)

FEATURE_DIM = 16


def synthesize_media(spark, n_rows: int, seed: int = 5) -> DataFrame:
    """Deterministic fake media table (binary payload = seeded bytes)."""

    def gen(it):
        for pdf in it:
            ids = pdf["id"].to_numpy()
            rows = {
                "media_id": ids,
                "kind": [["image", "audio", "video"][int(i) % 3] for i in ids],
                "mime": [
                    ["image/png", "audio/wav", "video/mp4"][int(i) % 3] for i in ids
                ],
                "width": [int(64 + (i % 8) * 16) for i in ids],
                "height": [int(64 + (i % 5) * 16) for i in ids],
                "duration_ms": [int((i % 7) * 1000) for i in ids],
                "content": [
                    hashlib.sha256(f"media|{seed}|{i}".encode()).digest() * 4
                    for i in ids
                ],
            }
            yield pd.DataFrame(rows)

    return spark.range(n_rows).mapInPandas(gen, schema=MEDIA_SCHEMA)


def decode_image_real(content: bytes):  # pragma: no cover - stub
    """STUB: real image decode requires PIL/opencv, absent here."""
    raise NotImplementedError(
        "image decoding requires an imaging library not present in this "
        "environment; wire PIL/torchvision here in production"
    )


def extract_features(df: DataFrame) -> DataFrame:
    """Feature-extraction plumbing over binary media.

    Production would decode + run a vision/audio model per Arrow batch;
    here the 'features' are a deterministic fake (sha256-seeded floats)
    so schema, batching and downstream joins are fully exercised."""

    def per_batch(it):
        for pdf in it:
            feats = []
            for blob in pdf["content"]:
                if blob is None:
                    feats.append([0.0] * FEATURE_DIM)
                    continue
                h = hashlib.sha256(bytes(blob)).digest()
                arr = np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16)
                feats.append((arr.astype(np.float64) / 65535.0).tolist())
            out = pdf[["media_id", "kind"]].copy()
            out["features"] = feats
            yield out

    schema = "media_id long, kind string, features array<double>"
    return df.mapInPandas(per_batch, schema=schema)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling plan: one row per planned frame timestamp
    (the decode itself is the stubbed step). Pure column ops."""
    video = df.filter(F.col("kind") == "video")
    return video.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.greatest(F.col("duration_ms") - 1, F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )


def resize_metadata(df: DataFrame, max_side: int = 256) -> DataFrame:
    """Resize planning (aspect-preserving target dims) as column math;
    the pixel work is the stubbed decode step."""
    scale = F.least(
        F.lit(max_side) / F.col("width"), F.lit(max_side) / F.col("height"), F.lit(1.0)
    )
    return df.select(
        "media_id",
        "width",
        "height",
        F.round(F.col("width") * scale).cast("int").alias("target_w"),
        F.round(F.col("height") * scale).cast("int").alias("target_h"),
    )
