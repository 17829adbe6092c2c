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


class MediaDecoder:
    """Pluggable decode step — the injection point for production codecs.

    Subclass and implement ``decode`` (bytes → numpy array: pixels for
    images, samples for audio, stacked frames for video); the pipeline
    around it (schema, Arrow batching, featurization, downstream joins)
    never changes. Instances are pickled into the ``mapInPandas``
    closure, so keep them stateless/picklable (open lazy handles inside
    ``decode``, not in ``__init__``)."""

    def decode(self, kind: str, mime: str | None, content: bytes) -> np.ndarray:
        raise NotImplementedError


class LibraryDecoder(MediaDecoder):
    """STUB default for real decoding: requires PIL/opencv/ffmpeg, none of
    which ship in this environment. Production wires them in a subclass
    without touching any pipeline code."""

    def decode(self, kind, mime, content):  # pragma: no cover - stub
        raise NotImplementedError(
            "real media decoding requires an imaging/audio library not "
            "present in this environment; subclass MediaDecoder and wire "
            "PIL/torchvision/ffmpeg here in production"
        )


class FakeDecoder(MediaDecoder):
    """Pure-numpy deterministic fake decoder for tests: tiles the payload
    bytes into an 8×8 float frame in [0,1]. Exercises the decoded-array
    path end-to-end with zero external deps."""

    side = 8

    def decode(self, kind, mime, content):
        arr = np.frombuffer(bytes(content), dtype=np.uint8)
        n = self.side * self.side
        return np.resize(arr, n).reshape(self.side, self.side).astype(np.float64) / 255.0


def decode_image_real(content: bytes):  # pragma: no cover - stub
    """STUB: real image decode requires PIL/opencv, absent here.
    Kept for API compatibility; prefer LibraryDecoder."""
    return LibraryDecoder().decode("image", None, content)


def extract_features(df: DataFrame, decoder: MediaDecoder | None = None) -> DataFrame:
    """Feature-extraction plumbing over binary media.

    With ``decoder=None`` (this environment's default) the 'features' are
    a deterministic fake (sha256-seeded floats) so schema, batching and
    downstream joins are fully exercised without any codec. With a
    ``MediaDecoder``, each blob is decoded to an array and mean-pooled
    into FEATURE_DIM buckets — production swaps in a real codec +
    vision/audio model per Arrow batch via the decoder, pipeline
    unchanged."""

    def per_batch(it):
        for pdf in it:
            feats = []
            for kind, mime, blob in zip(pdf["kind"], pdf["mime"], pdf["content"]):
                if blob is None:
                    feats.append([0.0] * FEATURE_DIM)
                    continue
                if decoder is None:
                    h = hashlib.sha256(bytes(blob)).digest()
                    arr = np.frombuffer(h[: FEATURE_DIM * 2], dtype=np.uint16)
                    feats.append((arr.astype(np.float64) / 65535.0).tolist())
                else:
                    decoded = decoder.decode(kind, mime, bytes(blob)).ravel()
                    pooled = np.resize(decoded, FEATURE_DIM * max(1, len(decoded) // FEATURE_DIM))
                    feats.append(pooled.reshape(FEATURE_DIM, -1).mean(axis=1).tolist())
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
