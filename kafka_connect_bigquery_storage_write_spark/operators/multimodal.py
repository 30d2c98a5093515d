"""Multimodal (image/audio/video) column plumbing for training-data
pipelines.

Media items travel as opaque ``binary`` columns plus typed metadata —
never decoded on the shuffle path. Decode / feature-extract / resize /
frame-sample run as Arrow-batched pandas iterators (mapInPandas) so each
Python worker touches one partition's bytes at a time with bounded memory.

The actual codecs (PIL/ffmpeg/librosa) are NOT available in this
container, so the decode kernels are stubbed: ``decode=None`` uses a
deterministic fake (bytes -> pseudo-features) to keep the Spark-side
contract — schema, batch shape, partition behavior — real and tested;
passing a real decoder swaps the stub without touching the plumbing.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("payload", T.BinaryType(), False),
    ]
)


def _fake_feature_vector(payload: bytes, dim: int) -> list[float]:
    """Deterministic stand-in for a real encoder: hash-seeded unit vector."""
    seed = int.from_bytes(hashlib.sha256(payload).digest()[:8], "big") % (2**32)
    rng = np.random.default_rng(seed)
    v = rng.standard_normal(dim)
    return (v / np.linalg.norm(v)).astype(float).tolist()


def extract_features(
    df: DataFrame,
    dim: int = 64,
    decode: Callable[[bytes], list[float]] | None = None,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """binary payload -> feature vector, via mapInPandas (Arrow batches).

    Output: (media_id, feature: array<double>). The iterator signature is
    the real production shape: batches stream through, nothing accumulates.
    """
    kernel = decode or (lambda b: _fake_feature_vector(bytes(b), dim))
    out_schema = T.StructType(
        [
            T.StructField(id_col, T.LongType(), False),
            T.StructField("feature", T.ArrayType(T.DoubleType()), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "feature": [kernel(p) for p in pdf[payload_col]],
                }
            )

    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    target_w: int,
    target_h: int,
    resize: Callable[[bytes, int, int], bytes] | None = None,
) -> DataFrame:
    """Image resize over mapInPandas. Stub: truncate/pad payload to a
    deterministic pseudo-thumbnail; real impl plugs in PIL at ``resize``."""
    if resize is None:
        def resize(b: bytes, w: int, h: int) -> bytes:  # deterministic fake
            raw = hashlib.sha256(bytes(b) + w.to_bytes(4, "big") + h.to_bytes(4, "big")).digest()
            return raw * max(1, (w * h) // len(raw))

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("width", T.IntegerType(), False),
            T.StructField("height", T.IntegerType(), False),
            T.StructField("payload", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": target_w,
                    "height": target_h,
                    "payload": [resize(p, target_w, target_h) for p in pdf["payload"]],
                }
            )

    return df.filter(F.col("kind") == "image").select("media_id", "payload").mapInPandas(run, schema=out_schema)


def sample_frames(
    df: DataFrame,
    every_ms: int = 1000,
    decode_frames: Callable[[bytes, int], list[bytes]] | None = None,
) -> DataFrame:
    """Video frame sampling: one output row per sampled frame.

    Stub yields duration_ms/every_ms deterministic pseudo-frames; a real
    ffmpeg-backed decoder slots into ``decode_frames``. The exploded
    (media_id, frame_no, frame) shape is what downstream encoders expect.
    """
    if decode_frames is None:
        def decode_frames(b: bytes, n: int) -> list[bytes]:
            return [hashlib.sha256(bytes(b) + i.to_bytes(4, "big")).digest() for i in range(n)]

    out_schema = T.StructType(
        [
            T.StructField("media_id", T.LongType(), False),
            T.StructField("frame_no", T.IntegerType(), False),
            T.StructField("frame", T.BinaryType(), False),
        ]
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, nos, frames = [], [], []
            for _, row in pdf.iterrows():
                n = max(1, int((row["duration_ms"] or every_ms) // every_ms))
                for i, fr in enumerate(decode_frames(row["payload"], n)):
                    ids.append(row["media_id"])
                    nos.append(i)
                    frames.append(fr)
            yield pd.DataFrame({"media_id": ids, "frame_no": nos, "frame": frames})

    return (
        df.filter(F.col("kind") == "video")
        .select("media_id", "duration_ms", "payload")
        .mapInPandas(run, schema=out_schema)
    )


def synthetic_media(spark, n: int = 100, seed: int = 42) -> DataFrame:
    """Deterministic fixture media table (no media files ship with the
    testdata): payload bytes derived from the id, kinds round-robin."""
    kinds = ["image", "audio", "video"]
    rows = []
    for i in range(n):
        kind = kinds[i % 3]
        payload = hashlib.sha256(f"media-{seed}-{i}".encode()).digest() * 4
        rows.append(
            (
                i,
                kind,
                {"image": "image/png", "audio": "audio/wav", "video": "video/mp4"}[kind],
                64 if kind == "image" else None,
                48 if kind == "image" else None,
                5000 if kind in ("audio", "video") else None,
                bytearray(payload),
            )
        )
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
