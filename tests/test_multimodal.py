"""Multimodal plumbing tests: schema contract, Arrow batch shape,
determinism of the stubbed kernels, and partition behavior."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.operators.multimodal import (
    extract_features,
    resize_images,
    sample_frames,
    synthetic_media,
)
from kafka_connect_bigquery_storage_write_spark.schema.lattice import validate_sink_schema
from kafka_connect_bigquery_storage_write_spark.operators.multimodal import MEDIA_SCHEMA


def test_media_schema_needs_binary_opt_in():
    import pytest
    from kafka_connect_bigquery_storage_write_spark.schema.lattice import UnsupportedDataTypeError

    with pytest.raises(UnsupportedDataTypeError):
        validate_sink_schema(MEDIA_SCHEMA)  # reference semantics reject BYTES
    validate_sink_schema(MEDIA_SCHEMA, allow_binary=True)  # engine extension


def test_feature_extraction_shape_and_determinism(spark):
    media = synthetic_media(spark, n=30).repartition(4)
    feats = extract_features(media, dim=16)
    rows = feats.collect()
    assert len(rows) == 30
    assert all(len(r.feature) == 16 for r in rows)
    # deterministic: same payload -> same vector across runs/partitions
    again = {r.media_id: r.feature for r in extract_features(media, dim=16).collect()}
    for r in rows:
        assert again[r.media_id] == r.feature


def test_resize_only_touches_images(spark):
    media = synthetic_media(spark, n=30)
    out = resize_images(media, 32, 32)
    n_images = media.filter(F.col("kind") == "image").count()
    rows = out.collect()
    assert len(rows) == n_images
    assert all(r.width == 32 and r.height == 32 and len(r.payload) > 0 for r in rows)


def test_frame_sampling_explodes_videos(spark):
    media = synthetic_media(spark, n=30)
    frames = sample_frames(media, every_ms=1000)
    n_videos = media.filter(F.col("kind") == "video").count()
    rows = frames.collect()
    assert len(rows) == n_videos * 5  # 5000ms / 1000ms
    assert {r.frame_no for r in rows} == {0, 1, 2, 3, 4}


def test_features_feed_similarity_search(spark):
    """The multimodal features flow into the same ANN operator as text
    embeddings — the integration a training pipeline needs."""
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import cosine_topk

    media = synthetic_media(spark, n=50)
    feats = extract_features(media, dim=16).withColumnRenamed("media_id", "vec_id").withColumnRenamed(
        "feature", "embedding"
    )
    queries = feats.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    topk = cosine_topk(feats, queries, k=3).collect()
    assert len(topk) == 9


def test_real_audio_video_payloads_decode_in_kernels(spark):
    """Round 7: the fixture's audio/video payloads are REAL containers
    (WAV / Y4M), and the default feature kernel must route them through
    the genuine decoders — decode-sensitivity means two different clips
    get different vectors, and the Y4M frame sampler must yield true
    planar frame bytes, not hash stubs."""
    import numpy as np

    from kafka_connect_bigquery_storage_write_spark.operators.multimodal import (
        extract_features,
        sample_frames,
        synthetic_media,
    )

    media = synthetic_media(spark, n=12)
    feats = {r["media_id"]: r["feature"] for r in extract_features(media).collect()}
    # audio ids: 1, 4, 7, 10; video ids: 2, 5, 8, 11 — all decode-sensitive
    assert feats[1] != feats[4] and feats[2] != feats[5]
    for mid in (1, 2, 4, 5):
        assert abs(np.linalg.norm(np.array(feats[mid])) - 1.0) < 1e-9
    # frame sampler: video id 2 has 5 real frames of 16x12 C444 ->
    # 3*192 = 576 bytes per frame, not a 32-byte sha256 stub
    frames = sample_frames(media, every_ms=1000).filter("media_id = 2").collect()
    assert len(frames) > 0
    assert all(len(bytes(r["frame"])) == 3 * 16 * 12 for r in frames)
    # and the first sampled frame equals the closed form's frame 0
    idx = np.arange(5 * 3 * 12 * 16, dtype=np.int64)
    flat = ((2 * 13 + idx * 7) % 256).astype(np.uint8).reshape(5, 3, 12, 16)
    want = flat[0].tobytes()
    got = bytes(sorted(frames, key=lambda r: r["frame_no"])[0]["frame"])
    assert got == want
