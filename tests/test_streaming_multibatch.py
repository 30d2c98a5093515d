"""Micro-batch boundary behavior: multiple trigger batches land as
separate idempotent batch dirs in the manifest sink (R7/R9/R14), and the
session window runs as a real streaming stateful aggregation (E17)."""

from __future__ import annotations

import json

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_bigquery_storage_write_spark.config import PipelineConfig
from kafka_connect_bigquery_storage_write_spark.streaming import IngestPipeline

KV_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("int_value", T.LongType(), False),
    ]
)


def test_multiple_microbatches_create_separate_manifest_batches(spark, tmp_path):
    """maxFilesPerTrigger=1 over 3 source files -> 3 foreachBatch calls ->
    3 committed batch ids, each visible, none duplicated."""
    src = tmp_path / "src"
    env_schema = "topic string, partition int, offset long, key string, value string"
    for i in range(3):
        rows = [("t", 0, i * 10 + j, f"k{i}-{j}", json.dumps({"id": f"id-{i}-{j}", "int_value": j})) for j in range(10)]
        spark.createDataFrame(rows, env_schema).coalesce(1).write.mode("append").json(str(src))

    cfg = PipelineConfig(
        sink_path=str(tmp_path / "sink"),
        dlq_path=str(tmp_path / "dlq"),
        checkpoint_path=str(tmp_path / "ckpt"),
        write_mode="committed",
    )
    p = IngestPipeline(config=cfg, value_schema=KV_SCHEMA)
    stream = spark.readStream.schema(env_schema).option("maxFilesPerTrigger", "1").json(str(src))
    q = p.start_stream(stream, trigger_once=True)
    q.awaitTermination(180)

    assert p._sink.committed_ids() == [0, 1, 2]
    assert p.read_sink(spark).count() == 30
    assert [s.batch_id for s in p.stats] == [0, 1, 2]


def test_session_window_streaming_mode(spark, tmp_path):
    """session_window as a real streaming stateful agg with watermark."""
    src = tmp_path / "src"
    out = tmp_path / "out"
    raw = "user_id long, ts string, value double"
    rows = [
        (1, "2024-01-01 10:00:00", 1.0),
        (1, "2024-01-01 10:05:00", 1.0),   # same session (gap 5m < 10m)
        (1, "2024-01-01 11:00:00", 1.0),   # new session
        (2, "2024-01-01 10:00:00", 1.0),
        (9, "2024-01-01 15:00:00", 1.0),   # advances watermark far enough to close all above
    ]
    df = spark.createDataFrame(rows, raw).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("overwrite").json(str(src))

    stream = spark.readStream.schema("user_id long, ts timestamp, value double").json(str(src))
    agg = (
        stream.withWatermark("ts", "10 minutes")
        .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("user_id", F.col("w.start").alias("start"), "n")
    )
    q = (
        agg.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {(r.user_id, r.start.strftime("%H:%M")): r.n for r in spark.read.parquet(str(out)).collect()}
    assert got[(1, "10:00")] == 2  # merged session
    assert got[(1, "11:00")] == 1
    assert got[(2, "10:00")] == 1


def test_kafka_builder_options():
    """Kafka source builders validate knobs without needing a broker."""
    import pytest

    from kafka_connect_bigquery_storage_write_spark.sources.kafka import kafka_stream

    with pytest.raises(ValueError, match="max_offsets_per_trigger"):
        kafka_stream(None, "localhost:9092", "t", max_offsets_per_trigger=0)


def test_bpe_ish_token_count(spark):
    from kafka_connect_bigquery_storage_write_spark.operators.text import bpe_ish_token_count, token_count

    df = spark.createDataFrame([("hello world, it's 2024ad!",)], "text string")
    row = df.select(
        token_count("text").alias("ws"), bpe_ish_token_count("text").alias("bpe")
    ).collect()[0]
    assert row.ws == 4
    # sub-word splits: hello | world | , | it | ' | s | 2024 | ad | !
    assert row.bpe > row.ws


def test_stream_stream_interval_join(spark, tmp_path):
    """Watermarked stream-stream inner join (E17): impressions joined to
    clicks within a bounded event-time interval. Both sides carry
    watermarks + a range condition, so Spark can bound the join state —
    the only shape where stream-stream joins survive unbounded input."""
    imp_src, clk_src, out = tmp_path / "imp", tmp_path / "clk", tmp_path / "join_out"
    imps = [
        (1, "2024-01-01 10:00:00"),
        (2, "2024-01-01 10:10:00"),
        (3, "2024-01-01 10:20:00"),
        (99, "2024-01-01 15:00:00"),  # watermark pusher
    ]
    clks = [
        (1, "2024-01-01 10:04:00"),   # within 5m of imp 1 -> joins
        (2, "2024-01-01 10:30:00"),   # 20m after imp 2 -> outside interval
        (98, "2024-01-01 15:00:00"),  # watermark pusher
    ]
    spark.createDataFrame(imps, "ad_id long, imp_ts string").withColumn(
        "imp_ts", F.to_timestamp("imp_ts")
    ).coalesce(1).write.mode("overwrite").parquet(str(imp_src))
    spark.createDataFrame(clks, "ad_id long, clk_ts string").withColumn(
        "clk_ts", F.to_timestamp("clk_ts")
    ).coalesce(1).write.mode("overwrite").parquet(str(clk_src))

    imp_stream = spark.readStream.schema("ad_id long, imp_ts timestamp").parquet(str(imp_src)).withWatermark(
        "imp_ts", "10 minutes"
    )
    clk_stream = spark.readStream.schema("ad_id long, clk_ts timestamp").parquet(str(clk_src)).withWatermark(
        "clk_ts", "10 minutes"
    )
    joined = imp_stream.join(
        clk_stream,
        (imp_stream.ad_id == clk_stream.ad_id)
        & (clk_stream.clk_ts >= imp_stream.imp_ts)
        & (clk_stream.clk_ts <= imp_stream.imp_ts + F.expr("INTERVAL 5 MINUTES")),
        "inner",
    ).select(imp_stream.ad_id, "imp_ts", "clk_ts")
    q = (
        joined.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "jckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    rows = spark.read.parquet(str(out)).collect()
    assert [(r.ad_id) for r in rows] == [1]  # only the in-interval click


def test_stream_static_enrichment_join(spark, tmp_path):
    """Stream-static join (E17): a micro-batch stream enriches against a
    static dimension; the dimension broadcasts (no stream-side state, no
    watermark needed — the pattern for slowly-changing reference data)."""
    src, out = tmp_path / "ev", tmp_path / "enriched"
    dim = spark.createDataFrame(
        [(1, "gold"), (2, "basic")], "user_id long, tier string"
    )
    spark.createDataFrame(
        [(10, 1, 5.0), (11, 2, 7.0), (12, 3, 9.0)], "event_id long, user_id long, value double"
    ).coalesce(1).write.mode("overwrite").parquet(str(src))

    stream = spark.readStream.schema("event_id long, user_id long, value double").parquet(str(src))
    enriched = stream.join(F.broadcast(dim), "user_id", "left")
    q = (
        enriched.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(tmp_path / "eckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = {r.event_id: r.tier for r in spark.read.parquet(str(out)).collect()}
    assert got == {10: "gold", 11: "basic", 12: None}


def test_funnel_stage_boundaries_on_planted_users(spark, monkeypatch, tmp_path):
    """Every funnel branch exercised on synthetic users: stop-at-each-
    stage, out-of-order purchase, conversion-window expiry, no-view."""
    import kafka_connect_bigquery_storage_write_spark.queries.streaming_batch as SB

    rows = [
        # u1: full funnel inside the windows -> stage 3
        (1, "view", "2024-01-01 10:00:00"),
        (1, "click", "2024-01-01 12:00:00"),
        (1, "purchase", "2024-01-02 12:00:00"),
        # u2: view then click, never purchases -> stage 2
        (2, "view", "2024-01-01 10:00:00"),
        (2, "click", "2024-01-01 11:00:00"),
        # u3: view only -> stage 1
        (3, "view", "2024-01-01 10:00:00"),
        # u4: purchase BEFORE its click -> stage 2 (ordering enforced)
        (4, "view", "2024-01-01 10:00:00"),
        (4, "purchase", "2024-01-01 11:00:00"),
        (4, "click", "2024-01-01 12:00:00"),
        # u5: click 3 days after view -> window expired -> stage 1
        (5, "view", "2024-01-01 10:00:00"),
        (5, "click", "2024-01-04 11:00:00"),
        # u6: no view at all -> stage 0
        (6, "click", "2024-01-01 10:00:00"),
        (6, "purchase", "2024-01-01 11:00:00"),
    ]
    ev = spark.createDataFrame(rows, "user_id long, event_type string, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    monkeypatch.setattr(SB, "load_table", lambda _spark, _sf, _name: ev)
    got = {r.funnel_stage: r.n_users for r in SB.q67_event_funnel(spark, "unused").collect()}
    assert got == {0: 1, 1: 2, 2: 2, 3: 1}
