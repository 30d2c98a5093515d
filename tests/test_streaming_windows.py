"""Real streaming execution for E17/E18: watermarked tumbling windows with
late-data drop, and dropDuplicatesWithinWatermark — running as actual
Structured Streaming queries over a file source."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

EV_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double"


def _write_json(spark, rows, path):
    raw = "event_id long, ts string, user_id long, event_type string, value double"
    df = spark.createDataFrame(rows, raw).withColumn("ts", F.to_timestamp("ts"))
    df.coalesce(1).write.mode("append").json(str(path))


def test_watermarked_tumbling_window_drops_late_data(spark, tmp_path):
    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"

    # batch 1: events in hour 10 and 11; watermark will advance to 11:00-10min
    _write_json(
        spark,
        [
            (1, "2024-01-01 10:05:00", 1, "click", 1.0),
            (2, "2024-01-01 10:55:00", 1, "click", 1.0),
            (3, "2024-01-01 11:30:00", 2, "click", 1.0),
        ],
        src,
    )

    def run_once():
        stream = spark.readStream.schema(EV_SCHEMA).json(str(src))
        agg = (
            stream.withWatermark("ts", "10 minutes")
            .groupBy(F.window("ts", "1 hour").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.col("w.start").alias("win_start"), "n")
        )
        q = (
            agg.writeStream.outputMode("append")
            .format("parquet")
            .option("path", str(out))
            .option("checkpointLocation", str(ckpt))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    run_once()
    # batch 2: a very late event for hour 10 (behind the watermark) and a
    # new event far ahead that closes the 11:00 window
    _write_json(
        spark,
        [
            (4, "2024-01-01 10:10:00", 3, "click", 1.0),  # LATE -> dropped
            (5, "2024-01-01 14:00:00", 3, "click", 1.0),
        ],
        src,
    )
    run_once()

    result = {r.win_start.strftime("%H:%M"): r.n for r in spark.read.parquet(str(out)).collect()}
    # hour-10 window closed with 2 events: the late event_id=4 was dropped
    assert result.get("10:00") == 2
    # hour-11 window closed once the watermark passed it
    assert result.get("11:00") == 1


def test_drop_duplicates_within_watermark(spark, tmp_path):
    src = tmp_path / "src"
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    _write_json(
        spark,
        [
            (1, "2024-01-01 10:00:00", 1, "click", 1.0),
            (1, "2024-01-01 10:00:30", 1, "click", 1.0),  # duplicate id within watermark
            (2, "2024-01-01 10:01:00", 1, "click", 1.0),
        ],
        src,
    )
    stream = spark.readStream.schema(EV_SCHEMA).json(str(src))
    dedup = stream.withWatermark("ts", "1 hour").dropDuplicatesWithinWatermark(["event_id"])
    q = (
        dedup.writeStream.outputMode("append")
        .format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    ids = sorted(r.event_id for r in spark.read.parquet(str(out)).collect())
    assert ids == [1, 2]


def test_stream_stream_interval_join_equals_batch(spark, tmp_path, sf_dir):
    """The q123 attribution join run as a REAL stream-stream inner join
    (two file streams, 48h watermarks, equality key + event-time
    interval condition) must produce exactly the batch result — the
    Structured Streaming feature the batch query's docstring claims."""
    from kafka_connect_bigquery_storage_write_spark.queries.temporal import q123_interval_join_attribution
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    batch_rows = sorted(tuple(r) for r in q123_interval_join_attribution(spark, sf_dir).collect())

    src = tmp_path / "ev_parquet"
    load_table(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id", "event_type"
    ).write.parquet(str(src))

    stream = spark.readStream.schema("event_id long, ts timestamp, user_id long, event_type string").parquet(
        str(src)
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "48 hours")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "48 hours")
    )
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("p_ts") < F.col("c_ts") + F.expr("INTERVAL 48 HOURS")),
    ).select(
        "purchase_id",
        "click_id",
        "user_id",
        F.floor(
            (F.unix_micros(F.col("p_ts").cast("timestamp")) - F.unix_micros(F.col("c_ts").cast("timestamp")))
            / 1_000_000
        )
        .cast("long")
        .alias("lag_s"),
    )
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    q = (
        joined.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = sorted(tuple(r) for r in spark.read.parquet(str(out)).collect())
    assert got == batch_rows
    assert len(got) > 0


def test_stream_stream_left_outer_join_equals_batch(spark, tmp_path, sf_dir):
    """q133 (VERDICT r5 #8) run as a REAL stream-stream LEFT OUTER join:
    watermarks on both sides, unmatched purchases emitted once the
    watermark proves no future click can match. A far-future sentinel
    pair (ghost user -1) advances both watermarks past every real event
    so the tail state flushes within one availableNow run; sentinels are
    excluded from the comparison."""
    from kafka_connect_bigquery_storage_write_spark.queries.temporal import q133_left_outer_attribution
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    batch_rows = sorted(
        tuple(r) for r in q133_left_outer_attribution(spark, sf_dir).collect()
    )

    src = tmp_path / "ev_parquet"
    load_table(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id", "event_type"
    ).write.parquet(str(src / "part1"))
    sentinels = spark.createDataFrame(
        [(-100, "2030-01-01 00:00:00", -1, "click"), (-101, "2030-01-10 00:00:00", -1, "purchase")],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    sentinels.coalesce(1).write.parquet(str(src / "part2"))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "part*"))
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "48 hours")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "48 hours")
    )
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("p_ts") < F.col("c_ts") + F.expr("INTERVAL 48 HOURS")),
        "leftOuter",
    ).select(
        "purchase_id",
        "click_id",
        "user_id",
        F.floor(
            (F.unix_micros(F.col("p_ts").cast("timestamp")) - F.unix_micros(F.col("c_ts").cast("timestamp")))
            / 1_000_000
        )
        .cast("long")
        .alias("lag_s"),
    )
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    q = (
        joined.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        tuple(r) for r in spark.read.parquet(str(out)).filter(F.col("user_id") != -1).collect()
    )
    assert got == batch_rows
    # the left-outer property actually fired: unmatched purchases exist
    assert any(r[1] is None for r in got)


def test_stream_stream_full_outer_join_equals_batch(spark, tmp_path, sf_dir):
    """q163 run as a REAL stream-stream FULL OUTER join: watermarks on
    both sides; unmatched purchases AND unmatched clicks each emit once
    the watermark proves their window closed. Same sentinel technique as
    the left-outer pin: a far-future ghost pair (user -1) advances both
    watermarks so the tail state flushes within one availableNow run;
    sentinels (and their self-join row) are excluded from the compare."""
    from kafka_connect_bigquery_storage_write_spark.queries.temporal import q163_full_outer_attribution
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    batch_rows = sorted(
        (tuple(r) for r in q163_full_outer_attribution(spark, sf_dir).collect()),
        key=lambda t: tuple((v is None, v) for v in t),
    )

    src = tmp_path / "ev_parquet"
    load_table(spark, sf_dir, "events").select(
        "event_id", F.col("ts").cast("timestamp").alias("ts"), "user_id", "event_type"
    ).write.parquet(str(src / "part1"))
    sentinels = spark.createDataFrame(
        [(-100, "2030-01-01 00:00:00", -1, "click"), (-101, "2030-01-10 00:00:00", -1, "purchase")],
        "event_id long, ts string, user_id long, event_type string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    sentinels.coalesce(1).write.parquet(str(src / "part2"))

    stream = (
        spark.readStream.schema("event_id long, ts timestamp, user_id long, event_type string")
        .option("maxFilesPerTrigger", 1)
        .parquet(str(src / "part*"))
    )
    clicks = (
        stream.filter(F.col("event_type") == "click")
        .select(F.col("event_id").alias("click_id"), F.col("user_id").alias("c_user"), F.col("ts").alias("c_ts"))
        .withWatermark("c_ts", "48 hours")
    )
    purchases = (
        stream.filter(F.col("event_type") == "purchase")
        .select(F.col("event_id").alias("purchase_id"), "user_id", F.col("ts").alias("p_ts"))
        .withWatermark("p_ts", "48 hours")
    )
    joined = purchases.join(
        clicks,
        (purchases.user_id == clicks.c_user)
        & (F.col("c_ts") <= F.col("p_ts"))
        & (F.col("p_ts") < F.col("c_ts") + F.expr("INTERVAL 48 HOURS")),
        "fullOuter",
    ).select(
        "purchase_id",
        "click_id",
        F.coalesce(F.col("user_id"), F.col("c_user")).alias("user_id"),
        F.floor(
            (F.unix_micros(F.col("p_ts").cast("timestamp")) - F.unix_micros(F.col("c_ts").cast("timestamp")))
            / 1_000_000
        )
        .cast("long")
        .alias("lag_s"),
    )
    out = tmp_path / "out"
    ckpt = tmp_path / "ckpt"
    q = (
        joined.writeStream.format("parquet")
        .option("path", str(out))
        .option("checkpointLocation", str(ckpt))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    got = sorted(
        (
            tuple(r)
            for r in spark.read.parquet(str(out)).filter(
                (F.coalesce(F.col("user_id"), F.lit(0)) >= 0)
            ).collect()
        ),
        key=lambda t: tuple((v is None, v) for v in t),
    )
    assert got == batch_rows
    assert len(got) > 0
