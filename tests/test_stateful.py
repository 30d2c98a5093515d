"""applyInPandasWithState: state must accumulate across micro-batches
within a streaming run (two source files, one file per trigger)."""

from __future__ import annotations

import contextlib

from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.streaming.stateful import running_user_totals


# the product context manager (streaming/stateful.py) is the single
# source of truth for the RocksDB-provider scoping every TWS call needs
from kafka_connect_bigquery_storage_write_spark.streaming.stateful import (  # noqa: E402
    rocksdb_state_store as _rocksdb_state_store,
)


def test_state_accumulates_across_microbatches(spark, tmp_path):
    src = tmp_path / "src"
    raw = "user_id long, ts string, value double"
    batch1 = [(1, "2024-01-01 10:00:00", 1.0), (1, "2024-01-01 10:01:00", 2.0), (2, "2024-01-01 10:00:00", 5.0)]
    batch2 = [(1, "2024-01-01 10:02:00", 4.0)]
    for rows in (batch1, batch2):
        df = spark.createDataFrame(rows, raw).withColumn("ts", F.to_timestamp("ts"))
        df.coalesce(1).write.mode("append").json(str(src))

    stream = spark.readStream.schema("user_id long, ts timestamp, value double").option(
        "maxFilesPerTrigger", "1"
    ).json(str(src))
    out = running_user_totals(stream)
    q = (
        out.writeStream.outputMode("update")
        .format("memory")
        .queryName("running_totals_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = spark.sql("select * from running_totals_test").collect()
    # update-mode: user 1 emits (2, 3.0) after batch1 then (3, 7.0) after
    # batch2 — proof the state cell carried across triggers
    got = {(r.user_id, r.n_events, r.sum_value) for r in rows}
    assert (1, 2, 3.0) in got
    assert (1, 3, 7.0) in got
    assert (2, 1, 5.0) in got


def test_stream_sessionizer_closes_by_gap_and_timeout(spark, tmp_path):
    src = tmp_path / "src"
    raw = "user_id long, ts string, value double"
    # user 1: two events 10 min apart (same session), then one 3 hours
    # later (new session); the watermark sentinel (user 99, far future)
    # pushes event time forward so the open session times out and closes.
    batch1 = [
        (1, "2024-01-01 10:00:00", 1.0),
        (1, "2024-01-01 10:10:00", 2.0),
    ]
    batch2 = [(1, "2024-01-01 13:10:00", 4.0)]
    batch3 = [(99, "2024-01-02 00:00:00", 0.0)]
    for rows in (batch1, batch2, batch3):
        df = spark.createDataFrame(rows, raw).withColumn("ts", F.to_timestamp("ts"))
        df.coalesce(1).write.mode("append").json(str(src))

    from kafka_connect_bigquery_storage_write_spark.streaming.stateful import sessionize_stream

    stream = spark.readStream.schema("user_id long, ts timestamp, value double").option(
        "maxFilesPerTrigger", "1"
    ).json(str(src))
    out = sessionize_stream(stream, gap_seconds=3600, watermark="0 seconds")
    q = (
        out.writeStream.outputMode("append")
        .format("memory")
        .queryName("sessions_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)

    rows = spark.sql("select * from sessions_test where user_id = 1").collect()
    sessions = {(str(r.session_start), str(r.session_end), r.n_events, r.sum_value) for r in rows}
    assert ("2024-01-01 10:00:00", "2024-01-01 10:10:00", 2, 3.0) in sessions
    assert ("2024-01-01 13:10:00", "2024-01-01 13:10:00", 1, 4.0) in sessions


def test_stream_sessionizer_matches_batch_sessionize(spark, tmp_path, sf_dir):
    """Streaming gap-sessionization must agree exactly with the batch
    sessionize operator over the same fixture events (6h gap), with a
    far-future sentinel closing every tail session via the timeout path."""
    from kafka_connect_bigquery_storage_write_spark.operators.temporal import sessionize
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table
    from kafka_connect_bigquery_storage_write_spark.streaming.stateful import sessionize_stream

    ev = load_table(spark, sf_dir, "events").select("user_id", F.col("ts").cast("timestamp"), "value")
    src = tmp_path / "src"
    ev.coalesce(1).write.mode("append").parquet(str(src))
    sentinel = spark.createDataFrame([(10**6, "2030-01-01 00:00:00", 0.0)], "user_id long, ts string, value double")
    sentinel.withColumn("ts", F.to_timestamp("ts")).coalesce(1).write.mode("append").parquet(str(src))

    stream = spark.readStream.schema("user_id long, ts timestamp, value double").option(
        "maxFilesPerTrigger", "1"
    ).parquet(str(src))
    q = (
        sessionize_stream(stream, gap_seconds=6 * 3600, watermark="0 seconds")
        .writeStream.outputMode("append")
        .format("memory")
        .queryName("sess_equiv_test")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    streamed = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events, r.sum_value)
        for r in spark.sql("select * from sess_equiv_test").collect()
        if r.user_id < 10**6
    }

    us = F.unix_micros(F.col("ts").cast("timestamp"))
    batch = {
        (r.user_id, str(r.session_start), str(r.session_end), r.n_events, r.total_value)
        for r in sessionize(ev, key="user_id", ts_col="ts", gap_seconds=6 * 3600)
        .groupBy("user_id", "session_seq")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.round(F.sum(F.col("value").cast("decimal(18,2)")), 2).cast("double").alias("total_value"),
        )
        .collect()
    }
    assert streamed == batch and len(batch) > 100


def test_transform_with_state_matches_apply_in_pandas_with_state(spark, tmp_path):
    """The same accumulator on Spark 4's transformWithStateInPandas must
    produce the same final per-user totals as the applyInPandasWithState
    form — the migration-without-drift guarantee. LIVE since round 13:
    the JVM<->stateful-worker protocol runs on the engine's own
    StateMessage wire codec (streaming/state_proto_shim, installed
    because google.protobuf is absent here), the package reaches the
    driver-side streaming runner via ensure_shipped's PYTHONPATH
    hand-off, and per-key state lives in RocksDB (TWS needs column
    families). Through round 12 this test could only pin the loud
    crash; now it pins the values."""
    from kafka_connect_bigquery_storage_write_spark.session import ensure_shipped
    from kafka_connect_bigquery_storage_write_spark.streaming import state_proto_shim
    from kafka_connect_bigquery_storage_write_spark.streaming.stateful import running_user_totals_tws

    assert state_proto_shim.install()  # real protobuf absent in-sandbox
    ensure_shipped(spark)

    src = tmp_path / "src"
    raw = "user_id long, ts string, value double"
    batch1 = [(1, "2024-01-01 10:00:00", 1.0), (1, "2024-01-01 10:01:00", 2.0), (2, "2024-01-01 10:00:00", 5.0)]
    batch2 = [(1, "2024-01-01 10:02:00", 4.0)]
    for rows in (batch1, batch2):
        df = spark.createDataFrame(rows, raw).withColumn("ts", F.to_timestamp("ts"))
        df.coalesce(1).write.mode("append").json(str(src))

    stream = spark.readStream.schema("user_id long, ts timestamp, value double").option(
        "maxFilesPerTrigger", "1"
    ).json(str(src))
    out = running_user_totals_tws(stream)

    with _rocksdb_state_store(spark):
        q = (
            out.writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_totals_test")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)

    rows = spark.sql("select * from tws_totals_test").collect()
    got = {(r.user_id, r.n_events, r.sum_value) for r in rows}
    # intermediate update proves the ValueState survived the trigger
    # boundary; finals match the applyInPandasWithState contract above
    assert (1, 2, 3.0) in got
    assert (1, 3, 7.0) in got
    assert (2, 1, 5.0) in got


def test_tws_exact_cents_across_batches(spark, tmp_path):
    """RunningCentsProcessor (the q232 kernel): integer-cents state, so
    the final update per user equals the exact batch aggregate no matter
    how the rows split across triggers."""
    from kafka_connect_bigquery_storage_write_spark.session import ensure_shipped
    from kafka_connect_bigquery_storage_write_spark.streaming.stateful import running_user_cents_tws

    ensure_shipped(spark)
    src = tmp_path / "src"
    raw = "user_id long, value double"
    batches = [
        [(1, 0.1), (1, 0.2), (2, 327.53)],
        [(1, 0.3), (2, 0.07)],
        [(1, 123.45)],
    ]
    for rows in batches:
        spark.createDataFrame(rows, raw).coalesce(1).write.mode("append").json(str(src))
    stream = spark.readStream.schema(raw).option("maxFilesPerTrigger", "1").json(str(src))
    with _rocksdb_state_store(spark):
        q = (
            running_user_cents_tws(stream)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_cents_test")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    rows = spark.sql("select * from tws_cents_test").collect()
    final = {}
    for r in rows:
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.sum_cents)
    # 0.1+0.2+0.3+123.45 = 124.05 exactly in cents (float sum would give
    # 124.05000000000001-ish before rounding)
    assert final[1] == (4, 12405)
    assert final[2] == (2, 32760)


def test_tws_timer_sessionizer_live_and_parity(spark, tmp_path):
    """TimerSessionizerProcessor (VERDICT r13 #3): the remaining TWS
    state surfaces — registered event-time TIMERS, ListState, MapState —
    driven LIVE on the StateMessage shim. Sessions close two ways: on
    arrival of a past-gap event (emitted mid-stream) and by TIMER expiry
    when the watermark passes last_event + gap (no closing event
    needed). Parity-pinned against the applyInPandasWithState
    sessionizer on the same input."""
    from kafka_connect_bigquery_storage_write_spark.session import ensure_shipped
    from kafka_connect_bigquery_storage_write_spark.streaming.stateful import (
        sessionize_stream,
        sessionize_stream_tws,
    )

    ensure_shipped(spark)
    raw = "user_id long, ts string, event_type string, value double"
    batches = [
        [(1, "2024-01-01 10:00:00", "a", 1.0), (1, "2024-01-01 10:00:30", "b", 2.0),
         (2, "2024-01-01 10:00:00", "a", 7.25)],
        [(1, "2024-01-01 10:01:00", "a", 3.0),   # session A spans the trigger boundary
         (1, "2024-01-01 10:05:00", "c", 4.0)],  # past gap: closes A on arrival
        [(1, "2024-01-01 10:10:00", "a", 5.0)],  # past gap: closes B on arrival
        [(-1, "2024-01-02 12:00:00", "x", 0.0)],  # sentinel: advances the watermark
    ]

    # PHASE-WISE availableNow runs pin the micro-batch ORDER: Spark's
    # file source does not reliably order same-listing files (observed
    # processing a later-mtime file first ~40% of runs), and the
    # sentinel triggering early would advance the watermark and drop
    # every 2024-01-01 event as late data. One write + one restart per
    # batch makes each run consume exactly the new file — deterministic.
    # The memory sink cannot recover from a checkpoint, so the phases
    # emit through foreachBatch into a driver-side list instead.
    def drive(sessionize_fn, name):
        src = tmp_path / f"src_{name}"
        rows_out = []
        for rows in batches:
            df = spark.createDataFrame(rows, raw).withColumn("ts", F.to_timestamp("ts"))
            df.coalesce(1).write.mode("append").json(str(src))
            stream = spark.readStream.schema(
                "user_id long, ts timestamp, event_type string, value double"
            ).json(str(src))
            q = (
                sessionize_fn(stream, gap_seconds=60, watermark="30 minutes")
                .writeStream.foreachBatch(lambda d, _i: rows_out.extend(d.collect()))
                .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(300)
        return rows_out

    with _rocksdb_state_store(spark):
        tws_rows = drive(sessionize_stream_tws, "tws_sess")
    got = {
        (r.user_id, r.start_us, r.end_us, r.n_events, r.sum_cents, r.n_types, r.session_seq)
        for r in tws_rows
        if r.user_id >= 0
    }

    def us(s: str) -> int:
        import datetime

        return int(datetime.datetime.fromisoformat(s).replace(
            tzinfo=datetime.timezone.utc).timestamp() * 1_000_000)

    assert got == {
        (1, us("2024-01-01 10:00:00"), us("2024-01-01 10:01:00"), 3, 600, 2, 1),
        (1, us("2024-01-01 10:05:00"), us("2024-01-01 10:05:00"), 1, 400, 1, 2),
        # closed by TIMER expiry (no later event for the key):
        (1, us("2024-01-01 10:10:00"), us("2024-01-01 10:10:00"), 1, 500, 1, 3),
        (2, us("2024-01-01 10:00:00"), us("2024-01-01 10:00:00"), 1, 725, 1, 1),
    }

    # parity vs the applyInPandasWithState sessionizer on the same input
    apws_rows = drive(sessionize_stream, "apws_sess")
    apws = {
        (r.user_id, int(r.session_start.timestamp() * 1_000_000),
         int(r.session_end.timestamp() * 1_000_000), r.n_events,
         int(round(r.sum_value * 100)))
        for r in apws_rows
        if r.user_id >= 0
    }
    assert apws == {(u, s, e, n, c) for u, s, e, n, c, _t, _q in got}


def test_tws_initial_state_bootstrap(spark, tmp_path):
    """BootstrappedCentsProcessor: per-key state seeded from a batch
    relation via initialState; streamed updates accumulate ON TOP of
    history the stream never saw, and a key with no initial state
    starts from zero."""
    from kafka_connect_bigquery_storage_write_spark.session import ensure_shipped
    from kafka_connect_bigquery_storage_write_spark.streaming.stateful import (
        running_user_cents_bootstrapped_tws,
    )

    ensure_shipped(spark)
    initial = spark.createDataFrame(
        [(1, 3, 1000), (2, 1, 250)], "user_id long, n_events long, sum_cents long"
    )
    src = tmp_path / "src"
    batches = [[(1, 0.5), (3, 2.0)], [(1, 0.25), (2, 1.0)]]
    for rows in batches:
        spark.createDataFrame(rows, "user_id long, value double").coalesce(1).write.mode(
            "append"
        ).json(str(src))
    stream = (
        spark.readStream.schema("user_id long, value double")
        .option("maxFilesPerTrigger", "1")
        .json(str(src))
    )
    with _rocksdb_state_store(spark):
        q = (
            running_user_cents_bootstrapped_tws(stream, initial)
            .writeStream.outputMode("update")
            .format("memory")
            .queryName("tws_bootstrap_test")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
    rows = spark.sql("select * from tws_bootstrap_test").collect()
    final = {}
    for r in rows:
        if r.user_id not in final or r.n_events > final[r.user_id][0]:
            final[r.user_id] = (r.n_events, r.sum_cents)
    # user 1: 3 events/1000c history + 50c + 25c across two batches
    assert final[1] == (5, 1075)
    # user 2: history + one streamed event
    assert final[2] == (2, 350)
    # user 3: NO initial state — starts from zero
    assert final[3] == (1, 200)
