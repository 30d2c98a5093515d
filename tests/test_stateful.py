"""applyInPandasWithState: state must accumulate across micro-batches
within a streaming run (two source files, one file per trigger)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.streaming.stateful import running_user_totals


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
    # the LAST update per user must reflect the accumulated state
    final = {}
    for r in rows:
        final[r.user_id] = (r.n_events, r.sum_value)  # updates arrive in batch order
    assert final[1] == (3, 7.0)  # 2 events in batch1 + 1 in batch2, state carried over
    assert final[2] == (1, 5.0)
