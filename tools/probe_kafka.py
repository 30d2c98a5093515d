"""End-to-end Kafka integration probe (VERDICT r5 #5).

The sandbox has no broker and no spark-sql-kafka jar, so this probe
cannot run here — it is the documented recipe that turns the engine's
construction-level Kafka evidence into execution evidence the moment an
environment provides both. Everything it drives is the production code
path unchanged (sources/kafka.py builders, IngestPipeline, ManifestSinkTable,
KafkaDeadLetterTopic).

Prerequisites:
  1. a reachable broker, e.g.   docker run -p 9092:9092 apache/kafka:3.7.0
  2. the kafka datasource jar:  --packages org.apache.spark:spark-sql-kafka-0-10_2.13:<spark-version>

Usage:
  spark-submit --packages org.apache.spark:spark-sql-kafka-0-10_2.13:4.1.2 \
      tools/probe_kafka.py [bootstrap=localhost:9092] [topic=spark_graft_probe]

What it proves, in order:
  1. PRODUCE: a batch write through the kafka sink (the KafkaDeadLetterTopic
     write path's format) lands N JSON envelopes on the topic.
  2. BATCH READ-BACK: kafka_batch() returns exactly those rows with the
     envelope columns (topic, partition, offset, key, value).
  3. STREAMING INGEST: kafka_stream() -> IngestPipeline.run_stream ->
     ManifestSinkTable lands the valid rows and routes the poison row to
     the DLQ — the reference's put()->convert->salvage->append path
     (BigqueryStorageWriteSinkTask.java:98-116) on a real broker.
"""

from __future__ import annotations

import json
import sys
import tempfile
import time
import uuid

from pyspark.sql import SparkSession

sys.path.insert(0, "/root/repo")  # runnable as `python tools/probe_kafka.py`


def main() -> None:
    bootstrap = sys.argv[1] if len(sys.argv) > 1 else "localhost:9092"
    topic = sys.argv[2] if len(sys.argv) > 2 else f"spark_graft_probe_{uuid.uuid4().hex[:8]}"

    from kafka_connect_bigquery_storage_write_spark.sources.kafka import kafka_batch, kafka_reader_options, kafka_stream

    spark = SparkSession.builder.appName("probe-kafka").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    # 1. PRODUCE ----------------------------------------------------------
    rows = [
        (str(i), json.dumps({"id": f"id-{i}", "int_value": i if i != 3 else None}))
        for i in range(10)  # row 3 violates the required int_value -> DLQ
    ]
    df = spark.createDataFrame(rows, "key string, value string")
    (
        df.write.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap)
        .option("topic", topic)
        .save()
    )
    print(f"produced {df.count()} envelopes to {topic}")

    # 2. BATCH READ-BACK --------------------------------------------------
    back = kafka_batch(spark, bootstrap, topic)
    got = {r["key"]: r["value"] for r in back.collect()}
    assert got == dict(rows), f"read-back mismatch: {len(got)} rows"
    assert set(back.columns) == {"topic", "partition", "offset", "key", "value"}
    print("batch read-back ok (envelope columns + payload identical)")

    # 3. STREAMING INGEST (the reference's end-to-end surface) -----------
    from pyspark.sql import types as T

    from kafka_connect_bigquery_storage_write_spark.config import PipelineConfig
    from kafka_connect_bigquery_storage_write_spark.streaming.pipeline import IngestPipeline

    schema = T.StructType(
        [
            T.StructField("id", T.StringType(), nullable=False),
            T.StructField("int_value", T.LongType(), nullable=False),
        ]
    )
    with tempfile.TemporaryDirectory() as tmp:
        cfg = PipelineConfig(
            sink_path=f"{tmp}/table",
            dlq_path=f"{tmp}/dlq",
            checkpoint_path=f"{tmp}/ckpt",
            write_mode="committed",
        )
        stream = kafka_stream(
            spark,
            bootstrap,
            topic,
            starting_offsets="earliest",
            max_offsets_per_trigger=1000,
        )
        pipe = IngestPipeline(config=cfg, value_schema=schema)
        # availableNow: drain every existing offset, then stop — the
        # deterministic probe shape (no sleep/poll heuristics)
        q = pipe.start_stream(stream, trigger_once=True)
        q.awaitTermination(120)
        n_ok = pipe.read_sink(spark).count()
        n_dlq = pipe._dlq.read(spark).count()
        print(f"streaming ingest: {n_ok} rows landed, {n_dlq} dead-lettered")
        assert n_ok == 9 and n_dlq == 1, "expected 9 valid + 1 poison row"
        print(f"option contract driven end-to-end: {kafka_reader_options(bootstrap, topic)}")
    print("PROBE PASSED")


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # noqa: BLE001 — report the documented seam state
        if "Failed to find data source: kafka" in str(e):
            print(
                "ENVIRONMENT BLOCKED (expected in the sandbox): the "
                "spark-sql-kafka connector jar is not on the classpath and "
                "there is no broker. On a real cluster run with\n"
                "  spark-submit --packages org.apache.spark:"
                "spark-sql-kafka-0-10_2.13:<spark-version> tools/probe_kafka.py "
                "<bootstrap> [topic]\n"
                "The option contract this probe exercises is pinned offline by "
                "tests/test_kafka_contract.py."
            )
            raise SystemExit(2)
        raise
