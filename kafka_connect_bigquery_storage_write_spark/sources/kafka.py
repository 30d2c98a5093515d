"""Kafka source/sink builders (SURVEY.md R1 in its production form).

The reference consumes Kafka through the Connect framework (reference:
BigqueryStorageWriteSinkTask.java:98-116); the Spark-native form is the
kafka datasource. No broker exists in the test environment, so these
builders are exercised at construction level in tests and swapped for the
file source (same envelope columns) everywhere else — the IngestPipeline
is source-agnostic by design.

Scale notes: `minPartitions` lets Spark split hot Kafka partitions across
more tasks than the topic has partitions; `maxOffsetsPerTrigger` is the
micro-batch size knob, the analogue of the reference's `buffer.size`
(BigqueryStreamWriteSinkConfig.java:36-41).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ENVELOPE_COLS = ("topic", "partition", "offset", "key", "value")


def kafka_stream(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
    fail_on_data_loss: bool = True,
) -> DataFrame:
    """Streaming Kafka source, normalized to the engine's envelope columns.

    The raw kafka source yields binary key/value plus metadata; the
    envelope projection casts key/value to string (the engine's JSON
    payload convention) and keeps (topic, partition, offset) for lineage,
    matching the reference's SinkRecord fields.
    """
    if max_offsets_per_trigger is not None and max_offsets_per_trigger <= 0:
        raise ValueError("max_offsets_per_trigger must be positive")
    reader = (
        spark.readStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .option("failOnDataLoss", str(fail_on_data_loss).lower())
    )
    if max_offsets_per_trigger is not None:
        reader = reader.option("maxOffsetsPerTrigger", str(max_offsets_per_trigger))
    if min_partitions is not None:
        reader = reader.option("minPartitions", str(min_partitions))
    raw = reader.load()
    return raw.select(
        "topic",
        "partition",
        "offset",
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
    )


def kafka_batch(
    spark: SparkSession,
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "earliest",
    ending_offsets: str = "latest",
) -> DataFrame:
    """Bounded Kafka read (backfill/replay path), same envelope."""
    raw = (
        spark.read.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("subscribe", topics)
        .option("startingOffsets", starting_offsets)
        .option("endingOffsets", ending_offsets)
        .load()
    )
    return raw.select(
        "topic",
        "partition",
        "offset",
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
    )
