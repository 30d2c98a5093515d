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


def kafka_reader_options(
    bootstrap_servers: str,
    topics: str,
    starting_offsets: str = "latest",
    max_offsets_per_trigger: int | None = None,
    min_partitions: int | None = None,
    fail_on_data_loss: bool = True,
) -> dict[str, str]:
    """The EXACT option set the kafka reader is built with — a pure
    function so the contract is pytest-pinned without a broker or the
    spark-sql-kafka jar (VERDICT r5 #5), and ``tools/probe_kafka.py``
    drives the same dict end-to-end when both exist.

    Reference mapping (BigqueryStorageWriteSinkTask.java:98-116 and the
    Connect framework semantics it inherits):
    - ``subscribe``: the task consumes the connector's configured topic
      set; one logical stream per TopicPartition (R1/R2).
    - ``startingOffsets``: Connect resumes from committed consumer
      offsets; 'latest' is the fresh-group default, a checkpoint dir is
      the committed-offset store on the Spark side (R15/R18).
    - ``failOnDataLoss=true`` default: the reference treats an offset
      gap as an error and rewinds rather than silently skipping
      (OUT_OF_RANGE -> rewind, BigqueryStreamWriter.java:162-165);
      deployments that prefer skip-and-continue opt out explicitly.
    - ``maxOffsetsPerTrigger``: micro-batch size cap, the analogue of
      buffer.size=1000 (BigqueryStreamWriteSinkConfig.java:36-41) —
      validated positive exactly like the reference's config check.
    - ``minPartitions``: Spark-only scale knob (split hot Kafka
      partitions across more tasks); no reference analogue, optional.
    """
    if max_offsets_per_trigger is not None and max_offsets_per_trigger <= 0:
        raise ValueError("max_offsets_per_trigger must be positive")
    if min_partitions is not None and min_partitions <= 0:
        raise ValueError("min_partitions must be positive")
    opts = {
        "kafka.bootstrap.servers": bootstrap_servers,
        "subscribe": topics,
        "startingOffsets": starting_offsets,
        "failOnDataLoss": str(fail_on_data_loss).lower(),
    }
    if max_offsets_per_trigger is not None:
        opts["maxOffsetsPerTrigger"] = str(max_offsets_per_trigger)
    if min_partitions is not None:
        opts["minPartitions"] = str(min_partitions)
    return opts


def envelope_projection(raw: DataFrame) -> DataFrame:
    """Normalize the raw kafka relation to the engine's envelope columns
    (string key/value + lineage), shared by the stream and batch readers
    and by the probe's read-back assertions."""
    return raw.select(
        "topic",
        "partition",
        "offset",
        F.col("key").cast("string").alias("key"),
        F.col("value").cast("string").alias("value"),
    )


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
    opts = kafka_reader_options(
        bootstrap_servers,
        topics,
        starting_offsets=starting_offsets,
        max_offsets_per_trigger=max_offsets_per_trigger,
        min_partitions=min_partitions,
        fail_on_data_loss=fail_on_data_loss,
    )
    return envelope_projection(spark.readStream.format("kafka").options(**opts).load())


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
    return envelope_projection(raw)
