"""Kafka dead-letter TOPIC sink — the reference's errant-record path.

The reference reports corrupt records to Connect's errantRecordReporter,
which produces them to a Kafka DLQ topic (reference:
BigqueryStorageWriteSinkTask.java:86-92). The engine's default DLQ is a
parquet table (sinks/dlq.py — queryable and replayable, strictly more
useful for batch forensics), but deployments standardized on topic-based
dead-lettering get the same surface here: the bad-rows DataFrame is
projected to the kafka sink's (key, value) contract and written with
``df.write.format("kafka")``.

No broker or spark-sql-kafka jar exists in this environment, so — like
sources/kafka.py — the writer is exercised at payload/construction level
in tests; on a cluster the ``write`` call is the production path
unchanged.

Payload contract (mirrors Connect's DLQ conventions):
- key: the source record's key (lineage back to the partition);
- value: JSON object {topic, partition, offset, key, value, errors,
  batch_id} — the full original envelope plus the validation reasons, so
  a replay consumer can re-ingest after fixing the upstream bug.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_ENVELOPE = ("topic", "partition", "offset", "key", "value")


@dataclass
class KafkaDeadLetterTopic:
    bootstrap_servers: str
    topic: str

    def payload(self, bad_df: DataFrame, batch_id: int, error_col: str = "_errors") -> DataFrame:
        """Project bad rows to the kafka sink contract: (key, value) strings.

        Kept separate from write() so tests (and dry runs) can pin the
        exact bytes that would be produced without needing a broker.
        """
        have_envelope = set(_ENVELOPE) <= set(bad_df.columns)
        fields = [
            *(
                [
                    F.col("topic").alias("src_topic"),
                    F.col("partition").alias("src_partition"),
                    F.col("offset").alias("src_offset"),
                    F.col("key").alias("src_key"),
                    F.col("value").cast("string").alias("src_value"),
                ]
                if have_envelope
                else []
            ),
            F.col(error_col).alias("errors"),
            F.lit(batch_id).alias("batch_id"),
        ]
        key = F.col("key").cast("string") if have_envelope else F.lit(None).cast("string")
        return bad_df.select(key.alias("key"), F.to_json(F.struct(*fields)).alias("value"))

    def write(self, bad_df: DataFrame, batch_id: int, error_col: str = "_errors") -> None:
        """Produce the batch to the DLQ topic (same duck-typed signature as
        the parquet DeadLetterQueue, so IngestPipeline treats them alike).

        Idempotence note: Kafka topics are append-only — a replayed batch
        produces duplicate DLQ records (consumers key on
        (src_topic, src_partition, src_offset) to dedup), which matches
        the reference's at-least-once reporter semantics. The parquet DLQ's
        batch-dir overwrite is strictly stronger; that asymmetry is why it
        stays the default.
        """
        (
            self.payload(bad_df, batch_id, error_col)
            .write.format("kafka")
            .option("kafka.bootstrap.servers", self.bootstrap_servers)
            .option("topic", self.topic)
            .save()
        )
