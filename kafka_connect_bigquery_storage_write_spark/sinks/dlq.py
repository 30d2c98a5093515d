"""Dead-letter queue sink (SURVEY.md R10–R12).

The reference reports each corrupt row to the Connect errantRecordReporter
(DLQ topic) keyed by its Kafka offset (reference:
BigqueryStorageWriteSinkTask.java:86-92; offset mapping
BigqueryStreamWriter.java:167-183). Here the bad-rows DataFrame — already
carrying its `_errors` reasons from the validation split — lands in a
parquet DLQ table with batch/offset lineage so every corrupt row stays
queryable and replayable.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


REPLAYED_MARKER = "_REPLAYED"


@dataclass
class DeadLetterQueue:
    root: str

    def __post_init__(self) -> None:
        os.makedirs(self.root, exist_ok=True)

    def write(self, bad_df: DataFrame, batch_id: int, error_col: str = "_errors") -> None:
        out = bad_df.withColumn("_dlq_batch_id", F.lit(batch_id)).withColumnRenamed(error_col, "_dlq_errors")
        out.write.mode("overwrite").parquet(os.path.join(self.root, f"batch={batch_id}"))

    def _batch_dir(self, batch_id: int) -> str:
        return os.path.join(self.root, f"batch={batch_id}")

    def batch_ids(self, include_replayed: bool = False) -> list[int]:
        """Batch ids present on disk, oldest first; replay-tombstoned dirs
        excluded unless asked for."""
        ids = []
        for name in os.listdir(self.root):
            if not name.startswith("batch="):
                continue
            bid = int(name.split("=", 1)[1])
            if include_replayed or not os.path.exists(os.path.join(self.root, name, REPLAYED_MARKER)):
                ids.append(bid)
        return sorted(ids)

    def read(self, spark: SparkSession, batch_ids: list[int] | None = None) -> DataFrame:
        """Read DLQ rows; default = every batch NOT yet marked replayed.

        ``mergeSchema`` is required: batch dirs are heterogeneous by design
        (envelope rows carry ``value_raw_b64`` only on the Avro path;
        non-envelope batches lack the Kafka columns entirely), and a
        single-footer inferred schema would silently drop the columns that
        only other batches carry — replay would then lose the raw payload.
        """
        ids = self.batch_ids() if batch_ids is None else sorted(set(batch_ids))
        if not ids:
            raise ValueError("no DLQ batches to read (all replayed or DLQ empty)")
        paths = [self._batch_dir(b) for b in ids]
        return spark.read.option("mergeSchema", "true").parquet(*paths)

    def mark_replayed(self, batch_ids: list[int]) -> None:
        """Tombstone batch dirs a successful replay consumed, so the next
        replay (after later batches dead-letter new rows) cannot re-ingest
        them — sink idempotence keys on batch id and would NOT dedupe a
        second replay under a fresh id."""
        for bid in batch_ids:
            marker = os.path.join(self._batch_dir(bid), REPLAYED_MARKER)
            with open(marker, "w") as fh:
                fh.write("replayed\n")

    def is_empty(self) -> bool:
        return not self.batch_ids()
