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


@dataclass
class DeadLetterQueue:
    root: str

    def __post_init__(self) -> None:
        os.makedirs(self.root, exist_ok=True)

    def write(self, bad_df: DataFrame, batch_id: int, error_col: str = "_errors") -> None:
        out = bad_df.withColumn("_dlq_batch_id", F.lit(batch_id)).withColumnRenamed(error_col, "_dlq_errors")
        out.write.mode("overwrite").parquet(os.path.join(self.root, f"batch={batch_id}"))

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.root)

    def is_empty(self) -> bool:
        return not any(name.startswith("batch=") for name in os.listdir(self.root))
