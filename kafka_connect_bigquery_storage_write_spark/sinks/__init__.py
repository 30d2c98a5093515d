from kafka_connect_bigquery_storage_write_spark.sinks.sink_table import (
    AppendResult,
    ManifestSinkTable,
    RetryPolicy,
    UnretryableSinkError,
    classify_retriable,
)
from kafka_connect_bigquery_storage_write_spark.sinks.dlq import DeadLetterQueue

__all__ = [
    "AppendResult",
    "ManifestSinkTable",
    "RetryPolicy",
    "UnretryableSinkError",
    "classify_retriable",
    "DeadLetterQueue",
]
