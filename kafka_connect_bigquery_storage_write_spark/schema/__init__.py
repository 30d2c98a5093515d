from kafka_connect_bigquery_storage_write_spark.schema.lattice import (
    UnsupportedDataTypeError,
    validate_sink_schema,
)
from kafka_connect_bigquery_storage_write_spark.schema.convert import (
    ERROR_COL,
    VALID_COL,
    convert_and_validate,
    project_to_sink_schema,
    split_valid,
)

__all__ = [
    "UnsupportedDataTypeError",
    "validate_sink_schema",
    "ERROR_COL",
    "VALID_COL",
    "convert_and_validate",
    "project_to_sink_schema",
    "split_valid",
]
