"""Schemaless fallback: infer a struct schema from JSON payloads.

The reference infers a type from the runtime Java class when a record has
no schema, treating inferred fields as optional (reference:
RecordConverter.java:17-19); top-level structs always need a schema
(RecordConverter.java:35-37). The Spark analogue: sample the JSON value
column, let the JSON datasource infer a StructType, and mark every field
nullable. Streaming requires the schema up front, so inference runs on a
bounded sample batch — the per-value dynamic fallback becomes a
per-source inference pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def infer_json_value_schema(
    spark: SparkSession,
    df: DataFrame,
    value_col: str = "value",
    sample_rows: int = 10_000,
) -> T.StructType:
    """Infer a StructType for a JSON-string column; all fields optional."""
    sample = df.select(F.col(value_col).cast("string").alias("v")).limit(sample_rows)
    inferred = spark.read.json(sample.rdd.map(lambda r: r.v or "{}"))
    schema = inferred.schema
    if not isinstance(schema, T.StructType) or not schema.fields:
        raise ValueError("could not infer a struct schema from the value column")
    return _all_optional(schema)


def _all_optional(dtype: T.StructType) -> T.StructType:
    fields = []
    for f in dtype.fields:
        dt = f.dataType
        if isinstance(dt, T.StructType):
            dt = _all_optional(dt)
        fields.append(T.StructField(f.name, dt, True))
    return T.StructType(fields)
