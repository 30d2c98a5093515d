"""Schema-mapped projection + row validation (SURVEY.md R5, R6, R10–R12).

The reference converts each buffered record Struct -> JSON and aborts the
row on a rule violation, salvaging the rest of the batch (reference:
RecordConverter.java:14-84; row salvage BigqueryStreamWriter.java:244-269).
Spark fails whole tasks, not rows, so the mechanism inverts (SURVEY.md §7
"hard parts"): validation runs as declarative column expressions *before*
the sink, producing an error column; the batch is then split into a good
DataFrame (written) and a bad DataFrame (dead-lettered with reasons).
All checks are JVM-side Catalyst expressions — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_bigquery_storage_write_spark.schema.lattice import validate_sink_schema

ERROR_COL = "_errors"


def _required_null_checks(struct_col: str, schema: T.StructType, path: str = "") -> list[Column]:
    """One check per non-nullable field: null => error string.

    Mirrors the reference's "Not optional field has null value"
    (RecordConverter.java:25-31), recursively for nested structs.
    """
    checks: list[Column] = []
    for field in schema.fields:
        ref = f"{struct_col}.{path}{field.name}" if path or struct_col else field.name
        label = f"{path}{field.name}"
        if not field.nullable:
            checks.append(
                F.when(
                    F.col(ref).isNull(),
                    F.lit(f"Not optional field has null value: {label}"),
                )
            )
        if isinstance(field.dataType, T.StructType):
            # nested required fields only apply when the parent is present
            for c in _required_null_checks(struct_col, field.dataType, path=f"{path}{field.name}."):
                checks.append(F.when(F.col(ref).isNotNull(), c))
    return checks


def convert_and_validate(
    df: DataFrame,
    value_col: str,
    schema: T.StructType,
    *,
    allow_binary: bool = False,
    corrupt_field: str | None = None,
) -> DataFrame:
    """Attach ``_errors: array<string>`` describing every rule violation.

    Static lattice rules (map key / bytes / unknown type) are enforced once
    at plan time; dynamic rules become an array of per-row error messages:
    - record value is not a struct / failed to parse -> non-struct drop (R4);
      pass ``corrupt_field`` (a field inside the struct populated via
      from_json's columnNameOfCorruptRecord) to catch malformed payloads,
      which PERMISSIVE parsing yields as structs full of nulls
    - null in a required field (R6)
    """
    validate_sink_schema(schema, allow_binary=allow_binary)
    not_struct = F.col(value_col).isNull()
    if corrupt_field is not None:
        not_struct = not_struct | F.col(f"{value_col}.{corrupt_field}").isNotNull()
    checks: list[Column] = [
        F.when(not_struct, F.lit("record is ignored because it is not struct record"))
    ]
    checks.extend(
        F.when(~not_struct, c) for c in _required_null_checks(value_col, schema)
    )
    errors = F.array_compact(F.array(*checks))
    return df.withColumn(ERROR_COL, errors)


def split_valid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a validated frame into (good, bad) on the error column.

    The inverted form of the reference's partial-batch salvage: bad rows
    leave the flow toward the DLQ, good rows continue to the sink in the
    same micro-batch (BigqueryStreamWriter.java:244-269 semantics).
    """
    good = df.filter(F.size(F.col(ERROR_COL)) == 0).drop(ERROR_COL)
    bad = df.filter(F.size(F.col(ERROR_COL)) > 0)
    return good, bad


def project_to_sink_schema(df: DataFrame, value_col: str, sink_schema: T.StructType) -> DataFrame:
    """Project the struct column onto the sink table's schema.

    Implements the reference's setIgnoreUnknownFields(true) semantics
    (BigqueryStreamWriter.java:206-209): source fields absent from the
    sink schema are silently dropped; sink fields absent from the source
    arrive as nulls (the Storage Write API would reject non-null required
    ones — our required-null check runs first).
    """
    src_type = df.schema[value_col].dataType
    if not isinstance(src_type, T.StructType):
        raise TypeError(f"{value_col} must be a struct column, got {src_type.simpleString()}")
    src_fields = {f.name for f in src_type.fields}
    cols = [
        (F.col(f"{value_col}.{f.name}") if f.name in src_fields else F.lit(None)).cast(f.dataType).alias(f.name)
        for f in sink_schema.fields
    ]
    return df.select(*cols)
