"""Schema-mapped projection + row validation (SURVEY.md R5, R6, R10–R12).

The reference converts each buffered record Struct -> JSON and aborts the
row on a rule violation, salvaging the rest of the batch (reference:
RecordConverter.java:14-84; row salvage BigqueryStreamWriter.java:244-269).
Spark fails whole tasks, not rows, so the mechanism inverts (SURVEY.md §7
"hard parts"): validation runs as declarative column expressions *before*
the sink, producing a validity flag plus per-row reasons; the batch is then
split into a good DataFrame (written) and a bad DataFrame (dead-lettered).
All checks are JVM-side Catalyst expressions — no Python in the row path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_bigquery_storage_write_spark.schema.lattice import validate_sink_schema

ERROR_COL = "_errors"
VALID_COL = "_is_valid"


def _required_null_rules(struct_col: str, schema: T.StructType, path: str = "") -> list[tuple[Column, str]]:
    """(violation-condition, message) per non-nullable field.

    Mirrors the reference's "Not optional field has null value"
    (RecordConverter.java:25-31), recursively for nested structs — a
    nested required field only applies when its parent struct is present.
    """
    rules: list[tuple[Column, str]] = []
    for field in schema.fields:
        ref = f"{struct_col}.{path}{field.name}"
        label = f"{path}{field.name}"
        if not field.nullable:
            rules.append((F.col(ref).isNull(), f"Not optional field has null value: {label}"))
        if isinstance(field.dataType, T.StructType):
            for cond, msg in _required_null_rules(struct_col, field.dataType, path=f"{path}{field.name}."):
                rules.append((F.col(ref).isNotNull() & cond, msg))
    return rules


def convert_and_validate(
    df: DataFrame,
    value_col: str,
    schema: T.StructType,
    *,
    allow_binary: bool = False,
    corrupt_field: str | None = None,
) -> DataFrame:
    """Attach ``_is_valid: boolean`` and ``_errors: array<string>``.

    Static lattice rules (map key / bytes / unknown type) are enforced once
    at plan time; dynamic rules become per-row expressions:
    - record value is not a struct / failed to parse -> non-struct drop (R4);
      pass ``corrupt_field`` (a field inside the struct populated via
      from_json's columnNameOfCorruptRecord) to catch malformed payloads,
      which PERMISSIVE parsing yields as structs full of nulls
    - null in a required field (R6)

    Two representations of the same rules on purpose: the boolean is a
    cheap AND-chain the split filter inlines; the reason array costs an
    interpreted array build per evaluation (measured ~2x the rest of
    validation), so downstream must evaluate it only on failing rows.
    """
    validate_sink_schema(schema, allow_binary=allow_binary)
    not_struct = F.col(value_col).isNull()
    if corrupt_field is not None:
        not_struct = not_struct | F.col(f"{value_col}.{corrupt_field}").isNotNull()
    rules = _required_null_rules(value_col, schema)

    is_valid = ~not_struct
    for cond, _msg in rules:
        is_valid = is_valid & ~F.coalesce(cond, F.lit(False))

    checks: list[Column] = [F.when(not_struct, F.lit("record is ignored because it is not struct record"))]
    checks.extend(F.when(~not_struct & cond, F.lit(msg)) for cond, msg in rules)
    errors = F.array_compact(F.array(*checks))

    return df.withColumn(VALID_COL, F.coalesce(is_valid, F.lit(False))).withColumn(ERROR_COL, errors)


def split_valid(df: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split a validated frame into (good, bad) on the validity flag.

    The inverted form of the reference's partial-batch salvage: bad rows
    leave the flow toward the DLQ with their reason array, good rows
    continue to the sink in the same micro-batch
    (BigqueryStreamWriter.java:244-269 semantics). The good branch filters
    on the boolean only — the reason array is never evaluated for rows
    that pass.
    """
    good = df.filter(F.col(VALID_COL)).drop(ERROR_COL, VALID_COL)
    bad = df.filter(~F.col(VALID_COL)).drop(VALID_COL)
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
