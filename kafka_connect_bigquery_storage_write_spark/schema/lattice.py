"""Type lattice rules of the record-conversion layer (SURVEY.md §1.2, R5).

The reference's conversion switch (reference: src/main/java/com/reproio/
kafka/connect/bigquery/RecordConverter.java:33-83) defines which types a
record may carry and which are rejected:

- STRUCT / MAP(string->V) / ARRAY / integral / floating / BOOLEAN / STRING
  are supported (recursively);
- MAP with a non-string key is rejected
  (RecordConverter.java:53-58 "Map field has non-string key");
- BYTES is rejected (RecordConverter.java:79-80 "Bytes field is unsupported");
- anything else is rejected (RecordConverter.java:81-82 "Unknown data type").

In Spark the schema is fixed per source, so these checks hoist from
per-row conversion time to plan time: ``validate_sink_schema`` walks a
StructType once and raises ``UnsupportedDataTypeError`` exactly where the
reference would have thrown per record. Row-level rules (null in a
required field, RecordConverter.java:25-31) stay dynamic — see convert.py.
"""

from __future__ import annotations

from pyspark.sql import types as T


class UnsupportedDataTypeError(Exception):
    """Spark-side analogue of the reference's UnsupportedDataTypeException."""


_PASSTHROUGH_TYPES = (
    T.ByteType,      # INT8
    T.ShortType,     # INT16
    T.IntegerType,   # INT32
    T.LongType,      # INT64
    T.FloatType,     # FLOAT32
    T.DoubleType,    # FLOAT64
    T.BooleanType,   # BOOLEAN
    T.StringType,    # STRING
)


def validate_sink_schema(dtype: T.DataType, path: str = "$", *, allow_binary: bool = False) -> None:
    """Recursively enforce the reference's type lattice on a Spark schema.

    ``allow_binary=True`` opts into the engine's BinaryType extension
    (multimodal columns); default matches reference semantics (reject).
    """
    if isinstance(dtype, T.StructType):
        for field in dtype.fields:
            validate_sink_schema(field.dataType, f"{path}.{field.name}", allow_binary=allow_binary)
        return
    if isinstance(dtype, T.MapType):
        if not isinstance(dtype.keyType, T.StringType):
            raise UnsupportedDataTypeError(f"Map field has non-string key at {path}")
        validate_sink_schema(dtype.valueType, f"{path}[value]", allow_binary=allow_binary)
        return
    if isinstance(dtype, T.ArrayType):
        validate_sink_schema(dtype.elementType, f"{path}[]", allow_binary=allow_binary)
        return
    if isinstance(dtype, T.BinaryType):
        if allow_binary:
            return
        raise UnsupportedDataTypeError(f"Bytes field is unsupported at {path}")
    if isinstance(dtype, _PASSTHROUGH_TYPES):
        return
    raise UnsupportedDataTypeError(f"Unknown data type: {dtype.simpleString()} at {path}")
