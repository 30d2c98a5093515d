"""Schema-compatibility checker (Confluent Schema Registry semantics).

The reference connector lives downstream of a Kafka Schema Registry: the
registry's compatibility mode decides which producer schema changes are
legal before records ever reach the sink (the sink itself freezes the
table schema — `BigqueryStreamWriter` builds its writer against the
table's descriptor once). This module re-creates the registry's check
for Spark schemas, with the standard Avro-derived rules (public
Confluent/Avro spec):

* BACKWARD  — data written with the OLD schema is readable by the NEW
  one: a field may be removed, or added only WITH a default (here:
  nullable, since Spark schemas carry no default values — null is the
  default); type changes must be promotions the reader accepts.
* FORWARD   — data written with the NEW schema is readable by the OLD
  one: a field may be added, or removed only if the old reader treats it
  as defaulted (nullable); type changes must be promotions in the other
  direction.
* FULL      — both: only nullable adds/removes and no-op type changes.
* NONE      — anything goes.

Numeric promotions follow Avro's lattice: byte -> short -> int -> long ->
float -> double (a reader with the WIDER type accepts data written with
the narrower). Nested structs recurse; arrays/maps check their element/
value types; a non-nullable -> nullable change is reader-compatible
(reader tolerates nulls it will never see), the reverse is not.

``ManifestSinkTable.schema_evolution="additive"`` is exactly
``check(old, new, "backward")`` with adds-must-be-nullable — this module
makes the registry-side contract testable on its own.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import types as T

_PROMOTION_ORDER = [
    T.ByteType(),
    T.ShortType(),
    T.IntegerType(),
    T.LongType(),
    T.FloatType(),
    T.DoubleType(),
]


def _promo_rank(dt: T.DataType) -> int | None:
    for i, t in enumerate(_PROMOTION_ORDER):
        if dt == t:
            return i
    return None


@dataclass
class CompatReport:
    compatible: bool
    errors: list[str] = field(default_factory=list)


def _reader_accepts(reader: T.DataType, writer: T.DataType, path: str, errors: list[str]) -> None:
    """Avro resolution direction: can data WRITTEN as ``writer`` be READ
    as ``reader``?"""
    if reader == writer:
        return
    rr, rw = _promo_rank(reader), _promo_rank(writer)
    if rr is not None and rw is not None:
        if rr >= rw:
            return
        errors.append(f"{path}: narrowing {writer.simpleString()} -> {reader.simpleString()}")
        return
    if isinstance(reader, T.StructType) and isinstance(writer, T.StructType):
        _check_struct(reader, writer, path, errors)
        return
    if isinstance(reader, T.ArrayType) and isinstance(writer, T.ArrayType):
        _reader_accepts(reader.elementType, writer.elementType, f"{path}[]", errors)
        return
    if isinstance(reader, T.MapType) and isinstance(writer, T.MapType):
        _reader_accepts(reader.keyType, writer.keyType, f"{path}<key>", errors)
        _reader_accepts(reader.valueType, writer.valueType, f"{path}<value>", errors)
        return
    if isinstance(reader, T.DecimalType) and isinstance(writer, T.DecimalType):
        if reader.precision >= writer.precision and reader.scale == writer.scale:
            return
        errors.append(f"{path}: decimal narrowing {writer.simpleString()} -> {reader.simpleString()}")
        return
    errors.append(f"{path}: incompatible type change {writer.simpleString()} -> {reader.simpleString()}")


def _check_struct(reader: T.StructType, writer: T.StructType, path: str, errors: list[str]) -> None:
    wmap = {f.name: f for f in writer.fields}
    rmap = {f.name: f for f in reader.fields}
    for name, rf in rmap.items():
        p = f"{path}.{name}"
        wf = wmap.get(name)
        if wf is None:
            # reader expects a field the writer never wrote: needs a default
            if not rf.nullable:
                errors.append(f"{p}: reader-required field absent from writer schema and not nullable")
            continue
        if not rf.nullable and wf.nullable:
            errors.append(f"{p}: reader requires non-null but writer may emit null")
        _reader_accepts(rf.dataType, wf.dataType, p, errors)
    # writer-only fields are simply dropped by the reader: always fine


def check(old: T.StructType, new: T.StructType, mode: str = "backward") -> CompatReport:
    """Is changing ``old`` -> ``new`` legal under ``mode``?

    BACKWARD: new reads old's data -> reader=new, writer=old.
    FORWARD:  old reads new's data -> reader=old, writer=new.
    FULL: both. NONE: always compatible.
    """
    mode = mode.lower()
    if mode not in ("backward", "forward", "full", "none"):
        raise ValueError(f"unknown compatibility mode {mode!r}")
    errors: list[str] = []
    if mode == "none":
        return CompatReport(True, [])
    if mode in ("backward", "full"):
        e: list[str] = []
        _check_struct(new, old, "$", e)
        errors += [f"backward: {m}" for m in e]
    if mode in ("forward", "full"):
        e = []
        _check_struct(old, new, "$", e)
        errors += [f"forward: {m}" for m in e]
    return CompatReport(not errors, errors)
