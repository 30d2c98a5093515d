"""Schema Registry compatibility semantics (schema/compat.py): the
Avro-derived matrix every Kafka->sink pipeline enforces upstream of the
connector. Pure-python, no Spark session needed."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T

from kafka_connect_bigquery_storage_write_spark.schema.compat import check


def S(*fields):
    return T.StructType(list(fields))


def f(name, dt, nullable=True):
    return T.StructField(name, dt, nullable)


BASE = S(f("id", T.LongType(), False), f("name", T.StringType()))


# ---- add / remove ----------------------------------------------------------

def test_add_nullable_field_is_full_compatible():
    new = S(*BASE.fields, f("extra", T.DoubleType(), True))
    assert check(BASE, new, "backward").compatible
    assert check(BASE, new, "forward").compatible
    assert check(BASE, new, "full").compatible


def test_add_required_field_breaks_backward_only():
    new = S(*BASE.fields, f("extra", T.DoubleType(), False))
    assert not check(BASE, new, "backward").compatible  # new reader can't fill it
    assert check(BASE, new, "forward").compatible       # old reader just drops it
    assert not check(BASE, new, "full").compatible


def test_remove_nullable_field_is_full_compatible():
    new = S(BASE.fields[0])
    assert check(BASE, new, "full").compatible


def test_remove_required_field_breaks_forward_only():
    old = S(f("id", T.LongType(), False), f("req", T.StringType(), False))
    new = S(f("id", T.LongType(), False))
    assert check(old, new, "backward").compatible
    rep = check(old, new, "forward")
    assert not rep.compatible and "req" in rep.errors[0]


# ---- type promotion --------------------------------------------------------

@pytest.mark.parametrize(
    "narrow,wide",
    [
        (T.IntegerType(), T.LongType()),
        (T.ShortType(), T.IntegerType()),
        (T.LongType(), T.DoubleType()),
        (T.FloatType(), T.DoubleType()),
        (T.ByteType(), T.LongType()),
    ],
)
def test_widening_is_backward_narrowing_is_forward_only(narrow, wide):
    old = S(f("v", narrow))
    new = S(f("v", wide))
    assert check(old, new, "backward").compatible      # wide reader reads narrow data
    assert not check(old, new, "forward").compatible   # narrow reader can't read wide
    assert not check(old, new, "full").compatible


def test_string_to_long_never_compatible():
    assert not check(S(f("v", T.StringType())), S(f("v", T.LongType())), "backward").compatible
    assert not check(S(f("v", T.StringType())), S(f("v", T.LongType())), "forward").compatible


# ---- nullability -----------------------------------------------------------

def test_required_to_nullable_is_backward_not_forward():
    old = S(f("v", T.LongType(), False))
    new = S(f("v", T.LongType(), True))
    assert check(old, new, "backward").compatible
    assert not check(old, new, "forward").compatible


# ---- nesting ---------------------------------------------------------------

def test_nested_struct_recurses_with_path():
    old = S(f("s", S(f("x", T.IntegerType()))))
    new = S(f("s", S(f("x", T.LongType()))))
    assert check(old, new, "backward").compatible
    rep = check(old, new, "forward")
    assert not rep.compatible and "$.s.x" in rep.errors[0]


def test_array_and_map_value_types_checked():
    old = S(f("a", T.ArrayType(T.IntegerType())), f("m", T.MapType(T.StringType(), T.FloatType())))
    new = S(f("a", T.ArrayType(T.LongType())), f("m", T.MapType(T.StringType(), T.DoubleType())))
    assert check(old, new, "backward").compatible
    assert not check(old, new, "forward").compatible


def test_decimal_precision_widening():
    old = S(f("d", T.DecimalType(10, 2)))
    new = S(f("d", T.DecimalType(18, 2)))
    assert check(old, new, "backward").compatible
    assert not check(old, new, "forward").compatible
    # scale change is never compatible
    assert not check(old, S(f("d", T.DecimalType(18, 4))), "backward").compatible


# ---- modes -----------------------------------------------------------------

def test_none_mode_accepts_anything():
    assert check(S(f("v", T.StringType())), S(f("w", T.BinaryType())), "none").compatible


def test_unknown_mode_raises():
    with pytest.raises(ValueError):
        check(BASE, BASE, "transitive")


def test_additive_sink_evolution_is_backward_check():
    """The manifest sink's additive mode == BACKWARD with nullable adds:
    the exact schema pair test_schema_evolution.py drives through the
    sink must pass here too (contract alignment)."""
    old = S(f("o_orderkey", T.LongType()), f("o_orderstatus", T.StringType()))
    new = S(*old.fields, f("o_totalprice", T.DoubleType(), True))
    assert check(old, new, "backward").compatible
