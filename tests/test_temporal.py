"""as-of join semantics: tie matching, staleness, left vs inner, and
multi-column payload atomicity."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.operators.temporal import asof_join


def _ts(spark, rows, schema):
    df = spark.createDataFrame(rows, schema)
    for c, t in [(f.name, f.dataType.simpleString()) for f in df.schema.fields]:
        if c.endswith("ts"):
            df = df.withColumn(c, F.to_timestamp(c))
    return df


def test_asof_backward_match_and_ties(spark):
    left = _ts(spark, [(1, "2024-01-01 10:00:00", "a"), (1, "2024-01-01 12:00:00", "b"), (2, "2024-01-01 10:00:00", "c")],
               "k long, ts string, tag string")
    right = _ts(spark, [(1, "2024-01-01 09:00:00", 100.0), (1, "2024-01-01 12:00:00", 200.0), (2, "2024-01-01 11:00:00", 300.0)],
                "k long, rts string, v double")
    out = asof_join(left, right, by="k", left_ts="ts", right_ts="rts", right_payload=["v"], how="inner")
    got = {(r.k, r.tag): r.v for r in out.collect()}
    assert got[(1, "a")] == 100.0   # most recent at-or-before 10:00 is 09:00
    assert got[(1, "b")] == 200.0   # equal timestamps match (>= semantics)
    assert (2, "c") not in got      # right row is in the future -> no match


def test_asof_left_keeps_unmatched(spark):
    left = _ts(spark, [(2, "2024-01-01 10:00:00", "c")], "k long, ts string, tag string")
    right = _ts(spark, [(2, "2024-01-01 11:00:00", 1.0)], "k long, rts string, v double")
    out = asof_join(left, right, by="k", left_ts="ts", right_ts="rts", right_payload=["v"], how="left").collect()
    assert len(out) == 1 and out[0].v is None


def test_asof_payload_is_atomic(spark):
    """Payload columns must come from the SAME right row even when one of
    them is legitimately null in a more recent row."""
    left = _ts(spark, [(1, "2024-01-01 12:00:00", "x")], "k long, ts string, tag string")
    right = _ts(spark, [(1, "2024-01-01 09:00:00", 1.0, "early"), (1, "2024-01-01 10:00:00", None, "late")],
                "k long, rts string, v double, label string")
    out = asof_join(left, right, by="k", left_ts="ts", right_ts="rts", right_payload=["v", "label"], how="inner").collect()
    # the matching row is the 10:00 one; its v is null and must NOT be
    # back-filled from the 09:00 row
    assert out[0].label == "late" and out[0].v is None


def test_asof_rejects_unknown_how(spark):
    import pytest

    with pytest.raises(ValueError, match="inner/left"):
        asof_join(spark.range(1), spark.range(1), by="id", left_ts="id", right_ts="id", right_payload=[], how="outer")
