"""Bucketed tables: the co-located join skips the shuffle, results intact."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kafka_connect_bigquery_storage_write_spark.sinks.bucketed import bucketed_table, write_bucketed
from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table


@pytest.fixture()
def no_broadcast(spark):
    """Force a real shuffle-or-colocate decision (no broadcast shortcut)."""
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_has_no_exchange(spark, sf_dir, tmp_path, no_broadcast):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey")
    write_bucketed(li, "t_li_b", str(tmp_path / "li"), "l_orderkey", buckets=8)
    write_bucketed(orders, "t_ord_b", str(tmp_path / "ord"), "l_orderkey", buckets=8)
    try:
        joined = bucketed_table(spark, "t_li_b").join(bucketed_table(spark, "t_ord_b"), "l_orderkey")
        plan = _plan(joined)
        assert "Exchange" not in plan, plan
        # same join over the raw (unbucketed) relations must shuffle — the
        # control proving the bucketing (not e.g. AQE) removed the exchange
        control = _plan(li.join(orders, "l_orderkey"))
        assert "Exchange" in control, control
        # and the co-located join returns the same rows
        n_b = joined.count()
        n_c = li.join(orders, "l_orderkey").count()
        assert n_b == n_c > 0
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_b")
        spark.sql("DROP TABLE IF EXISTS t_ord_b")


def test_bucketed_aggregation_has_no_exchange(spark, sf_dir, tmp_path, no_broadcast):
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    write_bucketed(li, "t_li_agg", str(tmp_path / "li_agg"), "l_orderkey", buckets=8)
    try:
        agg = bucketed_table(spark, "t_li_agg").groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        assert "Exchange" not in _plan(agg), _plan(agg)
        raw = li.groupBy("l_orderkey").agg(F.sum("l_quantity").alias("q"))
        assert "Exchange" in _plan(raw)
        assert agg.count() == raw.count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_agg")


def test_mismatched_bucket_counts_still_correct(spark, sf_dir, tmp_path, no_broadcast):
    """Different bucket counts can't co-locate — Spark must fall back to a
    correct (shuffled) plan, never a wrong one."""
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    orders = load_table(spark, sf_dir, "orders").select(F.col("o_orderkey").alias("l_orderkey"), "o_custkey")
    write_bucketed(li, "t_li_m", str(tmp_path / "li_m"), "l_orderkey", buckets=8)
    write_bucketed(orders, "t_ord_m", str(tmp_path / "ord_m"), "l_orderkey", buckets=4)
    try:
        joined = bucketed_table(spark, "t_li_m").join(bucketed_table(spark, "t_ord_m"), "l_orderkey")
        assert joined.count() == li.join(orders, "l_orderkey").count()
    finally:
        spark.sql("DROP TABLE IF EXISTS t_li_m")
        spark.sql("DROP TABLE IF EXISTS t_ord_m")


def test_rejects_nonpositive_buckets(spark, sf_dir, tmp_path):
    li = load_table(spark, sf_dir, "lineitem")
    with pytest.raises(ValueError, match="positive"):
        write_bucketed(li, "t_bad", str(tmp_path / "bad"), "l_orderkey", buckets=0)
