"""Date-partitioned layout: pruning reaches the scan, results intact."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from kafka_connect_bigquery_storage_write_spark.sinks.partitioned import (
    partition_filters,
    prunes_partitions,
    read_partitioned,
    write_date_partitioned,
)
from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table


def _write(spark, sf_dir, tmp_path) -> str:
    path = str(tmp_path / "events_by_day")
    write_date_partitioned(load_table(spark, sf_dir, "events"), path, ts_col="ts")
    return path


def test_layout_is_hive_style_directories(spark, sf_dir, tmp_path):
    path = _write(spark, sf_dir, tmp_path)
    days = [d for d in os.listdir(path) if d.startswith("dt=")]
    assert len(days) > 1, days  # fixture spans multiple days


def test_date_predicate_prunes_partitions(spark, sf_dir, tmp_path):
    path = _write(spark, sf_dir, tmp_path)
    df = read_partitioned(spark, path).filter(F.col("dt") == "2024-01-05")
    assert prunes_partitions(df, "dt"), partition_filters(df)
    # control: an unpartitioned predicate (on value) prunes nothing
    ctl = read_partitioned(spark, path).filter(F.col("value") > 0)
    assert not prunes_partitions(ctl, "dt"), partition_filters(ctl)


def test_pruned_read_returns_exactly_that_day(spark, sf_dir, tmp_path):
    path = _write(spark, sf_dir, tmp_path)
    ev = load_table(spark, sf_dir, "events")
    expected = ev.filter(F.to_date("ts") == "2024-01-05").count()
    got = read_partitioned(spark, path).filter(F.col("dt") == "2024-01-05").count()
    assert got == expected > 0


def test_range_predicate_also_prunes(spark, sf_dir, tmp_path):
    path = _write(spark, sf_dir, tmp_path)
    df = read_partitioned(spark, path).filter((F.col("dt") >= "2024-01-03") & (F.col("dt") < "2024-01-06"))
    assert prunes_partitions(df, "dt")
    ev = load_table(spark, sf_dir, "events")
    expected = ev.filter((F.to_date("ts") >= "2024-01-03") & (F.to_date("ts") < "2024-01-06")).count()
    assert df.count() == expected > 0


def test_prunes_partitions_not_fooled_by_pushed_filters(spark, tmp_path):
    """Regression: a data column whose name contains the partition
    column's name ('dt' in 'width') appears in PushedFilters/ReadSchema on
    the same FileScan line; the assertion must inspect only the bracketed
    PartitionFilters list, not the rest of the line."""
    path = str(tmp_path / "t")
    df = spark.createDataFrame(
        [("2024-01-01", 10), ("2024-01-02", 20)], "dt string, width int"
    )
    df.write.mode("overwrite").partitionBy("dt").parquet(path)
    only_width = read_partitioned(spark, path).filter(F.col("width") > 5)
    assert not prunes_partitions(only_width, "dt"), partition_filters(only_width)
    on_dt = read_partitioned(spark, path).filter(F.col("dt") == "2024-01-01")
    assert prunes_partitions(on_dt, "dt")
