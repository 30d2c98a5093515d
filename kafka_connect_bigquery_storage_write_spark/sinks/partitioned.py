"""Hive-style partitioned parquet writer: partition pruning for time/key
range queries.

At warehouse scale, the cheapest bytes are the ones never read: laying a
fact table out as ``dt=YYYY-MM-DD/`` directories lets every query with a
date predicate prune whole partitions at PLANNING time (the scan's
PartitionFilters), reducing a year-long table to the days asked for
before a single row is read. This composes with (not replaces) parquet
row-group min/max skipping, which still applies within each kept file.

Partition column choice is a cardinality game: date/hour (thousands of
values) prune well; high-cardinality keys (user_id) create millions of
tiny directories and kill the listing — bucket those instead
(sinks/bucketed.py). The two compose: partition by day, bucket by join
key within each day.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_date_partitioned(
    df: DataFrame,
    path: str,
    ts_col: str,
    partition_col: str = "dt",
    mode: str = "overwrite",
) -> None:
    """Write parquet partitioned by the DATE of ``ts_col``.

    The derived date column is materialized into the data (Spark moves it
    into the directory structure); readers get it back as a partition
    column and predicates on it prune directories.
    """
    out = df.withColumn(partition_col, F.to_date(F.col(ts_col)))
    out.write.mode(mode).partitionBy(partition_col).parquet(path)


def read_partitioned(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.parquet(path)


def partition_filters(df: DataFrame) -> str:
    """The PartitionFilters the planner attached to ``df``'s scans —
    empty string means every partition would be read (predicate not
    prunable: wrong column, or wrapped in a non-foldable expression)."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "\n".join(line.strip() for line in plan.splitlines() if "PartitionFilters" in line)


def prunes_partitions(df: DataFrame, column: str) -> bool:
    """True iff some scan in ``df``'s plan has a non-empty PartitionFilters
    mentioning ``column``.

    Only the bracketed PartitionFilters list itself is inspected — the
    FileScan line continues with PushedFilters/ReadSchema text that would
    otherwise make any column name "match" (a false green for plans that
    prune nothing).
    """
    for line in partition_filters(df).splitlines():
        if "PartitionFilters: [" not in line:
            continue
        inner = line.split("PartitionFilters: [", 1)[1].split("]", 1)[0].strip()
        if inner and column in inner:
            return True
    return False
