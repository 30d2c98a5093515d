"""ranked_prefix_sum: the distributed global rank/cumsum must agree
row-for-row with the single-partition window it replaces (VERDICT r5
#3), including under duplicate order-values, empty range partitions,
and descending orders."""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from kafka_connect_bigquery_storage_write_spark.operators.partitioning import ranked_prefix_sum


def _fixture(spark, n=997, parts=8):
    # deterministic values with heavy duplication in v so ties exercise
    # the tiebreak; k is the unique total-order tiebreaker
    return spark.range(n).select(
        F.col("id").alias("k"), (F.pmod(F.col("id") * 37, F.lit(19))).alias("v")
    ).repartition(parts)


def test_matches_single_partition_window(spark):
    df = _fixture(spark)
    order = [F.col("v").desc(), F.col("k")]
    got = {
        r["k"]: (r["r"], r["cum"])
        for r in ranked_prefix_sum(df, order, value="v").collect()
    }
    w = Window.orderBy(F.col("v").desc(), F.col("k"))
    exp = {
        r["k"]: (r["r"], r["cum"])
        for r in df.withColumn("r", F.row_number().over(w).cast("long"))
        .withColumn("cum", F.sum("v").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .collect()
    }
    assert got == exp


def test_rank_only_ascending(spark):
    df = _fixture(spark, n=256)
    got = {r["k"]: r["i"] for r in ranked_prefix_sum(df, [F.col("v"), F.col("k")], rank_col="i").collect()}
    w = Window.orderBy("v", "k")
    exp = {r["k"]: r["i"] for r in df.withColumn("i", F.row_number().over(w).cast("long")).collect()}
    assert got == exp


def test_more_partitions_than_rows(spark):
    # empty range partitions must not corrupt the offsets
    df = _fixture(spark, n=5, parts=3)
    got = sorted(
        (r["r"], r["k"]) for r in ranked_prefix_sum(df, [F.col("k")], num_partitions=16).collect()
    )
    assert [r for r, _ in got] == [1, 2, 3, 4, 5]
    assert got == [(i + 1, i) for i in range(5)]
