"""UDF-surface query entries (E19): scalar Python UDF, Arrow-vectorized
pandas UDF, and applyInPandas grouped-map — each checked against a pure-SQL
oracle computing the same function.

UDFs are the deliberate slow path (SURVEY.md steering): everything here is
also expressible with built-ins — the point of these entries is to verify
the Python execution surface itself (Arrow batch shape, type mapping,
grouped-map schema contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from kafka_connect_bigquery_storage_write_spark.queries import query
from kafka_connect_bigquery_storage_write_spark.queries.parity import CHARGE_DECIMAL_SQL, exact_avg4, exact_avg4_duckdb
from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table


@pandas_udf(T.DoubleType())
def _charge_vec(extprice: pd.Series, discount: pd.Series, tax: pd.Series) -> pd.Series:
    """Arrow-batched: whole columns arrive as pandas Series.

    The arithmetic runs in integer cents: the inputs are 2-decimal money,
    so price*(1-d)*(1+t) is exact in int64 at scale 1e-6 and the half-up
    round to cents is deterministic — float round here would diverge from
    the oracle's exact-decimal rounding at half boundaries (and pandas
    rounds half-to-even besides).
    """
    pc = np.round(extprice.to_numpy() * 100).astype(np.int64)
    dc = np.round(discount.to_numpy() * 100).astype(np.int64)
    tc = np.round(tax.to_numpy() * 100).astype(np.int64)
    v = pc * (100 - dc) * (100 + tc)  # exact, scale 1e-6
    cents = (v + 5_000) // 10_000  # half-up to 2dp (values non-negative)
    return pd.Series(cents / 100.0)


@query(
    "q60_pandas_udf_charge",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {CHARGE_DECIMAL_SQL} AS charge
    FROM lineitem
    WHERE l_orderkey <= 100
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q60_pandas_udf_charge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vectorized pandas UDF computing the charge expression.

    Scale note: Arrow transfer makes this ~10-100x a row-at-a-time UDF,
    but it still leaves codegen — the built-in expression (q20) is the
    production form; this entry verifies the Arrow path end to end.
    """
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            _charge_vec("l_extendedprice", "l_discount", "l_tax").alias("charge"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


@query(
    "q61_apply_in_pandas_user_stats",
    oracle=f"""
    SELECT user_id,
           count(*)                 AS n_events,
           round(sum(value), 2)     AS sum_value,
           {exact_avg4_duckdb("sum(value)", "count(value)")} AS avg_value,
           round(max(value) - min(value), 4) AS value_range
    FROM events
    GROUP BY user_id
    ORDER BY user_id
    """,
)
def q61_apply_in_pandas_user_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map applyInPandas computing per-user panel stats.

    The grouped-map contract: each user's rows arrive as one pandas
    DataFrame; output schema is declared up front. This is the shape every
    custom stateful/statistical operator takes when built-ins run out.
    """
    ev = load_table(spark, sf_dir, "events")

    def stats(pdf: pd.DataFrame) -> pd.DataFrame:
        v = pdf["value"]
        # values are 2-decimal and non-negative: integer cents make the
        # sum exact and the 4dp half-up mean deterministic (float round
        # of the mean flips at half boundaries, and differently per
        # engine — see the oracle's mirrored integer form). Nulls are
        # dropped BEFORE the cents cast (np.round(NaN).astype(int64) is
        # INT64_MIN garbage, not an error); like SQL, sum/avg skip nulls
        # while n_events counts all rows.
        valid = v.dropna()
        cents = np.round(valid.to_numpy() * 100).astype(np.int64)
        n_valid, s = len(cents), int(cents.sum())
        avg4 = exact_avg4(s, n_valid) if n_valid else None
        return pd.DataFrame(
            {
                "user_id": [pdf["user_id"].iloc[0]],
                "n_events": [len(pdf)],
                "sum_value": [s / 100.0 if n_valid else None],
                "avg_value": [avg4],
                "value_range": [round(valid.max() - valid.min(), 4) if n_valid else None],
            }
        )

    from kafka_connect_bigquery_storage_write_spark.operators.partitioning import repartition_for_grouped_map

    out_schema = "user_id long, n_events long, sum_value double, avg_value double, value_range double"
    ev = repartition_for_grouped_map(ev, "user_id")  # see helper: AQE starves grouped-map stages
    return ev.groupBy("user_id").applyInPandas(stats, schema=out_schema).orderBy("user_id")


@query(
    "q62_python_udf_priority",
    oracle="""
    SELECT o_orderpriority,
           CAST(substr(o_orderpriority, 1, 1) AS INT) AS priority_rank,
           count(*) AS n_orders
    FROM orders
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q62_python_udf_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python scalar UDF (the slowest surface, verified last).

    Parses '1-URGENT' -> 1. Deliberately tiny input domain: the UDF runs
    once per distinct value AFTER the aggregate, not once per row — the
    pattern to reach for whenever a Python UDF is unavoidable.
    """
    parse_rank = F.udf(lambda p: int(p.split("-")[0]) if p else None, T.IntegerType())
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
        .withColumn("priority_rank", parse_rank("o_orderpriority"))
        .select("o_orderpriority", "priority_rank", "n_orders")
        .orderBy("o_orderpriority")
    )


@query(
    "q162_map_in_arrow_charge",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {CHARGE_DECIMAL_SQL} AS charge
    FROM lineitem
    WHERE l_orderkey <= 100
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q162_map_in_arrow_charge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """mapInArrow computing the charge expression — the FOURTH Python
    execution surface beside q62 (row UDF), q60 (pandas UDF) and q61
    (grouped-map): batches arrive as raw ``pyarrow.RecordBatch`` with no
    pandas materialization at all, the zero-copy floor of the Python
    path (what vectorized feature-extraction kernels use when even the
    pandas conversion is measurable overhead). Same integer-cents
    arithmetic and the same oracle as q60 — the surfaces must agree
    bit-for-bit.
    """
    import pyarrow as pa

    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 100)

    def kernel(batches):
        for batch in batches:
            pc = np.round(batch.column("l_extendedprice").to_numpy(zero_copy_only=False) * 100).astype(np.int64)
            dc = np.round(batch.column("l_discount").to_numpy(zero_copy_only=False) * 100).astype(np.int64)
            tc = np.round(batch.column("l_tax").to_numpy(zero_copy_only=False) * 100).astype(np.int64)
            cents = (pc * (100 - dc) * (100 + tc) + 5_000) // 10_000
            yield pa.RecordBatch.from_arrays(
                [batch.column("l_orderkey"), batch.column("l_linenumber"), pa.array(cents / 100.0)],
                names=["l_orderkey", "l_linenumber", "charge"],
            )

    out = T.StructType(
        [
            T.StructField("l_orderkey", T.LongType()),
            T.StructField("l_linenumber", T.IntegerType()),
            T.StructField("charge", T.DoubleType()),
        ]
    )
    return (
        li.select("l_orderkey", "l_linenumber", "l_extendedprice", "l_discount", "l_tax")
        .mapInArrow(kernel, schema=out)
        .orderBy("l_orderkey", "l_linenumber")
    )
