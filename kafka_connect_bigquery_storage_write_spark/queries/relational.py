"""Relational operator surface (SURVEY.md §2.2 E1–E13).

Every query is declarative DataFrame code — Catalyst gets full visibility
for predicate pushdown, column pruning, broadcast-join selection and AQE.
Scale notes are on each query: which joins broadcast, where the shuffles
are, and why the plan survives a 100× scale-up.

Aggregates are rounded (2–4 decimals) on BOTH the Spark and oracle side so
double-precision sum ordering differences can't flip the value hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.operators.partitioning import ensure_compute_parallelism
from kafka_connect_bigquery_storage_write_spark.queries import query
from kafka_connect_bigquery_storage_write_spark.queries.parity import CHARGE_DECIMAL_SQL, exact_avg_cents, revenue_decimal_col, revenue_decimal_sql
from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table, local_rows_df


# --------------------------------------------------------------------------
# E1 parquet scan + E2 projection/cast + E3 filter + E7 agg + E9 sort
# --------------------------------------------------------------------------
@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE)             AS sum_qty,
           CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)        AS sum_base_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_disc_price,
           CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * (1 - CAST(l_discount AS DECIMAL(18,2)))
                          * (1 + CAST(l_tax AS DECIMAL(18,2)))), 2) AS DOUBLE) AS sum_charge,
           {exact_avg_cents("CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) * 100 AS BIGINT)", "count(*)", 2, "duckdb")} AS avg_qty,
           {exact_avg_cents("CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) * 100 AS BIGINT)", "count(*)", 2, "duckdb")} AS avg_price,
           {exact_avg_cents("CAST(sum(CAST(l_discount AS DECIMAL(18,2))) * 100 AS BIGINT)", "count(*)", 4, "duckdb")} AS avg_disc,
           count(*)                                                           AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    ORDER BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary (full scan -> hash agg).

    Scale: single shuffle on a 6-value grouping key; partial (map-side)
    aggregation collapses ~100% of rows before the exchange, so the
    shuffle payload is O(partitions * 6) regardless of input size.
    """
    li = load_table(spark, sf_dir, "lineitem")
    # exact DECIMAL aggregation end to end (inputs are 2-decimal money):
    # float sums drift by engine-specific ulps, and a drifted sum that
    # lands near a rounding half boundary flips the last digit between
    # engines — decimal sums and integer-division means are bit-identical
    # everywhere (see queries/parity.py)
    qty = F.col("l_quantity").cast("decimal(18,2)")
    price = F.col("l_extendedprice").cast("decimal(18,2)")
    disc = F.col("l_discount").cast("decimal(18,2)")
    tax = F.col("l_tax").cast("decimal(18,2)")
    disc_price = price * (1 - disc)
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).cast("double").alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + tax)), 2).cast("double").alias("sum_charge"),
            F.sum(qty).alias("_sq"),
            F.sum(price).alias("_sp"),
            F.sum(disc).alias("_sd"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .selectExpr(
            "l_returnflag",
            "l_linestatus",
            "sum_qty",
            "sum_base_price",
            "sum_disc_price",
            "sum_charge",
            exact_avg_cents("CAST(_sq * 100 AS BIGINT)", "count_order", 2, "spark") + " AS avg_qty",
            exact_avg_cents("CAST(_sp * 100 AS BIGINT)", "count_order", 2, "spark") + " AS avg_price",
            exact_avg_cents("CAST(_sd * 100 AS BIGINT)", "count_order", 4, "spark") + " AS avg_disc",
            "count_order",
        )
        .select(
            "l_returnflag", "l_linestatus", "sum_qty", "sum_base_price", "sum_disc_price",
            "sum_charge", "avg_qty", "avg_price", "avg_disc", "count_order",
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


# --------------------------------------------------------------------------
# E3 filter: BETWEEN / IN / LIKE, pushed to the parquet scan
# --------------------------------------------------------------------------
@query(
    "q02_filtered_scan",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size, p_retailprice
    FROM part
    WHERE p_size BETWEEN 10 AND 30
      AND p_brand IN ('Brand#1', 'Brand#12', 'Brand#23')
      AND p_name LIKE '%red%'
    ORDER BY p_partkey
    """,
)
def q02_filtered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate variety (BETWEEN / IN / LIKE) on a projected scan.

    Scale: no shuffle at all (narrow plan); BETWEEN and IN reach the
    parquet reader as PushedFilters, LIKE is evaluated in the scan stage.
    """
    part = load_table(spark, sf_dir, "part")
    return (
        part.select("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice")
        .filter(
            F.col("p_size").between(10, 30)
            & F.col("p_brand").isin("Brand#1", "Brand#12", "Brand#23")
            & F.col("p_name").like("%red%")
        )
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# E4 inner equi-join chain (fact ⋈ fact ⋈ dim)
# --------------------------------------------------------------------------
@query(
    "q03_shipping_priority",
    oracle=f"""
    SELECT l_orderkey,
           {revenue_decimal_sql()} AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
      AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey
    LIMIT 10
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style join + agg + top-k.

    Scale: customer (filtered to one segment) broadcasts into orders;
    orders⋈lineitem is the one real shuffle, on the join key both sides
    already aggregate on. Top-k via orderBy+limit becomes TakeOrdered —
    no global sort materialization.
    """
    cust = load_table(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load_table(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    li = load_table(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > F.lit("1998-03-15 00:00:00").cast("timestamp")
    )
    return (
        li.join(orders.join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey")), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(revenue_decimal_col().alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey"))
        .limit(10)
    )


# --------------------------------------------------------------------------
# E6 semi join (EXISTS with correlated predicate)
# --------------------------------------------------------------------------
@query(
    "q04_order_priority_check",
    oracle="""
    SELECT o_orderpriority, count(*) AS order_count
    FROM orders
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
        SELECT 1 FROM lineitem
        WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
      )
    GROUP BY o_orderpriority
    ORDER BY o_orderpriority
    """,
)
def q04_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style EXISTS -> left-semi join with a non-equi residual.

    Scale: semi join shuffles both sides once on the order key and never
    materializes the (order x lineitem) multiplicity — output ≤ orders.
    """
    orders = load_table(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1996-07-01 00:00:00").cast("timestamp"))
    )
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    return (
        orders.join(
            li,
            (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


# --------------------------------------------------------------------------
# E4 star join through broadcast dimensions
# --------------------------------------------------------------------------
@query(
    "q05_supplier_region_volume",
    oracle=f"""
    SELECT n_name, {revenue_decimal_sql()} AS revenue
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    ORDER BY revenue DESC, n_name
    """,
)
def q05_supplier_region_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Star join: fact table joined through 3 broadcast dimensions.

    Scale: supplier/nation/region are broadcast (no shuffle of lineitem
    for any join); the only exchange is the final 25-key aggregation,
    collapsed map-side first. This is the canonical 100TB-safe star plan.
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    nation = load_table(spark, sf_dir, "nation")
    region = load_table(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    dims = supp.join(
        F.broadcast(nation.join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))),
        F.col("s_nationkey") == F.col("n_nationkey"),
    ).select("s_suppkey", "n_name")
    return (
        li.join(F.broadcast(dims), F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("n_name")
        .agg(revenue_decimal_col().alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("n_name"))
    )


# --------------------------------------------------------------------------
# E3 pure filter + global agg (no grouping key)
# --------------------------------------------------------------------------
@query(
    "q06_forecast_revenue",
    oracle="""
    SELECT CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))
                          * CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.03 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: tight filter + scalar aggregate.

    Scale: all four predicates push to the scan; the global sum is a
    two-stage partial/final agg moving one double per partition.
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & F.col("l_discount").between(0.03, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)") * F.col("l_discount").cast("decimal(18,2)")), 2
            ).cast("double").alias("revenue")
        )
    )


# --------------------------------------------------------------------------
# E5 outer join preserving unmatched left side
# --------------------------------------------------------------------------
@query(
    "q07_customer_order_counts",
    oracle="""
    SELECT c_custkey, c_name,
           count(o_orderkey)                         AS order_count,
           round(coalesce(sum(o_totalprice), 0), 2)  AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    ORDER BY c_custkey
    """,
)
def q07_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping customers with zero orders.

    Scale: shuffle join on custkey (both sides large at scale); the
    aggregation reuses the same key so AQE can avoid a second exchange.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("order_count"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spent"),
        )
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# E6 anti join (NOT EXISTS)
# --------------------------------------------------------------------------
@query(
    "q08_customers_without_orders",
    oracle="""
    SELECT c_custkey, c_name, c_mktsegment
    FROM customer
    WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    ORDER BY c_custkey
    """,
)
def q08_customers_without_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS -> left-anti join."""
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders").select("o_custkey")
    return (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


# --------------------------------------------------------------------------
# E7 hash aggregation with count(distinct)
# --------------------------------------------------------------------------
@query(
    "q09_status_distinct_customers",
    oracle="""
    SELECT o_orderstatus,
           count(DISTINCT o_custkey)     AS n_customers,
           count(*)                      AS n_orders,
           round(sum(o_totalprice), 2)   AS sum_price,
           round(max(o_totalprice), 2)   AS max_price,
           round(min(o_totalprice), 2)   AS min_price
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q09_status_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY with count(distinct) + min/max/sum in one pass.

    Scale: Spark expands distinct aggregation into a two-level agg
    (Expand + partial agg) — no driver-side distinct set.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.countDistinct("o_custkey").alias("n_customers"),
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("sum_price"),
            F.round(F.max("o_totalprice"), 2).alias("max_price"),
            F.round(F.min("o_totalprice"), 2).alias("min_price"),
        )
        .orderBy("o_orderstatus")
    )


# --------------------------------------------------------------------------
# E8 rollup (subtotal lattice)
# --------------------------------------------------------------------------
@query(
    "q10_rollup_quantities",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2) AS sum_qty,
           count(*)                  AS n_rows
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    ORDER BY l_returnflag NULLS FIRST, l_linestatus NULLS FIRST
    """,
)
def q10_rollup_quantities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP subtotals: (flag, status), (flag), ()."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.round(F.sum("l_quantity"), 2).alias("sum_qty"), F.count(F.lit(1)).alias("n_rows"))
        .orderBy(F.col("l_returnflag").asc_nulls_first(), F.col("l_linestatus").asc_nulls_first())
    )


@query(
    "q11_cube_volumes",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           count(*)                    AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q11_cube_volumes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over two dimensions (all 4 grouping sets)."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.cube("o_orderstatus", "o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
        .orderBy(F.col("o_orderstatus").asc_nulls_first(), F.col("o_orderpriority").asc_nulls_first())
    )


# --------------------------------------------------------------------------
# E9 multi-key sort + limit (top-k)
# --------------------------------------------------------------------------
@query(
    "q12_top_orders",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey
    LIMIT 25
    """,
)
def q12_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k: orderBy+limit compiles to TakeOrderedAndProject —
    per-partition heaps, no global sort, O(k) driver memory."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey"))
        .limit(25)
    )


# --------------------------------------------------------------------------
# E10 window functions: ranking
# --------------------------------------------------------------------------
@query(
    "q13_top_customers_per_nation",
    oracle="""
    SELECT n_nationkey, c_custkey, round(c_acctbal, 2) AS acctbal, rn
    FROM (
      SELECT c_nationkey AS n_nationkey, c_custkey, c_acctbal,
             row_number() OVER (PARTITION BY c_nationkey ORDER BY c_acctbal DESC, c_custkey) AS rn
      FROM customer
    )
    WHERE rn <= 3
    ORDER BY n_nationkey, rn
    """,
)
def q13_top_customers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number ranking window; deterministic tiebreak on custkey.

    Scale: one shuffle on the partition key; rank filter prunes to 3
    rows/nation before any further stage.
    """
    cust = load_table(spark, sf_dir, "customer")
    w = W.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey"))
    return (
        cust.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select(
            F.col("c_nationkey").alias("n_nationkey"),
            "c_custkey",
            F.round("c_acctbal", 2).alias("acctbal"),
            "rn",
        )
        .orderBy("n_nationkey", "rn")
    )


# --------------------------------------------------------------------------
# E10 window functions: running frame + lag
# --------------------------------------------------------------------------
@query(
    "q14_running_customer_spend",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate,
           round(sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend,
           round(coalesce(lag(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey), 0), 2) AS prev_price
    FROM orders
    WHERE o_custkey <= 100
    ORDER BY o_custkey, o_orderdate, o_orderkey
    """,
)
def q14_running_customer_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running-sum frame (ROWS UNBOUNDED PRECEDING) + lag, deterministic
    tiebreak on orderkey so replays hash identically."""
    orders = load_table(spark, sf_dir, "orders").filter(F.col("o_custkey") <= 100)
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            "o_orderdate",
            F.round(F.sum("o_totalprice").over(w.rowsBetween(W.unboundedPreceding, W.currentRow)), 2).alias(
                "running_spend"
            ),
            F.round(F.coalesce(F.lag("o_totalprice").over(w), F.lit(0.0)), 2).alias("prev_price"),
        )
        .orderBy("o_custkey", "o_orderdate", "o_orderkey")
    )


# --------------------------------------------------------------------------
# E11 set operations
# --------------------------------------------------------------------------
@query(
    "q15_union_all_counts",
    oracle="""
    SELECT nationkey, count(*) AS n_entities
    FROM (
      SELECT c_nationkey AS nationkey FROM customer
      UNION ALL
      SELECT s_nationkey AS nationkey FROM supplier
    )
    GROUP BY nationkey
    ORDER BY nationkey
    """,
)
def q15_union_all_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) of two relations + agg."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return cust.unionAll(supp).groupBy("nationkey").agg(F.count(F.lit(1)).alias("n_entities")).orderBy("nationkey")


@query(
    "q16_intersect_except",
    oracle="""
    SELECT 'both' AS src, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey AS nationkey FROM supplier
    )
    UNION ALL
    SELECT 'cust_only' AS src, nationkey FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT s_nationkey AS nationkey FROM supplier
    )
    ORDER BY src, nationkey
    """,
)
def q16_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT and EXCEPT (set semantics) tagged and unioned."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    both = cust.intersect(supp).select(F.lit("both").alias("src"), "nationkey")
    cust_only = cust.subtract(supp).select(F.lit("cust_only").alias("src"), "nationkey")
    return both.unionAll(cust_only).orderBy("src", "nationkey")


# --------------------------------------------------------------------------
# E12 scalar functions: strings
# --------------------------------------------------------------------------
@query(
    "q17_string_functions",
    oracle="""
    SELECT p_partkey,
           upper(p_name)                       AS name_upper,
           substr(p_name, 1, 4)                AS name_prefix,
           concat(p_brand, '/', p_type)        AS brand_type,
           length(p_name)                      AS name_len,
           replace(p_name, ' ', '_')           AS name_snake,
           CASE WHEN p_name LIKE '%red%' THEN 1 ELSE 0 END AS is_red
    FROM part
    WHERE p_size <= 25
    ORDER BY p_partkey
    """,
)
def q17_string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String scalar library: upper/substr/concat/length/replace/LIKE."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.filter(F.col("p_size") <= 25)
        .select(
            "p_partkey",
            F.upper("p_name").alias("name_upper"),
            F.substring("p_name", 1, 4).alias("name_prefix"),
            F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
            F.length("p_name").alias("name_len"),
            F.replace(F.col("p_name"), F.lit(" "), F.lit("_")).alias("name_snake"),
            F.when(F.col("p_name").like("%red%"), 1).otherwise(0).alias("is_red"),
        )
        .orderBy("p_partkey")
    )


# --------------------------------------------------------------------------
# E12 scalar functions: dates
# --------------------------------------------------------------------------
@query(
    "q18_date_functions",
    oracle="""
    SELECT year(o_orderdate)                         AS o_year,
           month(o_orderdate)                        AS o_month,
           count(*)                                  AS n_orders,
           round(sum(o_totalprice), 2)               AS sum_price
    FROM orders
    GROUP BY year(o_orderdate), month(o_orderdate)
    ORDER BY o_year, o_month
    """,
)
def q18_date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date extraction (year/month) + agg per calendar month."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy(
            F.year("o_orderdate").alias("o_year"),
            F.month("o_orderdate").alias("o_month"),
        )
        .agg(F.count(F.lit(1)).alias("n_orders"), F.round(F.sum("o_totalprice"), 2).alias("sum_price"))
        .orderBy("o_year", "o_month")
    )


@query(
    "q19_ship_delay",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           date_diff('day', o_orderdate, l_shipdate) AS ship_delay_days,
           CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS ship_month
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE l_orderkey <= 200
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q19_ship_delay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """datediff + date_trunc across a join (order date -> ship date lag)."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 200)
    orders = load_table(spark, sf_dir, "orders")
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).cast("long").alias("ship_delay_days"),
            F.date_trunc("month", F.col("l_shipdate")).alias("ship_month"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# E12 scalar functions: math + conditional
# --------------------------------------------------------------------------
@query(
    "q20_math_functions",
    oracle=f"""
    SELECT l_orderkey, l_linenumber,
           {CHARGE_DECIMAL_SQL} AS charge,
           round(abs(l_discount - 0.05), 4)   AS disc_dev,
           CAST(ceil(l_quantity / 10.0) AS BIGINT)         AS qty_decile,
           CAST(floor(l_extendedprice / 1000.0) AS BIGINT) AS price_kbucket,
           mod(l_orderkey, 7)                 AS key_mod,
           round(sqrt(l_quantity), 4)         AS qty_sqrt
    FROM lineitem
    WHERE l_orderkey <= 300
    ORDER BY l_orderkey, l_linenumber
    """,
)
def q20_math_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math scalar library: round/abs/ceil/floor/mod/sqrt."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_orderkey") <= 300)
    return (
        li.select(
            "l_orderkey",
            "l_linenumber",
            # money product in EXACT decimal on both sides: rounding the
            # binary double diverges between engines at half boundaries
            # (Spark rounds the shortest decimal repr, DuckDB the exact
            # binary) — casting the 2-decimal inputs to DECIMAL first makes
            # the arithmetic and the round bit-identical everywhere
            F.round(
                F.col("l_extendedprice").cast("decimal(18,2)")
                * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
                * (F.lit(1) + F.col("l_tax").cast("decimal(18,2)")),
                2,
            ).cast("double").alias("charge"),
            F.round(F.abs(F.col("l_discount") - 0.05), 4).alias("disc_dev"),
            F.ceil(F.col("l_quantity") / 10.0).alias("qty_decile"),
            F.floor(F.col("l_extendedprice") / 1000.0).alias("price_kbucket"),
            (F.col("l_orderkey") % 7).alias("key_mod"),
            F.round(F.sqrt(F.col("l_quantity")), 4).alias("qty_sqrt"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


# --------------------------------------------------------------------------
# E12 array functions over the embeddings table
# --------------------------------------------------------------------------
@query(
    "q21_array_functions",
    oracle="""
    SELECT vec_id,
           len(embedding)                                   AS dim,
           round(CAST(embedding[1] AS DOUBLE), 4)           AS first_component,
           round((SELECT sum(CAST(x AS DOUBLE) * CAST(x AS DOUBLE)) FROM unnest(embedding) AS t(x)), 4) AS sq_norm,
           label
    FROM embeddings
    WHERE vec_id < 100
    ORDER BY vec_id
    """,
)
def q21_array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array ops: size, element_at, aggregate (fold) for squared norm —
    all JVM-side higher-order functions, no Python."""
    emb = load_table(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 100)
    x = F.col("embedding")
    sq_norm = F.aggregate(
        x, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
    )
    return emb.select(
        "vec_id",
        F.size(x).alias("dim"),
        F.round(F.element_at(x, 1).cast("double"), 4).alias("first_component"),
        F.round(sq_norm, 4).alias("sq_norm"),
        "label",
    ).orderBy("vec_id")


# --------------------------------------------------------------------------
# E12 JSON functions over events.props
# --------------------------------------------------------------------------
@query(
    "q22_json_functions",
    oracle="""
    SELECT event_type,
           count(*)                                              AS n_events,
           CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k
    FROM events
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def q22_json_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (get_json_object) feeding aggregation."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("event_type")
    )


# --------------------------------------------------------------------------
# E13 approximate distinct (exact at low cardinality, HLL sparse mode)
# --------------------------------------------------------------------------
@query(
    "q23_approx_distinct",
    oracle="""
    SELECT count(DISTINCT l_returnflag)  AS approx_flags,
           count(DISTINCT l_linestatus)  AS approx_status,
           count(DISTINCT l_returnflag)  AS exact_flags,
           count(DISTINCT l_linestatus)  AS exact_status
    FROM lineitem
    """,
)
def q23_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) checked against exact counts.

    At these cardinalities (3) HLL++ sparse mode is exact, so the oracle
    can assert equality; at high cardinality the same operator degrades
    gracefully (bench exercises l_partkey separately).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return li.agg(
        F.approx_count_distinct("l_returnflag").alias("approx_flags"),
        F.approx_count_distinct("l_linestatus").alias("approx_status"),
        F.countDistinct("l_returnflag").alias("exact_flags"),
        F.countDistinct("l_linestatus").alias("exact_status"),
    )


# --------------------------------------------------------------------------
# E12 explode (array -> rows) with posexplode
# --------------------------------------------------------------------------
# --------------------------------------------------------------------------
# E5 full outer join (both unmatched sides preserved)
# --------------------------------------------------------------------------
@query(
    "q28_full_outer_presence",
    oracle="""
    SELECT coalesce(c.nationkey, s.nationkey) AS nationkey,
           coalesce(c.n_customers, 0)         AS n_customers,
           coalesce(s.n_suppliers, 0)         AS n_suppliers
    FROM (SELECT c_nationkey AS nationkey, count(*) AS n_customers FROM customer GROUP BY 1) c
    FULL OUTER JOIN
         (SELECT s_nationkey AS nationkey, count(*) AS n_suppliers FROM supplier GROUP BY 1) s
    USING (nationkey)
    ORDER BY nationkey
    """,
)
def q28_full_outer_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join: nations present on either side survive with zero
    counts on the missing side. Aggregate-before-join keeps both inputs
    tiny regardless of fact-table scale."""
    cust = (
        load_table(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )
    supp = (
        load_table(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count(F.lit(1)).alias("n_suppliers"))
    )
    return (
        cust.join(supp, "nationkey", "full_outer")
        .select(
            "nationkey",
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
        .orderBy("nationkey")
    )


# --------------------------------------------------------------------------
# E11 bag-semantics set ops (INTERSECT ALL / EXCEPT ALL)
# --------------------------------------------------------------------------
@query(
    "q29_bag_setops",
    oracle="""
    SELECT 'inter_all' AS src, nationkey, count(*) AS n FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT ALL
      SELECT s_nationkey AS nationkey FROM supplier
    ) GROUP BY 2
    UNION ALL
    SELECT 'except_all' AS src, nationkey, count(*) AS n FROM (
      SELECT s_nationkey AS nationkey FROM supplier
      EXCEPT ALL
      SELECT c_nationkey AS nationkey FROM customer
    ) GROUP BY 2
    ORDER BY src, nationkey
    """,
)
def q29_bag_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL / EXCEPT ALL: multiplicity-preserving set operations
    (min / difference of occurrence counts respectively)."""
    cust = load_table(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    supp = load_table(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    inter = (
        cust.intersectAll(supp)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("inter_all").alias("src"), "nationkey", "n")
    )
    exc = (
        supp.exceptAll(cust)
        .groupBy("nationkey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.lit("except_all").alias("src"), "nationkey", "n")
    )
    return inter.unionAll(exc).orderBy("src", "nationkey")


# --------------------------------------------------------------------------
# E7/E12 pivot (wide aggregation)
# --------------------------------------------------------------------------
@query(
    "q34_pivot_status_matrix",
    oracle="""
    SELECT l_returnflag,
           round(coalesce(sum(CASE WHEN l_linestatus = 'F' THEN l_quantity END), 0), 2) AS qty_F,
           round(coalesce(sum(CASE WHEN l_linestatus = 'O' THEN l_quantity END), 0), 2) AS qty_O
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q34_pivot_status_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: linestatus values become columns. Explicit value list keeps
    the plan single-pass (no distinct-value pre-scan) — the only form that
    scales, since implicit pivot collects the value set on the driver."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag")
        .pivot("l_linestatus", ["F", "O"])
        .sum("l_quantity")
        .select(
            "l_returnflag",
            F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("qty_F"),
            F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("qty_O"),
        )
        .orderBy("l_returnflag")
    )


# --------------------------------------------------------------------------
# E8 explicit GROUPING SETS through the SQL entry point
# --------------------------------------------------------------------------
@query(
    "q25_grouping_sets_sql",
    oracle="""
    SELECT o_orderstatus, o_orderpriority,
           grouping(o_orderstatus)     AS g_status,
           grouping(o_orderpriority)   AS g_priority,
           count(*)                    AS n_orders,
           round(sum(o_totalprice), 2) AS sum_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
    """,
)
def q25_grouping_sets_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS + grouping() markers, via spark.sql.

    Also exercises the engine's third entry point (SQL text -> Catalyst);
    the DataFrame and SQL APIs compile to identical plans.
    """
    load_table(spark, sf_dir, "orders").createOrReplaceTempView("orders")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority,
               CAST(grouping(o_orderstatus) AS BIGINT)   AS g_status,
               CAST(grouping(o_orderpriority) AS BIGINT) AS g_priority,
               count(*)                                  AS n_orders,
               round(sum(o_totalprice), 2)               AS sum_price
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
        """
    )


# --------------------------------------------------------------------------
# E12 map functions over a real MapType column
# --------------------------------------------------------------------------
@query(
    "q26_map_functions",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
           len(json_keys(props))              AS n_keys,
           CAST(props->>'k' AS BIGINT)        AS k_value
    FROM events
    WHERE event_id < 500
    ORDER BY event_id
    """,
)
def q26_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: parse props into map<string,long>, then
    map_keys/size/element_at — the reference's MAP lattice entry (string
    keys enforced by the schema) exercised on real data.

    prop_keys is emitted as a sorted comma-joined string (not
    array<string>) so the driver's pandas canonicalization can sort/hash
    the column; the map surface itself is still fully exercised."""
    ev = load_table(spark, sf_dir, "events").filter(F.col("event_id") < 500)
    m = F.from_json("props", "map<string,bigint>")
    return ev.select(
        "event_id",
        F.array_join(F.array_sort(F.map_keys(m)), ",").alias("prop_keys"),
        F.size(F.map_keys(m)).alias("n_keys"),
        F.element_at(m, "k").alias("k_value"),
    ).orderBy("event_id")


# --------------------------------------------------------------------------
# E13 exact percentiles (continuous interpolation)
# --------------------------------------------------------------------------
@query(
    "q27_percentiles",
    oracle="""
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.50), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.90), 4) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99,
           count(*) AS n
    FROM orders
    GROUP BY o_orderstatus
    ORDER BY o_orderstatus
    """,
)
def q27_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact linear-interpolation percentiles per group (Spark
    `percentile` == DuckDB `quantile_cont`). The approximate form
    (approx_percentile / Greenwald-Khanna) is the scale path; exactness
    here gives the oracle check."""
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.groupBy("o_orderstatus")
        .agg(
            F.round(F.expr("percentile(o_totalprice, 0.50)"), 4).alias("p50"),
            F.round(F.expr("percentile(o_totalprice, 0.90)"), 4).alias("p90"),
            F.round(F.expr("percentile(o_totalprice, 0.99)"), 4).alias("p99"),
            F.count(F.lit(1)).alias("n"),
        )
        .orderBy("o_orderstatus")
    )


@query(
    "q24_explode_tokens",
    oracle="""
    SELECT token, count(*) AS n
    FROM (
      SELECT unnest(string_split(p_name, ' ')) AS token FROM part
    )
    GROUP BY token
    ORDER BY n DESC, token
    """,
)
def q24_explode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """split + explode: array-to-rows generator feeding an aggregate."""
    part = load_table(spark, sf_dir, "part")
    return (
        part.select(F.explode(F.split("p_name", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), F.col("token"))
    )


@query(
    "q58_small_quantity_revenue",
    oracle="""
    SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE p.p_brand IN ('Brand#1', 'Brand#2')
      AND l.l_quantity < (
        SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2 WHERE l2.l_partkey = p.p_partkey
      )
    """,
)
def q58_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: CORRELATED scalar subquery (per-part average
    bound). Registered through spark.sql deliberately — the point is
    Catalyst's decorrelation: the optimizer must rewrite the per-row
    correlated aggregate into a grouped join (one aggregation over
    lineitem + one join), not execute it per outer row. The oracle is the
    identical SQL on DuckDB, whose optimizer performs the same rewrite."""
    load_table(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_v")
    load_table(spark, sf_dir, "part").createOrReplaceTempView("part_v")
    return spark.sql(
        """
        SELECT round(sum(l.l_extendedprice) / 7.0, 2) AS avg_yearly
        FROM lineitem_v l JOIN part_v p ON p.p_partkey = l.l_partkey
        WHERE p.p_brand IN ('Brand#1', 'Brand#2')
          AND l.l_quantity < (
            SELECT 0.2 * avg(l2.l_quantity) FROM lineitem_v l2 WHERE l2.l_partkey = p.p_partkey
          )
        """
    )


@query(
    "q59_trailing_hour_window",
    oracle="""
    SELECT event_id, user_id,
           CAST(n_1h AS BIGINT) AS n_1h,
           round(sum_1h, 2)     AS sum_1h
    FROM (
      SELECT event_id, user_id,
             count(value) OVER w AS n_1h,
             sum(value)   OVER w AS sum_1h
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                   RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    )
    WHERE event_id <= 2000
    ORDER BY event_id
    """,
)
def q59_trailing_hour_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE window frame: per user, the count and sum of
    values in the trailing hour of EVENT TIME (not row count) — the frame
    every sessionized-metrics pipeline needs. Ordering and the frame are
    in exact integer microseconds on both engines (a seconds-granularity
    cast would disagree with the oracle at sub-second boundaries)."""
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = (
        W.partitionBy("user_id")
        # NTZ -> TZ cast is identity under the UTC session timezone; this
        # Spark build reads parquet TIMESTAMP(NANOS) as TIMESTAMP_NTZ, which
        # unix_micros rejects uncast
        .orderBy(F.unix_micros(F.col("ts").cast("timestamp")))
        .rangeBetween(-3_600_000_000, 0)
    )
    return (
        ev.select(
            "event_id",
            "user_id",
            F.count("value").over(w).alias("n_1h"),
            F.round(F.sum("value").over(w), 2).alias("sum_1h"),
        )
        .filter(F.col("event_id") <= 2000)
        .orderBy("event_id")
    )


@query(
    "q84_disjunctive_predicates",
    oracle=f"""
    SELECT p_brand,
           {revenue_decimal_sql()} AS revenue,
           CAST(count(*) AS BIGINT) AS n_items
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 25 AND l_quantity BETWEEN 10 AND 35)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 40 AND l_quantity BETWEEN 20 AND 50)
    GROUP BY p_brand
    ORDER BY p_brand
    """,
)
def q84_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: an OR of per-brand conjunctive bands across BOTH
    join sides — the optimizer stress case for disjunctive predicates.
    Catalyst must split the filter: the part-only disjunction
    (brand/size) prunes the build side and the lineitem-only quantity
    envelope (derived from the OR) pushes to the fact scan, leaving only
    the residual cross-side OR on join output. Revenue uses the
    exact-decimal parity fragment.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    bands = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15) & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#2") & F.col("p_size").between(5, 25) & F.col("l_quantity").between(10, 35))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(10, 40) & F.col("l_quantity").between(20, 50))
    )
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .filter(bands)
        .groupBy("p_brand")
        .agg(revenue_decimal_col().alias("revenue"), F.count(F.lit(1)).alias("n_items"))
        .orderBy("p_brand")
    )


@query(
    "q85_global_threshold",
    oracle="""
    WITH m AS (
      SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
             CAST(sum(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue,
             count(*) AS n_orders
      FROM orders
      GROUP BY month
    ),
    tot AS (SELECT CAST(sum(CAST(revenue AS DECIMAL(18,2))) AS DOUBLE) AS total,
                   count(*) AS n_months FROM m)
    SELECT month, revenue, n_orders
    FROM m, tot
    WHERE revenue * n_months > total
    ORDER BY month
    """,
)
def q85_global_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: keep groups whose aggregate exceeds a GLOBAL
    scalar computed from the same aggregation (above-average months).
    Catalyst evaluates the scalar side as a broadcast subquery over the
    reused month relation, not a second scan chain.

    Parity-critical: the threshold compares revenue * n_months > total —
    all exact quantities (decimal sums surfaced as exactly-representable
    doubles, integer month count), so engines cannot disagree at the
    boundary the way a floating avg() comparison could.
    """
    orders = load_table(spark, sf_dir, "orders")
    m = (
        orders.groupBy(F.date_trunc("month", "o_orderdate").alias("month"))
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .localCheckpoint(eager=True)  # barrier: threshold aggregate + filter both read m
    )
    tot = m.agg(
        F.sum(F.col("revenue").cast("decimal(18,2)")).cast("double").alias("total"),
        F.count(F.lit(1)).alias("n_months"),
    )
    return (
        m.crossJoin(F.broadcast(tot))
        .filter(F.col("revenue") * F.col("n_months") > F.col("total"))
        .select("month", "revenue", "n_orders")
        .orderBy("month")
    )


@query(
    "q89_large_volume_customers",
    oracle="""
    WITH big AS (
      SELECT l_orderkey, CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(l_quantity AS DECIMAL(18,2))) > 250
    )
    SELECT c.c_name, o.o_orderkey, o.o_orderdate, o.o_totalprice, b.total_qty
    FROM big b
    JOIN orders o ON o.o_orderkey = b.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    ORDER BY b.total_qty DESC, o.o_orderkey
    LIMIT 50
    """,
)
def q89_large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): a grouped HAVING filter
    on the fact table drives the join, not the other way round.

    Scale shape: lineitem aggregates FIRST (map-side partial sums on
    l_orderkey, exact decimal quantities), the HAVING filter collapses
    the relation to the rare heavy orders (~1.5% here, rarer at spec
    thresholds), and only those survivors join orders and customer —
    broadcast-sized by construction, so neither dimension join shuffles
    the fact table. The anti-shape (join first, aggregate later) would
    shuffle every lineitem row twice; this plan shuffles them once, into
    the aggregation. Mirrors the reference's buffer-then-flush economy
    (BigqueryStreamWriter.java:56 buffers rows, flushes once) at query
    scale: reduce before you move.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    cust = load_table(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("_qty_dec"))
        .filter(F.col("_qty_dec") > 250)
        .select("l_orderkey", F.col("_qty_dec").cast("double").alias("total_qty"))
    )
    return (
        F.broadcast(big)
        .join(orders, big.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .select("c_name", "o_orderkey", "o_orderdate", "o_totalprice", "total_qty")
        .orderBy(F.col("total_qty").desc(), "o_orderkey")
        .limit(50)
    )


@query(
    "q90_waiting_suppliers",
    oracle="""
    WITH li AS (
      SELECT l.l_orderkey, l.l_suppkey,
             max(CASE WHEN l.l_shipdate > o.o_orderdate + INTERVAL 365 DAY
                      THEN 1 ELSE 0 END) AS late
      FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      GROUP BY l.l_orderkey, l.l_suppkey
    )
    SELECT s.s_name, count(*) AS numwait
    FROM li l1
    JOIN supplier s ON s.s_suppkey = l1.l_suppkey
    WHERE l1.late = 1
      AND EXISTS (SELECT 1 FROM li l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM li l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.late = 1)
    GROUP BY s.s_name
    ORDER BY numwait DESC, s.s_name
    """,
)
def q90_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): the classic
    EXISTS + NOT-EXISTS double correlation, adapted to this schema's
    dates (late = shipped > 365 days after the order date; the reference
    schema's receipt/commit dates don't exist here).

    The oracle states it with correlated subqueries; the Spark program
    decorrelates BY HAND into one extra aggregation: per (order,
    supplier) compute the late flag, per order compute (n_suppliers,
    n_late), then a supplier is "waiting" on an order iff its flag is
    late AND n_suppliers > 1 (the EXISTS) AND n_late = 1 (the NOT
    EXISTS — it was the only late one). Two grouped passes over the same
    relation replace two correlated per-row subqueries; at 100 TB that is
    the difference between two shuffles and a nested-loop disaster. The
    per-order stats relation is orderkey-keyed like `li`, so AQE sees
    co-partitioned inputs; the supplier dimension broadcasts.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    supp = load_table(spark, sf_dir, "supplier")
    flags = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .select(
            "l_orderkey",
            "l_suppkey",
            (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS"))
            .cast("int")
            .alias("_is_late"),
        )
        .groupBy("l_orderkey", "l_suppkey")
        .agg(F.max("_is_late").alias("late"))
        # feeds both the per-order stats and the waiter filter; a plain
        # persist() here leaked a CacheManager entry per invocation (the
        # query fn never sees the collect, so it cannot unpersist) —
        # localCheckpoint blocks are instead released by the
        # ContextCleaner once the result DataFrame is unreferenced, the
        # same lifetime contract as the CC operators
        .localCheckpoint(eager=True)
    )
    order_stats = flags.groupBy("l_orderkey").agg(
        F.count(F.lit(1)).alias("n_supp"), F.sum("late").alias("n_late")
    )
    waiters = (
        flags.filter(F.col("late") == 1)
        .join(order_stats, "l_orderkey")
        .filter((F.col("n_supp") > 1) & (F.col("n_late") == 1))
    )
    out = (
        waiters.join(F.broadcast(supp), waiters.l_suppkey == supp.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
    )
    return out


@query(
    "q91_idle_rich_customers",
    oracle="""
    WITH pos AS (
      SELECT CAST(sum(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS total,
             count(*) AS n
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT n.n_name, count(*) AS numcust,
           CAST(sum(CAST(c.c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
    FROM customer c
    JOIN nation n ON n.n_nationkey = c.c_nationkey, pos
    WHERE c.c_acctbal * pos.n > pos.total
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY n.n_name
    ORDER BY n.n_name
    """,
)
def q91_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global-lost-customers): customers above the
    global average positive balance with no urgent orders, grouped by
    nation (this schema has no phone country codes; every customer here
    has SOME order, so the anti-join is against the urgent slice).

    Three scale moves: (1) the global average is ONE scalar aggregate
    broadcast into the filter — stated as c_acctbal * n > total in exact
    decimal-derived terms so no engine disagrees at the float boundary
    (same parity trick as q85); (2) the NOT EXISTS is a LEFT ANTI join
    against only the pre-filtered urgent orders (~20% of the table,
    pruned at the scan by a pushed predicate); (3) nation broadcasts.
    The customer table is scanned twice (scalar + main) — at 100 TB the
    scalar pass reads one column via parquet pruning, which is cheaper
    than persisting the full relation just to share the scan.
    """
    cust = load_table(spark, sf_dir, "customer")
    nation = load_table(spark, sf_dir, "nation")
    orders = load_table(spark, sf_dir, "orders")
    pos = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("total"),
        F.count(F.lit(1)).alias("n"),
    )
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        cust.crossJoin(F.broadcast(pos))
        .filter(F.col("c_acctbal") * F.col("n") > F.col("total"))
        .join(urgent, cust.c_custkey == urgent.o_custkey, "left_anti")
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(F.col("c_acctbal").cast("decimal(18,2)")).cast("double").alias("totacctbal"),
        )
        .orderBy("n_name")
    )


@query(
    "q102_returned_items",
    oracle=f"""
    SELECT c_custkey, c_name,
           {revenue_decimal_sql()} AS revenue,
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-04-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q102_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: top-20 customers by revenue lost to returned
    items in a quarter (extension surface E4/E7/E9 — the reference is a
    sink connector with no query engine; SURVEY.md §2.2).

    Scale shape: the quarter predicate pushes to the orders scan and
    prunes most of the fact join before the shuffle; nation (25 rows)
    broadcasts; the only wide exchange is the customer-grain hash
    aggregation, and the final top-20 is a TakeOrdered, not a global
    sort. Revenue uses the exact-decimal parity fragment with c_custkey
    tiebreak so LIMIT is deterministic across engines.
    """
    cust = load_table(spark, sf_dir, "customer")
    orders = load_table(spark, sf_dir, "orders")
    li = load_table(spark, sf_dir, "lineitem")
    nat = load_table(spark, sf_dir, "nation")
    sel = (
        orders.filter(
            (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .join(li.filter(F.col("l_returnflag") == "R"), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
    )
    return (
        sel.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(revenue_decimal_col().alias("revenue"))
        .orderBy(F.col("revenue").desc(), "c_custkey")
        .limit(20)
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
    )


_PROMO_DEC = """CAST(l_extendedprice AS DECIMAL(18,2))
                * (1 - CAST(l_discount AS DECIMAL(18,2)))"""


@query(
    "q103_promo_revenue",
    oracle=f"""
    SELECT round(100.0
             * CAST(round(sum(CASE WHEN p_type = 'PROMO' THEN {_PROMO_DEC}
                               ELSE CAST(0 AS DECIMAL(18,2)) END), 2) AS DOUBLE)
             / CAST(round(sum({_PROMO_DEC}), 2) AS DOUBLE), 6) AS promo_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q103_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: promotional revenue share for one month-range —
    conditional aggregation over a fact-dimension join, returning one
    scalar row.

    Scale shape: the shipdate band pushes to the lineitem scan; part
    broadcasts (dimension); both conditional sums ride ONE hash
    aggregation (no second pass for the denominator). Numerator and
    denominator are exact decimals surfaced as doubles, so the final
    division and 6dp round are single IEEE ops identical across engines.
    """
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part")
    sel = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
    ).join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
    dec = F.expr(_PROMO_DEC)
    zero = F.lit(0).cast("decimal(18,2)")
    return sel.agg(
        F.round(
            F.lit(100.0)
            * F.round(F.sum(F.when(F.col("p_type") == "PROMO", dec).otherwise(zero)), 2).cast("double")
            / F.round(F.sum(dec), 2).cast("double"),
            6,
        ).alias("promo_pct")
    )


@query(
    "q104_top_revenue_supplier",
    oracle=f"""
    WITH r AS (
      SELECT l_suppkey, {revenue_decimal_sql()} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN r ON s_suppkey = l_suppkey
    WHERE total_revenue = (SELECT max(total_revenue) FROM r)
    ORDER BY s_suppkey
    """,
)
def q104_top_revenue_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (revenue view + global max): the supplier(s) whose
    quarterly revenue equals the maximum — the canonical
    aggregate-then-compare-to-global-aggregate decorrelation.

    Scale shape: one supplier-grain hash aggregation (map-side partials),
    then the 1-row global max broadcasts back via crossJoin — the q85
    pattern — so no second scan of the facts and no sort; the supplier
    dimension broadcasts into the final name join. Revenue is
    exact-decimal, so the equality against the max is bit-safe (the
    whole reason a float revenue would make this query nondeterministic).
    """
    li = load_table(spark, sf_dir, "lineitem")
    supp = load_table(spark, sf_dir, "supplier")
    rev = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy("l_suppkey")
        .agg(revenue_decimal_col().alias("total_revenue"))
    )
    mx = rev.agg(F.max("total_revenue").alias("_mx"))
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("total_revenue") == F.col("_mx"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


@query(
    "q115_window_rank_family",
    oracle="""
    WITH w AS (
      SELECT o_custkey, o_orderkey, o_totalprice,
             rank()         OVER win AS rnk,
             dense_rank()   OVER win AS drnk,
             round(percent_rank() OVER win, 6) AS prank,
             round(cume_dist()    OVER win, 6) AS cdist,
             first_value(o_orderkey) OVER (win ROWS BETWEEN UNBOUNDED PRECEDING
                                           AND UNBOUNDED FOLLOWING) AS biggest_order,
             CAST(ntile(4) OVER win AS INT) AS quartile
      FROM orders
      WINDOW win AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
    )
    SELECT o_custkey, o_orderkey,
           CAST(rnk AS BIGINT) AS rnk, CAST(drnk AS BIGINT) AS drnk,
           prank, cdist, biggest_order, quartile
    FROM w
    WHERE o_custkey < 100
    ORDER BY o_custkey, rnk, o_orderkey
    """,
)
def q115_window_rank_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking-window family in one pass: rank / dense_rank /
    percent_rank / cume_dist / first_value / ntile over a per-customer
    price ordering — completing E10's surface beyond row_number/lag
    (q13/q14). One window spec, one shuffle, every function evaluated in
    the same sort; determinism from the orderkey tiebreak (percent_rank
    and cume_dist are rational n-based values — identical doubles given
    identical orderings, rounded once at 6dp).
    """
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    win = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    full = win.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.rank().over(win).alias("rnk"),
            F.dense_rank().over(win).alias("drnk"),
            F.round(F.percent_rank().over(win), 6).alias("prank"),
            F.round(F.cume_dist().over(win), 6).alias("cdist"),
            F.first("o_orderkey").over(full).alias("biggest_order"),
            F.ntile(4).over(win).alias("quartile"),
        )
        .filter(F.col("o_custkey") < 100)
        .orderBy("o_custkey", "rnk", "o_orderkey")
    )


@query(
    "q116_token_typo_pairs",
    oracle=f"""
    WITH vocab AS (
      SELECT DISTINCT unnest({{toks}}) AS token FROM documents
    )
    SELECT a.token AS token_a, b.token AS token_b,
           CAST(levenshtein(a.token, b.token) AS INT) AS dist
    FROM vocab a JOIN vocab b
      ON a.token < b.token
     AND abs(length(a.token) - length(b.token)) <= 2
    WHERE levenshtein(a.token, b.token) <= 2
    ORDER BY token_a, token_b
    """.format(toks="list_filter(string_split_regex(text, '\\s+'), t -> t <> '')"),
)
def q116_token_typo_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spelling-variant candidates: distinct token pairs within edit
    distance 2 — the vocabulary-normalization pass (typo folding, UK/US
    variants) that runs before token statistics at corpus scale.
    Levenshtein is a well-defined integer metric, identical across
    engines.

    Scale shape: the pair join runs on the VOCABULARY relation (distinct
    tokens — thousands, not billions), length-banded (|len diff| <= 2)
    so each token only meets its own and adjacent length classes; the
    corpus-grain work is one explode+distinct. At web vocab scale the
    band key extends to (length, first char) without changing semantics.
    """
    docs = ensure_compute_parallelism(load_table(spark, sf_dir, "documents"))
    vocab = docs.select(
        F.explode(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("token")
    ).distinct()
    a = vocab.select(F.col("token").alias("token_a"), F.length("token").alias("_la"))
    b = vocab.select(F.col("token").alias("token_b"), F.length("token").alias("_lb"))
    return (
        a.join(
            b,
            (F.col("token_a") < F.col("token_b"))
            & (F.abs(F.col("_la") - F.col("_lb")) <= 2),
        )
        .withColumn("dist", F.levenshtein("token_a", "token_b"))
        .filter(F.col("dist") <= 2)
        .select("token_a", "token_b", "dist")
        .orderBy("token_a", "token_b")
    )


@query(
    "q118_chisquare_independence",
    oracle="""
    WITH cells AS (
      SELECT event_type, CAST(dayofweek(ts) AS INT) AS dow, count(*) AS o
      FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT sum(o) AS n FROM cells),
    rows_ AS (SELECT event_type, sum(o) AS rt FROM cells GROUP BY 1),
    cols_ AS (SELECT dow, sum(o) AS ct FROM cells GROUP BY 1),
    terms AS (
      SELECT CAST(floor(
               (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n)
               * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * ct / n)
               / (CAST(rt AS DOUBLE) * ct / n) * 1000000.0 + 0.5) AS BIGINT) AS t
      FROM cells JOIN rows_ USING (event_type) JOIN cols_ USING (dow), tot
    )
    SELECT CAST((SELECT count(*) FROM rows_) AS INT) AS n_types,
           CAST((SELECT count(*) FROM cols_) AS INT) AS n_days,
           CAST(((SELECT count(*) FROM rows_) - 1) * ((SELECT count(*) FROM cols_) - 1) AS INT) AS dof,
           CAST(sum(t) AS DOUBLE) / 1000000.0 AS chi2
    FROM terms
    """,
)
def q118_chisquare_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence test between event type and day-of-week —
    the categorical-drift / A-A sanity check every event pipeline runs
    (a large chi2 means traffic mix depends on weekday).

    Exactness: observed and marginal counts are exact integers; each
    cell's (o-e)^2/e term is computed with one identical IEEE op chain
    and immediately fixed to integer micro-units, so the cross-cell SUM
    is order-free (a raw double sum over cells would be
    aggregation-order dependent). Scale shape: one count aggregation at
    (type, dow) grain — 35 cells regardless of event count — then
    driver-trivial marginals; the only event-grain work is the pushed
    projection of (event_type, dayofweek).
    """
    ev = load_table(spark, sf_dir, "events")
    cells = ev.groupBy("event_type", F.dayofweek("ts").alias("dow")).agg(F.count(F.lit(1)).alias("o"))
    rows_ = cells.groupBy("event_type").agg(F.sum("o").alias("rt"))
    cols_ = cells.groupBy("dow").agg(F.sum("o").alias("ct"))
    tot = cells.agg(F.sum("o").alias("n"))
    e = F.col("rt").cast("double") * F.col("ct") / F.col("n")
    term = F.floor((F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e * F.lit(1000000.0) + F.lit(0.5)).cast("long")
    joined = cells.join(rows_, "event_type").join(F.broadcast(cols_), "dow").crossJoin(F.broadcast(tot))
    n_types = rows_.count()
    n_days = cols_.count()
    return joined.agg(
        F.lit(n_types).cast("int").alias("n_types"),
        F.lit(n_days).cast("int").alias("n_days"),
        F.lit((n_types - 1) * (n_days - 1)).cast("int").alias("dof"),
        (F.sum(term).cast("double") / F.lit(1000000.0)).alias("chi2"),
    )


_CORR_COLS = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]


def _corr_pair_sql(x: str, y: str) -> str:
    cx = f"CAST(round(CAST({x} AS DECIMAL(18,2)) * 100) AS HUGEINT)"
    cy = f"CAST(round(CAST({y} AS DECIMAL(18,2)) * 100) AS HUGEINT)"
    return f"""
      SELECT '{x}' AS col_x, '{y}' AS col_y,
             floor(CAST(count(*) * sum({cx} * {cy}) - sum({cx}) * sum({cy}) AS DOUBLE)
                   / sqrt(CAST(count(*) * sum({cx} * {cx}) - sum({cx}) * sum({cx}) AS DOUBLE)
                          * CAST(count(*) * sum({cy} * {cy}) - sum({cy}) * sum({cy}) AS DOUBLE))
                   * 1000000.0 + 0.5) / 1000000.0 AS r
      FROM lineitem"""


@query(
    "q119_numeric_correlations",
    oracle=" UNION ALL ".join(
        _corr_pair_sql(x, y) for i, x in enumerate(_CORR_COLS) for y in _CORR_COLS[i + 1 :]
    )
    + " ORDER BY col_x, col_y",
)
def q119_numeric_correlations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix (upper triangle) over the lineitem
    numeric columns — the feature-screening pass before any modeling on
    tabular data. Exact cross-engine parity for a statistic that is
    normally float-order fuzz: all five moments (n, Σx, Σy, Σxy, Σx²,
    Σy²) are exact integer-cent sums (decimal-typed so a 100 TB corpus
    cannot overflow), and r is one identical IEEE expression over them,
    portably rounded at 6dp. One pass over the fact table computes every
    pair's moments simultaneously (map-side combine; no per-pair scans —
    the same economics as DataFrame.stat.corr done 6x in one job).
    """
    li = load_table(spark, sf_dir, "lineitem")
    cents = {c: F.round(F.col(c).cast("decimal(18,2)") * 100).cast("decimal(38,0)") for c in _CORR_COLS}
    aggs = [F.count(F.lit(1)).alias("n")]
    for i, x in enumerate(_CORR_COLS):
        aggs.append(F.sum(cents[x]).alias(f"s_{x}"))
        aggs.append(F.sum(cents[x] * cents[x]).alias(f"ss_{x}"))
        for y in _CORR_COLS[i + 1 :]:
            aggs.append(F.sum(cents[x] * cents[y]).alias(f"sxy_{x}_{y}"))
    m = li.agg(*aggs)
    pairs = []
    for i, x in enumerate(_CORR_COLS):
        for y in _CORR_COLS[i + 1 :]:
            num = (F.col("n") * F.col(f"sxy_{x}_{y}") - F.col(f"s_{x}") * F.col(f"s_{y}")).cast("double")
            dx = (F.col("n") * F.col(f"ss_{x}") - F.col(f"s_{x}") * F.col(f"s_{x}")).cast("double")
            dy = (F.col("n") * F.col(f"ss_{y}") - F.col(f"s_{y}") * F.col(f"s_{y}")).cast("double")
            r6 = F.floor(num / F.sqrt(dx * dy) * F.lit(1000000.0) + F.lit(0.5)) / F.lit(1000000.0)
            pairs.append(
                m.select(F.lit(x).alias("col_x"), F.lit(y).alias("col_y"), r6.alias("r"))
            )
    out = pairs[0]
    for p in pairs[1:]:
        out = out.unionAll(p)
    return out.orderBy("col_x", "col_y")


_PROFILE_NUM = ["l_quantity", "l_extendedprice", "l_discount", "l_tax"]
_PROFILE_STR = ["l_returnflag", "l_linestatus"]


@query(
    "q121_column_profile",
    oracle=" UNION ALL ".join(
        [
            f"""SELECT '{c}' AS col, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
                CAST(min({c}) AS DOUBLE) AS min_num, CAST(max({c}) AS DOUBLE) AS max_num,
                CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
                FROM lineitem"""
            for c in _PROFILE_NUM
        ]
        + [
            f"""SELECT '{c}' AS col, CAST(count(*) AS BIGINT) AS n,
                CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
                CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
                CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
                min({c}) AS min_str, max({c}) AS max_str
                FROM lineitem"""
            for c in _PROFILE_STR
        ]
    )
    + " ORDER BY col",
)
def q121_column_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality column profile of the fact table: row count, null
    count, distinct cardinality, and min/max per column (numeric and
    string sections typed separately — cross-engine float FORMATTING is
    not portable, float VALUES are). The health check every ingestion
    pipeline runs before publishing a table version; schema-drift
    monitors diff consecutive profiles.

    Scale shape: ONE pass over the table computes every column's
    counts/extremes simultaneously (shared scan, map-side combine);
    the distinct counts are the only shuffles and each moves one
    column's values. At 100 TB swap count(DISTINCT) for
    approx_count_distinct (q23) — the panel shape is unchanged.
    """
    li = load_table(spark, sf_dir, "lineitem")
    aggs = []
    for c in _PROFILE_NUM + _PROFILE_STR:
        aggs += [
            F.count(F.lit(1)).alias(f"n_{c}"),
            F.sum(F.isnull(c).cast("long")).alias(f"nn_{c}"),
            F.countDistinct(c).alias(f"nd_{c}"),
            F.min(c).alias(f"mn_{c}"),
            F.max(c).alias(f"mx_{c}"),
        ]
    m = li.agg(*aggs)
    parts = []
    for c in _PROFILE_NUM:
        parts.append(
            m.select(
                F.lit(c).alias("col"),
                F.col(f"n_{c}").alias("n"),
                F.col(f"nn_{c}").alias("n_null"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.col(f"mn_{c}").cast("double").alias("min_num"),
                F.col(f"mx_{c}").cast("double").alias("max_num"),
                F.lit(None).cast("string").alias("min_str"),
                F.lit(None).cast("string").alias("max_str"),
            )
        )
    for c in _PROFILE_STR:
        parts.append(
            m.select(
                F.lit(c).alias("col"),
                F.col(f"n_{c}").alias("n"),
                F.col(f"nn_{c}").alias("n_null"),
                F.col(f"nd_{c}").alias("n_distinct"),
                F.lit(None).cast("double").alias("min_num"),
                F.lit(None).cast("double").alias("max_num"),
                F.col(f"mn_{c}").alias("min_str"),
                F.col(f"mx_{c}").alias("max_str"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionAll(p)
    return out.orderBy("col")


@query(
    "q127_unpivot_metrics",
    oracle="""
    WITH agg AS (
      SELECT l_returnflag,
             CAST(round(sum(CAST(l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS qty,
             CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2) AS DOUBLE) AS price,
             CAST(round(sum(CAST(l_discount AS DECIMAL(18,2))), 2) AS DOUBLE) AS disc
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, metric, amount
    FROM agg UNPIVOT (amount FOR metric IN (qty, price, disc))
    ORDER BY l_returnflag, metric
    """,
)
def q127_unpivot_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) — the inverse of q34's pivot: a wide per-flag
    metric aggregate reshaped into (flag, metric, amount) long form, the
    shape dashboards, metric stores and ML feature tables ingest.
    Spark's unpivot/melt is a pure projection expansion (each input row
    emits one row per value column — no shuffle, no Python); the
    upstream aggregate uses exact decimals so the reshaped values hash
    identically.
    """
    li = load_table(spark, sf_dir, "lineitem")
    agg = li.groupBy("l_returnflag").agg(
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2).cast("double").alias("qty"),
        F.round(F.sum(F.col("l_extendedprice").cast("decimal(18,2)")), 2).cast("double").alias("price"),
        F.round(F.sum(F.col("l_discount").cast("decimal(18,2)")), 2).cast("double").alias("disc"),
    )
    return agg.unpivot(
        ids=["l_returnflag"], values=["qty", "price", "disc"], variableColumnName="metric", valueColumnName="amount"
    ).orderBy("l_returnflag", "metric")


@query(
    "q129_null_safe_join",
    oracle="""
    WITH keyed AS (
      SELECT nullif(event_type, 'view') AS k, value FROM events
    ),
    weights(k, w) AS (
      VALUES ('click', 2.0), ('purchase', 5.0), (NULL, 0.5)
    )
    SELECT coalesce(keyed.k, '<null>') AS key,
           CAST(count(*) AS BIGINT) AS n,
           w AS weight,
           CAST(round(sum(CAST(value AS DECIMAL(18,2))) * CAST(w AS DECIMAL(4,1)), 2) AS DOUBLE)
             AS weighted_value
    FROM keyed JOIN weights ON keyed.k IS NOT DISTINCT FROM weights.k
    GROUP BY keyed.k, w
    ORDER BY key
    """,
)
def q129_null_safe_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (Spark `<=>` == SQL IS NOT DISTINCT FROM):
    a weights dimension whose key set INCLUDES NULL — the semantics a
    plain equi-join silently drops (NULL = NULL is NULL, so unkeyed
    facts vanish). The fallback-bucket pattern every dimension join with
    incomplete keys needs; completes the join-predicate surface (equi,
    non-equi range, interval, semi/anti, null-safe).

    Scale: the null-safe condition still hashes (Spark plans
    BroadcastHashJoin on coalesced key comparison), so the dimension
    broadcasts as usual — pinned by the plan staying sort-merge-free.
    """
    ev = load_table(spark, sf_dir, "events")
    keyed = ev.select(F.nullif("event_type", F.lit("view")).alias("k"), "value")
    weights = local_rows_df(spark, [("click", 2.0), ("purchase", 5.0), (None, 0.5)], "k string, w double")
    return (
        keyed.join(F.broadcast(weights), keyed.k.eqNullSafe(weights.k))
        .groupBy(keyed.k, "w")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(
                F.sum(F.col("value").cast("decimal(18,2)")) * F.col("w").cast("decimal(4,1)"), 2
            )
            .cast("double")
            .alias("weighted_value"),
        )
        .select(
            F.coalesce(keyed.k, F.lit("<null>")).alias("key"),
            "n",
            F.col("w").alias("weight"),
            "weighted_value",
        )
        .orderBy("key")
    )


@query(
    "q130_cdc_latest_state",
    oracle="""
    WITH ranked AS (
      SELECT user_id, ts, event_type, value,
             row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rk,
             count(*)    OVER (PARTITION BY user_id) AS n_changes
      FROM events
    )
    SELECT user_id, ts AS last_ts, event_type AS last_type,
           round(value, 2) AS last_value,
           CAST(n_changes AS BIGINT) AS n_changes
    FROM ranked WHERE rk = 1
    ORDER BY user_id
    """,
)
def q130_cdc_latest_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Change-log compaction / MERGE-latest semantics: collapse an
    append-only event log to one current-state row per key (newest by
    event time, event_id tiebreak for same-timestamp changes) plus the
    change count — the materialization step behind every CDC mirror and
    upsert sink, expressed as a deterministic rank window.

    Scale shape: one shuffle on the key; both the latest-row rank and
    the change count ride the SAME window partitioning (no second
    exchange). At table-maintenance scale this is the compaction query a
    MERGE INTO engine runs under the hood; the manifest sink's
    idempotent batches (R14) make re-running it safe.
    """
    from pyspark.sql import Window as W

    ev = load_table(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy(F.col("ts").desc(), F.col("event_id").desc())
    wc = W.partitionBy("user_id")
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .withColumn("n_changes", F.count(F.lit(1)).over(wc))
        .filter(F.col("rk") == 1)
        .select(
            "user_id",
            F.col("ts").alias("last_ts"),
            F.col("event_type").alias("last_type"),
            F.round("value", 2).alias("last_value"),
            "n_changes",
        )
        .orderBy("user_id")
    )


@query(
    "q152_window_frames",
    oracle="""
    WITH w AS (
      SELECT o_custkey, o_orderkey,
             CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2)))
                        OVER (PARTITION BY o_custkey ORDER BY o_totalprice
                              RANGE BETWEEN 1000 PRECEDING AND CURRENT ROW), 2) AS DOUBLE)
               AS near_price_sum,
             nth_value(o_orderkey, 2) OVER (PARTITION BY o_custkey
                                            ORDER BY o_totalprice DESC, o_orderkey
                                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS second_biggest,
             last_value(o_orderkey) OVER (PARTITION BY o_custkey
                                          ORDER BY o_totalprice DESC, o_orderkey
                                          ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
               AS next_window_key,
             lead(o_orderkey, 1, -1) OVER (PARTITION BY o_custkey
                                           ORDER BY o_totalprice DESC, o_orderkey)
               AS following_key
      FROM orders
    )
    SELECT o_custkey, o_orderkey, near_price_sum,
           second_biggest, next_window_key, following_key
    FROM w WHERE o_custkey < 100
    ORDER BY o_custkey, o_orderkey
    """,
)
def q152_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Window FRAME semantics — the E10 corners q13/q14/q115 don't touch:
    a RANGE frame over a numeric ordering (value-based bounds, so
    same-price ties land in each other's frames regardless of physical
    order — the frame type that is deterministic under ties BY
    CONSTRUCTION), nth_value within a running ROWS frame, last_value
    over a bounded sliding frame, and lead() with an explicit default.
    Money sums go through DECIMAL(18,2) inside the frame so both
    engines aggregate exactly.

    Scale shape: every function shares one (o_custkey) partitioning;
    the two sort orders (price asc for the RANGE frame, desc for the
    rank-side functions) cost one exchange + two in-partition sorts,
    never a second shuffle.
    """
    from pyspark.sql import Window as W

    orders = load_table(spark, sf_dir, "orders")
    asc = W.partitionBy("o_custkey").orderBy("o_totalprice").rangeBetween(-1000, 0)
    desc = W.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(), "o_orderkey")
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.round(F.sum(F.col("o_totalprice").cast("decimal(18,2)")).over(asc), 2)
            .cast("double")
            .alias("near_price_sum"),
            F.nth_value("o_orderkey", 2).over(desc.rowsBetween(W.unboundedPreceding, W.currentRow)).alias(
                "second_biggest"
            ),
            F.last("o_orderkey").over(desc.rowsBetween(-1, 1)).alias("next_window_key"),
            F.lead("o_orderkey", 1, -1).over(desc).alias("following_key"),
        )
        .filter(F.col("o_custkey") < 100)
        .orderBy("o_custkey", "o_orderkey")
    )


@query(
    "q158_lateral_topk",
    oracle="""
    SELECT n.n_name AS nation, t.c_name, t.c_acctbal
    FROM nation n,
         LATERAL (
           SELECT c_name, c_acctbal FROM customer c
           WHERE c.c_nationkey = n.n_nationkey
           ORDER BY c_acctbal DESC, c_name LIMIT 2
         ) t
    ORDER BY nation, t.c_acctbal DESC, t.c_name
    """,
)
def q158_lateral_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LATERAL correlated subquery with ORDER BY + LIMIT — the per-row
    top-k join SQL:2016 writes natively and both optimizers must
    decorrelate (Spark: DecorrelateInnerQuery rewrites the limit-per-key
    lateral into a ranked window join, never a per-outer-row execution;
    DuckDB performs the equivalent dependent-join unnesting). Completes
    the correlation surface beside q58 (correlated scalar aggregate) and
    q90 (EXISTS/NOT EXISTS): this is the correlated TABLE subquery.

    Registered through spark.sql deliberately, like q58 — the operator
    under test is the optimizer's decorrelation, not the query shape
    (q13 already covers the hand-written window form). No float
    arithmetic: acctbal passes through unmodified, ties broken on
    c_name, so the hash is stable by construction.
    """
    load_table(spark, sf_dir, "nation").createOrReplaceTempView("nation_v")
    load_table(spark, sf_dir, "customer").createOrReplaceTempView("customer_v")
    return spark.sql(
        """
        SELECT n.n_name AS nation, t.c_name, t.c_acctbal
        FROM nation_v n
        JOIN LATERAL (
          SELECT c_name, c_acctbal FROM customer_v c
          WHERE c.c_nationkey = n.n_nationkey
          ORDER BY c_acctbal DESC, c_name LIMIT 2
        ) t
        ORDER BY nation, t.c_acctbal DESC, t.c_name
        """
    )


@query(
    "q187_winsorized_stats",
    oracle="""
    WITH r AS (
      SELECT l_returnflag,
             CAST(l_extendedprice AS DECIMAL(18,2)) AS p,
             row_number() OVER (
               PARTITION BY l_returnflag
               ORDER BY l_extendedprice, l_orderkey, l_linenumber
             ) AS rn,
             count(*) OVER (PARTITION BY l_returnflag) AS n
      FROM lineitem
    ),
    kept AS (
      SELECT l_returnflag, p, n
      FROM r
      WHERE rn > n // 20 AND rn <= n - n // 20
    )
    SELECT l_returnflag,
           CAST(max(n) AS BIGINT) AS n_total,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(round(sum(p), 2) AS DOUBLE) AS trimmed_sum,
           CAST(min(p) AS DOUBLE) AS p05_floor,
           CAST(max(p) AS DOUBLE) AS p95_ceil
    FROM kept
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q187_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust (5%-trimmed) group statistics by EXACT rank trimming — the
    outlier-resistant aggregate a quality pipeline uses where plain means
    get dragged by heavy tails. Percentile-function semantics differ
    between engines (interpolation modes), so the airtight form trims by
    row_number over a TOTAL order (value + unique key tiebreak): both
    engines drop exactly the same floor(n/20) rows from each end.
    Decimal(18,2) arithmetic end-to-end (the half-boundary recipe).

    Scale: one window per group partition — the same shuffle the final
    aggregate needs anyway; no second pass, no percentile sketch. For
    groups too large for a single partition's sort, the rank trimming
    degrades gracefully to approx_percentile bounds + a plain filter
    (documented alternative, not needed at fixture scale).
    """
    from pyspark.sql import Window as W

    li = load_table(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_extendedprice").cast("decimal(18,2)").alias("p"),
        "l_orderkey",
        "l_linenumber",
    )
    w = W.partitionBy("l_returnflag").orderBy("p", "l_orderkey", "l_linenumber")
    r = li.select(
        "l_returnflag",
        "p",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(W.partitionBy("l_returnflag")).alias("n"),
    )
    kept = r.filter(
        (F.col("rn") > F.floor(F.col("n") / 20)) & (F.col("rn") <= F.col("n") - F.floor(F.col("n") / 20))
    )
    return (
        kept.groupBy("l_returnflag")
        .agg(
            F.max("n").alias("n_total"),
            F.count(F.lit(1)).alias("n_kept"),
            F.round(F.sum("p"), 2).cast("double").alias("trimmed_sum"),
            F.min("p").cast("double").alias("p05_floor"),
            F.max("p").cast("double").alias("p95_ceil"),
        )
        .orderBy("l_returnflag")
    )


@query(
    "q188_equidepth_binning",
    oracle="""
    WITH r AS (
      SELECT o_orderstatus,
             CAST(o_totalprice AS DECIMAL(18,2)) AS p,
             ntile(8) OVER (ORDER BY o_totalprice, o_orderkey) AS bin
      FROM orders
    )
    SELECT bin,
           CAST(count(*) AS BIGINT) AS n,
           CAST(min(p) AS DOUBLE) AS lo,
           CAST(max(p) AS DOUBLE) AS hi,
           CAST(round(sum(p), 2) AS DOUBLE) AS mass,
           CAST(count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_f
    FROM r
    GROUP BY bin
    ORDER BY bin
    """,
)
def q188_equidepth_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) feature binning, exact and DISTRIBUTED: the
    SQL-standard ntile(8) row assignment over a total order (value +
    unique-key tiebreak, so both engines place every row identically) —
    the discretization step for histogram features / monotonic-binning
    pipelines, with per-bin boundaries, mass, and a class count (the
    inputs to WoE/IV scoring). No percentile interpolation anywhere.

    Scale: the oracle writes a globally-ordered ntile(8) window, but the
    Spark side does NOT use a global window (the single-task cliff the
    AST guard in tests/test_plans.py bans): the global rank comes from
    ``ranked_prefix_sum`` (range-partition + per-partition window +
    P-row offset join) and the ntile bucket is recomputed from (rank, n)
    with the standard remainder formula — first n%8 buckets get one
    extra row. Exactly DuckDB's assignment, at any scale.
    """
    from kafka_connect_bigquery_storage_write_spark.operators.partitioning import ranked_prefix_sum

    od = load_table(spark, sf_dir, "orders").select(
        "o_orderstatus",
        F.col("o_totalprice").cast("decimal(18,2)").alias("p"),
        "o_orderkey",
        F.col("o_totalprice").alias("raw"),
    )
    ranked = ranked_prefix_sum(od, order=[F.col("raw"), F.col("o_orderkey")], rank_col="r")
    n_total = od.agg(F.count(F.lit(1)).alias("n"))
    base = F.floor(F.col("n") / 8)
    rem = F.col("n") % 8
    fat = rem * (base + 1)  # rows covered by the first n%8 (larger) buckets
    bin_expr = (
        F.when(F.col("r") <= fat, F.floor((F.col("r") - 1) / (base + 1)) + 1)
        .otherwise(rem + F.floor((F.col("r") - fat - 1) / base) + 1)
        .cast("int")
    )
    r = ranked.crossJoin(F.broadcast(n_total)).select(
        "o_orderstatus", "p", bin_expr.alias("bin")
    )
    return (
        r.groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("p").cast("double").alias("lo"),
            F.max("p").cast("double").alias("hi"),
            F.round(F.sum("p"), 2).cast("double").alias("mass"),
            F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_f"),
        )
        .orderBy("bin")
    )


@query(
    "q190_entity_resolution",
    oracle="""
    WITH dirty AS (
      SELECT c_custkey + 1000000 AS d_key,
             substr(c_name, 1, length(c_name) - 1) || 'X' AS d_name,
             c_nationkey AS d_nation,
             c_acctbal + 0.5 AS d_bal,
             c_mktsegment AS d_seg
      FROM customer WHERE c_custkey % 10 = 0
    ),
    cand AS (
      SELECT c.c_custkey AS a_key, d.d_key AS b_key,
             levenshtein(c.c_name, d.d_name) AS lev,
             abs(c.c_acctbal - d.d_bal) AS bal_gap
      FROM customer c JOIN dirty d
        ON c.c_nationkey = d.d_nation AND c.c_mktsegment = d.d_seg
    ),
    scored AS (
      SELECT a_key, b_key,
             (CASE WHEN lev <= 1 THEN 4 ELSE 0 END
              + CASE WHEN bal_gap < 1.0 THEN 2 ELSE 0 END
              + 2) AS score
      FROM cand
    )
    SELECT a_key, b_key, CAST(score AS INT) AS score
    FROM scored WHERE score >= 7
    ORDER BY a_key, b_key
    """,
)
def q190_entity_resolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage / entity resolution with BLOCKING — the
    Fellegi-Sunter shape every dedup-across-sources pipeline runs: a
    deterministically perturbed copy of every 10th customer (key+1e6,
    last name char swapped, balance shifted 0.5) is linked back against
    the clean table. Candidates form only inside (nation, segment)
    blocks — never the full n^2 — then field-agreement weights score
    each candidate (name levenshtein <= 1 -> +4, balance gap < 1.0 ->
    +2, block agreement +2) and threshold 7 decides matches. Every
    planted duplicate scores 8 by construction; the oracle re-derives
    the identical rule, so blocking, edit distance, and scoring are all
    hash-checked.

    Scale shape: the blocking join's cost is Sum over blocks of
    |clean_b| x |dirty_b| — bounded by the blocking-key histogram
    (~n^2/100 here, and in practice blocks are capped like q32's
    max_df); the score is pure column arithmetic, no UDF; levenshtein
    is a JVM builtin on short strings.
    """
    cust = load_table(spark, sf_dir, "customer")
    dirty = cust.filter(F.col("c_custkey") % 10 == 0).select(
        (F.col("c_custkey") + 1000000).alias("b_key"),
        F.concat(
            F.substring(F.col("c_name"), 1, F.length("c_name") - 1), F.lit("X")
        ).alias("d_name"),
        F.col("c_nationkey").alias("d_nation"),
        (F.col("c_acctbal") + 0.5).alias("d_bal"),
        F.col("c_mktsegment").alias("d_seg"),
    )
    cand = cust.join(
        dirty,
        (F.col("c_nationkey") == F.col("d_nation"))
        & (F.col("c_mktsegment") == F.col("d_seg")),
    )
    score = (
        F.when(F.levenshtein("c_name", "d_name") <= 1, 4).otherwise(0)
        + F.when(F.abs(F.col("c_acctbal") - F.col("d_bal")) < 1.0, 2).otherwise(0)
        + F.lit(2)
    )
    return (
        cand.select(
            F.col("c_custkey").alias("a_key"),
            "b_key",
            score.cast("int").alias("score"),
        )
        .filter(F.col("score") >= 7)
        .orderBy("a_key", "b_key")
    )
