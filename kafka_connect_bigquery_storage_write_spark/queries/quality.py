"""Data-quality expectation checks (Deequ/Great-Expectations shape).

A training-data pipeline gates every ingest on a constraint suite:
completeness, uniqueness, value ranges, allowed domains, referential
integrity. The engine expresses the whole suite as ONE pass over the
fact table (conditional aggregates) plus one distinct-count and one
anti-join — the same decomposition Deequ compiles its analyzers to —
and emits one row per check so the gate is itself queryable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.queries import query
from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table


@query(
    "q135_expectation_checks",
    oracle="""
    WITH n AS (SELECT count(*) AS n_rows FROM lineitem),
    checks AS (
      SELECT 'not_null(l_shipdate)' AS check_name,
             (SELECT count(*) FROM lineitem WHERE l_shipdate IS NULL) AS n_violations
      UNION ALL
      SELECT 'unique(l_orderkey,l_linenumber)',
             (SELECT count(*) - count(DISTINCT (l_orderkey, l_linenumber)) FROM lineitem)
      UNION ALL
      SELECT 'range(l_discount,0.0,0.1)',
             (SELECT count(*) FROM lineitem WHERE l_discount < 0.0 OR l_discount > 0.1)
      UNION ALL
      SELECT 'range(l_quantity,1,50)',
             (SELECT count(*) FROM lineitem WHERE l_quantity < 1 OR l_quantity > 50)
      UNION ALL
      SELECT 'in_set(l_returnflag,[A,N,R])',
             (SELECT count(*) FROM lineitem WHERE l_returnflag NOT IN ('A','N','R'))
      UNION ALL
      SELECT 'ref(l_orderkey -> orders.o_orderkey)',
             (SELECT count(*) FROM lineitem l
              WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey))
    )
    SELECT check_name,
           CAST(n.n_rows AS BIGINT)       AS n_rows,
           CAST(n_violations AS BIGINT)   AS n_violations,
           n_violations = 0               AS passed
    FROM checks, n
    ORDER BY check_name
    """,
)
def q135_expectation_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suite over lineitem: completeness, composite-key
    uniqueness, two range checks, an allowed-value domain, and
    referential integrity against orders — one row per check with
    violation counts and a pass flag.

    Scale shape: the four row-local checks (null, ranges, domain) fold
    into ONE conditional-aggregate pass over the scan (no shuffle at
    all — map-side partials only); uniqueness is one distinct-count on
    the composite key (the only key-grain shuffle); referential
    integrity is a LEFT ANTI join against the aggregated key set of
    orders. Nothing is per-check rescanned — exactly how a constraint
    engine batches analyzers at TB scale.
    """
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")

    viol = lambda c: F.sum(c.cast("long")).alias("v")  # noqa: E731
    row_local = li.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_shipdate").isNull().cast("long")).alias("v_null"),
        F.sum(((F.col("l_discount") < 0.0) | (F.col("l_discount") > 0.1)).cast("long")).alias("v_disc"),
        F.sum(((F.col("l_quantity") < 1) | (F.col("l_quantity") > 50)).cast("long")).alias("v_qty"),
        F.sum((~F.col("l_returnflag").isin("A", "N", "R")).cast("long")).alias("v_flag"),
    )
    uniq = li.agg(
        (F.count(F.lit(1)) - F.countDistinct("l_orderkey", "l_linenumber")).alias("v_uniq")
    )
    orphan = (
        li.select("l_orderkey")
        .join(orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("v_ref"))
    )
    wide = row_local.crossJoin(uniq).crossJoin(orphan)
    checks = [
        ("not_null(l_shipdate)", "v_null"),
        ("unique(l_orderkey,l_linenumber)", "v_uniq"),
        ("range(l_discount,0.0,0.1)", "v_disc"),
        ("range(l_quantity,1,50)", "v_qty"),
        ("in_set(l_returnflag,[A,N,R])", "v_flag"),
        ("ref(l_orderkey -> orders.o_orderkey)", "v_ref"),
    ]
    stack = ", ".join(f"'{name}', {col}" for name, col in checks)
    return (
        wide.selectExpr("n_rows", f"stack({len(checks)}, {stack}) as (check_name, n_violations)")
        .select(
            "check_name",
            "n_rows",
            "n_violations",
            (F.col("n_violations") == 0).alias("passed"),
        )
        .orderBy("check_name")
    )


@query(
    "q199_k_anonymity_audit",
    oracle="""
    WITH qi AS (
      SELECT c_custkey,
             c_nationkey,
             c_mktsegment,
             CAST(floor(c_acctbal / 1000) AS BIGINT) AS bal_band
      FROM customer
    ),
    grp AS (
      SELECT c_nationkey, c_mktsegment, bal_band, count(*) AS k
      FROM qi GROUP BY c_nationkey, c_mktsegment, bal_band
    )
    SELECT CASE WHEN k = 1 THEN 'k=1 (unique)'
                WHEN k < 5 THEN 'k in 2..4'
                WHEN k < 10 THEN 'k in 5..9'
                ELSE 'k >= 10' END AS risk_bucket,
           CAST(count(*) AS BIGINT)  AS n_groups,
           CAST(sum(k) AS BIGINT)    AS n_individuals,
           CAST(min(k) AS BIGINT)    AS min_k,
           CAST(max(k) AS BIGINT)    AS max_k
    FROM grp
    GROUP BY 1
    ORDER BY min_k
    """,
)
def q199_k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over quasi-identifiers — the re-identification
    risk profile a privacy review runs before releasing or training on
    user-adjacent data: individuals whose (nation, segment,
    balance-band) combination is unique (k=1) are directly
    re-identifiable; the query buckets every equivalence class by its k
    and counts exposed individuals per risk tier. (q75 scrubs direct
    identifiers; this measures the INDIRECT ones scrubbing can't fix —
    the two halves of the standard privacy pass.)

    Scale: one hash aggregate at QI-group grain (groups, not people, on
    the wire), then a second tiny aggregate over |groups| rows; banding
    the continuous column is plain column arithmetic, and generalizing
    a QI (coarser bands) to raise k re-runs only this plan.
    """
    cust = load_table(spark, sf_dir, "customer")
    qi = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.floor(F.col("c_acctbal") / 1000).cast("long").alias("bal_band"),
    )
    grp = qi.groupBy("c_nationkey", "c_mktsegment", "bal_band").agg(F.count(F.lit(1)).alias("k"))
    bucket = (
        F.when(F.col("k") == 1, "k=1 (unique)")
        .when(F.col("k") < 5, "k in 2..4")
        .when(F.col("k") < 10, "k in 5..9")
        .otherwise("k >= 10")
    )
    return (
        grp.groupBy(bucket.alias("risk_bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_groups"),
            F.sum("k").alias("n_individuals"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
        .orderBy("min_k")
    )
