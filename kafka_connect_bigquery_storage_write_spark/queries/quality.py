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


# Cumulative Poisson(1) CDF scaled to the 24-bit hash space (16^6), floored:
# P(X<=k) * 16777216 for k = 0..5; a hash below threshold[k] draws weight <= k.
# Weights cap at 6 (P(X>=7) ~ 8.3e-5) so the CASE ladder is finite and both
# engines evaluate the identical integer comparisons.
_POISSON_THRESHOLDS = (6171992, 12343985, 15429982, 16458647, 16715813, 16767247)
_BOOT_R = 200  # replicates; CI picks order statistics 6 and 195 (~2.5% / 97.5%)


def _poisson_case_sql(hash_expr: str) -> str:
    arms = " ".join(
        f"WHEN {hash_expr} < {t} THEN {k}" for k, t in enumerate(_POISSON_THRESHOLDS)
    )
    return f"CASE {arms} ELSE 6 END"


@query(
    "q213_bootstrap_ci",
    oracle=f"""
    WITH rep AS (
      SELECT d.lang, d.n_chars,
             {_poisson_case_sql("CAST('0x' || substr(md5(CAST(d.doc_id AS VARCHAR) || ':' || CAST(t.r AS VARCHAR)), 1, 6) AS INT)")} AS w,
             t.r
      FROM documents d, range({_BOOT_R}) t(r)
    ),
    means AS (
      SELECT lang, r,
             sum(w * n_chars) * 1.0 / sum(w) AS mean_r
      FROM rep GROUP BY lang, r
      HAVING sum(w) > 0
    ),
    ranked AS (
      SELECT lang, mean_r,
             row_number() OVER (PARTITION BY lang ORDER BY mean_r, r) AS rn
      FROM means
    ),
    ci AS (
      SELECT lang,
             round(min(CASE WHEN rn = 6   THEN mean_r END), 4) AS ci_lo,
             round(min(CASE WHEN rn = 195 THEN mean_r END), 4) AS ci_hi
      FROM ranked GROUP BY lang
    ),
    point AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             round(sum(n_chars) * 1.0 / count(*), 4) AS mean_chars
      FROM documents GROUP BY lang
    )
    SELECT p.lang, p.n_docs, p.mean_chars, c.ci_lo, c.ci_hi
    FROM point p JOIN ci c ON p.lang = c.lang
    ORDER BY p.lang
    """,
)
def q213_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap 95% confidence interval for mean document length
    per language — the eval-pipeline primitive behind "is this quality
    delta real or noise". The classical multinomial bootstrap needs a
    global resample per replicate (a shuffle per replicate, unusable at
    scale); the Poisson(1) approximation gives every (row, replicate)
    an i.i.d. integer weight from pure hash arithmetic, so ALL 200
    replicates ride one map-side explode + one hash aggregate.

    Engine-exactness: the replicate weight is a CASE ladder of integer
    comparisons against floor(CDF * 16^6) thresholds on a 24-bit md5
    slice (identical literals both engines); each replicate mean is ONE
    double division of two exact BIGINT sums; the interval is order
    statistics 6/195 of the 200 replicate means (row_number with the
    replicate id as tiebreak), not an interpolated percentile — engines
    cannot disagree on either. Scale: the fan-out is generated column
    arithmetic in codegen (no data-size shuffle beyond the (lang, r)
    aggregate, which map-side combines to |langs| * 200 rows), and the
    ranking window runs over 200 rows per language.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    rep = docs.withColumn("r", F.explode(F.sequence(F.lit(0), F.lit(_BOOT_R - 1))))
    h = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col("doc_id").cast("string"), F.col("r").cast("string"))), 1, 6
        ),
        16,
        10,
    ).cast("long")
    w = F.lit(6)
    for k, t in reversed(list(enumerate(_POISSON_THRESHOLDS))):
        w = F.when(h < t, F.lit(k)).otherwise(w)
    # sum(w) > 0 guard (both engines, identically): a zero-weight replicate
    # would yield a NULL mean whose sort position differs across engines.
    # Unreachable at any fixture scale (P = e^-n_docs, n_docs >= 71) but it
    # keeps the query total for arbitrarily small groups.
    means = (
        rep.withColumn("w", w)
        .groupBy("lang", "r")
        .agg(F.sum(F.col("w") * F.col("n_chars")).alias("swn"), F.sum("w").alias("sw"))
        .filter(F.col("sw") > 0)
        .select("lang", "r", (F.col("swn") / F.col("sw")).alias("mean_r"))
    )
    from pyspark.sql import Window as W

    rn = F.row_number().over(W.partitionBy("lang").orderBy("mean_r", "r"))
    ci = (
        means.withColumn("rn", rn)
        .groupBy("lang")
        .agg(
            F.round(F.min(F.when(F.col("rn") == 6, F.col("mean_r"))), 4).alias("ci_lo"),
            F.round(F.min(F.when(F.col("rn") == 195, F.col("mean_r"))), 4).alias("ci_hi"),
        )
    )
    point = docs.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.sum("n_chars") / F.count(F.lit(1)), 4).alias("mean_chars"),
    )
    return point.join(F.broadcast(ci), "lang").select(
        "lang", "n_docs", "mean_chars", "ci_lo", "ci_hi"
    ).orderBy("lang")
