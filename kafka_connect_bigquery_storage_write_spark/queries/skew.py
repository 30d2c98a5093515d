"""Skew-mitigation query entries: the salted operators, oracle-checked.

Salting must be invisible in the RESULT — only the physical distribution
changes. These entries pin exactly that: each salted plan's oracle is the
plain unsalted SQL, so any salt leakage (lost rows, double counts,
salt-column escape) is a driver hash mismatch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.operators.skew import salted_agg, salted_join
from kafka_connect_bigquery_storage_write_spark.queries import query
from kafka_connect_bigquery_storage_write_spark.queries.parity import revenue_decimal_col, revenue_decimal_sql
from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table


@query(
    "q48_salted_agg",
    oracle="""
    SELECT l_returnflag,
           round(sum(l_quantity), 2)       AS sum_l_quantity,
           CAST(count(l_orderkey) AS BIGINT) AS count_l_orderkey,
           min(l_discount)                 AS min_l_discount,
           max(l_extendedprice)            AS max_l_extendedprice
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def q48_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage salted aggregation on a low-cardinality skewed key.

    l_returnflag has 3 values over the whole table — the exact shape where
    hash partitioning degenerates to 3 reducers and salting matters. The
    oracle is the plain GROUP BY: identical results prove the
    partial/combine decomposition is exact.
    """
    li = load_table(spark, sf_dir, "lineitem")
    out = salted_agg(
        li,
        key_cols=["l_returnflag"],
        aggs={"l_quantity": "sum", "l_orderkey": "count", "l_discount": "min", "l_extendedprice": "max"},
        salt_buckets=16,
    )
    return out.select(
        "l_returnflag",
        F.round("sum_l_quantity", 2).alias("sum_l_quantity"),
        F.col("count_l_orderkey"),
        "min_l_discount",
        "max_l_extendedprice",
    ).orderBy("l_returnflag")


@query(
    "q49_salted_join",
    oracle=f"""
    SELECT p.p_brand,
           CAST(count(*) AS BIGINT)                          AS n_items,
           {revenue_decimal_sql("l.l_extendedprice", "l.l_discount")} AS revenue
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    GROUP BY p.p_brand
    ORDER BY p.p_brand
    """,
)
def q49_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted equi-join (hash-derived replay-stable salt on the skewed
    side, build side replicated) followed by an aggregate; the oracle is
    the plain join — identical revenue per brand proves no row is lost or
    duplicated by the salt replication."""
    li = load_table(spark, sf_dir, "lineitem")
    part = load_table(spark, sf_dir, "part").select(F.col("p_partkey").alias("l_partkey"), "p_brand")
    joined = salted_join(li, part, key="l_partkey", salt_buckets=8)
    return (
        joined.groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            revenue_decimal_col().alias("revenue"),
        )
        .orderBy("p_brand")
    )


@query(
    "q81_heavy_hitters",
    oracle="""
    WITH toks AS (
      SELECT unnest(list_filter(string_split_regex(text, '\\s+'), t -> t <> '')) AS token
      FROM documents
    ),
    tot AS (SELECT count(*) AS n FROM toks)
    SELECT token,
           count(*) AS n_rows,
           round(count(*) * 1.0 / tot.n, 6) AS share
    FROM toks, tot
    GROUP BY token, tot.n
    HAVING count(*) >= 0.01 * tot.n
    ORDER BY token
    """,
)
def q81_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact heavy-hitter tokens (>= 1% of all corpus tokens) via the
    sketch-then-verify operator: a Misra-Gries freqItems pass yields a
    no-false-negative candidate list, then exact counts verify only
    those candidates — the full token key space is never grouped, so the
    result is EXACT at any corpus size while the per-key state stays
    driver-bounded at ~1/support entries. The oracle is the naive exact
    GROUP BY ... HAVING, proving the sketch path loses nothing.
    """
    from kafka_connect_bigquery_storage_write_spark.operators.partitioning import ensure_compute_parallelism
    from kafka_connect_bigquery_storage_write_spark.operators.skew import heavy_hitters

    docs = ensure_compute_parallelism(load_table(spark, sf_dir, "documents"))
    toks = docs.select(F.explode(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("token"))
    return heavy_hitters(toks, "token", support=0.01).orderBy("token")


@query(
    "q111_key_skew_profile",
    oracle="""
    WITH cnt AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c, user_id) AS i FROM cnt
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n_keys,
             CAST(sum(c) AS BIGINT) AS total,
             CAST(max(c) AS BIGINT) AS max_count,
             CAST(sum(i * c) AS BIGINT) AS weighted
      FROM ranked
    )
    SELECT n_keys, total, max_count,
           floor(max_count * 1000000.0 / total + 0.5) / 1000000.0 AS top_share,
           floor((2.0 * weighted - (n_keys + 1.0) * total) * 1000000.0
                 / (CAST(n_keys AS DOUBLE) * total) + 0.5) / 1000000.0 AS gini
    FROM agg
    """,
)
def q111_key_skew_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-key skew profiler: key count, max key share, and the Gini
    coefficient of the per-key row distribution — the diagnostic that
    decides WHETHER a join/agg needs q48/q49's salting before it runs
    (gini ~0 = uniform keys, ~1 = one hot key owns the shuffle).

    Exactness: Gini via the sorted-prefix formula
    (2*sum(i*x_i) - (n+1)*sum(x)) / (n*sum(x)) with x ascending and a
    deterministic tiebreak — every term an exact integer, one double
    division + portable floor-half-up round at the end. Scale shape: the
    rank runs over the KEY-grain count relation (n_keys rows, not
    events) — but a 100 TB event log's key space is itself 10^8+, so the
    rank is a distributed prefix-sum (``ranked_prefix_sum``), not a
    single-partition global window; the events-grain work is one
    map-side-combined count.
    """
    from kafka_connect_bigquery_storage_write_spark.operators.partitioning import ranked_prefix_sum

    ev = load_table(spark, sf_dir, "events")
    cnt = ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("c"))
    ranked = ranked_prefix_sum(cnt, [F.col("c"), F.col("user_id")], rank_col="i")
    agg = ranked.agg(
        F.count(F.lit(1)).alias("n_keys"),
        F.sum("c").alias("total"),
        F.max("c").alias("max_count"),
        F.sum(F.col("i") * F.col("c")).alias("weighted"),
    )
    return agg.select(
        "n_keys",
        "total",
        "max_count",
        (F.floor(F.col("max_count") * F.lit(1000000.0) / F.col("total") + F.lit(0.5)) / F.lit(1000000.0)).alias(
            "top_share"
        ),
        (
            F.floor(
                (F.lit(2.0) * F.col("weighted") - (F.col("n_keys") + F.lit(1.0)) * F.col("total"))
                * F.lit(1000000.0)
                / (F.col("n_keys").cast("double") * F.col("total"))
                + F.lit(0.5)
            )
            / F.lit(1000000.0)
        ).alias("gini"),
    )


@query(
    "q141_count_min_estimates",
    oracle="""
    WITH ds AS (SELECT unnest([0, 1, 2, 3]) AS d),
    hashed AS (
      SELECT d.d, user_id,
             CAST('0x' || substr(md5(CAST(d.d AS VARCHAR) || '|' || CAST(user_id AS VARCHAR)), 1, 8) AS BIGINT) % 512 AS cell
      FROM events, ds d
    ),
    cells AS (SELECT d, cell, count(*) AS c FROM hashed GROUP BY d, cell),
    exact AS (
      SELECT user_id, count(*) AS n FROM events GROUP BY user_id
      ORDER BY n DESC, user_id LIMIT 20
    ),
    probes AS (
      SELECT e.user_id, e.n, d.d,
             CAST('0x' || substr(md5(CAST(d.d AS VARCHAR) || '|' || CAST(e.user_id AS VARCHAR)), 1, 8) AS BIGINT) % 512 AS cell
      FROM exact e, ds d
    )
    SELECT p.user_id,
           CAST(p.n AS BIGINT)        AS exact_count,
           CAST(min(c.c) AS BIGINT)   AS cms_estimate,
           min(c.c) >= p.n            AS never_undercounts
    FROM probes p JOIN cells c ON c.d = p.d AND c.cell = p.cell
    GROUP BY p.user_id, p.n
    ORDER BY exact_count DESC, user_id
    """,
)
def q141_count_min_estimates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min sketch, deterministic enough to oracle: depth-4 x
    width-512 counter grid keyed by md5-derived cell hashes (the same
    bytes on every engine), estimates = min over rows — completing the
    mergeable-sketch family (HLL q83, KLL q117, theta q120, freqItems
    q81) with the frequency-estimation member. The query reports the
    top-20 exact user counts beside their CMS estimates plus the
    never-undercounts invariant the sketch guarantees.

    Scale shape: the grid is depth*width = 2048 counters TOTAL
    regardless of corpus size (each cell a map-side-combined count);
    that is the whole point — frequency estimates over an unbounded key
    space in O(1) memory, mergeable across batches/partitions by cell
    addition. The d-replication explode multiplies the scan by depth,
    not the shuffle (cells, not events, cross the exchange).
    """
    ev = load_table(spark, sf_dir, "events")
    ds = F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("d")
    cell = (
        F.conv(F.substring(F.md5(F.concat_ws("|", F.col("d"), F.col("user_id"))), 1, 8), 16, 10).cast("long") % 512
    )
    hashed = ev.select("user_id").select(ds, "user_id").withColumn("cell", cell)
    cells = hashed.groupBy("d", "cell").agg(F.count(F.lit(1)).alias("c"))
    exact = (
        ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).orderBy(F.col("n").desc(), "user_id").limit(20)
    )
    probes = exact.select(ds, "user_id", "n").withColumn("cell", cell)
    return (
        probes.join(F.broadcast(cells), ["d", "cell"])
        .groupBy("user_id", "n")
        .agg(F.min("c").alias("_est"))
        .select(
            "user_id",
            F.col("n").cast("long").alias("exact_count"),
            F.col("_est").cast("long").alias("cms_estimate"),
            (F.col("_est") >= F.col("n")).alias("never_undercounts"),
        )
        .orderBy(F.col("exact_count").desc(), "user_id")
    )
