"""Skew utilities: salted aggregation/join correctness on a deliberately
skewed key distribution (one key holding ~50% of rows)."""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.operators.skew import salted_agg, salted_join, skew_profile


def _skewed(spark, n=10_000):
    # key 0 holds half the rows; keys 1..99 share the rest
    return spark.range(n).select(
        F.when(F.col("id") % 2 == 0, 0).otherwise(F.pmod(F.col("id"), F.lit(99)) + 1).cast("long").alias("k"),
        (F.col("id") % 7).cast("double").alias("v"),
    )


def test_salted_agg_matches_plain_agg(spark):
    df = _skewed(spark)
    plain = {
        (r.k): (r.s, r.n, r.mx)
        for r in df.groupBy("k").agg(F.sum("v").alias("s"), F.count("v").alias("n"), F.max("v").alias("mx")).collect()
    }
    salted = {
        (r.k): (r.sum_v, r.count_v, r.max_v)
        for r in salted_agg(df, ["k"], {"v": "sum"} | {}, salt_buckets=8)
        .join(salted_agg(df, ["k"], {"v": "count"}, salt_buckets=8), "k")
        .join(salted_agg(df, ["k"], {"v": "max"}, salt_buckets=8), "k")
        .collect()
    }
    assert plain.keys() == salted.keys()
    for k in plain:
        assert plain[k][0] == salted[k][0]  # sum
        assert plain[k][1] == salted[k][1]  # count
        assert plain[k][2] == salted[k][2]  # max


def test_salted_join_matches_plain_join(spark):
    skewed = _skewed(spark, 5_000)
    dim = spark.range(100).select(F.col("id").alias("k"), F.concat(F.lit("name-"), F.col("id")).alias("name"))
    plain = skewed.join(dim, "k").groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    salted = salted_join(skewed, dim, "k", salt_buckets=8).groupBy("k").agg(F.count(F.lit(1)).alias("n")).collect()
    assert {(r.k, r.n) for r in plain} == {(r.k, r.n) for r in salted}


def test_salted_join_salt_is_replay_deterministic(spark):
    """Hash-derived salt: two independent runs (fresh lineage, different
    partitioning) must produce identical row-level results — rand()-based
    salting could re-draw under task retry."""
    dim = spark.range(100).select(F.col("id").alias("k"), F.concat(F.lit("name-"), F.col("id")).alias("name"))
    run1 = sorted(tuple(r) for r in salted_join(_skewed(spark, 3_000), dim, "k", salt_buckets=8).collect())
    run2 = sorted(
        tuple(r) for r in salted_join(_skewed(spark, 3_000).repartition(7), dim, "k", salt_buckets=8).collect()
    )
    assert run1 == run2


def test_salted_join_rejects_unsupported_how(spark):
    import pytest

    with pytest.raises(ValueError, match="inner/left"):
        salted_join(_skewed(spark, 10), _skewed(spark, 10), "k", how="full")


def test_skew_profile_finds_hot_key(spark):
    prof = skew_profile(_skewed(spark), ["k"], top_n=3).collect()
    assert prof[0].k == 0 and prof[0].share > 0.4


def test_rejects_non_decomposable_agg(spark):
    import pytest

    with pytest.raises(ValueError, match="decomposable"):
        salted_agg(_skewed(spark), ["k"], {"v": "avg"})


def test_heavy_hitters_exact_boundary_key(spark):
    """A key sitting EXACTLY at support*total must be reported: freqItems'
    no-false-negative guarantee is strict-greater-than its support arg, so
    the sketch runs at support*0.99 to cover the >= threshold pass 2
    applies (a boundary key would otherwise vanish from the candidates)."""
    from kafka_connect_bigquery_storage_write_spark.operators.skew import heavy_hitters

    # 1000 rows; key 'edge' appears exactly 100 times = support 0.10
    rows = [("edge",)] * 100 + [(f"tail{i}",) for i in range(900)]
    df = spark.createDataFrame(rows, "k string")
    out = {r.k: r.n_rows for r in heavy_hitters(df, "k", support=0.10).collect()}
    assert out == {"edge": 100}


def test_heavy_hitters_plan_uses_broadcast_semi_join(spark):
    """The candidate verify must be a broadcast semi-join, not an
    isin(list) In-literal that grows toward 1/support entries."""
    from kafka_connect_bigquery_storage_write_spark.operators.skew import heavy_hitters

    df = spark.range(2000).select((F.col("id") % 10).cast("string").alias("k"))
    plan = heavy_hitters(df, "k", support=0.05)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
