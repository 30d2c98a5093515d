"""coactivity_edges hot-bucket cap (VERDICT r5 #4): deterministic
md5-rank member sampling bounds the self-join blowup; a cap above every
bucket's size is a no-op (the registered q122 configuration)."""

from __future__ import annotations

import pyspark.sql.functions as F

from kafka_connect_bigquery_storage_write_spark.operators.graph import coactivity_edges


def _members(spark, spec):
    # spec: {bucket: n_members}; members are "<bucket>_m<i>"
    rows = [(b, f"{b}_m{i}") for b, n in spec.items() for i in range(n)]
    return spark.createDataFrame(rows, "h string, u string")


def test_cap_bounds_hot_bucket_edges(spark):
    hu = _members(spark, {"hot": 50, "cold": 4})
    edges = coactivity_edges(hu, max_bucket_members=10)
    per_src = edges.groupBy().count().collect()[0][0]
    # hot contributes 10*9 directed pairs, cold (under cap) all 4*3
    assert per_src == 10 * 9 + 4 * 3


def test_cap_above_bucket_size_is_identity(spark):
    hu = _members(spark, {"a": 7, "b": 3})
    capped = set(map(tuple, coactivity_edges(hu, max_bucket_members=2000).collect()))
    uncapped = set(map(tuple, coactivity_edges(hu).collect()))
    assert capped == uncapped and len(uncapped) == 7 * 6 + 3 * 2


def test_cap_sample_is_deterministic_across_partitionings(spark):
    hu = _members(spark, {"hot": 40})
    e1 = set(map(tuple, coactivity_edges(hu.repartition(1), max_bucket_members=8).collect()))
    e2 = set(map(tuple, coactivity_edges(hu.repartition(16), max_bucket_members=8).collect()))
    assert e1 == e2 and len(e1) == 8 * 7


def test_q122_fixture_ranks_unchanged_by_cap(spark, sf_dir):
    """The registered cap (2000) sits far above the fixture's max bucket
    membership, so q122's top-50 must be byte-identical to the uncapped
    build."""
    from kafka_connect_bigquery_storage_write_spark.operators.graph import pagerank_integer
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    hu = ev.select(F.date_trunc("hour", "ts").alias("h"), F.col("user_id").alias("u")).distinct()

    def top50(edges):
        r = pagerank_integer(edges.localCheckpoint(eager=True), iterations=2)
        return [
            (row["vertex"], row["rank_micro"])
            for row in r.orderBy(F.col("rank_micro").desc(), "vertex").limit(50).collect()
        ]

    assert top50(coactivity_edges(hu, max_bucket_members=2000)) == top50(coactivity_edges(hu))
