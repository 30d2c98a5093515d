"""Incremental rollup: partial/combine exactness, replay idempotence,
compaction invariance, late-data absorption."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from kafka_connect_bigquery_storage_write_spark.streaming.rollup import IncrementalRollup


def _events(spark):
    rows = [
        # (event_id, ts, key, value) — two hour buckets, two keys
        (1, "2024-01-01 10:05:00", "a", 10.0),
        (2, "2024-01-01 10:15:00", "a", 20.0),
        (3, "2024-01-01 10:25:00", "b", 5.0),
        (4, "2024-01-01 11:05:00", "a", 40.0),
        (5, "2024-01-01 11:35:00", "b", 1.0),
        (6, "2024-01-01 11:45:00", "b", 3.0),
    ]
    return spark.createDataFrame(rows, "event_id long, ts string, k string, value double").withColumn(
        "ts", F.to_timestamp("ts")
    )


def _rollup(tmp_path):
    return IncrementalRollup(
        sink_path=str(tmp_path / "rollup"),
        ts_col="ts",
        window="1 hour",
        key_cols=["k"],
        aggs=[("value", "count"), ("value", "sum"), ("value", "avg"), ("value", "min"), ("value", "max")],
    )


def _state(roll, spark):
    return {
        (str(r.window_start), r.k): (r.count_value, r.sum_value, r.avg_value, r.min_value, r.max_value)
        for r in roll.read(spark).collect()
    }


EXPECTED = {
    ("2024-01-01 10:00:00", "a"): (2, 30.0, 15.0, 10.0, 20.0),
    ("2024-01-01 10:00:00", "b"): (1, 5.0, 5.0, 5.0, 5.0),
    ("2024-01-01 11:00:00", "a"): (1, 40.0, 40.0, 40.0, 40.0),
    ("2024-01-01 11:00:00", "b"): (2, 4.0, 2.0, 1.0, 3.0),
}


def test_multi_batch_fold_equals_direct_aggregate(spark, tmp_path):
    ev = _events(spark)
    roll = _rollup(tmp_path)
    for i, pred in enumerate([F.col("event_id") <= 2, F.col("event_id").isin(3, 4), F.col("event_id") >= 5]):
        roll.process_batch(ev.filter(pred), batch_id=i)
    assert _state(roll, spark) == EXPECTED


def test_replayed_batch_is_absorbed_not_double_counted(spark, tmp_path):
    ev = _events(spark)
    roll = _rollup(tmp_path)
    roll.process_batch(ev.filter(F.col("event_id") <= 3), batch_id=0)
    before = _state(roll, spark)
    res = roll.process_batch(ev.filter(F.col("event_id") <= 3), batch_id=0)  # crash-replay
    assert res.already_exists
    assert _state(roll, spark) == before


def test_late_data_lands_as_new_partial(spark, tmp_path):
    """No watermark cliff: an hour-10 event arriving in batch 2 combines
    into the hour-10 bucket — storage-backed state has no retention bound."""
    ev = _events(spark)
    roll = _rollup(tmp_path)
    roll.process_batch(ev.filter(F.col("event_id") != 2), batch_id=0)
    roll.process_batch(ev.filter(F.col("event_id") == 2), batch_id=1)  # late hour-10 row
    assert _state(roll, spark) == EXPECTED


def test_compaction_preserves_results(spark, tmp_path):
    ev = _events(spark)
    roll = _rollup(tmp_path)
    for i in range(4):
        roll.process_batch(ev.filter(F.pmod("event_id", F.lit(4)) == i), batch_id=i)
    before = _state(roll, spark)
    assert roll.compact(spark) is not None
    assert _state(roll, spark) == before
    # vacuum drops the absorbed partial dirs; results still unchanged
    assert len(roll.vacuum()) == 4
    assert _state(roll, spark) == before


def test_rejects_non_decomposable_agg(tmp_path):
    with pytest.raises(ValueError, match="decomposable"):
        IncrementalRollup(
            sink_path=str(tmp_path / "r"), ts_col="ts", window="1 hour", key_cols=["k"], aggs=[("value", "median")]
        )


def test_rollup_streaming_mode(spark, tmp_path):
    """start_stream drives the same fold via foreachBatch: 3 source files
    with maxFilesPerTrigger=1 -> 3 micro-batches -> combined state equals
    the direct aggregate."""
    src = tmp_path / "src"
    for i in range(3):  # slice the canonical fixture into 3 non-empty files
        _events(spark).filter(F.pmod("event_id", F.lit(3)) == i).coalesce(1).write.mode("append").parquet(str(src))

    roll = _rollup(tmp_path)
    stream = (
        spark.readStream.schema("event_id long, ts timestamp, k string, value double")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src))
    )
    q = roll.start_stream(stream, checkpoint_path=str(tmp_path / "ckpt"), availableNow=True)
    q.awaitTermination(180)
    assert roll._sink.committed_ids() == [0, 1, 2]
    assert _state(roll, spark) == EXPECTED


def test_approx_distinct_sketches_merge_across_batches(spark, tmp_path):
    """approx_distinct rides the rollup as an HLL sketch: per-batch
    partials union on read, so distinct users per window is maintainable
    incrementally (exact COUNT DISTINCT has no bounded partial form).
    At fixture cardinalities the datasketches estimate is exact, so the
    check is equality against a direct count(distinct) — and the 3-batch
    incremental fold must equal the one-shot aggregate."""
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    ev = load_table(spark, "/root/testdata/sf0.001", "events").select(
        "ts", "event_type", "user_id"
    )
    roll = IncrementalRollup(
        sink_path=str(tmp_path / "rollup"),
        ts_col="ts",
        window="1 day",
        key_cols=["event_type"],
        aggs=[("user_id", "approx_distinct"), ("user_id", "count")],
    )
    # three increments by event-time thirds (arbitrary split)
    for i, (lo, hi) in enumerate([(0, 8), (8, 16), (16, 32)]):
        roll.process_batch(ev.filter((F.dayofmonth("ts") >= lo) & (F.dayofmonth("ts") < hi)), i)
    got = {
        (str(r.window_start), r.event_type): (r.approx_distinct_user_id, r.count_user_id)
        for r in roll.read(spark).collect()
    }
    direct = {
        (str(r.w), r.event_type): (r.nd, r.n)
        for r in ev.groupBy(
            F.window("ts", "1 day").getField("start").alias("w"), "event_type"
        )
        .agg(F.countDistinct("user_id").alias("nd"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert got == direct and len(direct) > 50


# ---------------------------------------------------------------------------
# IncrementalTopK
# ---------------------------------------------------------------------------


def _item_events(spark):
    """One hour bucket, skewed item counts: x=5, y=3, z=2, w=1."""
    rows = []
    eid = 0
    for item, n in (("x", 5), ("y", 3), ("z", 2), ("w", 1)):
        for _ in range(n):
            eid += 1
            rows.append((eid, "2024-01-01 10:05:00", "a", item))
    return spark.createDataFrame(rows, "event_id long, ts string, k string, item string").withColumn(
        "ts", F.to_timestamp("ts")
    )


def _topk(tmp_path, m, name="topk"):
    from kafka_connect_bigquery_storage_write_spark.streaming.rollup import IncrementalTopK

    return IncrementalTopK(
        sink_path=str(tmp_path / name),
        ts_col="ts",
        window="1 hour",
        key_cols=["k"],
        item_col="item",
        m=m,
    )


def test_topk_multi_batch_fold_is_exact_when_m_covers_cardinality(spark, tmp_path):
    ev = _item_events(spark)
    roll = _topk(tmp_path, m=10)
    for i in range(3):
        roll.process_batch(ev.filter(F.pmod("event_id", F.lit(3)) == i), batch_id=i)
    got = [(r.item, r.n, r.rank) for r in roll.read(spark, k=3).orderBy("rank").collect()]
    assert got == [("x", 5, 1), ("y", 3, 2), ("z", 2, 3)]


def test_topk_replayed_batch_absorbed(spark, tmp_path):
    ev = _item_events(spark)
    roll = _topk(tmp_path, m=10)
    roll.process_batch(ev, batch_id=0)
    roll.process_batch(ev, batch_id=0)  # replay: must be ALREADY_EXISTS
    got = {(r.item, r.n) for r in roll.read(spark, k=2).collect()}
    assert got == {("x", 5), ("y", 3)}  # not doubled


def test_topk_truncated_counts_are_lower_bounds_and_head_survives(spark, tmp_path):
    """m=2 truncation: merged counts never exceed the truth, and the true
    heaviest item survives every batch's cut (it is in every batch's
    top-m by construction of heavy hitters)."""
    ev = _item_events(spark)
    roll = _topk(tmp_path, m=2)
    for i in range(3):
        roll.process_batch(ev.filter(F.pmod("event_id", F.lit(3)) == i), batch_id=i)
    got = {r.item: r.n for r in roll.read(spark, k=4).collect()}
    truth = {"x": 5, "y": 3, "z": 2, "w": 1}
    for item, n in got.items():
        assert n <= truth[item]
    top = roll.read(spark, k=1).collect()[0]
    assert top.item == "x"


def test_topk_rejects_bad_m(tmp_path):
    with pytest.raises(ValueError):
        _topk(tmp_path, m=0)


def test_quantile_rollup_exact_regime_and_error_bound(spark, sf_dir, tmp_path):
    """approx_quantile partials: (a) in the exact regime (kll_k >= group
    rows) the merged 3-batch rollup reproduces the exact order statistic
    (quantile_disc convention); (b) at the production default k=200 the
    estimate's true rank stays within a loose KLL rank-error envelope."""
    from pyspark.sql import functions as F

    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table
    from kafka_connect_bigquery_storage_write_spark.streaming.rollup import IncrementalRollup

    ev = load_table(spark, sf_dir, "events")

    def rolled(k, sub):
        roll = IncrementalRollup(
            sink_path=str(tmp_path / f"qr_{k}_{sub}"),
            ts_col="ts",
            window="3650 days",  # one window: per-type groups, maximal n
            key_cols=["event_type"],
            aggs=[("value", "approx_quantile")],
            kll_k=k,
        )
        for i in range(3):
            roll.process_batch(ev.filter(F.pmod("event_id", F.lit(3)) == i), batch_id=i)
        return {r.event_type: (r.p50_value, r.p90_value) for r in roll.read(spark).collect()}

    vals = {}
    for r in ev.select("event_type", "value").collect():
        vals.setdefault(r.event_type, []).append(r.value)
    for t in vals:
        vals[t].sort()

    import math

    exact_mode = rolled(65535, "a")
    for t, (p50, p90) in exact_mode.items():
        xs = vals[t]
        n = len(xs)
        assert p50 == xs[max(math.ceil(0.5 * n), 1) - 1]
        assert p90 == xs[max(math.ceil(0.9 * n), 1) - 1]

    approx = rolled(200, "b")
    for t, (p50, _p90) in approx.items():
        xs = vals[t]
        n = len(xs)
        import bisect

        rank = bisect.bisect_right(xs, p50)
        assert abs(rank - 0.5 * n) <= max(0.08 * n, 2), f"{t}: rank {rank} of {n} for p50 {p50}"
