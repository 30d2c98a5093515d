"""CDC/upsert ingestion mode (round 8): keyed MERGE per micro-batch."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_bigquery_storage_write_spark.config import PipelineConfig
from kafka_connect_bigquery_storage_write_spark.streaming.pipeline import IngestPipeline

VALUE_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.LongType(), False),
        T.StructField("seq", T.LongType(), False),
    ]
)


def _env(spark, rows):
    df = spark.createDataFrame(rows, "k long, v long, seq long")
    payload = F.to_json(F.struct("k", "v", "seq"))
    return df.select(
        F.lit("t").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("seq").alias("offset"),
        F.col("k").cast("string").alias("key"),
        payload.alias("value"),
    )


def test_upsert_mode_merges_batches(spark, tmp_path):
    cfg = PipelineConfig(
        sink_path=str(tmp_path / "sink"), write_mode="committed",
        upsert_keys=["k"], upsert_order_col="seq",
    )
    pipe = IngestPipeline(config=cfg, value_schema=VALUE_SCHEMA, sink_schema=VALUE_SCHEMA)
    # batch 0 seeds; contains TWO changes for k=1 — latest (seq) wins
    pipe.run_batch(_env(spark, [(1, 10, 1), (1, 11, 2), (2, 20, 3)]), batch_id=0)
    got = {r["k"]: r["v"] for r in pipe.read_sink(spark).collect()}
    assert got == {1: 11, 2: 20}
    # batch 1: update k=2, insert k=3
    pipe.run_batch(_env(spark, [(2, 99, 4), (3, 30, 5)]), batch_id=1)
    got = {r["k"]: r["v"] for r in pipe.read_sink(spark).collect()}
    assert got == {1: 11, 2: 99, 3: 30}
    # replayed batch id short-circuits (exactly-once bookkeeping)
    stats = pipe.run_batch(_env(spark, [(2, 12345, 4), (3, 30, 5)]), batch_id=1)
    assert stats.already_exists
    assert {r["k"]: r["v"] for r in pipe.read_sink(spark).collect()} == {1: 11, 2: 99, 3: 30}


def test_upsert_streaming_end_to_end(spark, tmp_path):
    """Two file-source micro-batches of keyed changes through a REAL
    Structured Streaming query: the sink converges to latest-per-key."""
    src = tmp_path / "src"
    cfg = PipelineConfig(
        sink_path=str(tmp_path / "sink"), checkpoint_path=str(tmp_path / "ckpt"),
        write_mode="committed", upsert_keys=["k"], upsert_order_col="seq",
    )
    pipe = IngestPipeline(config=cfg, value_schema=VALUE_SCHEMA, sink_schema=VALUE_SCHEMA)
    # phase-wise availableNow runs pin the micro-batch order (the file
    # source does not reliably order same-listing files, and k=1 must
    # converge to the LATER batch's value)
    for b, rows in enumerate([[(1, 10, 1), (2, 20, 2)], [(1, 111, 3), (3, 30, 4)]]):
        _env(spark, rows).coalesce(1).write.json(str(src / f"b{b}"))
        stream = spark.readStream.schema(
            "topic string, partition int, offset long, key string, value string"
        ).json(str(src / "b*"))
        q = pipe.start_stream(stream, trigger_once=True)
        q.awaitTermination(180)
    got = {r["k"]: r["v"] for r in pipe.read_sink(spark).collect()}
    assert got == {1: 111, 2: 20, 3: 30}


def test_upsert_config_validation(tmp_path):
    with pytest.raises(ValueError, match="requires upsert_keys"):
        PipelineConfig(sink_path=str(tmp_path), upsert_order_col="seq")
    # pending composes ONLY with MOR (round 14): a COW merge rewrites the
    # visible base in place, so it cannot stage; MOR stages and publishes
    # at the epoch commit
    with pytest.raises(ValueError, match="upsert_mode='mor'"):
        PipelineConfig(sink_path=str(tmp_path), write_mode="pending", upsert_keys=["k"])
    PipelineConfig(
        sink_path=str(tmp_path), write_mode="pending", upsert_keys=["k"], upsert_mode="mor"
    )
    with pytest.raises(ValueError, match="write_mode='pending'"):
        PipelineConfig(sink_path=str(tmp_path), commit_every_n_batches=2)
    with pytest.raises(ValueError, match="positive"):
        PipelineConfig(sink_path=str(tmp_path), write_mode="pending", commit_every_n_batches=0)


def test_upsert_lost_snapshot_cas_does_not_mark_batch(spark, tmp_path, monkeypatch):
    """ADVICE r8: the keyed merge (merge_rows_pruned since round 10) returns None when a concurrent rewriter wins
    the snapshot CAS. The pipeline must NOT create the merge marker then —
    a marked-but-unapplied batch would short-circuit replay and silently
    drop its changes. A transient loss retries to success; a persistent
    loss raises with no marker."""
    cfg = PipelineConfig(
        sink_path=str(tmp_path / "sink"), write_mode="committed",
        upsert_keys=["k"], upsert_order_col="seq",
    )
    pipe = IngestPipeline(config=cfg, value_schema=VALUE_SCHEMA, sink_schema=VALUE_SCHEMA)
    pipe.run_batch(_env(spark, [(1, 10, 1)]), batch_id=0)  # seed

    real = type(pipe._sink).merge_rows_pruned
    calls = {"n": 0}

    def flaky(self, *a, **kw):
        calls["n"] += 1
        if calls["n"] == 1:
            return None  # lost CAS once
        return real(self, *a, **kw)

    monkeypatch.setattr(type(pipe._sink), "merge_rows_pruned", flaky)
    pipe.run_batch(_env(spark, [(1, 99, 2)]), batch_id=1)
    assert calls["n"] == 2  # retried against fresh state
    assert {r["k"]: r["v"] for r in pipe.read_sink(spark).collect()} == {1: 99}
    marker = tmp_path / "sink" / "_commits" / "merge-1.marker"
    assert marker.exists()

    monkeypatch.setattr(type(pipe._sink), "merge_rows_pruned", lambda self, *a, **kw: None)
    with pytest.raises(RuntimeError, match="CAS lost"):
        pipe.run_batch(_env(spark, [(1, 7, 3)]), batch_id=2)
    assert not (tmp_path / "sink" / "_commits" / "merge-2.marker").exists()
    # replay after the failure applies the batch (no marker short-circuit)
    monkeypatch.setattr(type(pipe._sink), "merge_rows_pruned", real)
    pipe.run_batch(_env(spark, [(1, 7, 3)]), batch_id=2)
    assert {r["k"]: r["v"] for r in pipe.read_sink(spark).collect()} == {1: 7}


def test_two_concurrent_upsert_pipelines_disjoint_keys(spark, tmp_path):
    """VERDICT r9 #6 — the real multi-writer CDC topology: TWO upsert
    pipelines (own batch-id spaces, disjoint key ranges) race the SAME
    sink concurrently. Snapshot-CAS losses must retry (never mark an
    unapplied batch), every batch must land exactly once (markers
    disjoint and complete), and the final state must be latest-per-key
    across both writers."""
    import threading

    cfg = PipelineConfig(
        sink_path=str(tmp_path / "sink"), write_mode="committed",
        upsert_keys=["k"], upsert_order_col="seq",
    )
    pipe_a = IngestPipeline(config=cfg, value_schema=VALUE_SCHEMA, sink_schema=VALUE_SCHEMA)
    pipe_b = IngestPipeline(config=cfg, value_schema=VALUE_SCHEMA, sink_schema=VALUE_SCHEMA)
    # seed once so both writers start on a non-empty table
    pipe_a.run_batch(_env(spark, [(k, 0, 0) for k in range(0, 20)] + [(k, 0, 0) for k in range(100, 120)]), batch_id=0)

    errs: list[BaseException] = []

    def writer(pipe, lo: int, base_bid: int):
        try:
            for i in range(1, 4):  # 3 merge batches per writer
                rows = [(k, lo * 1000 + i, i) for k in range(lo, lo + 20)]
                pipe.run_batch(_env(spark, rows), batch_id=base_bid + i)
        except BaseException as e:  # noqa: BLE001 - surface to the main thread
            errs.append(e)

    ta = threading.Thread(target=writer, args=(pipe_a, 0, 100))     # bids 101-103
    tb = threading.Thread(target=writer, args=(pipe_b, 100, 200))   # bids 201-203
    ta.start(); tb.start(); ta.join(180); tb.join(180)
    assert not errs, errs

    got = {r["k"]: r["v"] for r in pipe_a.read_sink(spark).collect()}
    want = {k: (3 if k < 100 else 100_003) for k in list(range(0, 20)) + list(range(100, 120))}
    assert got == want, {k: v for k, v in got.items() if want.get(k) != v}

    # exactly-once bookkeeping: every batch has its merge/seed marker
    import os

    commits = os.listdir(tmp_path / "sink" / "_commits")
    for bid in (0, 101, 102, 103, 201, 202, 203):
        assert f"merge-{bid}.marker" in commits, sorted(commits)
    # and replaying any batch on either pipeline is a no-op
    stats = pipe_b.run_batch(_env(spark, [(100, 777777, 9)]), batch_id=201)
    assert stats.already_exists
    assert {r["k"]: r["v"] for r in pipe_a.read_sink(spark).collect()} == want


def test_upsert_empty_batch_is_noop_not_cas_wedge(spark, tmp_path):
    """ADVICE r10 (medium): a micro-batch whose rows are ALL dead-lettered
    reaches the merge path empty; merge_rows_pruned reports empty updates
    as None, which the CAS retry loop used to misread as a lost snapshot
    CAS — wedging the pipeline on replay. It must no-op, mark the batch
    applied, and short-circuit replays."""
    cfg = PipelineConfig(
        sink_path=str(tmp_path / "sink"), write_mode="committed",
        upsert_keys=["k"], upsert_order_col="seq", dlq_path=str(tmp_path / "dlq"),
    )
    pipe = IngestPipeline(config=cfg, value_schema=VALUE_SCHEMA, sink_schema=VALUE_SCHEMA)
    pipe.run_batch(_env(spark, [(1, 10, 1), (2, 20, 2)]), batch_id=0)  # seed
    bad = spark.createDataFrame(
        [("t", 0, 10, "x", "{not json")],
        "topic string, partition int, offset long, key string, value string",
    )
    stats = pipe.run_batch(bad, batch_id=1)
    assert stats.dlq_rows == 1 and stats.written_rows == 0 and not stats.already_exists
    # replay short-circuits on the merge marker (exactly-once bookkeeping)
    stats2 = pipe.run_batch(bad, batch_id=1)
    assert stats2.already_exists
    got = {r["k"]: r["v"] for r in pipe.read_sink(spark).collect()}
    assert got == {1: 10, 2: 20}


def test_upsert_mode_mor_merges_batches(spark, tmp_path):
    """upsert_mode='mor': same convergence as COW, but every micro-batch
    is APPEND-ONLY (no pre-existing data file rewritten or renamed) and
    the feed still serves per-batch upserts without a changelog."""
    import os

    cfg = PipelineConfig(
        sink_path=str(tmp_path / "sink"), write_mode="committed",
        upsert_keys=["k"], upsert_order_col="seq", upsert_mode="mor",
    )
    pipe = IngestPipeline(config=cfg, value_schema=VALUE_SCHEMA, sink_schema=VALUE_SCHEMA)
    pipe.run_batch(_env(spark, [(1, 10, 1), (1, 11, 2), (2, 20, 3)]), batch_id=0)
    assert {r["k"]: r["v"] for r in pipe.read_sink(spark).collect()} == {1: 11, 2: 20}
    pre = {os.path.basename(p) for p in pipe._sink.visible_files()}
    pipe.run_batch(_env(spark, [(2, 99, 4), (3, 30, 5)]), batch_id=1)
    post = {os.path.basename(p) for p in pipe._sink.visible_files()}
    assert pre <= post, "MOR micro-batch must not rewrite any visible file"
    assert {r["k"]: r["v"] for r in pipe.read_sink(spark).collect()} == {1: 11, 2: 99, 3: 30}
    stats = pipe.run_batch(_env(spark, [(2, 12345, 4), (3, 30, 5)]), batch_id=1)
    assert stats.already_exists
    assert {r["k"]: r["v"] for r in pipe.read_sink(spark).collect()} == {1: 11, 2: 99, 3: 30}
    # the feed types the MOR batch 'upsert' with no changelog write
    ch = pipe._sink.changes(spark, after_batch_id=0)
    assert {(r["_change_batch_id"], r["_change_type"]) for r in ch.collect()} == {(1, "upsert")}
    # and a consumer drains it into a converged mirror
    from kafka_connect_bigquery_storage_write_spark.sinks import ManifestSinkTable
    from kafka_connect_bigquery_storage_write_spark.sinks.cdf_consumer import ChangeFeedConsumer

    tgt = ManifestSinkTable(str(tmp_path / "mirror"), write_mode="committed")
    consumer = ChangeFeedConsumer(pipe._sink, tgt, keys=["k"], checkpoint_dir=str(tmp_path / "ck2"))
    assert consumer.run_available_now(spark) == 2
    a = {tuple(r) for r in pipe.read_sink(spark).collect()}
    b = {tuple(r) for r in tgt.read(spark).collect()}
    assert a == b


def test_upsert_mode_validation(tmp_path):
    with pytest.raises(ValueError, match="cow|mor"):
        PipelineConfig(sink_path=str(tmp_path), upsert_keys=["k"], upsert_mode="bogus")
    with pytest.raises(ValueError, match="requires upsert_keys"):
        PipelineConfig(sink_path=str(tmp_path), upsert_mode="mor")
