"""Pending-mode (transactional) CDC at the STREAMING pipeline surface
(VERDICT r13 #2 — the reference's R17 commits pending streams at
offset-commit time, BigqueryStorageWriteSinkTask.java:148-245; round 13
built the staged-MERGE sink semantics (q233) and this round routes
``upsert_mode='mor' x write_mode='pending'`` through ``IngestPipeline``:
foreachBatch STAGES each micro-batch, and an epoch publishes every
``commit_every_n_batches`` micro-batches or at ``pipeline.commit()``)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_bigquery_storage_write_spark.config import PipelineConfig
from kafka_connect_bigquery_storage_write_spark.streaming.pipeline import IngestPipeline

VALUE_SCHEMA = T.StructType(
    [
        T.StructField("k", T.LongType(), False),
        T.StructField("v", T.LongType(), False),
    ]
)


def _env(spark, rows):
    df = spark.createDataFrame(rows, "k long, v long")
    return df.select(
        F.lit("t").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("k").alias("offset"),
        F.col("k").cast("string").alias("key"),
        F.to_json(F.struct("k", "v")).alias("value"),
    )


def _pipe(tmp_path, cadence=None, name="sink", evolution="frozen"):
    cfg = PipelineConfig(
        sink_path=str(tmp_path / name),
        checkpoint_path=str(tmp_path / f"{name}-ckpt"),
        write_mode="pending",
        upsert_keys=["k"],
        upsert_mode="mor",
        commit_every_n_batches=cadence,
        sink_schema_evolution=evolution,
    )
    return IngestPipeline(config=cfg, value_schema=VALUE_SCHEMA, sink_schema=VALUE_SCHEMA)


def _content(spark, pipe):
    return {r["k"]: r["v"] for r in pipe.read_sink(spark).collect()}


def test_pending_mor_stream_invisible_until_commit(spark, tmp_path):
    """Three staged micro-batches (seed + two overlapping merges) are
    INVISIBLE — reads empty, feed empty — until one commit publishes the
    converged transaction; in-transaction supersedes apply."""
    pipe = _pipe(tmp_path)
    sink = pipe._sink
    pipe.run_batch(_env(spark, [(1, 10), (2, 20), (3, 30)]), batch_id=0)  # staged seed
    pipe.run_batch(_env(spark, [(2, 21), (4, 40)]), batch_id=1)  # staged merge
    pipe.run_batch(_env(spark, [(2, 22), (5, 50)]), batch_id=2)  # supersedes batch 1's k=2
    assert _content(spark, pipe) == {}, "staged transaction leaked into reads"
    assert sink.changes(spark, after_batch_id=-1).count() == 0, "staged merge leaked into the feed"
    assert sink.staged_ids() == [0], "the seed must be a plain staged append"
    # one epoch rename publishes the whole converged transaction
    assert pipe.commit() == [0, 1, 2]
    assert _content(spark, pipe) == {1: 10, 2: 22, 3: 30, 4: 40, 5: 50}
    # the feed types the merge batches 'upsert'
    assert [(b, t) for b, _d, t in sink._change_sources(0)] == [(1, "upsert"), (2, "upsert")]
    # replaying a published batch id is a no-op
    stats = pipe.run_batch(_env(spark, [(2, 999)]), batch_id=2)
    assert stats.already_exists
    assert _content(spark, pipe)[2] == 22


def test_pending_mor_cadence_commits_epochs(spark, tmp_path):
    """commit_every_n_batches=2: epochs publish after micro-batches 1 and
    3, each visible exactly at its boundary."""
    pipe = _pipe(tmp_path, cadence=2)
    s0 = pipe.run_batch(_env(spark, [(1, 10), (2, 20)]), batch_id=0)
    assert s0.epoch_batch_ids is None
    assert _content(spark, pipe) == {}, "mid-epoch batch must stay staged"
    s1 = pipe.run_batch(_env(spark, [(2, 21), (3, 30)]), batch_id=1)
    assert s1.epoch_batch_ids == [0, 1]
    assert _content(spark, pipe) == {1: 10, 2: 21, 3: 30}
    s2 = pipe.run_batch(_env(spark, [(3, 31)]), batch_id=2)
    assert s2.epoch_batch_ids is None
    assert _content(spark, pipe) == {1: 10, 2: 21, 3: 30}, "epoch-2 staging leaked"
    s3 = pipe.run_batch(_env(spark, [(4, 40)]), batch_id=3)
    assert s3.epoch_batch_ids == [2, 3]
    assert _content(spark, pipe) == {1: 10, 2: 21, 3: 31, 4: 40}
    epochs = [f for f in os.listdir(tmp_path / "sink" / "_commits") if f.startswith("epoch-")]
    assert len(epochs) == 2


def test_pending_reset_unmarks_merge_batches(spark, tmp_path):
    """reset() aborts the open transaction AND removes the pipeline's
    merge markers for the discarded batches, so the same batch ids can
    re-stage (checkpoint replay after an abort must not silently no-op)."""
    pipe = _pipe(tmp_path)
    pipe.run_batch(_env(spark, [(1, 10), (2, 20)]), batch_id=0)
    pipe.run_batch(_env(spark, [(2, 21)]), batch_id=1)
    assert sorted(pipe.reset()) == [0, 1]
    for b in (0, 1):
        assert not os.path.exists(tmp_path / "sink" / "_commits" / f"merge-{b}.marker")
    assert _content(spark, pipe) == {}
    # the aborted batch ids RE-stage and publish
    s0 = pipe.run_batch(_env(spark, [(1, 11), (2, 22)]), batch_id=0)
    s1 = pipe.run_batch(_env(spark, [(2, 23)]), batch_id=1)
    assert not s0.already_exists and not s1.already_exists
    assert pipe.commit() == [0, 1]
    assert _content(spark, pipe) == {1: 11, 2: 23}


def test_pending_mor_streaming_end_to_end(spark, tmp_path):
    """A REAL Structured Streaming drive: three file-source micro-batches
    under cadence=3 publish as ONE epoch from inside foreachBatch.
    Phase-wise availableNow runs pin the micro-batch order (the file
    source does not reliably order same-listing files, and the k=2/k=3
    latest-wins convergence depends on it)."""
    src = tmp_path / "src"
    pipe = _pipe(tmp_path, cadence=3)

    def stream():
        return spark.readStream.schema(
            "topic string, partition int, offset long, key string, value string"
        ).json(str(src / "b*"))

    for b, rows in enumerate([[(1, 10), (2, 20)], [(2, 21), (3, 30)], [(3, 31)]]):
        _env(spark, rows).coalesce(1).write.json(str(src / f"b{b}"))
        q = pipe.start_stream(stream(), trigger_once=True)
        q.awaitTermination(180)
    assert _content(spark, pipe) == {1: 10, 2: 21, 3: 31}
    assert [s.epoch_batch_ids for s in pipe.stats] == [None, None, [0, 1, 2]]
    # restarting the checkpointed stream with no new files replays nothing
    q2 = pipe.start_stream(stream(), trigger_once=True)
    q2.awaitTermination(180)
    assert _content(spark, pipe) == {1: 10, 2: 21, 3: 31}


def test_pending_merge_additive_evolution_commit_and_reset(spark, tmp_path):
    """Pending x additive evolution (VERDICT r13 #6): a staged merge that
    GROWS the schema publishes schema + data atomically at commit; after
    a reset the schema-already-evolved-no-data table is readable (old
    columns null-fill is moot — no rows) and a later merge converges."""
    wide = T.StructType(
        [
            T.StructField("k", T.LongType(), False),
            T.StructField("v", T.LongType(), False),
            T.StructField("note", T.StringType(), True),
        ]
    )

    def env_wide(rows):
        df = spark.createDataFrame(rows, "k long, v long, note string")
        return df.select(
            F.lit("t").alias("topic"),
            F.lit(0).alias("partition"),
            F.col("k").alias("offset"),
            F.col("k").cast("string").alias("key"),
            F.to_json(F.struct("k", "v", "note")).alias("value"),
        )

    pipe = _pipe(tmp_path, evolution="additive")
    pipe.run_batch(_env(spark, [(1, 10), (2, 20)]), batch_id=0)
    # the evolving merge stages against the staged seed
    wide_pipe = IngestPipeline(config=pipe.config, value_schema=wide, sink_schema=wide)
    wide_pipe.run_batch(env_wide([(2, 21, "x")]), batch_id=1)
    assert _content(spark, pipe) == {}, "evolving staged merge leaked"
    # (i) commit: readers see evolved schema + data atomically
    assert wide_pipe.commit() == [0, 1]
    got = {r["k"]: (r["v"], r["note"]) for r in wide_pipe.read_sink(spark).collect()}
    assert got == {1: (10, None), 2: (21, "x")}

    # (ii) reset path on a fresh table: the evolved-schema-no-data state
    pipe2 = _pipe(tmp_path, name="sink2", evolution="additive")
    pipe2.run_batch(_env(spark, [(5, 50)]), batch_id=0)
    wide2 = IngestPipeline(config=pipe2.config, value_schema=wide, sink_schema=wide)
    wide2.run_batch(env_wide([(5, 51, "y")]), batch_id=1)
    assert sorted(wide2.reset()) == [0, 1]
    # schema stays evolved with no data — readable, and a later merge converges
    assert wide2.read_sink(spark).count() == 0
    assert {f.name for f in pipe2._sink.schema().fields} == {"k", "v", "note"}
    wide2.run_batch(env_wide([(6, 60, "z")]), batch_id=2)
    assert wide2.commit() == [2]
    got2 = {r["k"]: (r["v"], r["note"]) for r in wide2.read_sink(spark).collect()}
    assert got2 == {6: (60, "z")}
