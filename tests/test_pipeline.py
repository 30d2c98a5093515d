"""End-to-end ingest pipeline tests (SURVEY.md R1–R17 recomposed, E20).

Batch-path poison-row salvage mirrors the reference's serialization-error
test (3 rows in, row 1 bad -> rows 0,2 land, row 1 to DLQ); streaming
tests cover checkpointed replay idempotence and both commit modes.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kafka_connect_bigquery_storage_write_spark.config import PipelineConfig
from kafka_connect_bigquery_storage_write_spark.streaming import IngestPipeline, kafka_shaped

KV_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("int_value", T.LongType(), False),
    ]
)


def _envelope(spark, payloads):
    rows = [("t", 0, i, f"key-{i}", json.dumps(p) if isinstance(p, dict) else p) for i, p in enumerate(payloads)]
    return spark.createDataFrame(rows, "topic string, partition int, offset long, key string, value string")


def _pipeline(tmp_path, mode="committed", dlq=True):
    cfg = PipelineConfig(
        sink_path=str(tmp_path / "sink"),
        dlq_path=str(tmp_path / "dlq") if dlq else None,
        checkpoint_path=str(tmp_path / "ckpt"),
        write_mode=mode,
    )
    return IngestPipeline(config=cfg, value_schema=KV_SCHEMA)


def test_poison_row_salvage(spark, tmp_path):
    """3 rows, middle one invalid -> 2 land in sink, 1 in DLQ with reason."""
    p = _pipeline(tmp_path)
    df = _envelope(spark, [{"id": "id-0", "int_value": 1}, {"id": None, "int_value": 2}, {"id": "id-2", "int_value": 3}])
    stats = p.run_batch(df, 0)
    assert (stats.input_rows, stats.written_rows, stats.dlq_rows) == (3, 2, 1)
    assert sorted(r.id for r in p.read_sink(spark).collect()) == ["id-0", "id-2"]
    dlq = p._dlq.read(spark)
    bad = dlq.collect()[0]
    assert bad.offset == 1 and "id" in bad._dlq_errors[0]


def test_pending_mode_commit_protocol(spark, tmp_path):
    p = _pipeline(tmp_path, mode="pending")
    df = _envelope(spark, [{"id": "a", "int_value": 1}, {"id": "b", "int_value": 2}])
    p.run_batch(df, 0)
    assert p.read_sink(spark).count() == 0  # invisible before commit
    assert p.commit() == [0]
    assert p.read_sink(spark).count() == 2


def test_batch_replay_is_idempotent(spark, tmp_path):
    p = _pipeline(tmp_path)
    df = _envelope(spark, [{"id": "a", "int_value": 1}])
    p.run_batch(df, 0)
    stats = p.run_batch(df, 0)  # replay same batch id
    assert stats.already_exists and stats.written_rows == 0
    assert p.read_sink(spark).count() == 1


def test_streaming_file_source_end_to_end(spark, tmp_path):
    """Kafka-shaped file stream -> pipeline -> sink, availableNow trigger."""
    src_dir = tmp_path / "src"
    payloads = [{"id": f"id-{i}", "int_value": i} for i in range(50)]
    env = _envelope(spark, payloads)
    env.write.mode("overwrite").json(str(src_dir))

    p = _pipeline(tmp_path)
    stream = (
        spark.readStream.schema("topic string, partition int, offset long, key string, value string")
        .json(str(src_dir))
    )
    q = p.start_stream(stream, trigger_once=True)
    q.awaitTermination(120)
    assert p.read_sink(spark).count() == 50


def test_streaming_restart_does_not_duplicate(spark, tmp_path):
    """Restarting from the same checkpoint replays no committed batch (R14/R15)."""
    src_dir = tmp_path / "src"
    env = _envelope(spark, [{"id": f"id-{i}", "int_value": i} for i in range(10)])
    env.write.mode("overwrite").json(str(src_dir))

    p = _pipeline(tmp_path)
    schema = "topic string, partition int, offset long, key string, value string"
    q = p.start_stream(spark.readStream.schema(schema).json(str(src_dir)), trigger_once=True)
    q.awaitTermination(120)
    n1 = p.read_sink(spark).count()

    # restart with same checkpoint: no new input -> no duplicates
    q2 = p.start_stream(spark.readStream.schema(schema).json(str(src_dir)), trigger_once=True)
    q2.awaitTermination(120)
    assert p.read_sink(spark).count() == n1 == 10


def test_kafka_shaped_envelope(spark, sf_dir):
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").limit(100)
    env = kafka_shaped(ev, topic="events", key_col="event_id", partitions=4)
    assert set(env.columns) == {"topic", "partition", "offset", "key", "value"}
    # offsets are dense per partition starting at 0 (Kafka-like)
    mins = env.groupBy("partition").agg(F.min("offset").alias("m")).collect()
    assert all(r.m == 0 for r in mins)
    assert env.count() == 100


def test_config_validation():
    with pytest.raises(ValueError, match="write.mode"):
        PipelineConfig(sink_path="/tmp/x", write_mode="exactly_once")
    with pytest.raises(ValueError, match="buffer.size"):
        PipelineConfig(sink_path="/tmp/x", buffer_size=0)


def test_crash_between_dlq_and_sink_never_loses_dead_letters(spark, tmp_path, monkeypatch):
    """The DLQ write precedes the sink append BY DESIGN: if the driver
    dies between them, the replayed batch must still deliver the bad rows
    (a sink-first order would short-circuit on ALREADY_EXISTS and skip
    dead-lettering forever — the ADVICE-flagged loss)."""
    from kafka_connect_bigquery_storage_write_spark.sinks.sink_table import ManifestSinkTable

    p = _pipeline(tmp_path)
    df = _envelope(
        spark,
        [{"id": "id-0", "int_value": 1}, {"id": None, "int_value": 2}, {"id": "id-2", "int_value": 3}],
    )
    orig = ManifestSinkTable.write_batch
    calls = {"n": 0}

    def crash_once(self, frame, batch_id):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("simulated crash after DLQ write, before sink append")
        return orig(self, frame, batch_id)

    monkeypatch.setattr(ManifestSinkTable, "write_batch", crash_once)
    with pytest.raises(RuntimeError, match="simulated crash"):
        p.run_batch(df, batch_id=0)
    # the DLQ already holds the bad row — it was written before the crash
    assert p._dlq.read(spark).count() == 1
    # replay: sink commits, DLQ rewrite is idempotent (no duplicates)
    stats = p.run_batch(df, batch_id=0)
    assert not stats.already_exists and stats.written_rows == 2 and stats.dlq_rows == 1
    assert p._dlq.read(spark).count() == 1
    assert p.read_sink(spark).count() == 2


def test_dlq_replay_tombstones_consumed_batches(spark, tmp_path):
    """Two-wave replay must not duplicate: batch 0 dead-letters row A,
    replay 1 fixes and ingests it (tombstoning batch 0); batch 2 then
    dead-letters row B; replay 2 must consume ONLY B — without the
    tombstone it would re-ingest A under a fresh batch id, which sink
    idempotence (keyed on batch id) cannot dedupe."""
    p = _pipeline(tmp_path)

    def fix(df):
        return df.withColumn(
            "value",
            F.when(
                F.get_json_object("value", "$.id").isNull(),
                F.concat(F.lit('{"id": "fixed-'), F.col("offset").cast("string"), F.lit('", "int_value": 0}')),
            ).otherwise(F.col("value")),
        )

    wave1 = _envelope(spark, [{"id": "id-0", "int_value": 1}, {"id": None, "int_value": 2}])
    assert p.run_batch(wave1, 0).dlq_rows == 1
    s1 = p.replay_dlq(spark, batch_id=1, fix=fix)
    assert (s1.input_rows, s1.written_rows, s1.dlq_rows) == (1, 1, 0)
    assert p._dlq.batch_ids() == []  # batch 0 tombstoned
    assert p._dlq.batch_ids(include_replayed=True) == [0]

    wave2 = _envelope(spark, [{"id": "id-3", "int_value": 3}, {"id": None, "int_value": 4}])
    assert p.run_batch(wave2, 2).dlq_rows == 1
    s2 = p.replay_dlq(spark, batch_id=3, fix=fix)
    # only wave 2's dead letter is consumed — NOT batch 0's already-replayed row
    assert (s2.input_rows, s2.written_rows) == (1, 1)
    ids = sorted(r.id for r in p.read_sink(spark).collect())
    assert ids == ["fixed-1", "fixed-1", "id-0", "id-3"] or ids == ["fixed-1", "id-0", "id-3"]


def test_dlq_replay_without_pending_batches_raises(spark, tmp_path):
    p = _pipeline(tmp_path)
    wave = _envelope(spark, [{"id": None, "int_value": 1}])
    p.run_batch(wave, 0)
    p.replay_dlq(spark, batch_id=1, fix=lambda df: df.withColumn("value", F.lit('{"id": "x", "int_value": 1}')))
    with pytest.raises(ValueError, match="no DLQ batches"):
        p.replay_dlq(spark, batch_id=2)


def test_dlq_read_merges_heterogeneous_batch_schemas(spark, tmp_path):
    """Batch dirs are heterogeneous by design (only Avro-path batches
    carry value_raw_b64); a single-footer inferred schema would silently
    drop columns other batches need for replay — read must mergeSchema."""
    from kafka_connect_bigquery_storage_write_spark.sinks.dlq import DeadLetterQueue

    dlq = DeadLetterQueue(str(tmp_path / "dlq"))
    base = _envelope(spark, ['not json']).withColumn("_errors", F.array(F.lit("bad")))
    dlq.write(base, 0)
    dlq.write(base.withColumn("value_raw_b64", F.lit("QUJD")), 1)
    cols = set(dlq.read(spark).columns)
    assert "value_raw_b64" in cols and "value" in cols
