"""Additive schema evolution on the manifest sink."""

from __future__ import annotations

import pytest

from kafka_connect_bigquery_storage_write_spark.sinks.sink_table import ManifestSinkTable


def _sink(tmp_path, mode="additive"):
    return ManifestSinkTable(str(tmp_path / "t"), schema_evolution=mode)


def test_new_nullable_column_grows_the_table(spark, tmp_path):
    sink = _sink(tmp_path)
    sink.write_batch(spark.createDataFrame([(1, "a")], "id long, name string"), 0)
    sink.write_batch(spark.createDataFrame([(2, "b", 9.5)], "id long, name string, score double"), 1)
    rows = {r.id: r for r in sink.read(spark).collect()}
    assert set(sink.read(spark).columns) == {"id", "name", "score"}
    assert rows[1].score is None  # pre-evolution rows backfill null
    assert rows[2].score == 9.5
    assert sink.schema()["score"].nullable  # forced nullable on add


def test_omitting_a_nullable_column_is_allowed(spark, tmp_path):
    sink = _sink(tmp_path)
    sink.write_batch(spark.createDataFrame([(1, "a", 1.0)], "id long, name string, score double"), 0)
    sink.write_batch(spark.createDataFrame([(2, "b")], "id long, name string"), 1)
    rows = {r.id: r for r in sink.read(spark).collect()}
    assert rows[2].score is None


def test_type_change_rejected(spark, tmp_path):
    sink = _sink(tmp_path)
    sink.write_batch(spark.createDataFrame([(1, "a")], "id long, name string"), 0)
    with pytest.raises(ValueError, match="changed type"):
        sink.write_batch(spark.createDataFrame([("x", "b")], "id string, name string"), 1)


def test_dropping_required_column_rejected(spark, tmp_path):
    from pyspark.sql import types as T

    sink = _sink(tmp_path)
    schema = T.StructType(
        [T.StructField("id", T.LongType(), False), T.StructField("name", T.StringType(), True)]
    )
    sink.write_batch(spark.createDataFrame([(1, "a")], schema), 0)
    with pytest.raises(ValueError, match="required column"):
        sink.write_batch(spark.createDataFrame([("only-name",)], "name string"), 1)


def test_frozen_mode_keeps_first_schema(spark, tmp_path):
    sink = _sink(tmp_path, mode="frozen")
    sink.write_batch(spark.createDataFrame([(1, "a")], "id long, name string"), 0)
    sink.write_batch(spark.createDataFrame([(2, "b", 9.5)], "id long, name string, score double"), 1)
    # the extra column is projected away on read — the reference's model
    assert set(sink.read(spark).columns) == {"id", "name"}


def test_evolution_survives_compaction_and_replay(spark, tmp_path):
    sink = _sink(tmp_path)
    sink.write_batch(spark.createDataFrame([(1, "a")], "id long, name string"), 0)
    sink.write_batch(spark.createDataFrame([(2, "b", 9.5)], "id long, name string, score double"), 1)
    assert sink.compact(spark) is not None
    # replayed pre-evolution batch is absorbed, schema unchanged
    res = sink.write_batch(spark.createDataFrame([(1, "a")], "id long, name string"), 0)
    assert res.already_exists
    rows = {r.id: r for r in sink.read(spark).collect()}
    assert len(rows) == 2 and rows[2].score == 9.5 and rows[1].score is None
    assert set(sink.read(spark).columns) == {"id", "name", "score"}


def test_dup_key_merge_with_new_column_is_recoverable(spark, tmp_path):
    """Pin the dup-gate/evolution ordering (VERDICT r14 #6/#7): since the
    round-14 action fusion the duplicate-key gate rides the key-planning
    aggregate, which runs AFTER additive evolution — so a duplicate-key
    batch that also adds a column raises with the schema already evolved
    but NO data changed. That state must be fully recoverable: readers
    see null-backfilled values for the new column, and a retry with the
    deduplicated batch merges normally."""
    sink = _sink(tmp_path)
    sink.write_batch(spark.createDataFrame([(1, "a"), (2, "b")], "id long, name string"), 0)
    bad = spark.createDataFrame(
        [(1, "x", 1.0), (1, "y", 2.0)], "id long, name string, score double"
    )
    with pytest.raises(ValueError, match="duplicate keys"):
        sink.merge_rows_pruned(spark, bad, keys=["id"])
    # evolved-no-data: the schema grew, every row survives null-backfilled
    rows = {r.id: r for r in sink.read(spark).collect()}
    assert set(sink.read(spark).columns) == {"id", "name", "score"}
    assert len(rows) == 2 and rows[1].name == "a" and rows[1].score is None
    # recovery: the deduplicated retry merges cleanly
    fixed = spark.createDataFrame([(1, "y", 2.0)], "id long, name string, score double")
    assert sink.merge_rows_pruned(spark, fixed, keys=["id"]) is not None
    rows = {r.id: r for r in sink.read(spark).collect()}
    assert rows[1].name == "y" and rows[1].score == 2.0 and rows[2].score is None


def test_rejects_unknown_evolution_mode(tmp_path):
    with pytest.raises(ValueError, match="frozen|additive"):
        ManifestSinkTable(str(tmp_path / "t"), schema_evolution="mutable")


def test_pipeline_redeploy_with_wider_schema(spark, tmp_path):
    """The deployment scenario: pipeline v2 adds a nullable column to its
    sink_schema and keeps writing the same sink table (additive mode);
    v1's batches read the new column as null."""
    import json

    from pyspark.sql import types as T

    from kafka_connect_bigquery_storage_write_spark.config import PipelineConfig
    from kafka_connect_bigquery_storage_write_spark.streaming import IngestPipeline

    def cfg():
        return PipelineConfig(sink_path=str(tmp_path / "sink"), sink_schema_evolution="additive")

    env_schema = "topic string, partition int, offset long, key string, value string"
    v1_schema = T.StructType([T.StructField("id", T.LongType(), False)])
    v2_schema = T.StructType(
        [T.StructField("id", T.LongType(), False), T.StructField("tag", T.StringType(), True)]
    )
    env1 = spark.createDataFrame([("t", 0, 0, "a", json.dumps({"id": 1}))], env_schema)
    env2 = spark.createDataFrame([("t", 0, 1, "b", json.dumps({"id": 2, "tag": "x"}))], env_schema)

    IngestPipeline(config=cfg(), value_schema=v1_schema).run_batch(env1, batch_id=0)
    v2 = IngestPipeline(config=cfg(), value_schema=v2_schema)
    v2.run_batch(env2, batch_id=1)

    rows = {r.id: r for r in v2.read_sink(spark).collect()}
    assert rows[1].tag is None and rows[2].tag == "x"
    assert set(v2.read_sink(spark).columns) == {"id", "tag"}


def test_pipeline_config_validates_evolution_mode_eagerly():
    from kafka_connect_bigquery_storage_write_spark.config import PipelineConfig

    with pytest.raises(ValueError, match="sink_schema_evolution"):
        PipelineConfig(sink_path="/tmp/x", sink_schema_evolution="aditive")
