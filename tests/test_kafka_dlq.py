"""Kafka DLQ-topic sink: payload contract, config validation, pipeline wiring.

No broker/jar in this environment (see sinks/kafka_dlq.py docstring), so the
tests pin the exact produced (key, value) payload and the plumbing around it,
mirroring how sources/kafka.py is construction-tested.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.config import PipelineConfig
from kafka_connect_bigquery_storage_write_spark.sinks.kafka_dlq import KafkaDeadLetterTopic


def _bad_rows(spark):
    rows = [
        ("events", 0, 7, "k7", '{"event_id": "oops"}', ["event_id: expected long"]),
        ("events", 1, 9, "k9", "not json at all", ["corrupt record"]),
    ]
    return spark.createDataFrame(
        rows, "topic string, partition int, offset long, key string, value string, _errors array<string>"
    )


def test_payload_carries_full_lineage_and_errors(spark):
    dlq = KafkaDeadLetterTopic("broker:9092", "events.dlq")
    out = dlq.payload(_bad_rows(spark), batch_id=3).collect()
    assert sorted(r.key for r in out) == ["k7", "k9"]
    by_key = {r.key: json.loads(r.value) for r in out}
    assert by_key["k7"]["src_topic"] == "events"
    assert by_key["k7"]["src_partition"] == 0
    assert by_key["k7"]["src_offset"] == 7
    assert by_key["k7"]["src_value"] == '{"event_id": "oops"}'
    assert by_key["k7"]["errors"] == ["event_id: expected long"]
    assert by_key["k7"]["batch_id"] == 3
    assert by_key["k9"]["errors"] == ["corrupt record"]


def test_payload_without_envelope_degrades_gracefully(spark):
    df = spark.createDataFrame([(1, ["required field x is null"])], "row_id long, _errors array<string>")
    out = KafkaDeadLetterTopic("b:9092", "t").payload(df, batch_id=0).collect()
    assert out[0].key is None
    v = json.loads(out[0].value)
    assert v["errors"] == ["required field x is null"]
    assert "src_topic" not in v


def test_payload_is_kafka_sink_shaped(spark):
    out = KafkaDeadLetterTopic("b:9092", "t").payload(_bad_rows(spark), batch_id=1)
    assert out.columns == ["key", "value"]
    assert dict(out.dtypes) == {"key": "string", "value": "string"}


def test_config_requires_topic_and_servers_together():
    with pytest.raises(ValueError, match="together"):
        PipelineConfig(sink_path="/tmp/x", dlq_topic="t")
    with pytest.raises(ValueError, match="together"):
        PipelineConfig(sink_path="/tmp/x", dlq_bootstrap_servers="b:9092")


def test_config_rejects_both_dlq_destinations():
    with pytest.raises(ValueError, match="not both"):
        PipelineConfig(sink_path="/tmp/x", dlq_path="/tmp/d", dlq_topic="t", dlq_bootstrap_servers="b:9092")


def test_pipeline_routes_bad_rows_to_kafka_dlq(spark, tmp_path, monkeypatch):
    """The pipeline selects the topic DLQ when configured, and hands it the
    bad rows with envelope + errors (write intercepted: no broker here)."""
    from pyspark.sql import types as T

    from kafka_connect_bigquery_storage_write_spark.streaming.pipeline import IngestPipeline

    captured = {}

    def fake_write(self, bad_df, batch_id, error_col="_errors"):
        captured["payload"] = self.payload(bad_df, batch_id, error_col).collect()

    monkeypatch.setattr(KafkaDeadLetterTopic, "write", fake_write)

    cfg = PipelineConfig(
        sink_path=str(tmp_path / "sink"), dlq_topic="events.dlq", dlq_bootstrap_servers="broker:9092"
    )
    schema = T.StructType(
        [T.StructField("event_id", T.LongType(), False), T.StructField("v", T.DoubleType(), True)]
    )
    pipe = IngestPipeline(config=cfg, value_schema=schema)
    env = spark.createDataFrame(
        [
            ("t", 0, 0, "a", '{"event_id": 1, "v": 2.0}'),
            ("t", 0, 1, "b", "garbage"),
        ],
        "topic string, partition int, offset long, key string, value string",
    )
    stats = pipe.run_batch(env, batch_id=0)
    assert stats.written_rows == 1 and stats.dlq_rows == 1
    assert len(captured["payload"]) == 1
    v = json.loads(captured["payload"][0].value)
    assert v["src_offset"] == 1 and v["src_value"] == "garbage"
    # good row still landed in the sink
    assert pipe.read_sink(spark).select(F.col("event_id")).collect()[0][0] == 1
