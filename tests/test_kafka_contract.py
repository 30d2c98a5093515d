"""Kafka reader option contract (VERDICT r5 #5): the exact option set
kafka_stream hands the datasource, pinned against reference semantics
(BigqueryStorageWriteSinkTask.java:98-116;
BigqueryStreamWriteSinkConfig.java:36-41) without needing a broker.
tools/probe_kafka.py drives the same dict end-to-end when one exists."""

from __future__ import annotations

import pytest

from kafka_connect_bigquery_storage_write_spark.sources.kafka import ENVELOPE_COLS, envelope_projection, kafka_reader_options


def test_default_option_contract():
    opts = kafka_reader_options("broker:9092", "events_topic")
    assert opts == {
        "kafka.bootstrap.servers": "broker:9092",
        "subscribe": "events_topic",
        "startingOffsets": "latest",
        # offset gaps are an error (reference OUT_OF_RANGE -> rewind,
        # BigqueryStreamWriter.java:162-165), never a silent skip
        "failOnDataLoss": "true",
    }


def test_buffer_size_analogue_and_scale_knobs():
    opts = kafka_reader_options(
        "b:9092", "t1,t2", starting_offsets="earliest", max_offsets_per_trigger=1000, min_partitions=64
    )
    assert opts["subscribe"] == "t1,t2"  # multi-topic like the connector's topic list
    assert opts["startingOffsets"] == "earliest"
    assert opts["maxOffsetsPerTrigger"] == "1000"  # buffer.size=1000 analogue
    assert opts["minPartitions"] == "64"
    # optional knobs never leak into the option set when unset
    assert set(kafka_reader_options("b:9092", "t")) == {
        "kafka.bootstrap.servers",
        "subscribe",
        "startingOffsets",
        "failOnDataLoss",
    }


def test_opt_out_of_fail_on_data_loss_is_explicit():
    assert kafka_reader_options("b:9092", "t", fail_on_data_loss=False)["failOnDataLoss"] == "false"


@pytest.mark.parametrize("bad", [0, -1])
def test_trigger_cap_validated_positive(bad):
    # mirrors the reference's buffer.size>0 validation (R19)
    with pytest.raises(ValueError):
        kafka_reader_options("b:9092", "t", max_offsets_per_trigger=bad)
    with pytest.raises(ValueError):
        kafka_reader_options("b:9092", "t", min_partitions=bad)


def test_envelope_projection_matches_sinkrecord_fields(spark):
    """The projection keeps exactly the SinkRecord lineage fields the
    reference consumes (topic/kafkaPartition/kafkaOffset/key/value —
    BigqueryStorageWriteSinkTask.java:102, BigqueryStreamWriter.java:240)
    and casts payloads to string."""
    raw = spark.createDataFrame(
        [("t", 0, 7, b"k", b'{"a":1}', "ignored")],
        "topic string, partition int, offset long, key binary, value binary, extra string",
    )
    out = envelope_projection(raw)
    assert tuple(out.columns) == ENVELOPE_COLS
    row = out.collect()[0]
    assert (row["topic"], row["partition"], row["offset"], row["key"], row["value"]) == ("t", 0, 7, "k", '{"a":1}')
