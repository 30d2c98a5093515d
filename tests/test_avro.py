"""Avro envelope path: pure-Python binary codec + Spark integration.

Mirrors the reference's schema-driven record path
(RecordConverter.java:21-22) in its real-world Schema-Registry form.
Codec roundtrips are property-tested; the Spark path is driven end to
end (encode -> decode -> parse -> validate -> sink) including the
corrupt-payload salvage that the reference implements via row errors.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from kafka_connect_bigquery_storage_write_spark.schema.avro import (
    AvroDecodeError,
    AvroSchemaError,
    avro_schema_to_spark,
    confluent_frame,
    confluent_unframe,
    decode,
    encode,
    parse_schema,
)

EVENT_AVRO = json.dumps(
    {
        "type": "record",
        "name": "Event",
        "fields": [
            {"name": "event_id", "type": "long"},
            {"name": "ts", "type": ["null", "string"], "default": None},
            {"name": "user_id", "type": "long"},
            {"name": "event_type", "type": "string"},
            {"name": "value", "type": ["null", "double"], "default": None},
            {"name": "props", "type": ["null", "string"], "default": None},
        ],
    }
)


# -- codec ------------------------------------------------------------------
@pytest.mark.parametrize(
    "schema,value",
    [
        ("long", 0),
        ("long", -1),
        ("long", 2**62),
        ("long", -(2**63)),
        ("int", 12345),
        ("boolean", True),
        ("boolean", False),
        ("double", 3.141592653589793),
        ("string", "héllo wörld ☃"),
        (["null", "long"], None),
        (["null", "long"], 42),
        ({"type": "array", "items": "long"}, []),
        ({"type": "array", "items": "long"}, [1, -2, 3]),
        ({"type": "map", "values": "long"}, {}),
        ({"type": "map", "values": "long"}, {"a": 1, "b": -2}),
    ],
)
def test_scalar_roundtrip(schema, value):
    s = parse_schema(schema)
    assert decode(encode(value, s), s) == value


def test_float_roundtrip_single_precision():
    s = parse_schema("float")
    assert decode(encode(0.5, s), s) == 0.5  # exactly representable


def test_record_roundtrip_nested():
    schema = parse_schema(
        {
            "type": "record",
            "name": "Outer",
            "fields": [
                {"name": "id", "type": "long"},
                {
                    "name": "inner",
                    "type": {
                        "type": "record",
                        "name": "Inner",
                        "fields": [
                            {"name": "tags", "type": {"type": "array", "items": "string"}},
                            {"name": "attrs", "type": {"type": "map", "values": "long"}},
                        ],
                    },
                },
            ],
        }
    )
    v = {"id": 7, "inner": {"tags": ["a", "b"], "attrs": {"x": 1}}}
    assert decode(encode(v, schema), schema) == v


@settings(max_examples=200, deadline=None)
@given(
    st.fixed_dictionaries(
        {
            "event_id": st.integers(min_value=-(2**63), max_value=2**63 - 1),
            "ts": st.none() | st.text(max_size=40),
            "user_id": st.integers(min_value=-(2**63), max_value=2**63 - 1),
            "event_type": st.text(max_size=20),
            "value": st.none() | st.floats(allow_nan=False, allow_infinity=False),
            "props": st.none() | st.text(max_size=60),
        }
    )
)
def test_event_record_roundtrip_property(rec):
    s = parse_schema(EVENT_AVRO)
    assert decode(encode(rec, s), s) == rec


def test_rejected_types_mirror_reference_lattice():
    # RecordConverter.java:79-82 — BYTES unsupported, unknown types rejected
    with pytest.raises(AvroSchemaError, match="unsupported"):
        parse_schema({"type": "record", "name": "R", "fields": [{"name": "b", "type": "bytes"}]})
    with pytest.raises(AvroSchemaError):
        parse_schema({"type": "enum", "name": "E", "symbols": ["A"]})
    with pytest.raises(AvroSchemaError, match="Unknown data type"):
        parse_schema("decimal")


def test_decode_errors():
    s = parse_schema("string")
    with pytest.raises(AvroDecodeError, match="truncated"):
        decode(encode("hello", s)[:-2], s)
    with pytest.raises(AvroDecodeError, match="trailing"):
        decode(encode("hello", s) + b"x", s)
    with pytest.raises(AvroDecodeError, match="union index"):
        decode(b"\x08", parse_schema(["null", "long"]))


def test_confluent_framing():
    sid, payload = confluent_unframe(confluent_frame(b"abc", schema_id=77))
    assert (sid, payload) == (77, b"abc")
    with pytest.raises(AvroDecodeError, match="magic"):
        confluent_unframe(b"\x01\x00\x00\x00\x01abc")


def test_avro_schema_to_spark_mapping():
    from pyspark.sql import types as T

    spark_t = avro_schema_to_spark(EVENT_AVRO)
    assert isinstance(spark_t, T.StructType)
    by_name = {f.name: f for f in spark_t.fields}
    assert by_name["event_id"].dataType == T.LongType() and not by_name["event_id"].nullable
    assert by_name["value"].dataType == T.DoubleType() and by_name["value"].nullable
    assert by_name["props"].dataType == T.StringType() and by_name["props"].nullable


# -- Spark path -------------------------------------------------------------
def test_spark_encode_decode_roundtrip(spark):
    from pyspark.sql import functions as F

    from kafka_connect_bigquery_storage_write_spark.schema.avro import avro_decode_to_json, avro_encode_from_json

    src = spark.createDataFrame(
        [(1, "click", 1.5), (2, "view", None), (3, "buy", -0.25)],
        "event_id long, event_type string, value double",
    )
    env = src.select(
        F.col("event_id").alias("k"),
        F.to_json(F.struct(F.col("event_id"), F.lit(None).cast("string").alias("ts"), F.lit(9).cast("long").alias("user_id"), "event_type", "value", F.lit(None).cast("string").alias("props"))).alias("value"),
    )
    binary = avro_encode_from_json(env, "value", EVENT_AVRO)
    assert dict(binary.dtypes)["value"] == "binary"
    back = avro_decode_to_json(binary, "value", EVENT_AVRO)
    rows = {r.k: json.loads(r.value) for r in back.collect()}
    assert rows[1]["event_type"] == "click" and rows[1]["value"] == 1.5
    assert rows[2]["value"] is None
    assert rows[3]["value"] == -0.25


def test_avro_pipeline_end_to_end_with_salvage(spark, tmp_path):
    """Avro envelope -> IngestPipeline: good rows land in the sink, a
    corrupt binary payload dead-letters with lineage (R10-R12 over Avro)."""
    from pyspark.sql import functions as F

    from kafka_connect_bigquery_storage_write_spark.config import PipelineConfig
    from kafka_connect_bigquery_storage_write_spark.schema.avro import avro_encode_from_json
    from kafka_connect_bigquery_storage_write_spark.streaming.pipeline import IngestPipeline

    src = spark.createDataFrame(
        [(1, "click", 1.5), (2, "view", 2.0), (3, "buy", 3.0)],
        "event_id long, event_type string, value double",
    )
    env = src.select(
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("event_id").cast("string").alias("key"),
        F.to_json(F.struct("event_id", F.lit(None).cast("string").alias("ts"), F.lit(9).cast("long").alias("user_id"), "event_type", "value", F.lit(None).cast("string").alias("props"))).alias("value"),
    )
    binary = avro_encode_from_json(env, "value", EVENT_AVRO)
    # poison one payload: not Confluent-framed, not valid Avro
    poisoned = binary.withColumn(
        "value", F.when(F.col("offset") == 2, F.lit(b"\x07garbage")).otherwise(F.col("value"))
    )
    cfg = PipelineConfig(
        sink_path=str(tmp_path / "sink"),
        dlq_path=str(tmp_path / "dlq"),
        value_format="avro",
    )
    pipe = IngestPipeline.for_avro(cfg, EVENT_AVRO)
    stats = pipe.run_batch(poisoned, batch_id=0)
    assert (stats.input_rows, stats.written_rows, stats.dlq_rows) == (3, 2, 1)
    sunk = {r.event_id for r in pipe.read_sink(spark).collect()}
    assert sunk == {1, 3}
    dlq = pipe._dlq.read(spark).collect()
    assert len(dlq) == 1 and dlq[0].offset == 2
    # replay contract: the DLQ row retains the ORIGINAL framed bytes
    # (post-decode `value` is only the error marker for undecodable rows)
    import base64

    assert dlq[0].value.startswith("!AVRO_DECODE_ERROR")
    assert base64.b64decode(dlq[0].value_raw_b64) == b"\x07garbage"


def test_avro_config_validation(tmp_path):
    from kafka_connect_bigquery_storage_write_spark.config import PipelineConfig
    from kafka_connect_bigquery_storage_write_spark.streaming.pipeline import IngestPipeline
    from pyspark.sql import types as T

    with pytest.raises(ValueError, match="value.format"):
        PipelineConfig(sink_path=str(tmp_path / "s"), value_format="protobuf")
    cfg = PipelineConfig(sink_path=str(tmp_path / "s"), value_format="avro")
    with pytest.raises(ValueError, match="avro_schema_json"):
        IngestPipeline(config=cfg, value_schema=T.StructType([]))


def test_dlq_replay_reingests_fixed_avro_rows(spark, tmp_path):
    """The replay consumer contract end to end: the dead-lettered row's
    restored original bytes are repaired and re-ingested through the
    SAME pipeline path, landing in the sink under a new batch id."""
    from pyspark.sql import functions as F

    from kafka_connect_bigquery_storage_write_spark.config import PipelineConfig
    from kafka_connect_bigquery_storage_write_spark.schema.avro import avro_encode_from_json
    from kafka_connect_bigquery_storage_write_spark.streaming.pipeline import IngestPipeline

    src = spark.createDataFrame(
        [(1, "click", 1.5), (2, "view", 2.0), (3, "buy", 3.0)],
        "event_id long, event_type string, value double",
    )
    env = src.select(
        F.lit("events").alias("topic"),
        F.lit(0).alias("partition"),
        F.col("event_id").alias("offset"),
        F.col("event_id").cast("string").alias("key"),
        F.to_json(F.struct("event_id", F.lit(None).cast("string").alias("ts"), F.lit(9).cast("long").alias("user_id"), "event_type", "value", F.lit(None).cast("string").alias("props"))).alias("value"),
    )
    binary = avro_encode_from_json(env, "value", EVENT_AVRO)
    good_payloads = {r.offset: r.value for r in binary.collect()}
    poisoned = binary.withColumn(
        "value", F.when(F.col("offset") == 2, F.lit(b"\x07garbage")).otherwise(F.col("value"))
    )
    cfg = PipelineConfig(sink_path=str(tmp_path / "sink"), dlq_path=str(tmp_path / "dlq"), value_format="avro")
    pipe = IngestPipeline.for_avro(cfg, EVENT_AVRO)
    assert pipe.run_batch(poisoned, batch_id=0).dlq_rows == 1
    assert {r.event_id for r in pipe.read_sink(spark).collect()} == {1, 3}

    # repair: swap the broken payload for the correct original encoding
    fixed_bytes = good_payloads[2]

    def fix(df):
        return df.withColumn(
            "value", F.when(F.col("offset") == 2, F.lit(fixed_bytes)).otherwise(F.col("value"))
        )

    stats = pipe.replay_dlq(spark, batch_id=1, fix=fix)
    assert (stats.input_rows, stats.written_rows, stats.dlq_rows) == (1, 1, 0)
    assert {r.event_id for r in pipe.read_sink(spark).collect()} == {1, 2, 3}


# -- Object Container Files (round 7) -------------------------------------


class TestObjectContainerFile:
    SCHEMA = {
        "type": "record",
        "name": "Row",
        "fields": [
            {"name": "id", "type": "long"},
            {"name": "name", "type": "string"},
            {"name": "score", "type": "double"},
        ],
    }
    ROWS = [{"id": i, "name": f"n{i}", "score": i * 0.5} for i in range(2500)]

    def test_roundtrip_both_codecs_and_blocking(self):
        from kafka_connect_bigquery_storage_write_spark.sources.avro_container import read_ocf_bytes, write_ocf_bytes

        for codec in ("null", "deflate"):
            blob = write_ocf_bytes(self.ROWS, self.SCHEMA, codec=codec, block_records=1000)
            schema, back = read_ocf_bytes(blob)
            assert back == self.ROWS  # 3 blocks (1000/1000/500) reassemble
            assert [f["name"] for f in schema["fields"]] == ["id", "name", "score"]
        # deflate actually compresses the repetitive payload
        from kafka_connect_bigquery_storage_write_spark.sources.avro_container import write_ocf_bytes as w

        assert len(w(self.ROWS, self.SCHEMA, codec="deflate")) < len(w(self.ROWS, self.SCHEMA, codec="null"))

    def test_corrupt_sync_marker_fails_loudly(self):
        import pytest as _pytest

        from kafka_connect_bigquery_storage_write_spark.sources.avro_container import read_ocf_bytes, write_ocf_bytes

        blob = bytearray(write_ocf_bytes(self.ROWS[:10], self.SCHEMA, codec="null"))
        blob[-1] ^= 0xFF  # flip a byte of the final sync marker
        with _pytest.raises(ValueError, match="sync marker"):
            read_ocf_bytes(bytes(blob))

    def test_spark_write_read_distributed(self, spark, tmp_path):
        from kafka_connect_bigquery_storage_write_spark.sources.avro_container import read_avro_container, write_avro_container

        df = spark.range(1000).selectExpr(
            "id", "concat('n', id) as name", "id * 0.5 as score"
        ).repartition(4)
        path = str(tmp_path / "ocf")
        write_avro_container(df, path, self.SCHEMA, codec="deflate")
        import os

        files = [f for f in os.listdir(path) if f.endswith(".avro")]
        assert len(files) == 4  # one container per task
        back = read_avro_container(spark, path, self.SCHEMA)
        assert back.count() == 1000
        got = sorted((r["id"], r["name"], r["score"]) for r in back.collect())
        assert got == [(i, f"n{i}", i * 0.5) for i in range(1000)]
        # task-commit protocol: names are deterministic per partition and
        # a re-executed write (the task-retry/speculation shape) renames
        # over the same files — no duplicate parts, no double-counted rows
        assert sorted(files) == [f"part-{i:05d}.avro" for i in range(4)]
        write_avro_container(df, path, self.SCHEMA, codec="deflate")
        files2 = [f for f in os.listdir(path) if f.endswith(".avro")]
        assert sorted(files2) == sorted(files)
        assert read_avro_container(spark, path, self.SCHEMA).count() == 1000

    def test_schema_mismatch_rejected(self, spark, tmp_path):
        import pytest as _pytest

        from kafka_connect_bigquery_storage_write_spark.sources.avro_container import read_avro_container, write_avro_container

        df = spark.range(10).selectExpr("id", "concat('n', id) as name", "id * 0.5 as score")
        path = str(tmp_path / "ocf")
        write_avro_container(df, path, self.SCHEMA)
        other = {"type": "record", "name": "Row", "fields": [{"name": "wrong", "type": "long"}]}
        with _pytest.raises(Exception, match="mismatch"):
            read_avro_container(spark, path, other).collect()
