"""Avro Object Container File (OCF) source — E1's fifth format.

The reference ingests Avro-encoded records framed for the Schema
Registry (schema/avro.py handles that wire format); data lakes also
store Avro as FILES in the public Object Container format (Avro 1.11
spec, "Object Container Files"):

    4-byte magic 'Obj\\x01'
    file metadata: an Avro map<bytes> — avro.schema (JSON), avro.codec
    16-byte sync marker
    repeated blocks: varint record count, varint compressed byte size,
        block bytes (codec null = raw, deflate = RFC 1951 raw deflate),
        16-byte sync marker

This module implements that container from the spec over the SAME
pure-Python record codec the pipeline already uses (schema/avro.py
_decode/_encode — the reference's type lattice), plus the Spark
plumbing: a distributed writer (one .avro file per task, the write-
then-commit pattern Spark's own writers use) and a distributed reader
(binaryFile scan -> mapInPandas block decode). Spark's own spark-avro
jar is absent in this environment; on a cluster that ships it the
one-line swap is ``spark.read.format("avro")`` and everything
downstream is unchanged — the same swap note as schema/avro.py.

Scale shape: each file decodes independently inside one Arrow-batched
task (binaryFile gives (path, content) rows); block-level deflate keeps
IO compressed; no shuffle is introduced by the source itself. The
Python decode is the jar-less trade documented at module top.
"""

from __future__ import annotations

import io
import json
import uuid
import zlib

from pyspark.sql import DataFrame, SparkSession

from kafka_connect_bigquery_storage_write_spark.schema.avro import (
    _decode,
    _encode,
    _read_varint,
    _write_varint,
    avro_schema_to_spark,
    parse_schema,
)

_MAGIC = b"Obj\x01"
# deterministic marker (any 16 bytes are legal per spec; fixed bytes make
# written fixtures reproducible for the value-hash oracle)
_SYNC = bytes(range(16))


def write_ocf_bytes(records: list[dict], schema, codec: str = "deflate", block_records: int = 1000) -> bytes:
    """Serialize records to one OCF byte string (spec-exact)."""
    schema = parse_schema(schema)
    if codec not in ("null", "deflate"):
        raise ValueError(f"codec must be null|deflate, got {codec!r}")
    out = bytearray()
    out += _MAGIC
    meta = {"avro.schema": json.dumps(schema).encode(), "avro.codec": codec.encode()}
    # file metadata is an Avro map<bytes>: one block of len(meta) pairs, then 0
    _write_varint(out, len(meta))
    for k, v in meta.items():
        kb = k.encode()
        _write_varint(out, len(kb))
        out += kb
        _write_varint(out, len(v))
        out += v
    _write_varint(out, 0)
    out += _SYNC
    for start in range(0, len(records), block_records):
        chunk = records[start : start + block_records]
        body = bytearray()
        for r in chunk:
            _encode(body, r, schema)
        blob = bytes(body)
        if codec == "deflate":
            # spec: raw RFC 1951 stream (no zlib header/checksum)
            co = zlib.compressobj(wbits=-15)
            blob = co.compress(blob) + co.flush()
        out_block = bytearray()
        _write_varint(out_block, len(chunk))
        _write_varint(out_block, len(blob))
        out += bytes(out_block) + blob + _SYNC
    return bytes(out)


def read_ocf_bytes(data: bytes) -> tuple[dict | str | list, list]:
    """Parse one OCF byte string -> (embedded schema, records)."""
    buf = io.BytesIO(data)
    if buf.read(4) != _MAGIC:
        raise ValueError("not an Avro object container file")
    meta: dict[str, bytes] = {}
    while True:
        n = _read_varint(buf)
        if n == 0:
            break
        if n < 0:  # negative count form: abs(count) then byte size (skipped)
            n = -n
            _read_varint(buf)
        for _ in range(n):
            klen = _read_varint(buf)
            k = buf.read(klen).decode()
            vlen = _read_varint(buf)
            meta[k] = buf.read(vlen)
    schema = parse_schema(json.loads(meta["avro.schema"].decode()))
    codec = meta.get("avro.codec", b"null").decode()
    if codec not in ("null", "deflate"):
        raise ValueError(f"unsupported OCF codec {codec!r}")
    sync = buf.read(16)
    records: list = []
    while True:
        head = buf.read(1)
        if not head:
            break
        buf.seek(-1, io.SEEK_CUR)
        count = _read_varint(buf)
        size = _read_varint(buf)
        blob = buf.read(size)
        if codec == "deflate":
            blob = zlib.decompress(blob, wbits=-15)
        bbuf = io.BytesIO(blob)
        for _ in range(count):
            records.append(_decode(bbuf, schema))
        if buf.read(16) != sync:
            raise ValueError("OCF sync marker mismatch (corrupt block boundary)")
    return schema, records


def write_avro_container(df: DataFrame, path: str, avro_schema, codec: str = "deflate") -> None:
    """Distributed OCF write: each task serializes its partition into one
    ``part-<partitionId>.avro`` file under ``path`` (the task-writes/
    driver-never-collects pattern; assumes a shared filesystem like every
    Spark writer does). Column order and names must match the record
    schema.

    Task-commit protocol: the file name is DETERMINISTIC per partition
    and published by atomic rename-over — a retried or speculative task
    attempt re-derives the same partition contents and renames onto the
    same final name, so at most one file per partition ever exists and
    ``read_avro_container`` never double-counts after a task retry. The
    per-attempt staging name carries a uuid so two live attempts never
    interleave writes within one temp file.
    """
    import os

    schema = parse_schema(avro_schema)
    fields = [f["name"] for f in schema["fields"]]
    os.makedirs(path, exist_ok=True)

    def write_part(batches):
        import pandas as pd
        from pyspark import TaskContext

        rows: list[dict] = []
        for pdf in batches:
            rows.extend(pdf[fields].to_dict("records"))
        if rows:
            pid = TaskContext.get().partitionId()
            blob = write_ocf_bytes(rows, schema, codec=codec)
            fname = os.path.join(path, f"part-{pid:05d}.avro")
            tmp = f"{fname}.{uuid.uuid4().hex}.tmp"
            with open(tmp, "wb") as f:
                f.write(blob)
            os.replace(tmp, fname)
        yield pd.DataFrame({"n": [len(rows)]})

    df.mapInPandas(write_part, "n long").write.format("noop").mode("overwrite").save()


def read_avro_container(spark: SparkSession, path: str, avro_schema) -> DataFrame:
    """Distributed OCF read: binaryFile scan -> per-file block decode in
    Arrow-batched kernels. ``avro_schema`` declares the expected record
    schema (schema-on-read is explicit, the q124/q125 rule); each file's
    EMBEDDED schema must be field-compatible — the decode itself uses
    the embedded writer schema per the Avro resolution model's trivial
    case (identical schemas), and a mismatch fails loudly.
    """
    schema = parse_schema(avro_schema)
    fields = [f["name"] for f in schema["fields"]]
    out_type = avro_schema_to_spark(schema)

    def decode_files(batches):
        import pandas as pd

        for pdf in batches:
            frames = []
            for blob in pdf["content"]:
                emb_schema, records = read_ocf_bytes(bytes(blob))
                emb_fields = [f["name"] for f in emb_schema["fields"]]
                if emb_fields != fields:
                    raise ValueError(f"OCF schema mismatch: file has {emb_fields}, expected {fields}")
                frames.append(pd.DataFrame(records, columns=fields))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    files = spark.read.format("binaryFile").load(f"{path}/*.avro").select("content")
    spark_fields = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in out_type.fields)
    return files.mapInPandas(decode_files, schema=spark_fields)
