"""Training-shard export: every file bounded, manifest counts what is
actually on disk, integrity gate catches drift."""

from __future__ import annotations

import json
import os

import pytest

from kafka_connect_bigquery_storage_write_spark.sinks.shards import read_manifest, verify_shards, write_training_shards
from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table


def test_every_shard_bounded_and_counts_exact(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    n = docs.count()
    path = str(tmp_path / "shards")
    manifest = write_training_shards(docs.repartition(4), path, max_records_per_file=60)
    assert manifest["n_rows"] == n
    assert all(s["n_rows"] <= 60 for s in manifest["shards"])
    assert manifest["n_shards"] == len(manifest["shards"]) >= n // 60
    # manifest round-trips and the integrity gate passes
    assert read_manifest(path) == manifest
    assert verify_shards(spark, path)
    # read-back content identical
    assert spark.read.parquet(path).count() == n


def test_sort_within_shards(spark, sf_dir, tmp_path):
    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    path = str(tmp_path / "shards")
    write_training_shards(docs.repartition(4), path, max_records_per_file=1000, sort_within_shards_by=["doc_id"])
    rows = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("f"), "doc_id")
        .groupBy("f")
        .agg(F.expr("collect_list(doc_id)").alias("ids"))
        .collect()
    )
    # parquet preserves write order within a file: each shard is sorted
    for r in rows:
        assert r["ids"] == sorted(r["ids"])


def test_verify_shards_catches_drift(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    path = str(tmp_path / "shards")
    write_training_shards(docs, path, max_records_per_file=100)
    m = read_manifest(path)
    m["n_rows"] += 1
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(m, f)
    with pytest.raises(ValueError, match="shard drift"):
        verify_shards(spark, path)


def test_rejects_nonpositive_cap(spark, sf_dir, tmp_path):
    docs = load_table(spark, sf_dir, "documents")
    with pytest.raises(ValueError):
        write_training_shards(docs, str(tmp_path / "x"), max_records_per_file=0)


# -- incremental shard layout (VERDICT r6 #8): multi-batch fold == one-shot


def _doc_tokens(spark, sf_dir):
    import pyspark.sql.functions as F

    docs = load_table(spark, sf_dir, "documents")
    return docs.select(
        "doc_id", F.size(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("n_tokens")
    )


def test_incremental_layout_equals_one_shot_q140(spark, sf_dir, tmp_path):
    """Folding three append-ordered batches must reproduce EXACTLY the
    one-shot q140 shard summary over the union — boundary shards that
    span batches combine from partials."""
    from kafka_connect_bigquery_storage_write_spark.queries import QUERIES, load_all
    from kafka_connect_bigquery_storage_write_spark.sinks.shards import IncrementalShardLayout

    load_all()
    d = _doc_tokens(spark, sf_dir)
    lay = IncrementalShardLayout(str(tmp_path / "layout"), tokens_per_shard=2_000)
    # batches split on doc_id ranges (append-only id order)
    for i, (lo, hi) in enumerate([(0, 150), (150, 320), (320, 10**9)]):
        lay.process_batch(d.filter(f"doc_id >= {lo} and doc_id < {hi}"), batch_id=i)
    got = [
        (r["shard_id"], r["n_docs"], r["n_tokens"], r["first_id"], r["last_id"])
        for r in lay.read(spark).collect()
    ]
    want = [
        (r["shard_id"], r["n_docs"], r["n_tokens"], r["first_doc"], r["last_doc"])
        for r in QUERIES["q140_token_balanced_shards"](spark, sf_dir).collect()
    ]
    assert got == want


def test_incremental_layout_replay_idempotent_and_order_guard(spark, sf_dir, tmp_path):
    from kafka_connect_bigquery_storage_write_spark.sinks.shards import IncrementalShardLayout

    d = _doc_tokens(spark, sf_dir)
    lay = IncrementalShardLayout(str(tmp_path / "layout"), tokens_per_shard=2_000)
    b0 = d.filter("doc_id < 200")
    lay.process_batch(b0, batch_id=0)
    before = [tuple(r) for r in lay.read(spark).collect()]
    # replayed batch id: absorbed, nothing double-counts
    res = lay.process_batch(b0, batch_id=0)
    assert res.already_exists
    assert [tuple(r) for r in lay.read(spark).collect()] == before
    # out-of-order append is a relayout, not an append: rejected loudly
    with pytest.raises(ValueError, match="append-only"):
        lay.process_batch(d.filter("doc_id < 100"), batch_id=1)
    # compaction of partials changes nothing
    lay.process_batch(d.filter("doc_id >= 200 and doc_id < 400"), batch_id=1)
    full = [tuple(r) for r in lay.read(spark).collect()]
    lay.compact(spark, target_files=1)
    assert [tuple(r) for r in lay.read(spark).collect()] == full


def test_incremental_layout_streaming_mode(spark, sf_dir, tmp_path):
    """start_stream drives the fold via foreachBatch: 3 append-ordered
    source files with maxFilesPerTrigger=1 -> 3 micro-batches -> layout
    equals the one-shot q140 summary (checkpointed batch ids make replay
    idempotence compose with exactly-once)."""
    from kafka_connect_bigquery_storage_write_spark.queries import QUERIES, load_all
    from kafka_connect_bigquery_storage_write_spark.sinks.shards import IncrementalShardLayout

    load_all()
    d = _doc_tokens(spark, sf_dir)
    src = tmp_path / "src"
    # files named so the file source lists them in id order (its listing
    # is lexicographic) — the append-only contract of the layout
    for i, (lo, hi) in enumerate([(0, 150), (150, 320), (320, 10**9)]):
        d.filter(f"doc_id >= {lo} and doc_id < {hi}").coalesce(1).write.parquet(str(src / f"part={i}"))
    lay = IncrementalShardLayout(str(tmp_path / "layout"), tokens_per_shard=2_000)
    stream = (
        spark.readStream.schema("doc_id long, n_tokens int")
        .option("maxFilesPerTrigger", "1")
        .parquet(str(src / "part=*"))
    )
    q = lay.start_stream(stream, checkpoint_path=str(tmp_path / "ckpt"), availableNow=True)
    q.awaitTermination(180)
    got = [
        (r["shard_id"], r["n_docs"], r["n_tokens"], r["first_id"], r["last_id"])
        for r in lay.read(spark).collect()
    ]
    want = [
        (r["shard_id"], r["n_docs"], r["n_tokens"], r["first_doc"], r["last_doc"])
        for r in QUERIES["q140_token_balanced_shards"](spark, sf_dir).collect()
    ]
    assert got == want
