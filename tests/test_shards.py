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
