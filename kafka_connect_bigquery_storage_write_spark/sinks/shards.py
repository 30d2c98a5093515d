"""Training-shard export: bounded-size files plus a queryable manifest.

A training job consumes a dataset as a list of shard files with known
row counts — the loader schedules workers by shard, resumes by shard,
and verifies by shard. This writer produces that contract from any
DataFrame:

- ``maxRecordsPerFile`` bounds every parquet file (Spark splits task
  output at the cap, so the bound holds regardless of partitioning);
- the manifest is derived by READING BACK the written files and
  counting per file — it records what is actually on disk, not what
  the writer intended, so a truncated or lost file is caught at export
  time rather than mid-training.
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def write_training_shards(
    df: DataFrame,
    path: str,
    max_records_per_file: int = 10_000,
    sort_within_shards_by: list[str] | None = None,
) -> dict:
    """Write ``df`` as parquet shards of at most ``max_records_per_file``
    rows each, then read the directory back and write ``_manifest.json``
    with per-file row counts. Returns the manifest dict.

    ``sort_within_shards_by`` optionally sorts rows within each task's
    output (``sortWithinPartitions``) so shard contents are locally
    ordered (e.g. by doc_id) without paying a global sort.
    """
    if max_records_per_file <= 0:
        raise ValueError("max_records_per_file must be positive")
    out = df
    if sort_within_shards_by:
        out = out.sortWithinPartitions(*sort_within_shards_by)
    (
        out.write.mode("overwrite")
        .option("maxRecordsPerFile", str(max_records_per_file))
        .parquet(path)
    )
    spark = df.sparkSession
    per_file = (
        spark.read.parquet(path)
        .select(F.input_file_name().alias("file"))
        .groupBy("file")
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .collect()
    )
    shards = sorted(
        ({"file": os.path.basename(r["file"]), "n_rows": int(r["n_rows"])} for r in per_file),
        key=lambda s: s["file"],
    )
    manifest = {
        "n_shards": len(shards),
        "n_rows": int(sum(s["n_rows"] for s in shards)),
        "max_records_per_file": max_records_per_file,
        "shards": shards,
    }
    with open(os.path.join(path, "_manifest.json"), "w") as f:
        json.dump(manifest, f, indent=1)
    return manifest


def read_manifest(path: str) -> dict:
    with open(os.path.join(path, "_manifest.json")) as f:
        return json.load(f)


def verify_shards(spark: SparkSession, path: str) -> bool:
    """Re-count the directory against its manifest (the pre-training
    integrity gate). Raises on any drift; True when intact."""
    manifest = read_manifest(path)
    actual = spark.read.parquet(path).count()
    if actual != manifest["n_rows"]:
        raise ValueError(f"shard drift: manifest says {manifest['n_rows']} rows, directory has {actual}")
    return True
