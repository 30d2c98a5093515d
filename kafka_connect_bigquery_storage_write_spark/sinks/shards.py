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


class IncrementalShardLayout:
    """Streaming-maintained token-balanced shard layout (VERDICT r6 #8 —
    the incremental form of q140): each micro-batch of (id, tokens) rows
    extends the global prefix-sum layout from a carried running total, so
    the export layout is maintained AS DATA ARRIVES instead of recomputed
    from scratch.

    Invariant (pytest-pinned): folding batches B1..Bn yields exactly the
    shard summary the one-shot q140 layout produces over B1 ∪ .. ∪ Bn.
    It holds because shard_id is a pure function of the global prefix sum
    and the ONLY cross-batch state it needs is a single scalar — the
    token total of all prior batches — which is derived from committed
    sink state on every fold (never cached on the driver), so crash/
    replay cannot desynchronize it: a replayed batch id is absorbed by
    the manifest sink's idempotent protocol before it could double-count.

    Contract: batches must be append-only in id order (every id in batch
    N greater than all ids in batches < N — the natural shape of an
    ingest sequence). Out-of-order batches are rejected loudly: a
    retroactive insert would renumber every later shard, which is a
    relayout, not an append.

    Scale shape: the per-batch fold is ranked_prefix_sum (distributed
    range partition + offset broadcast, q112/q140 machinery) plus one
    shard-grain aggregate; the sink stores shard-grain PARTIALS (sum/
    sum/min/max — decomposable, so boundary shards that span batches
    combine on read, same algebra as IncrementalRollup); the carried
    scalar is an aggregate over shard-grain rows, bounded by total
    shards, not documents.
    """

    def __init__(self, sink_path: str, tokens_per_shard: int = 2_000,
                 id_col: str = "doc_id", tokens_col: str = "n_tokens"):
        from kafka_connect_bigquery_storage_write_spark.sinks.sink_table import ManifestSinkTable

        if tokens_per_shard <= 0:
            raise ValueError("tokens_per_shard must be positive")
        self.tokens_per_shard = tokens_per_shard
        self.id_col = id_col
        self.tokens_col = tokens_col
        self._sink = ManifestSinkTable(sink_path, write_mode="committed")

    def _committed_state(self, spark: SparkSession) -> tuple[int, int | None]:
        """(carried token total, max id) over committed batches."""
        if not self._sink.committed_ids():
            return 0, None
        row = self._sink.read(spark).agg(
            F.sum("n_tokens").alias("t"), F.max("last_id").alias("m")
        ).collect()[0]
        return int(row["t"] or 0), (int(row["m"]) if row["m"] is not None else None)

    def process_batch(self, df: DataFrame, batch_id: int):
        """Fold one micro-batch of (id_col, tokens_col) rows into the
        layout. Idempotent per batch_id (replay == no-op)."""
        from kafka_connect_bigquery_storage_write_spark.operators.partitioning import ranked_prefix_sum

        spark = df.sparkSession
        if self._sink._is_known(batch_id):
            # replayed micro-batch: absorbed BEFORE the order guard — its
            # own ids are of course <= the committed max, that's not an
            # ordering violation, it's the idempotent-replay contract
            from kafka_connect_bigquery_storage_write_spark.sinks.sink_table import AppendResult

            return AppendResult(batch_id=batch_id, rows=0, already_exists=True)
        base, max_id = self._committed_state(spark)
        d = df.select(F.col(self.id_col).alias("_id"), F.col(self.tokens_col).cast("long").alias("_tok"))
        if max_id is not None:
            lo = d.agg(F.min("_id")).collect()[0][0]
            if lo is not None and lo <= max_id:
                raise ValueError(
                    f"batch {batch_id} id {lo} <= committed max {max_id}: "
                    "shard layout is append-only in id order"
                )
        c = ranked_prefix_sum(d, [F.col("_id")], value="_tok", cum_col="cum")
        partial = (
            c.withColumn(
                "shard_id", F.expr(f"greatest(cum + {base}L - 1, 0L) div {self.tokens_per_shard}")
            )
            .groupBy("shard_id")
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.sum("_tok").alias("n_tokens"),
                F.min("_id").alias("first_id"),
                F.max("_id").alias("last_id"),
            )
        )
        return self._sink.write_batch(partial, batch_id)

    def read(self, spark: SparkSession) -> DataFrame:
        """Shard-grain summary == the one-shot layout over everything
        folded so far (boundary shards combine across batch partials)."""
        return (
            self._sink.read(spark)
            .groupBy("shard_id")
            .agg(
                F.sum("n_docs").alias("n_docs"),
                F.sum("n_tokens").alias("n_tokens"),
                F.min("first_id").alias("first_id"),
                F.max("last_id").alias("last_id"),
            )
            .orderBy("shard_id")
        )

    def compact(self, spark: SparkSession, target_files: int = 4):
        """Merge partial files (read cost bound), exactly IncrementalRollup's."""
        return self._sink.compact(spark, target_files=target_files)

    def start_stream(self, stream_df: DataFrame, checkpoint_path: str, **trigger_kwargs):
        """Drive the fold from Structured Streaming (foreachBatch), the
        same wiring as IncrementalRollup.start_stream — micro-batch ids
        come from the checkpoint, so replay idempotence composes with
        exactly-once for free. The stream must deliver append-ordered
        ids (see the class contract)."""
        writer = (
            stream_df.writeStream.foreachBatch(lambda d, i: self.process_batch(d, i))
            .option("checkpointLocation", checkpoint_path)
            .queryName("kafka_connect_bigquery_storage_write_spark-shard-layout")
        )
        if trigger_kwargs:
            writer = writer.trigger(**trigger_kwargs)
        return writer.start()
