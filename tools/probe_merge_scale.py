"""Probe: pruned MERGE write amplification vs whole-table COW (VERDICT r9 #1).

Builds a key-clustered sink table (N_FILES files, disjoint key ranges —
the post-compaction / ordered-ingest layout), then applies ONE small CDC
batch (updates confined to a single file's range + a few inserts) through

  (a) merge_rows          — whole-table copy-on-write, and
  (b) merge_rows_pruned   — zone-map touched-file COW,

and reports wall time plus how many data files each one rewrote. The
claim under test: (b)'s rewrite cost is O(touched files) while (a)'s is
O(table), so the gap must WIDEN as the table grows.

Usage: python tools/probe_merge_scale.py [n_files] [rows_per_file]
"""

from __future__ import annotations

import sys
import tempfile
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
from kafka_connect_bigquery_storage_write_spark.sinks.sink_table import ManifestSinkTable  # noqa: E402


def build(spark, root, n_files, rows_per):
    sink = ManifestSinkTable(root, write_mode="committed")
    for b in range(n_files):
        df = spark.range(b * rows_per, (b + 1) * rows_per).select(
            F.col("id").alias("k"),
            F.sha2(F.col("id").cast("string"), 256).alias("payload"),
        )
        sink.write_batch(df.coalesce(1), b)
    return sink


def cdc_batch(spark, rows_per, n_files):
    upd = spark.range(10, 10 + 500).select(
        F.col("id").alias("k"), F.lit("UPDATED").alias("payload")
    )
    ins = spark.range(n_files * rows_per, n_files * rows_per + 100).select(
        F.col("id").alias("k"), F.lit("INSERTED").alias("payload")
    )
    return upd.unionByName(ins)


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 32
    rows_per = int(sys.argv[2]) if len(sys.argv) > 2 else 200_000
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "16")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    for label, pruned in (("whole-table merge_rows", False), ("pruned merge_rows_pruned", True)):
        root = tempfile.mkdtemp(prefix=f"probe_merge_{'p' if pruned else 'w'}_")
        sink = build(spark, f"{root}/t", n_files, rows_per)
        updates = cdc_batch(spark, rows_per, n_files).localCheckpoint(eager=True)
        t0 = time.time()
        if pruned:
            res = sink.merge_rows_pruned(spark, updates, keys=["k"], target_files=2)
            assert res is not None
            rewritten, kept = res[1], res[2]
        else:
            assert sink.merge_rows(spark, updates, keys=["k"]) is not None
            rewritten, kept = "all", 0
        dt = time.time() - t0
        n = sink.read(spark).count()
        print(
            f"{label}: {dt:6.2f}s  table={n_files}x{rows_per} rows  "
            f"rewritten_files={rewritten} pointer_copied={kept}  rows_after={n}"
        )


if __name__ == "__main__":
    main()
