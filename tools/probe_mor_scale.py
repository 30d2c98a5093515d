"""Probe: merge-on-read vs copy-on-write under HIGH-FREQUENCY scattered CDC
(VERDICT r10 #2).

``merge_rows_pruned`` (COW) is O(touched files) per batch — ideal when a
batch's keys cluster into few files. The adversarial CDC shape is the
opposite: many SMALL batches whose keys are scattered uniformly across
the keyspace, so EVERY file straddles some update key and pruning
degenerates to a near-whole-table rewrite per batch. ``upsert_mor``
writes one appended file + one tombstone set per batch regardless of
scatter, deferring all rewriting to one final compaction.

This probe builds a key-clustered table (N_FILES files, disjoint
ranges), then applies K batches of U scattered updates each through

  (a) merge_rows_pruned per batch (COW), and
  (b) upsert_mor per batch + ONE compact() at the end (MOR),

and reports per-path wall time, total data files written and read
amplification left behind (visible DV rows for MOR before compaction).
The claim under test: COW's cost is K * O(files-straddled) while MOR's
is K * O(batch) + one O(table) compaction, so the gap must WIDEN with K.

Usage: python tools/probe_mor_scale.py [n_files] [rows_per_file] [k_batches] [updates_per_batch]
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


def scattered_batch(spark, i, n_files, rows_per, n_upd):
    """n_upd updates spread uniformly over the whole keyspace (stride
    walk, offset by batch) — every file straddles some key."""
    total = n_files * rows_per
    stride = max(1, total // n_upd)
    return spark.range(0, n_upd).select(
        ((F.col("id") * stride + i * 7) % total).alias("k"),
        F.lit(f"UPDATED-{i}").alias("payload"),
    ).dropDuplicates(["k"])


def data_files(sink):
    import os

    n = 0
    for r, _d, files in os.walk(os.path.join(sink.root, "data")):
        n += sum(1 for f in files if f.endswith(".parquet"))
    return n


def main():
    n_files = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    rows_per = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    k = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    n_upd = int(sys.argv[4]) if len(sys.argv) > 4 else 200

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("probe-mor")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    with tempfile.TemporaryDirectory() as tmp:
        cow = build(spark, f"{tmp}/cow", n_files, rows_per)
        t0 = time.time()
        rewritten = 0
        for i in range(k):
            res = cow.merge_rows_pruned(
                spark, scattered_batch(spark, i, n_files, rows_per, n_upd), keys=["k"],
                target_files=n_files,
            )
            assert res is not None
            rewritten += res[1]
        t_cow = time.time() - t0
        print(
            f"COW  : {k} scattered batches x {n_upd} upd  {t_cow:6.1f}s  "
            f"files_rewritten={rewritten} (amplification ~{rewritten // k}/batch of {n_files})"
        )

        mor = build(spark, f"{tmp}/mor", n_files, rows_per)
        t0 = time.time()
        tombs = 0
        for i in range(k):
            res = mor.upsert_mor(
                spark, scattered_batch(spark, i, n_files, rows_per, n_upd), keys=["k"], batch_id=100 + i
            )
            assert res is not None
            tombs += res[1]
        t_mor_batches = time.time() - t0
        dv_rows = sum(d["rows"] for d in mor.visible_dvs())
        t0 = time.time()
        assert mor.compact(spark, target_files=n_files) is not None
        t_compact = time.time() - t0
        print(
            f"MOR  : {k} scattered batches x {n_upd} upd  {t_mor_batches:6.1f}s  "
            f"appended_files={k} tombstones={tombs} (dv rows pending pre-compaction: {dv_rows})"
        )
        print(f"MOR  : final compact() {t_compact:6.1f}s  (one table-sized pass, amortized over {k} batches)")
        print(
            f"TOTAL: cow={t_cow:.1f}s  mor={t_mor_batches + t_compact:.1f}s "
            f"(batches {t_mor_batches:.1f}s + compact {t_compact:.1f}s)"
        )
        n_match = {r["k"] for r in cow.read(spark).select("k").collect()} == {
            r["k"] for r in mor.read(spark).select("k").collect()
        }
        same = (
            cow.read(spark).exceptAll(mor.read(spark)).isEmpty()
            and mor.read(spark).exceptAll(cow.read(spark)).isEmpty()
        )
        print(f"content identical across paths: {same} (keysets match: {n_match})")


if __name__ == "__main__":
    main()
