"""Round-9 scale probes.

1. k-core chain adversary (VERDICT r8 #3 "Done" criterion): a PATH graph
   at k=2 peels two endpoints per round — Θ(n) driver-coordinated rounds,
   the class the star escape hatch fixed for CC. Probe (a) measures the
   distributed loop on chains with the local finish DISABLED (cost grows
   ~linearly in rounds), (b) the shipped default, where the surviving
   subgraph fits local_finish_max_edges and the whole peel collapses to
   one bounded collect + an O(V+E) driver continuation.

2. Delete-vector read overhead: a 16-file table with one point-DV vs the
   same table post-compaction — wall clock of a full aggregate through
   the anti-join merge vs the clean path.

Usage: python tools/probe_round9_ops.py
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.session import get_spark


def _chain(spark, n):
    fwd = spark.range(n - 1).select(F.col("id").alias("src"), (F.col("id") + 1).alias("dst"))
    return fwd.union(fwd.select(F.col("dst").alias("src"), F.col("src").alias("dst"))).localCheckpoint(
        eager=True
    )


def probe_kcore_chain(spark):
    from kafka_connect_bigquery_storage_write_spark.operators.graph import kcore_peel

    print("== k-core chain adversary ==")
    for n in (400, 800, 1600):
        edges = _chain(spark, n)
        t0 = time.perf_counter()
        _trace, _k, rounds = kcore_peel(edges, k=2, max_rounds=10_000, local_finish_max_edges=None)
        dt = time.perf_counter() - t0
        print(f"distributed-only: n={n} rounds={rounds} wall={dt:.1f}s")
    for n in (10_000, 40_000):
        edges = _chain(spark, n)
        t0 = time.perf_counter()
        _trace, _k, rounds = kcore_peel(edges, k=2)  # default local finish
        dt = time.perf_counter() - t0
        print(f"local-finish default: n={n} rounds={rounds} wall={dt:.1f}s")


def probe_dv_read_overhead(spark):
    from kafka_connect_bigquery_storage_write_spark.sinks.sink_table import ManifestSinkTable

    print("== delete-vector read overhead ==")
    root = tempfile.mkdtemp(prefix="probe_dv_")
    sink = ManifestSinkTable(root + "/t", write_mode="committed")
    per = 250_000
    for b in range(16):
        sink.write_batch(
            spark.range(b * per, (b + 1) * per).selectExpr("id AS k", "id * 2 AS v").coalesce(1), b
        )

    def timed_agg(tag):
        t0 = time.perf_counter()
        row = sink.read(spark).agg(F.count(F.lit(1)), F.sum("v")).first()
        print(f"{tag}: rows={row[0]} wall={time.perf_counter() - t0:.2f}s")

    timed_agg("clean read (no DV)")
    t0 = time.perf_counter()
    res = sink.delete_where_dv(spark, [("k", ">=", 1000), ("k", "<", 2000)])
    print(f"dv point delete: n={res[1]} wall={time.perf_counter() - t0:.2f}s (no file rewritten)")
    timed_agg("merge-on-read (1 DV)")
    t0 = time.perf_counter()
    sink.compact(spark, target_files=8)
    print(f"compaction absorbing DV: wall={time.perf_counter() - t0:.2f}s")
    timed_agg("post-compaction read")


if __name__ == "__main__":
    spark = get_spark(app_name="probe9", cpus=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    probe_kcore_chain(spark)
    probe_dv_read_overhead(spark)
