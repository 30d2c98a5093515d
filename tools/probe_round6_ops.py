"""Round-6 scale probes.

1. Hot-bucket co-activity edge build (VERDICT r5 #4 "Done" criterion):
   a synthetic hot hour with 10x the cap's membership — capped vs
   uncapped edge-build wall time and edge counts, proving
   max_bucket_members bounds the df^2 blowup.
2. Distributed prefix-sum (VERDICT r5 #3): vocabulary-scale rank/cumsum
   via ranked_prefix_sum vs the single-partition global window it
   replaced, at 12M distinct tokens. Measured crossover: at 1.5M rows
   the single-partition window still wins (6.8s vs 22.4s - two extra
   exchanges dominate), at 12M the distributed form wins 3x (9.2s vs
   26.5s) and the gap widens with scale (one-core sort + one-task state
   vs parallel range sort); the fix targets the 10^7-10^8-token regime
   the verdict flagged, not the fixture.

Usage: python tools/probe_round6_ops.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window
from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.operators.graph import coactivity_edges
from kafka_connect_bigquery_storage_write_spark.operators.partitioning import ranked_prefix_sum
from kafka_connect_bigquery_storage_write_spark.session import get_spark


def probe_hot_bucket(spark):
    # 20 cold hours x 200 users + ONE hot hour with 8_000 users
    # (4x the q122 cap of 2000). Uncapped, the hot hour alone is
    # 8_000^2 = 6.4e7 candidate pairs; capped it is 2000^2 = 4e6 — a
    # 16x edge-count ratio, enough to demonstrate the bound while
    # keeping the uncapped baseline runnable on this host.
    cold = spark.range(20).selectExpr("cast(id as string) as h").crossJoin(
        spark.range(200).selectExpr("concat('u', id) as u")
    )
    hot = spark.createDataFrame([("hot",)], "h string").crossJoin(
        spark.range(8_000).selectExpr("concat('u', id) as u")
    )
    hu = cold.union(hot).repartition(32).localCheckpoint(eager=True)

    t0 = time.perf_counter()
    n_capped = coactivity_edges(hu, max_bucket_members=2000).count()
    t_capped = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_uncapped = coactivity_edges(hu).count()
    t_uncapped = time.perf_counter() - t0
    print(
        f"hot-bucket edge build: capped(K=2000) {t_capped:.1f}s / {n_capped:,} edges"
        f" vs uncapped {t_uncapped:.1f}s / {n_uncapped:,} edges",
        flush=True,
    )


def probe_prefix_sum(spark):
    # 12M distinct "tokens" with a zipf-ish count column
    tf = (
        spark.range(12_000_000)
        .selectExpr("concat('tok', id) as token", "cast(1 + 1000000 div (id + 1) as long) as c")
        .repartition(32)
        .localCheckpoint(eager=True)
    )
    order = [F.col("c").desc(), F.col("token")]

    t0 = time.perf_counter()
    distributed = ranked_prefix_sum(tf, order, value="c").agg(
        F.max("r"), F.max("cum")
    ).collect()[0]
    t_dist = time.perf_counter() - t0

    w = Window.orderBy(*order)
    t0 = time.perf_counter()
    single = (
        tf.withColumn("r", F.row_number().over(w).cast("long"))
        .withColumn("cum", F.sum("c").over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .agg(F.max("r"), F.max("cum"))
        .collect()[0]
    )
    t_single = time.perf_counter() - t0
    assert tuple(distributed) == tuple(single), (distributed, single)
    print(
        f"prefix-sum 12M tokens: distributed {t_dist:.1f}s vs single-partition window {t_single:.1f}s"
        f" (identical max rank/cum {tuple(distributed)})",
        flush=True,
    )


def main():
    spark = get_spark(app_name="probe-round6", cpus=16, shuffle_partitions=32)
    probe_hot_bucket(spark)
    probe_prefix_sum(spark)


if __name__ == "__main__":
    main()
