"""Round-7 scale probes.

1. Skewed-user point-in-time join (VERDICT r6 #2 "Done" criterion): one
   power user with 1e5 clicks and 1e5 purchases. The interval-join form
   (q139's previous shape, kept as the DuckDB oracle) evaluates
   C*P = 1e10 predicate pairs inside ONE task for that key; the as-of
   form (union + single window pass per key, q54 machinery) sorts
   (C+P) rows. Both are timed head-to-head on identical data and
   checked for identical results.

Usage: python tools/probe_round7_ops.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import Window as W
from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.operators.temporal import asof_join
from kafka_connect_bigquery_storage_write_spark.session import get_spark


def probe_skewed_point_in_time(spark):
    # ONE hot user: 100_000 clicks (1s apart) + 1_000 purchases spread
    # across the click range — plus 50 cold users for realism.
    hot_clicks = spark.range(100_000).selectExpr(
        "'hot' as user_id",
        "id as click_id",
        "timestamp_seconds(1600000000 + id) as ts",
    )
    cold_clicks = spark.range(50 * 100).selectExpr(
        "concat('u', id % 50) as user_id",
        "1000000 + id as click_id",
        "timestamp_seconds(1600000000 + id) as ts",
    )
    clicks_raw = hot_clicks.union(cold_clicks).repartition(32).localCheckpoint(eager=True)
    purchases = (
        spark.range(100_000)
        .selectExpr(
            "'hot' as user_id",
            "2000000 + id as purchase_id",
            "timestamp_seconds(1600000000 + id * 97) as p_ts",
        )
        .localCheckpoint(eager=True)
    )

    wc = W.partitionBy("user_id").orderBy("ts", "click_id")
    versions = (
        clicks_raw.withColumn("state_version", F.row_number().over(wc).cast("long"))
        .withColumn("valid_to", F.lead("ts").over(wc))
        .withColumnRenamed("ts", "valid_from")
        .filter(F.col("valid_to").isNull() | (F.col("valid_to") > F.col("valid_from")))
        .withColumnRenamed("click_id", "state_click_id")
    )

    # -- as-of form (what q139 executes now) --
    t0 = time.perf_counter()
    asof = asof_join(
        purchases, versions, by="user_id", left_ts="p_ts", right_ts="valid_from",
        right_payload=["state_version", "state_click_id"], how="left",
    ).select("purchase_id", "state_version", "state_click_id")
    asof_rows = sorted(tuple(r) for r in asof.collect())
    t_asof = time.perf_counter() - t0

    # -- interval-join form (q139's previous shape / current oracle) --
    t0 = time.perf_counter()
    ij = (
        purchases.join(
            versions.withColumnRenamed("user_id", "v_user"),
            (F.col("user_id") == F.col("v_user"))
            & (F.col("valid_from") <= F.col("p_ts"))
            & ((F.col("p_ts") < F.col("valid_to")) | F.col("valid_to").isNull()),
            "left",
        )
    ).select("purchase_id", "state_version", "state_click_id")
    ij_rows = sorted(tuple(r) for r in ij.collect())
    t_ij = time.perf_counter() - t0

    assert asof_rows == ij_rows, "as-of and interval-join answers diverged"
    print(
        f"skewed point-in-time (1e5 clicks x 1e5 purchases on one key): "
        f"as-of {t_asof:.1f}s vs interval-join {t_ij:.1f}s "
        f"({len(asof_rows)} rows, identical)",
        flush=True,
    )


def main():
    spark = get_spark(app_name="probe-round7", cpus=16, shuffle_partitions=32)
    probe_skewed_point_in_time(spark)
    probe_pq_scan_vs_brute(spark)
    probe_incremental_layout_fold_cost(spark)





def probe_pq_scan_vs_brute(spark):
    """PQ ADC scan + rescore vs brute-force cosine at sf0.1 (50k x 64):
    the point is the SCANNED-BYTES story (8-byte codes vs 512-byte float
    rows), but wall-clock should also hold or win once the corpus
    outgrows the broadcast-fold regime."""
    import sys

    sys.path.insert(0, "/root/repo")
    from pyspark.sql import functions as F

    from kafka_connect_bigquery_storage_write_spark.operators.similarity import cosine_topk, pq_topk
    from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.1", "embeddings").localCheckpoint(eager=True)
    queries = emb.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")

    t0 = time.perf_counter()
    n_b = cosine_topk(emb, queries, k=5).count()
    t_brute = time.perf_counter() - t0

    t0 = time.perf_counter()
    n_pq = pq_topk(emb, queries, k=5, n_subspaces=8, n_codes=64, rescore_factor=8).count()
    t_pq = time.perf_counter() - t0
    print(
        f"pq vs brute @50k x 64, 10 queries: brute {t_brute:.1f}s/{n_b} rows, "
        f"pq(8x64, rf8, incl. train+encode) {t_pq:.1f}s/{n_pq} rows; "
        f"scan relation: 8B codes vs 512B floats per row",
        flush=True,
    )


def probe_incremental_layout_fold_cost(spark):
    """The per-batch fold cost of IncrementalShardLayout must stay flat
    as the table grows: the carried state is ONE scalar derived from the
    shard-grain partials (bounded by shard count), never the documents."""
    import shutil
    import sys
    import tempfile

    sys.path.insert(0, "/root/repo")
    from kafka_connect_bigquery_storage_write_spark.sinks.shards import IncrementalShardLayout

    root = tempfile.mkdtemp(prefix="probe_layout_")
    lay = IncrementalShardLayout(root + "/layout", tokens_per_shard=100_000)
    batch_rows = 200_000
    times = []
    for b in range(8):
        df = spark.range(b * batch_rows, (b + 1) * batch_rows).selectExpr(
            "id as doc_id", "cast(id % 997 as int) as n_tokens"
        )
        t0 = time.perf_counter()
        lay.process_batch(df, batch_id=b)
        times.append(time.perf_counter() - t0)
    n = lay.read(spark).count()
    print(
        f"incremental layout fold over 8 x {batch_rows} docs: per-batch "
        f"{' '.join(f'{t:.1f}' for t in times)}s (flat = state is scalar), "
        f"{n} shards total",
        flush=True,
    )
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
