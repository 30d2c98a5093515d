"""10x scale probes for the round-4 operators (q90/q94/q96/q97/q98).

Replicates the sf0.1 tables 10x with disjoint id spaces (the same
regime as the round-2/3 dedup probes) and times each operator. The
containment probe runs with max_df engaged: replication multiplies every
shingle's df by 10, i.e. the documented sum-df^2 regime where the
stop-shingle cap is the intended configuration.

Usage: python tools/probe_round4_ops.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.operators.dedup import containment_pairs
from kafka_connect_bigquery_storage_write_spark.session import get_spark
from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

SF = "/root/testdata/sf0.1"
R = 10


def replicate(df, id_cols: dict[str, int]):
    """Union R copies with disjoint id spaces (col -> offset unit)."""
    out = None
    for i in range(R):
        c = df
        for col, unit in id_cols.items():
            c = c.withColumn(col, F.col(col) + F.lit(i * unit))
        out = c if out is None else out.union(c)
    return out


def timed(name, fn):
    t0 = time.monotonic()
    n = fn()
    print(f"PROBE {name}: {time.monotonic() - t0:.1f}s ({n:,} rows)")


def main() -> None:
    spark = get_spark(app_name="probe-round4-ops")

    # --- q90 shape: hand-decorrelated EXISTS/NOT-EXISTS at 6M lineitems
    li = replicate(
        load_table(spark, SF, "lineitem"), {"l_orderkey": 10_000_000}
    ).persist()
    orders = replicate(
        load_table(spark, SF, "orders"), {"o_orderkey": 10_000_000}
    ).persist()
    li.count(), orders.count()

    def q90_shape():
        flags = (
            li.join(orders, li.l_orderkey == orders.o_orderkey)
            .select(
                "l_orderkey",
                "l_suppkey",
                (F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 365 DAYS")).cast("int").alias("_l"),
            )
            .groupBy("l_orderkey", "l_suppkey")
            .agg(F.max("_l").alias("late"))
        )
        stats = flags.groupBy("l_orderkey").agg(F.count(F.lit(1)).alias("ns"), F.sum("late").alias("nl"))
        return (
            flags.filter(F.col("late") == 1)
            .join(stats, "l_orderkey")
            .filter((F.col("ns") > 1) & (F.col("nl") == 1))
            .groupBy("l_suppkey")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .count()
        )

    timed("q90 decorrelated waiting-suppliers, 6M lineitems", q90_shape)
    li.unpersist(), orders.unpersist()

    # --- documents 10x (50k docs) for vocab + containment
    docs = replicate(load_table(spark, SF, "documents"), {"doc_id": 10_000_000}).persist()
    docs.count()

    def vocab():
        toks = docs.select(
            "doc_id", F.posexplode(F.filter(F.split("text", r"\s+"), lambda t: t != "")).alias("pos", "token")
        )
        freq = toks.groupBy("token").agg(F.count(F.lit(1)).alias("tf"))
        top = freq.orderBy(F.col("tf").desc(), "token").limit(256)
        from pyspark.sql import Window as W

        vocab_df = top.withColumn("id", F.row_number().over(W.orderBy(F.col("tf").desc(), "token")))
        enc = toks.join(F.broadcast(vocab_df), "token", "left").select(
            "doc_id", "pos", F.coalesce("id", F.lit(0)).alias("id")
        )
        return (
            enc.groupBy("doc_id")
            .agg(
                F.count(F.lit(1)).alias("n_tokens"),
                F.transform(F.sort_array(F.collect_list(F.struct("pos", "id"))), lambda x: x["id"]).alias("ids"),
            )
            .count()
        )

    timed("q96 vocab encode, 50k docs", vocab)

    def containment():
        # max_df engaged: 10x replication multiplies df by 10 — the
        # documented stop-shingle regime
        return containment_pairs(docs, threshold=0.8, max_df=50).count()

    timed("q94 containment (max_df=50), 50k docs", containment)
    docs.unpersist()

    # --- events 10x (1M events, 10x users) for gap fill + top-k rollup
    ev = replicate(load_table(spark, SF, "events"), {"event_id": 100_000_000, "user_id": 100_000}).persist()
    ev.count()

    def gap_fill():
        sub = ev.filter(F.pmod("user_id", F.lit(100_000)) < 20)  # 200 users across replicas
        hourly = sub.groupBy("user_id", F.date_trunc("hour", "ts").alias("hour")).agg(
            F.count(F.lit(1)).alias("n")
        )
        bounds = sub.agg(
            F.date_trunc("hour", F.min("ts")).alias("lo"), F.date_trunc("hour", F.max("ts")).alias("hi")
        )
        grid = (
            sub.select("user_id")
            .distinct()
            .crossJoin(F.broadcast(bounds))
            .select("user_id", F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 HOUR"))).alias("hour"))
        )
        return grid.join(hourly, ["user_id", "hour"], "left").count()

    timed("q97 gap fill, 200 users x full window", gap_fill)

    def topk_rollup():
        import tempfile

        from kafka_connect_bigquery_storage_write_spark.streaming.rollup import IncrementalTopK

        roll = IncrementalTopK(
            sink_path=tempfile.mkdtemp(prefix="probe_topk_") + "/topk",
            ts_col="ts",
            window="1 day",
            key_cols=["event_type"],
            item_col="user_id",
            m=100,
        )
        for i in range(10):
            roll.process_batch(ev.filter(F.pmod("event_id", F.lit(10)) == i), batch_id=i)
        return roll.read(spark, k=5).count()

    timed("q98 top-k rollup, 10 batches x 1M events (m=100)", topk_rollup)
    spark.stop()


if __name__ == "__main__":
    main()
