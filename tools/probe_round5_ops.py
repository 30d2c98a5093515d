"""10x scale probes for the round-5 operators.

Replicates the sf0.1 tables 10x with disjoint id spaces (same regime as
the round-2/3/4 probes) and times:
- q102 shape (TPC-H Q10): returned-items top-20 at ~6M lineitems
- q105 shape: contamination scores at 50k docs (held side kept at
  fixture size — the realistic regime: the benchmark suite does NOT
  grow with the corpus)
- q107 shape: exact gram matrix at 20k vectors (the partial-rows-per-
  batch invariant means time should scale ~linearly with corpus size)
- semantic_dedup with the max_cluster_rows cap ENGAGED at 20k vectors
  (block-pair splitting of hot clusters — the round-5 hardening; note
  the replicated corpus is the duplicate-heavy regime, so pair output
  is large by construction, like the round-3 decontamination probe)

Usage: python tools/probe_round5_ops.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.operators.dedup import contamination_scores
from kafka_connect_bigquery_storage_write_spark.operators.similarity import gram_matrix_micro, semantic_dedup
from kafka_connect_bigquery_storage_write_spark.queries.parity import revenue_decimal_col
from kafka_connect_bigquery_storage_write_spark.session import get_spark
from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

SF = "/root/testdata/sf0.1"
R = 10


def replicate(df, id_cols: dict[str, int]):
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
    print(f"PROBE {name}: {time.monotonic() - t0:.1f}s ({n:,} rows)", flush=True)


def main() -> None:
    spark = get_spark(app_name="probe-round5-ops")

    # --- q102 shape at ~6M lineitems / 1.5M orders ----------------------
    li = replicate(load_table(spark, SF, "lineitem"), {"l_orderkey": 10_000_000})
    orders = replicate(load_table(spark, SF, "orders"), {"o_orderkey": 10_000_000})
    cust = load_table(spark, SF, "customer")
    nat = load_table(spark, SF, "nation")

    def q102_probe():
        sel = (
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
            )
            .join(li.filter(F.col("l_returnflag") == "R"), F.col("l_orderkey") == F.col("o_orderkey"))
            .join(cust, F.col("c_custkey") == F.col("o_custkey"))
            .join(F.broadcast(nat), F.col("c_nationkey") == F.col("n_nationkey"))
        )
        return (
            sel.groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
            .agg(revenue_decimal_col().alias("revenue"))
            .orderBy(F.col("revenue").desc(), "c_custkey")
            .limit(20)
            .count()
        )

    timed("q102_returned_items_10x", q102_probe)

    # --- q105 shape: 50k train docs vs fixture-size held-out set --------
    docs10 = replicate(load_table(spark, SF, "documents"), {"doc_id": 10_000_000})
    held = load_table(spark, SF, "documents").filter(
        (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 2), 16, 10).cast("int") % 10) >= 8
    )
    timed(
        "q105_contamination_scores_10x_train",
        lambda: contamination_scores(docs10, held).count(),
    )

    # --- q107 shape: exact gram matrix at 20k vectors -------------------
    emb10 = replicate(load_table(spark, SF, "embeddings"), {"vec_id": 10_000_000})
    timed("q107_gram_matrix_10x", lambda: gram_matrix_micro(emb10).count())

    # --- semantic dedup with the cluster cap engaged at 20k vectors -----
    # cap 500: with 16 clusters averaging ~1.25k vectors each, every list
    # splits into >=3 blocks -> the block-pair machinery is exercised at
    # scale, per-task state provably <= ~2*cap vectors
    timed(
        "semantic_dedup_capped_10x",
        lambda: semantic_dedup(emb10, threshold=0.4, n_clusters=16, max_cluster_rows=500).count(),
    )

    probe_pagerank(spark)


def probe_pagerank(spark) -> None:
    """10x PageRank probe: co-activity graph from the replicated events.
    User ids AND timestamps are offset per replica (disjoint user spaces
    + disjoint time ranges), so the graph is 10 truly disconnected
    copies — edge volume scales ~10x and convergence structure is
    preserved. (Offsetting only ids would let replicas share hours and
    square the per-hour bucket — a 100x edge blow-up measuring the
    hot-bucket regime, not the scale-up.)"""
    from kafka_connect_bigquery_storage_write_spark.operators.graph import pagerank_integer

    base = load_table(spark, SF, "events")
    parts = []
    for i in range(R):
        parts.append(
            base.withColumn("user_id", F.col("user_id") + F.lit(i * 10_000_000)).withColumn(
                "ts", F.col("ts") + F.expr(f"INTERVAL {i * 3000} DAYS")
            )
        )
    ev10 = parts[0]
    for p in parts[1:]:
        ev10 = ev10.union(p)
    hu = ev10.select(F.date_trunc("hour", "ts").alias("h"), F.col("user_id").alias("u")).distinct()
    a = hu.select("h", F.col("u").alias("src"))
    b = hu.select("h", F.col("u").alias("dst"))
    edges = a.join(b, "h").filter(F.col("src") != F.col("dst")).select("src", "dst").distinct()
    edges = edges.localCheckpoint(eager=True)
    timed("pagerank_10x_3iters", lambda: pagerank_integer(edges, iterations=3).count())


if __name__ == "__main__":
    main()
