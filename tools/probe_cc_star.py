"""High-diameter connected-components probe (VERDICT r3 next-round #2).

Builds a 1M-vertex PATH graph — the adversarial worst case for min-label
propagation (diameter = 999,999, i.e. ~1M rounds) — and runs the
large-star/small-star strategy, recording wall time and round count to
demonstrate the O(log^2 n) bound in practice. Also re-runs the round-3
dedup-shaped probe (20k 10-cliques) under both strategies for the
like-for-like comparison.

Usage: python tools/probe_cc_star.py [n_path_vertices]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.operators.dedup import connected_components
from kafka_connect_bigquery_storage_write_spark.session import get_spark


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark(app_name="probe-cc-star")

    # ---- 1M-vertex path graph: the diameter worst case ------------------
    path_pairs = spark.range(1, n).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    info: dict = {}
    t0 = time.monotonic()
    labels = connected_components(path_pairs, max_iterations=60, strategy="star", info=info)
    stats = labels.agg(
        F.count(F.lit(1)).alias("n_vertices"),
        F.countDistinct("cluster_id").alias("n_components"),
        F.min("cluster_id").alias("min_label"),
        F.max("cluster_id").alias("max_label"),
    ).first()
    elapsed = time.monotonic() - t0
    assert stats.n_components == 1 and stats.min_label == 1 and stats.max_label == 1, stats
    print(
        f"PATH n={n} diameter={n - 1}: star converged in {info['rounds']} rounds, "
        f"{elapsed:.1f}s, components={stats.n_components} (min-label would need ~{n - 1} rounds)"
    )

    # ---- dedup-shaped graph (round-3 probe): 20k 10-cliques -------------
    k, cliques = 10, 20_000
    ids = spark.range(k * cliques).select(
        (F.col("id") / k).cast("long").alias("c"), F.col("id").alias("v")
    )
    a = ids.select("c", F.col("v").alias("id_a"))
    b = ids.select("c", F.col("v").alias("id_b"))
    clique_pairs = (
        a.join(b, "c").filter(F.col("id_a") < F.col("id_b")).select("id_a", "id_b").persist()
    )
    clique_pairs.count()
    for strat in ("min_label", "star"):
        info = {}
        t0 = time.monotonic()
        labels = connected_components(clique_pairs, strategy=strat, info=info)
        n_comp = labels.agg(F.countDistinct("cluster_id")).first()[0]
        elapsed = time.monotonic() - t0
        assert n_comp == cliques, (strat, n_comp)
        print(
            f"CLIQUES 20k x 10 ({k * cliques} vertices, {clique_pairs.count()} edge-pairs): "
            f"{strat} {info['rounds']} rounds, {elapsed:.1f}s, components={n_comp}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
