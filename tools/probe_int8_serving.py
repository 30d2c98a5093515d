"""Int8 ANN serving probe (VERDICT r3 next-round #3 'Done' criterion).

Measures, at sf0.1 (5,000 x 64-dim embeddings):
  1. candidate-memory bytes of the int8 serving table (scale + 1B/dim
     codes) vs the float64 assignment arrays and a float32 baseline;
  2. wall time of ivf_topk_int8 vs the float ivf_topk at identical
     (n_lists, n_probe), plus recall of the int8 funnel vs the float path.

Usage: python tools/probe_int8_serving.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.operators.similarity import (
    ivf_assign,
    ivf_assign_int8,
    ivf_topk,
    ivf_topk_int8,
    ivf_train,
)
from kafka_connect_bigquery_storage_write_spark.session import get_spark
from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark(app_name="probe-int8-serving")
    emb = load_table(spark, sf_dir, "embeddings").persist()
    n = emb.count()
    dim = len(emb.first().embedding)

    cents = ivf_train(emb, n_lists=16)
    int8_tbl = ivf_assign_int8(emb, cents)
    row = int8_tbl.agg(F.sum(F.length("codes")).alias("code_bytes")).first()
    # per-row serving payload: 1B/dim codes + 8B scale + 8B id + 4B list_id
    int8_bytes = row.code_bytes + n * (8 + 8 + 4)
    f64_tbl = ivf_assign(emb, cents)
    f64_bytes = n * (dim * 8 + 8 + 4)
    f32_bytes = n * (dim * 4 + 8 + 4)
    print(
        f"n={n} dim={dim}: int8 serving table {int8_bytes:,} B "
        f"({int8_bytes / n:.0f} B/vec) vs float32 {f32_bytes:,} B ({f32_bytes / int8_bytes:.2f}x) "
        f"vs float64 assignment {f64_bytes:,} B ({f64_bytes / int8_bytes:.2f}x)"
    )
    assert f64_tbl.count() == n

    queries = emb.filter(F.col("vec_id") < 100).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    for name, fn in (
        ("float ivf_topk", lambda: ivf_topk(emb, queries, k=5, n_lists=16, n_probe=6)),
        (
            "int8 ivf_topk_int8",
            lambda: ivf_topk_int8(emb, queries, k=5, n_lists=16, n_probe=6, rescore_factor=4),
        ),
    ):
        best = None
        for _ in range(2):
            t0 = time.monotonic()
            rows = fn().collect()
            dt = time.monotonic() - t0
            best = dt if best is None else min(best, dt)
        if name.startswith("float"):
            flt = {(r.query_id, r.neighbor_id) for r in rows}
        else:
            i8 = {(r.query_id, r.neighbor_id) for r in rows}
        print(f"{name}: {best:.2f}s min-of-2, {len(rows)} rows (100 queries, k=5)")
    recall = len(flt & i8) / len(flt)
    print(f"int8 funnel recall vs float path @ k=5: {recall:.3f}")
    spark.stop()


if __name__ == "__main__":
    main()
