"""Round-8 scale probes.

1. BPE apply scales with the DISTINCT-WORD relation, not the corpus
   (VERDICT r7 #4 "Done" criterion): the Arrow kernel tokenizes each
   distinct word once; corpus weight re-enters as an integer column. The
   probe applies a 64-merge trained table to 30k vs 300k distinct words
   (10x) and reports wall clock — near-linear in words, independent of
   how many billions of documents those words came from.

2. Manifest-sink data skipping: a 32-batch table (one key range per
   batch), point read via read(where=...) vs full scan — reports files
   opened (the zone-map prune) and wall clock.

Usage: python tools/probe_round8_ops.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.session import get_spark


def probe_bpe_word_grain(spark):
    from kafka_connect_bigquery_storage_write_spark.operators.bpe import bpe_tokens_udf, bpe_train

    def words_df(n):
        # synthetic distinct words, 6-18 chars over a 12-letter alphabet,
        # Zipf-ish frequencies
        return spark.range(n).selectExpr(
            "concat_ws('', transform(sequence(0, 5 + cast(id % 13 as int)), "
            "  j -> substring('etaoinshrdlu', 1 + cast((id * 31 + j * 7) % 12 as int), 1))) AS token",
            "1 + cast(id % 97 as long) AS f",
        )

    merges = bpe_train(words_df(30_000), n_merges=64, max_words=30_000)
    print(f"  trained 64 merges from 30k words; first 5: {merges[:5]}")
    # warm the Python-worker pool + Arrow path so the first timed point
    # isn't billed worker startup
    warm = bpe_tokens_udf(merges)
    words_df(2_000).select(F.explode(warm(F.col("token")))).write.format("noop").mode("overwrite").save()
    for n in (30_000, 300_000):
        df = words_df(n)
        enc = bpe_tokens_udf(merges)
        t0 = time.perf_counter()
        out = (
            df.select(F.explode(enc(F.col("token"))).alias("tok"), "f")
            .groupBy("tok")
            .agg(F.sum("f").alias("n"))
        )
        out.write.format("noop").mode("overwrite").save()
        dt = time.perf_counter() - t0
        print(f"  apply over {n:>7} distinct words: {dt:6.2f}s")


def probe_data_skipping(spark, tmp_root):
    from kafka_connect_bigquery_storage_write_spark.sinks.sink_table import ManifestSinkTable

    root = os.path.join(tmp_root, "skiptable")
    sink = ManifestSinkTable(root, write_mode="committed")
    for b in range(32):
        df = spark.range(b * 10_000, (b + 1) * 10_000).selectExpr("id AS k", "id * 2 AS v").coalesce(2)
        sink.write_batch(df, b)
    n_all = len(sink.visible_files())
    pred = [("k", "==", 123_456)]
    n_pruned = len(sink.visible_files(pred))
    t0 = time.perf_counter()
    full = sink.read(spark).filter("k = 123456").count()
    t_full = time.perf_counter() - t0
    t0 = time.perf_counter()
    pruned = sink.read(spark, where=pred).count()
    t_pruned = time.perf_counter() - t0
    assert full == pruned == 1
    print(
        f"  point read: {n_pruned}/{n_all} files opened "
        f"(full-scan filter {t_full:5.2f}s vs pruned {t_pruned:5.2f}s)"
    )


def main():
    import tempfile

    spark = get_spark(app_name="probe-round8", cpus=8, shuffle_partitions=8)
    print("BPE apply at distinct-word grain (10x words => ~10x cost, corpus-size-free):")
    probe_bpe_word_grain(spark)
    print("Manifest-sink zone-map skipping (32 batches, disjoint ranges):")
    with tempfile.TemporaryDirectory() as tmp:
        probe_data_skipping(spark, tmp)


if __name__ == "__main__":
    main()
