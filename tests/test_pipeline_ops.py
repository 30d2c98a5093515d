"""Invariant checks for the round-3 pipeline operators, beyond oracle
parity: quantization error bounds, packing conservation, chunk coverage.
Each invariant is evaluated ENGINE-SIDE over the whole fixture corpus
(one aggregate per assertion, no per-row driver loops).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.queries import QUERIES, load_all
from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

load_all()


def test_quantize_error_bound_and_code_range(spark, sf_dir):
    """absmax int8: every residual is within scale/2 (floor(x+0.5) rounds
    to nearest) and every code is within [-127, 127]."""
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import quantize_embeddings

    emb = load_table(spark, sf_dir, "embeddings")
    q = quantize_embeddings(emb).join(emb, "vec_id")
    x = F.transform(F.col("embedding"), lambda v: v.cast("double"))
    worst_resid_ratio = F.array_max(
        F.zip_with(x, F.col("codes"), lambda v, c: F.abs(v - c.cast("double") * F.col("scale")) / F.col("scale"))
    )
    row = q.agg(
        F.max(worst_resid_ratio).alias("worst"),
        F.max(F.array_max(F.transform("codes", F.abs))).alias("maxcode"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    # scale is rounded to 9dp in the output, so allow that quantum
    assert row.worst <= 0.5 + 1e-6, row
    assert row.maxcode <= 127
    assert row.n == emb.count()


def test_packing_conserves_docs_and_tokens(spark, sf_dir):
    """Every document lands in exactly one bin; token totals per source
    are conserved; bins fill in order (no bin id gaps per source)."""
    out = QUERIES["q79_sequence_packing"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split("text", r"\s+"), lambda t: t != ""))
    direct = docs.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum(n_tok).alias("n_tokens")
    )
    packed = out.groupBy("source").agg(
        F.sum("n_docs").alias("n_docs"),
        F.sum("n_tokens").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_bins"),
        F.max("bin_id").alias("max_bin"),
    )
    assert direct.join(packed, "source", "inner").count() == direct.count()
    bad = (
        direct.alias("d")
        .join(packed.alias("p"), "source")
        .filter(
            (F.col("d.n_docs") != F.col("p.n_docs"))
            | (F.col("d.n_tokens") != F.col("p.n_tokens"))
            | (F.col("p.max_bin") != F.col("p.n_bins") - 1)  # dense bin ids
        )
        .count()
    )
    assert bad == 0


def test_chunking_exact_coverage(spark, sf_dir):
    """Per doc: chunks start at 0, step 448, end exactly at n_tok, and
    adjacent chunks overlap by 64 tokens (512-448) except a short tail."""
    out = QUERIES["q80_document_chunking"](spark, sf_dir)
    docs = load_table(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(F.split("text", r"\s+"), lambda t: t != ""))
    per_doc = out.groupBy("doc_id").agg(
        F.min("start_tok").alias("first_start"),
        F.max("end_tok").alias("last_end"),
        F.count(F.lit(1)).alias("n_chunks"),
        F.max("chunk_idx").alias("max_idx"),
        F.max(F.col("start_tok") - F.col("chunk_idx") * 448).alias("stride_dev"),
    )
    joined = per_doc.join(docs.select("doc_id", n_tok.alias("n_tok")), "doc_id")
    bad = joined.filter(
        (F.col("first_start") != 0)
        | (F.col("last_end") != F.greatest(F.col("n_tok"), F.lit(0)))
        | (F.col("max_idx") != F.col("n_chunks") - 1)
        | (F.col("stride_dev") != 0)  # start_tok == chunk_idx * 448 exactly
    ).count()
    assert bad == 0
    assert per_doc.count() == docs.count()  # every doc chunked


def test_quantize_zero_vector_guard(spark):
    """A zero vector must quantize to all-zero codes with scale 1.0 (the
    absmax==0 guard) instead of dividing by zero into NaNs."""
    from kafka_connect_bigquery_storage_write_spark.operators.similarity import quantize_embeddings

    df = spark.createDataFrame(
        [(1, [0.0, 0.0, 0.0]), (2, [3.0, -1.5, 0.0])], "vec_id long, embedding array<double>"
    )
    rows = {r.vec_id: r for r in quantize_embeddings(df).collect()}
    assert rows[1].scale == 1.0 and rows[1].codes == [0, 0, 0] and rows[1].mse == 0.0
    assert rows[2].codes[0] == 127  # absmax element maps to full scale


def test_sessionize_single_event_and_empty(spark):
    """A single-event user forms one session; an empty input yields an
    empty panel (no window errors)."""
    from kafka_connect_bigquery_storage_write_spark.operators.temporal import sessionize

    one = spark.createDataFrame([(5, "2024-01-01 10:00:00")], "user_id long, ts string").withColumn(
        "ts", F.to_timestamp("ts")
    )
    out = sessionize(one, key="user_id", ts_col="ts", gap_seconds=60).collect()
    assert len(out) == 1 and out[0].session_seq == 1
    empty = one.filter(F.lit(False))
    assert sessionize(empty, key="user_id", ts_col="ts", gap_seconds=60).count() == 0


def test_decontaminate_empty_held_side(spark):
    """No held-out docs -> no contamination pairs (join degenerates
    cleanly, no crash)."""
    from kafka_connect_bigquery_storage_write_spark.operators.dedup import decontaminate

    train = spark.createDataFrame([(1, "alpha beta gamma delta epsilon zeta")], "doc_id long, text string")
    held = train.filter(F.lit(False))
    assert decontaminate(train, held, min_shared=1).count() == 0


def test_heavy_hitters_validates_support(spark):
    import pytest

    from kafka_connect_bigquery_storage_write_spark.operators.skew import heavy_hitters

    df = spark.range(10).select(F.col("id").alias("k"))
    with pytest.raises(ValueError, match="support"):
        heavy_hitters(df, "k", support=0.0)
    with pytest.raises(ValueError, match="support"):
        heavy_hitters(df, "k", support=1.5)
