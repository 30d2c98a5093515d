"""Scalar/vector function library: the engine's reusable column expressions.

Everything here returns Column expressions built from pyspark.sql.functions
(JVM-side, codegen-friendly) — importable by user queries the same way the
built-in F namespace is.
"""

from kafka_connect_bigquery_storage_write_spark.operators.similarity import cosine, dot, norm
from kafka_connect_bigquery_storage_write_spark.operators.text import (
    bpe_ish_token_count,
    fingerprint,
    langid_en_score,
    mean_token_len,
    punct_ratio,
    quality_score,
    stopword_ratio,
    token_count,
    tokens,
)
from kafka_connect_bigquery_storage_write_spark.operators.dedup import word_shingles

__all__ = [
    "cosine",
    "dot",
    "norm",
    "bpe_ish_token_count",
    "fingerprint",
    "langid_en_score",
    "mean_token_len",
    "punct_ratio",
    "quality_score",
    "stopword_ratio",
    "token_count",
    "tokens",
    "word_shingles",
]
