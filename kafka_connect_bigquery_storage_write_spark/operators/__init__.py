"""Extension operators for large-scale training-data pipelines (SURVEY.md E14–E16).

Everything here is built from declarative DataFrame primitives (shuffle-
conscious, broadcast-aware); Python appears only as Arrow-batched pandas
UDFs where Spark genuinely lacks the operator. This façade re-exports the
DataFrame-level operator surface; Column-level expressions live in
``kafka_connect_bigquery_storage_write_spark.functions``.
"""

from kafka_connect_bigquery_storage_write_spark.operators.dedup import (
    exact_dedup,
    jaccard_near_dup_pairs,
    minhash_lsh_near_dups,
    minhash_signatures,
    simhash,
    simhash_near_dups,
)
from kafka_connect_bigquery_storage_write_spark.operators.multimodal import extract_features, resize_images, sample_frames
from kafka_connect_bigquery_storage_write_spark.operators.partitioning import (
    ensure_compute_parallelism,
    repartition_for_grouped_map,
)
from kafka_connect_bigquery_storage_write_spark.operators.similarity import (
    cosine_near_dup_pairs,
    cosine_near_dup_pairs_blocked,
    cosine_near_dup_pairs_lsh,
    cosine_topk,
    ivf_topk,
    lsh_topk,
)
from kafka_connect_bigquery_storage_write_spark.operators.skew import salted_agg, salted_join, skew_profile
from kafka_connect_bigquery_storage_write_spark.operators.temporal import asof_join
from kafka_connect_bigquery_storage_write_spark.operators.text import repetition_signals, text_stats, winnow_fingerprints

__all__ = [
    "exact_dedup",
    "jaccard_near_dup_pairs",
    "minhash_lsh_near_dups",
    "minhash_signatures",
    "simhash",
    "simhash_near_dups",
    "extract_features",
    "resize_images",
    "sample_frames",
    "ensure_compute_parallelism",
    "repartition_for_grouped_map",
    "cosine_near_dup_pairs",
    "cosine_near_dup_pairs_blocked",
    "cosine_near_dup_pairs_lsh",
    "cosine_topk",
    "ivf_topk",
    "lsh_topk",
    "salted_agg",
    "salted_join",
    "skew_profile",
    "asof_join",
    "repetition_signals",
    "text_stats",
    "winnow_fingerprints",
]
