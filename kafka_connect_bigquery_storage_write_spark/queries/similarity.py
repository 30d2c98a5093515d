"""Similarity-search query entries (E15) over the embeddings table."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.operators.similarity import cosine_near_dup_pairs, cosine_topk, lsh_topk
from kafka_connect_bigquery_storage_write_spark.queries import query
from kafka_connect_bigquery_storage_write_spark.sources.tables import load_table

# double-precision dot product with left-to-right summation — the exact
# float semantics of the Spark-side F.aggregate fold
_DOT = """list_aggregate(list_transform(list_zip({a}, {b}),
            x -> CAST(x[1] AS DOUBLE) * CAST(x[2] AS DOUBLE)), 'sum')"""
_NORM = """sqrt(list_aggregate(list_transform({a},
            x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum'))"""


@query(
    "q35_cosine_topk",
    oracle=f"""
    WITH q AS (SELECT vec_id AS query_id, embedding AS qe FROM embeddings WHERE vec_id < 10),
    c AS (SELECT vec_id AS neighbor_id, embedding AS ce FROM embeddings),
    scored AS (
      SELECT query_id, neighbor_id,
             round({_DOT.format(a='qe', b='ce')}
                   / ({_NORM.format(a='qe')} * {_NORM.format(a='ce')}), 6) AS cosine
      FROM q CROSS JOIN c
      WHERE neighbor_id <> query_id
    ),
    ranked AS (
      SELECT query_id, neighbor_id, cosine,
             row_number() OVER (PARTITION BY query_id ORDER BY cosine DESC, neighbor_id) AS rank
      FROM scored
    )
    SELECT query_id, neighbor_id, cosine, CAST(rank AS INT) AS rank
    FROM ranked WHERE rank <= 5
    ORDER BY query_id, rank
    """,
)
def q35_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact brute-force cosine top-5 for 10 query vectors.

    Scale: broadcast(queries) — corpus never shuffles until the per-query
    top-k; dot products are JVM higher-order folds in double precision.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")
    return cosine_topk(emb, queries, k=5).orderBy("query_id", "rank")


@query("q36_lsh_ann_topk")  # approximate by design -> rows-only; recall vs brute force in pytest
def q36_lsh_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH approximate top-5 (16 planes, 4 bands).

    The scale path: signatures computed in one narrow pass, candidates
    only from shared buckets, exact rescoring on candidates.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10).select(F.col("vec_id").alias("query_id"), "embedding")
    return lsh_topk(emb, queries, k=5).orderBy("query_id", "rank")


@query(
    "q37_embedding_near_dups",
    oracle=f"""
    WITH n AS (
      SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE) / {_NORM.format(a='embedding')}) AS nv
      FROM embeddings
    )
    , scored AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             round({_DOT.format(a='a.nv', b='b.nv')}, 6) AS cosine
      FROM n a JOIN n b ON a.vec_id < b.vec_id
    )
    SELECT id_a, id_b, cosine FROM scored
    WHERE cosine >= 0.4
    ORDER BY id_a, id_b
    """,
)
def q37_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs (cosine >= 0.4), exact all-pairs.

    Normalization happens once per vector before the pair join, so each
    pair costs exactly one dot product.
    """
    emb = load_table(spark, sf_dir, "embeddings")
    return cosine_near_dup_pairs(emb, threshold=0.4).orderBy("id_a", "id_b")
