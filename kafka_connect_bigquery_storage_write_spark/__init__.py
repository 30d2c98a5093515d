"""kafka_connect_bigquery_storage_write_spark — a PySpark-native analytics & streaming-ingest engine.

A from-scratch Spark restatement of the capability surface of
joker1007/kafka-connect-bigquery-storage-write (a Kafka Connect -> BigQuery
Storage Write API sink connector), extended with a general relational query
surface and large-scale training-data-pipeline operators (dedup, similarity
search, text analysis), per SURVEY.md.

Design stance (SURVEY.md §4): declare logical plans with the DataFrame/SQL
API and let Catalyst/Tungsten optimize; Python only at the edges
(Arrow-batched pandas UDFs), never row-at-a-time in hot paths.
"""

from kafka_connect_bigquery_storage_write_spark.session import get_spark
from kafka_connect_bigquery_storage_write_spark.sources.tables import TABLE_NAMES, load_table, load_tables, register_views

__all__ = [
    "get_spark",
    "TABLE_NAMES",
    "load_table",
    "load_tables",
    "register_views",
]

__version__ = "0.1.0"
