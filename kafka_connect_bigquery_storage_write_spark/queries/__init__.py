"""Query registry: every engine operator exposed as a named (spark, sf_dir) -> DataFrame.

Each registered query pairs a Spark DataFrame program with an equivalent
ANSI-SQL oracle string (run by the harness on DuckDB over the same parquet
files). Registration order groups by SURVEY.md §2 operator family.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Register a query; ``oracle`` is DuckDB-SQL over the fixture views.

    Omit ``oracle`` for ops whose semantics aren't SQL-expressible
    (the harness then records a weaker rows-only check).
    """

    def deco(fn: QueryFn) -> QueryFn:
        if name in QUERIES:
            raise ValueError(f"duplicate query name {name!r}")
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query-defining module (idempotent)."""
    from kafka_connect_bigquery_storage_write_spark.queries import dedup, multimodal, pipelines, relational, similarity, skew, streaming_batch, temporal, text, udfs  # noqa: F401
