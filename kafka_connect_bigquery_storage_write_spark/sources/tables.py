"""Parquet table catalog over the fixture star schema (SURVEY.md E1).

The scan is the foundation of every query: `spark.read.parquet` gives
Tungsten's vectorized columnar reader, and because all downstream operators
are declarative DataFrame expressions, Catalyst pushes filters and prunes
columns into this scan for free (verify with `.explain("formatted")` —
look for `PushedFilters` / `ReadSchema`).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# Dimension tables small enough to broadcast at any realistic scale factor:
# region is 5 rows, nation 25 at every SF; supplier/part/customer grow with SF
# but stay orders of magnitude under the fact tables.
BROADCASTABLE = ("region", "nation", "supplier")

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def local_rows_df(spark: SparkSession, rows, schema) -> DataFrame:
    """Driver-local rows as a ONE-partition DataFrame.

    ``spark.createDataFrame(list, schema)`` parallelizes the list into
    ``defaultParallelism`` slices (32 on the bench host), so EVERY
    downstream job pays one Python-worker round trip PER SLICE — and the
    common persist pattern ``.coalesce(1).write`` runs those round trips
    SERIALLY inside one task: measured 5-7 s to write a 1-row relation
    vs 0.3 s on a single slice (the Python boundary prices per
    partition, not per row — guide §4). Driver-local lists are small by
    construction (centroids, codebooks, gate rows, fixture constants),
    so one slice is always the right layout; anything that needs
    parallelism downstream can repartition explicitly.
    """
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise ValueError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    # Externally-built sessions (the correctness driver's harness) enter the
    # engine here: make sure the package zip is on every worker's sys.path
    # before any query pickles a package-referencing kernel.
    from kafka_connect_bigquery_storage_write_spark.session import ensure_shipped

    ensure_shipped(spark)
    if name == "events":
        # runtime-settable SQL conf; needed even when the caller's session
        # wasn't built by session.get_spark (e.g. the driver harness)
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events":
        # parquet TIMESTAMP(NANOS) arrives as long (see session.py conf);
        # truncate ns -> µs exactly like DuckDB does when reading the same file
        from pyspark.sql import functions as F
        from pyspark.sql import types as T

        if isinstance(df.schema["ts"].dataType, T.LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    """Register every fixture table as a temp view for the SQL entry point."""
    tables = load_tables(spark, sf_dir)
    for name, df in tables.items():
        df.createOrReplaceTempView(name)
    return tables
