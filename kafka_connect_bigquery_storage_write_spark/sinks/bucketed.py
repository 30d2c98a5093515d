"""Bucketed-table writer: shuffle-free co-located joins and aggregations.

At 100 TB the single biggest join cost is the shuffle of the fact table.
Bucketing pre-shuffles ONCE at write time: `bucketBy(n, key)` hash-
partitions rows into n files per partition by the join key and records
the layout in the catalog; any later equi-join or aggregation on that key
between tables bucketed with the same n reads co-located buckets and
skips the Exchange entirely (and with `sortBy`, the sort). The write-side
shuffle is amortized over every downstream query — the standard layout
for fact tables that are joined repeatedly on one key.

Spark constraint (public API): bucketed layouts only persist through the
catalog — `saveAsTable`, not `save` — because the bucket spec lives in
table metadata, not in the files. The helper therefore registers an
EXTERNAL table (explicit ``path``) so the data sits where the caller
says and the catalog entry carries the bucket spec. On a cluster with a
shared metastore the same call is production-ready; with the default
in-memory catalog the table registration is session-scoped while the
files persist.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    path: str,
    key: str | list[str],
    buckets: int,
    sort: bool = True,
    mode: str = "overwrite",
) -> None:
    """Write ``df`` as an external parquet table bucketed (and optionally
    sorted) on ``key``. ``buckets`` must match between tables that will
    join co-located; size it so one bucket of the LARGEST table fits an
    executor core's working set (buckets ≈ table_bytes / 256 MB)."""
    keys = [key] if isinstance(key, str) else list(key)
    if buckets <= 0:
        raise ValueError("buckets must be positive")
    writer = df.write.mode(mode).option("path", path).bucketBy(buckets, *keys)
    if sort:
        writer = writer.sortBy(*keys)
    writer.format("parquet").saveAsTable(name)


def bucketed_table(spark: SparkSession, name: str) -> DataFrame:
    """Read a bucketed table back through the catalog (the bucket layout
    is only honored on catalog reads — `spark.read.parquet(path)` on the
    same files would NOT skip the shuffle)."""
    return spark.table(name)
