"""SparkSession construction with scale-aware defaults.

Local test runs use local[N]; the same config block is what we would ship
to a 1000-executor cluster — AQE on (runtime partition coalescing + skew
join handling), Arrow for the pandas-UDF path, UTC session time.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def get_spark(
    app_name: str = "kafka_connect_bigquery_storage_write_spark",
    cpus: int | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession tuned for this engine.

    On a real cluster the master/memory settings come from spark-submit;
    everything set here is cluster-safe: AQE handles partition coalescing
    and skew joins at any scale, and shuffle partitions default to the
    parallelism of the runtime rather than Spark's legacy 200.
    """
    cpus = cpus or DEFAULT_CPUS
    shuffle_partitions = shuffle_partitions or cpus
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # coalesce toward the runtime's parallelism, not toward 1 MB
        # partitions: byte-based coalescing starves CPU-heavy stages
        # (Python grouped-map above all) whose inputs are small in bytes
        # but expensive per row. parallelismFirst is Spark's default; the
        # lower floor lets it hold for small-bytes shuffles too. At TB
        # scale partitions are far above either floor, so this only
        # changes small-input behavior.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "true")
        .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # fixture `events` parquet stores TIMESTAMP(NANOS); read as long and
        # convert to micros in the loader (Spark has no native ns timestamps)
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
