"""Compute-parallelism pinning for expensive per-row operators.

A Spark scan's partition count follows the BYTES of the input
(maxPartitionBytes bin-packing), which is the right default when cost is
proportional to I/O. Operators whose cost is dominated by per-row CPU —
O(n^2) similarity kernels, shingling regexes, Arrow/numpy vote folds —
break that assumption: a corpus that fits one 128 MB split is still
millions of expensive rows, and inheriting the scan's single partition
serializes the whole operator (and, in local runs, makes its timing
GC-noisy because one thread does all allocation).

``ensure_compute_parallelism`` pins a floor: if the input has fewer
partitions than the runtime's parallelism, repartition up; otherwise pass
through untouched. On a production cluster reading TB-scale inputs the
scan already has thousands of partitions, so the gate makes the extra
shuffle a small-input-only cost — exactly when the shuffle is cheapest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_compute_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    """Repartition ``df`` up to the runtime parallelism if it has fewer
    partitions; no-op (and no shuffle) when the input is already wide.

    Round-robin repartition: the operators this guards do their own
    key-shuffles downstream, so balance matters here, not co-location.
    """
    target = min_partitions or df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
