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


def repartition_for_grouped_map(df: DataFrame, *keys: str, n_groups: int | None = None) -> DataFrame:
    """Pin the shuffle feeding a groupBy(*keys).applyInPandas.

    Grouped-map inputs are usually small in BYTES but expensive per row
    (Python + Arrow per group), so AQE's byte-based partition coalescing
    starves the worker pool — measured collapsing 36 matmul groups onto
    one worker. An explicit numPartitions repartition on the group keys is
    preserved by AQE, and the subsequent groupBy on the same keys reuses
    the partitioning without another shuffle. ``n_groups`` (when the
    caller knows the group count) caps the fan-out at one partition per
    group.
    """
    target = df.sparkSession.sparkContext.defaultParallelism
    if n_groups is not None:
        target = min(n_groups, target)
    # floor of 1: a dynamically-computed empty group list must not turn
    # into repartition(0, ...) (IllegalArgumentException far from cause)
    return df.repartition(max(target, 1), *keys)
