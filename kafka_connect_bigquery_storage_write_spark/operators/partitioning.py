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

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


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


def ranked_prefix_sum(
    df: DataFrame,
    order: list[Column],
    value: str | None = None,
    rank_col: str = "r",
    cum_col: str = "cum",
    num_partitions: int | None = None,
) -> DataFrame:
    """Distributed ``row_number`` (+ optional running ``sum``) over a
    TOTAL order, without ever collapsing the relation onto one task.

    A bare ``Window.orderBy(...)`` (no partitionBy) is the classic scale
    trap: Spark plans it as a single-partition WindowExec (`WindowExec:
    No Partition Defined`), so a 10^7–10^8-row vocabulary or key-count
    relation serializes on one core. This helper is the standard
    two-phase prefix-sum instead:

      1. range-partition on ``order`` (the same exchange a global sort
         pays — partition i's keys all precede partition i+1's);
      2. rank/cumsum WITHIN each range partition (parallel window keyed
         by ``spark_partition_id()``);
      3. aggregate the P per-partition (count, sum) totals — a P-row
         relation — window THOSE into exclusive offsets (bounded by the
         partition count, so the global window there is safe by
         construction), and broadcast-join the offsets back.

    ``order`` must be a deterministic total order (callers tie-break on
    a unique key, as every registered query already does). ``value``
    names the column whose running sum lands in ``cum_col``; omit it for
    rank-only. AQE note: coalescing of the range exchange merges only
    ADJACENT reducer ranges, so per-partition monotonicity — all phase-2
    correctness — survives runtime re-planning.
    """
    spark = df.sparkSession
    n = num_partitions or spark.sparkContext.defaultParallelism
    part = df.repartitionByRange(n, *order).withColumn("_rps_pid", F.spark_partition_id())
    # MATERIALIZATION BARRIER — correctness, not caching. RangePartitioner
    # SAMPLES its boundaries with an rdd-id-derived seed, so two separate
    # physical evaluations of this subtree can pick DIFFERENT boundaries;
    # the offsets branch and the final join below both consume ``part``,
    # and if each re-evaluates the exchange independently the pid
    # assignments diverge and ranks silently corrupt (observed at sf0.1:
    # q108 emitted an 11th decile). localCheckpoint(eager=True) fills the
    # pid-stamped relation exactly once before either consumer reads it,
    # and — unlike persist(), whose CacheManager entry is never released
    # because the collect happens outside this function (the
    # relational.py:1324 leak, ADVICE r9) — its blocks are freed by the
    # ContextCleaner once the result is unreferenced. It is also the
    # STRONGER barrier: a persist eviction under memory pressure would
    # re-sample the range exchange; truncated lineage cannot.
    part = part.localCheckpoint(eager=True)
    w = Window.partitionBy("_rps_pid").orderBy(*order)
    local = part.withColumn(rank_col, F.row_number().over(w).cast("long"))
    aggs = [F.count(F.lit(1)).alias("_rps_n")]
    if value is not None:
        local = local.withColumn(
            cum_col, F.sum(value).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        )
        aggs.append(F.sum(value).alias("_rps_s"))
    per_part = local.groupBy("_rps_pid").agg(*aggs)
    wo = Window.orderBy("_rps_pid").rowsBetween(Window.unboundedPreceding, -1)
    off_cols = ["_rps_pid", F.coalesce(F.sum("_rps_n").over(wo), F.lit(0)).alias("_rps_roff")]
    if value is not None:
        off_cols.append(F.coalesce(F.sum("_rps_s").over(wo), F.lit(0)).alias("_rps_soff"))
    offsets = per_part.select(*off_cols)
    out = local.join(F.broadcast(offsets), "_rps_pid")
    out = out.withColumn(rank_col, F.col(rank_col) + F.col("_rps_roff"))
    if value is not None:
        out = out.withColumn(cum_col, F.col(cum_col) + F.col("_rps_soff"))
    return out.drop("_rps_pid", "_rps_roff", "_rps_soff")
