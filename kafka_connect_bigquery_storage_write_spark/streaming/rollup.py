"""Incremental windowed rollup — a continuously-maintained materialized
aggregate (the "hypertable rollup / continuous aggregate" pattern).

Each micro-batch folds into PARTIAL aggregates per (window, key) and
appends them to a ManifestSinkTable batch; reading combines the partials.
The decomposition is the same partial/combine algebra Spark's own
hash aggregation uses (and salted_agg exploits), lifted to STORAGE:

    batch N arrives -> groupBy(window, keys) partials -> sink batch N
    read            -> groupBy(window, keys) combine over all batches

Why this shape scales:
- each micro-batch writes O(windows x keys) rows, never raw events;
- state lives in the sink table, not executor memory — no streaming
  state store to size, no watermark-bounded window retention: late data
  simply lands as another partial in a later batch and combines in;
- exactly-once for free: partials ride the manifest sink's idempotent
  batch protocol (a replayed micro-batch is absorbed as ALREADY_EXISTS,
  so partials are never double-counted — the property that makes
  count/sum safe here at all);
- combine-on-read cost is bounded by compaction: ManifestSinkTable's
  compact() rewrites N batch files into one, which for partials IS the
  merge (re-aggregation happens on the next read over fewer rows).

avg decomposes as (sum, count) internally and is finalized on read.
approx_distinct stores a per-partial HLL sketch (datasketches binary,
~KBs per group regardless of cardinality) and unions sketches on read —
the only way COUNT DISTINCT can ride an incremental rollup at all, since
exact distinct is not decomposable into bounded partials.
approx_quantile stores a per-partial KLL sketch (same mergeable-summary
algebra as HLL: bounded bytes per group, merge on read) and surfaces
p50/p90/p99 — quantiles are the other classically-non-decomposable
aggregate, and the KLL partial is the only way a latency/size percentile
dashboard can ride a forever-running rollup. In the exact regime
(kll_k >= the group's row count) the sketch retains every value and the
quantiles are exact order statistics — the configuration pytest pins
against a direct sort; production keeps the default k and the
epsilon ~ 1.65/sqrt(k) rank-error bound.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kafka_connect_bigquery_storage_write_spark.sinks.sink_table import AppendResult, ManifestSinkTable

_PARTIAL = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
_COMBINE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}


@dataclass
class IncrementalRollup:
    sink_path: str
    ts_col: str
    window: str  # e.g. "1 hour" — tumbling
    key_cols: list[str]
    aggs: list[tuple[str, str]]  # (column, sum|count|min|max|avg|approx_distinct|approx_quantile)
    kll_k: int = 200  # KLL accuracy knob; >= group rows => exact order stats
    _sink: ManifestSinkTable = field(init=False)

    def __post_init__(self) -> None:
        for _col, fn in self.aggs:
            if fn not in (*_PARTIAL, "avg", "approx_distinct", "approx_quantile"):
                raise ValueError(
                    f"{fn!r} is not decomposable; use sum/count/min/max/avg/approx_distinct/approx_quantile"
                )
        if not 8 <= self.kll_k <= 65535:
            raise ValueError("kll_k must be in [8, 65535] (datasketches KLL bound)")
        self._sink = ManifestSinkTable(self.sink_path, write_mode="committed")

    # -- internal aggregate plans -------------------------------------------
    def _partial_cols(self):
        cols, seen = [], set()
        for c, fn in self.aggs:
            if fn == "approx_distinct":
                if (c, fn) not in seen:
                    seen.add((c, fn))
                    cols.append(F.hll_sketch_agg(c).alias(f"_p_hll_{c}"))
                continue
            if fn == "approx_quantile":
                if (c, fn) not in seen:
                    seen.add((c, fn))
                    cols.append(
                        F.kll_sketch_agg_double(F.col(c).cast("double"), F.lit(self.kll_k)).alias(f"_p_kll_{c}")
                    )
                continue
            needed = ("sum", "count") if fn == "avg" else (fn,)
            for p in needed:
                if (c, p) not in seen:  # avg shares partials with sum/count
                    seen.add((c, p))
                    cols.append(_PARTIAL[p](c).alias(f"_p_{p}_{c}"))
        return cols

    def _combine_cols(self):
        cols = []
        for c, fn in self.aggs:
            if fn == "avg":
                cols.append((F.sum(f"_p_sum_{c}") / F.sum(f"_p_count_{c}")).alias(f"avg_{c}"))
            elif fn == "approx_distinct":
                cols.append(
                    F.hll_sketch_estimate(F.hll_union_agg(f"_p_hll_{c}")).alias(f"approx_distinct_{c}")
                )
            elif fn == "approx_quantile":
                merged = F.kll_merge_agg_double(f"_p_kll_{c}")
                for name, q in (("p50", 0.5), ("p90", 0.9), ("p99", 0.99)):
                    cols.append(F.kll_sketch_get_quantile_double(merged, F.lit(q)).alias(f"{name}_{c}"))
            else:
                cols.append(_COMBINE[fn](f"_p_{fn}_{c}").alias(f"{fn}_{c}"))
        return cols

    # -- the micro-batch fold (foreachBatch target) -------------------------
    def process_batch(self, df: DataFrame, batch_id: int) -> AppendResult:
        partial = df.groupBy(
            F.window(F.col(self.ts_col), self.window).getField("start").alias("window_start"),
            *self.key_cols,
        ).agg(*self._partial_cols())
        return self._sink.write_batch(partial, batch_id)

    def start_stream(self, stream_df: DataFrame, checkpoint_path: str, **trigger_kwargs):
        writer = (
            stream_df.writeStream.foreachBatch(lambda d, i: self.process_batch(d, i))
            .option("checkpointLocation", checkpoint_path)
            .queryName("kafka_connect_bigquery_storage_write_spark-rollup")
        )
        if trigger_kwargs:
            writer = writer.trigger(**trigger_kwargs)
        return writer.start()

    # -- reads ---------------------------------------------------------------
    def read(self, spark: SparkSession) -> DataFrame:
        """The rolled-up aggregate: combine all committed partials."""
        partials = self._sink.read(spark)
        return partials.groupBy("window_start", *self.key_cols).agg(*self._combine_cols())

    def compact(self, spark: SparkSession, target_files: int = 4) -> int | None:
        """Merge partial batches (delegates to the sink's snapshot
        compaction); read() results are unchanged, read cost drops."""
        return self._sink.compact(spark, target_files=target_files)

    def vacuum(self) -> list[str]:
        """Delete partial directories absorbed by compaction snapshots
        (sink vacuum); run after in-flight readers of the old layout
        finish."""
        return self._sink.vacuum()


@dataclass
class IncrementalTopK:
    """Incrementally-maintained top-k items per (window, keys) — the
    heavy-hitters member of the continuous-aggregate family (count/sum/
    min/max/avg/approx_distinct live in IncrementalRollup).

    Each micro-batch appends a TRUNCATED per-item count partial: exact
    per-(window, keys, item) counts, keeping only the ``m`` most frequent
    items per group (rank by count desc, item asc — deterministic under
    ties). The read merges partials by summation and re-ranks — the
    mergeable-summaries shape (Agarwal et al. 2012): merged counts are
    LOWER bounds, and an item absent from one batch's partial missed by
    at most that batch's m-th count, so the total underestimate is
    bounded by sum_b c_m(b). With ``m`` >= the per-group item
    cardinality the rollup is EXACT — the configuration q98's SQL oracle
    checks; the truncated regime's guarantees are pinned in pytest.

    Storage per batch is O(windows x keys x m) rows — bounded regardless
    of stream volume, the property that lets the rollup run forever.
    Exactly-once rides the manifest sink's idempotent batch protocol
    exactly as IncrementalRollup's partials do.
    """

    sink_path: str
    ts_col: str
    window: str  # tumbling, e.g. "1 day"
    key_cols: list[str]
    item_col: str
    m: int = 1000  # per-batch, per-group retained items
    _sink: ManifestSinkTable = field(init=False)

    def __post_init__(self) -> None:
        if self.m < 1:
            raise ValueError("m must be >= 1")
        self._sink = ManifestSinkTable(self.sink_path, write_mode="committed")

    def process_batch(self, df: DataFrame, batch_id: int) -> AppendResult:
        from pyspark.sql import Window as W

        counts = df.groupBy(
            F.window(F.col(self.ts_col), self.window).getField("start").alias("window_start"),
            *self.key_cols,
            F.col(self.item_col).alias("_item"),
        ).agg(F.count(F.lit(1)).alias("_p_n"))
        w = W.partitionBy("window_start", *self.key_cols).orderBy(
            F.col("_p_n").desc(), F.col("_item")
        )
        partial = counts.withColumn("_rk", F.row_number().over(w)).filter(F.col("_rk") <= self.m).drop("_rk")
        return self._sink.write_batch(partial, batch_id)

    def start_stream(self, stream_df: DataFrame, checkpoint_path: str, **trigger_kwargs):
        writer = (
            stream_df.writeStream.foreachBatch(lambda d, i: self.process_batch(d, i))
            .option("checkpointLocation", checkpoint_path)
            .queryName("kafka_connect_bigquery_storage_write_spark-topk-rollup")
        )
        if trigger_kwargs:
            writer = writer.trigger(**trigger_kwargs)
        return writer.start()

    def read(self, spark: SparkSession, k: int) -> DataFrame:
        """Top-k per (window, keys): merge partials by summation, re-rank.
        Columns: window_start, *keys, item, n, rank."""
        from pyspark.sql import Window as W

        merged = (
            self._sink.read(spark)
            .groupBy("window_start", *self.key_cols, "_item")
            .agg(F.sum("_p_n").alias("n"))
        )
        w = W.partitionBy("window_start", *self.key_cols).orderBy(F.col("n").desc(), F.col("_item"))
        return (
            merged.withColumn("rank", F.row_number().over(w).cast("int"))
            .filter(F.col("rank") <= k)
            .withColumnRenamed("_item", "item")
        )

    def compact(self, spark: SparkSession, target_files: int = 4) -> int | None:
        return self._sink.compact(spark, target_files=target_files)

    def vacuum(self) -> list[str]:
        return self._sink.vacuum()
