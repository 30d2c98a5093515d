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
    aggs: list[tuple[str, str]]  # (column, sum|count|min|max|avg) pairs
    _sink: ManifestSinkTable = field(init=False)

    def __post_init__(self) -> None:
        for _col, fn in self.aggs:
            if fn not in (*_PARTIAL, "avg", "approx_distinct"):
                raise ValueError(
                    f"{fn!r} is not decomposable; use sum/count/min/max/avg/approx_distinct"
                )
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
