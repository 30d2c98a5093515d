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


# The external correctness driver snapshots exactly the FIRST 50 entries of
# the registry.  With more than 50 registered queries, plain registration
# order would starve whichever family registers last, so DRIVER_WINDOW is
# ROTATED each round to lead with (a) queries whose newest official driver
# row is oldest and (b) queries new this round; everything else follows in
# registration order, with the no-oracle (rows-only) queries last so the
# window carries the maximum number of hash-verified rows.
#
# STALENESS POLICY (since round 5; arithmetic updated round 7): with
# 142 oracled queries and a 50-row window, a full rotation now takes
# ~3 rounds. The guarantee is LEAST-RECENTLY-VERIFIED-FIRST: every
# rotation leads with queries that have zero official rows, then the
# oldest-verified cohort — no query is ever passed over in favor of a
# fresher one. Compensating control:
# tools/driver_sim.py verifies EVERY oracled query against its DuckDB
# oracle every round at sf0.01 (and the non-quadratic-oracle set at
# sf0.1) under the official driver's canonicalizer replica
# (harness_canon.py), so local green is a faithful predictor for the
# unwindowed majority.
#
# Round-10 rotation (VERDICT r9 #2: keep burning staleness — the window
# composition it prescribed): lead with the THREE queries new this round
# (q217 pruned MERGE, q218 CDF streaming sync, q219 bucketed governed
# join, q220 CDC->bucketed-mirror composition — zero official rows;
# growth 4 <= the prescribed 12, so the
# window refreshes 46 stale rows), then the full r5-latest remainder
# (15 queries — the stalest official rows in the registry), then the
# r6-latest cohort in registration order until the window holds exactly
# 50. After this round no oracled query's newest official row is older
# than r6, and 12 r6 stragglers remain for the round-11 lead.
DRIVER_WINDOW: tuple[str, ...] = (
    # --- new this round (r10; zero official rows) ---
    "q217_sink_merge_pruned",
    "q218_cdf_streaming_sync",
    "q219_bucketed_sink_colocated",
    "q220_cdc_bucketed_mirror",
    # --- r5-latest remainder (stalest official rows; complete) ---
    "q81_heavy_hitters",
    "q50_tumbling_window",
    "q51_sliding_window",
    "q52_session_window",
    "q53_stream_dedup",
    "q56_incremental_rollup",
    "q67_event_funnel",
    "q68_cohort_retention",
    "q83_incremental_distinct_rollup",
    "q54_asof_join",
    "q55_range_join_bands",
    "q77_sessionize_events",
    "q60_pandas_udf_charge",
    "q61_apply_in_pandas_user_stats",
    "q62_python_udf_priority",
    # --- r6-latest cohort, registration order ---
    "q30_dedup_exact",
    "q31_ngram_jaccard_pairs",
    "q32_minhash_lsh_near_dups",
    "q65_incremental_dedup",
    "q73_dedup_clusters",
    "q87_dedup_clusters_star",
    "q78_decontamination",
    "q94_containment_pairs",
    "q109_bloom_prefilter_dedup",
    "q113_incremental_near_dup",
    "q99_weighted_quota_sample",
    "q106_token_freq_of_freq",
    "q108_quality_decile_bins",
    "q112_vocab_coverage",
    "q110_unigram_surprisal",
    "q128_weighted_reservoir_sample",
    "q131_quality_survivorship",
    "q122_pagerank_coactivity",
    "q47_multimodal_binary_metadata",
    "q70_conversion_roundtrip",
    "q71_ingest_pipeline_committed",
    "q86_dlq_replay_convergence",
    "q124_jsonl_source",
    "q125_csv_source",
    "q09_status_distinct_customers",
    "q10_rollup_quantities",
    "q11_cube_volumes",
    "q12_top_orders",
    "q13_top_customers_per_nation",
    "q115_window_rank_family",
    "q116_token_typo_pairs",
)


def _reorder_for_driver_window() -> None:
    """Rebuild the registries so DRIVER_WINDOW names come first.

    Order: DRIVER_WINDOW → remaining oracled queries (registration order) →
    rows-only queries (registration order).  Idempotent; unknown names in
    DRIVER_WINDOW fail loudly so the list can't silently rot.
    """
    missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
    if missing:
        raise ValueError(f"DRIVER_WINDOW names not registered: {missing}")
    rest = [n for n in QUERIES if n not in DRIVER_WINDOW]
    ordered = (
        list(DRIVER_WINDOW)
        + [n for n in rest if n in ORACLE]
        + [n for n in rest if n not in ORACLE]
    )
    reordered = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)


def load_all() -> None:
    """Import every query-defining module (idempotent), then order the
    registry for the driver's 50-entry correctness window."""
    from kafka_connect_bigquery_storage_write_spark.queries import dedup, graph, multimodal, pipelines, quality, relational, similarity, skew, streaming_batch, temporal, text, udfs  # noqa: F401

    _reorder_for_driver_window()
