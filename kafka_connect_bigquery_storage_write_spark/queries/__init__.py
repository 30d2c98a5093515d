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
# STALENESS POLICY (since round 5): with 123 oracled queries and a
# 50-row window, ≤1-round staleness is arithmetically impossible (a
# 2-round rotation covers 100). The guarantee is LEAST-RECENTLY-
# VERIFIED-FIRST with ≤2-round staleness: every rotation leads with the
# queries whose newest official row is oldest. Compensating control:
# tools/driver_sim.py verifies EVERY oracled query against its DuckDB
# oracle every round at sf0.01 (and the non-quadratic-oracle set at
# sf0.1) under the official driver's canonicalizer replica
# (harness_canon.py), so local green is a faithful predictor for the
# unwindowed majority.
#
# Round-6 rotation (VERDICT r5 next-round #1): staleness order is
# never-windowed (27: q106/q108–q131 less the seven windowed in r5,
# plus rows-only q88/q92) → r2-latest rows-only block (q33/q36/q38/
# q39/q63) → oldest r4-latest queries in registration order (first 18).
DRIVER_WINDOW: tuple[str, ...] = (
    # --- never officially windowed (new in r5; sim-green every round) ---
    "q106_token_freq_of_freq",
    "q108_quality_decile_bins",
    "q109_bloom_prefilter_dedup",
    "q110_unigram_surprisal",
    "q111_key_skew_profile",
    "q112_vocab_coverage",
    "q113_incremental_near_dup",
    "q114_series_outliers",
    "q115_window_rank_family",
    "q116_token_typo_pairs",
    "q117_incremental_quantile_rollup",
    "q118_chisquare_independence",
    "q119_numeric_correlations",
    "q120_theta_returning_users",
    "q121_column_profile",
    "q122_pagerank_coactivity",
    "q123_interval_join_attribution",
    "q124_jsonl_source",
    "q125_csv_source",
    "q126_filtered_cosine_topk",
    "q127_unpivot_metrics",
    "q128_weighted_reservoir_sample",
    "q129_null_safe_join",
    "q130_cdc_latest_state",
    "q131_quality_survivorship",
    # never-windowed rows-only (pytest-pinned recall/exactness)
    "q88_ivf_int8_serving",
    "q92_semantic_dedup",
    # --- newest official row is r2 (rows-only family) ---
    "q33_simhash_near_dups",
    "q36_lsh_ann_topk",
    "q38_embedding_near_dups_blocked",
    "q39_ivf_ann_topk",
    "q63_embedding_near_dups_lsh",
    # --- newest official row is r4; first 18 in registration order ---
    "q30_dedup_exact",
    "q31_ngram_jaccard_pairs",
    "q32_minhash_lsh_near_dups",
    "q65_incremental_dedup",
    "q73_dedup_clusters",
    "q87_dedup_clusters_star",
    "q78_decontamination",
    "q94_containment_pairs",
    "q99_weighted_quota_sample",
    "q47_multimodal_binary_metadata",
    "q70_conversion_roundtrip",
    "q71_ingest_pipeline_committed",
    "q86_dlq_replay_convergence",
    "q09_status_distinct_customers",
    "q10_rollup_quantities",
    "q11_cube_volumes",
    "q12_top_orders",
    "q13_top_customers_per_nation",
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
