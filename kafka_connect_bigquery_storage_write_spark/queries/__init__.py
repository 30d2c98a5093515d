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
# Round-9 rotation (VERDICT r8 next-round #1: burn down staleness —
# rotate, don't grow): lead with the TWELVE queries new this round
# (q205-q216, zero official rows), then the r4-latest stragglers
# q49/q98/q97 (the stalest official rows in the registry), then the
# r5-latest cohort in registration order until the window holds exactly
# 50. Registry growth this round is 12 (<= the prescribed 15), so the
# window refreshes 38 stale rows. The r5 remainder (q81/q50/q51/q52/
# q53/q56/q67/q68/q83/q54/q55/q77/q60/q61/q62) plus the r6-latest
# cohort lead the round-10 rotation.
DRIVER_WINDOW: tuple[str, ...] = (
    # --- new this round (r9; zero official rows) ---
    "q205_sink_delete_vectors",
    "q206_byte_bpe_encode",
    "q207_sink_stats_sum_pushdown",
    "q208_cdc_change_feed_replay",
    "q209_temperature_mixture",
    "q210_weighted_sssp",
    "q211_tokenizer_compression_eval",
    "q212_event_transition_matrix",
    "q213_bootstrap_ci",
    "q214_hashed_ngram_importance",
    "q215_sink_snapshot_diff",
    "q216_bucketed_colocated_join",
    # --- r4-latest (stalest official rows) ---
    "q49_salted_join",
    "q98_incremental_topk_rollup",
    "q97_gap_filled_hourly",
    # --- r5-latest cohort, registration order ---
    "q105_contamination_scores",
    "q40_text_stats",
    "q41_language_histogram",
    "q42_top_tokens",
    "q44_train_test_split",
    "q45_token_budget",
    "q46_winnow_fingerprints",
    "q43_quality_filter",
    "q57_repetition_signals",
    "q66_mixture_sampling",
    "q74_tfidf_top_terms",
    "q75_pii_scrub",
    "q79_sequence_packing",
    "q80_document_chunking",
    "q82_stratified_sample",
    "q96_vocab_encode",
    "q72_avro_ingest_roundtrip",
    "q01_pricing_summary",
    "q02_filtered_scan",
    "q03_shipping_priority",
    "q04_order_priority_check",
    "q05_supplier_region_volume",
    "q06_forecast_revenue",
    "q07_customer_order_counts",
    "q08_customers_without_orders",
    "q84_disjunctive_predicates",
    "q85_global_threshold",
    "q102_returned_items",
    "q103_promo_revenue",
    "q104_top_revenue_supplier",
    "q100_ivf_exact_topk",
    "q101_blocked_near_dups_exact",
    "q76_embedding_quantize",
    "q93_label_centroids",
    "q107_embedding_gram_matrix",
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
