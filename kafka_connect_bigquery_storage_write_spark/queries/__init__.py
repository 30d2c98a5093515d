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
# Round-11 rotation (VERDICT r10 #5: burn the last r6 staleness): lead
# with the SIX queries new this round (q221 merge-on-read upserts,
# q222 CDC across schema evolution, q223 repeated-span removal, q224
# consumer-aware vacuum, q225 binpack OPTIMIZE, q226 unaligned span
# removal — zero official rows),
# then the COMPLETE r6-latest cohort: its 12 oracled stragglers plus
# its 7 rows-only ANN queries — joined by the other two rows-only ANN
# queries (q145 r7-latest, q175) — because all nine now carry IN-QUERY
# recall/precision gates (VERDICT r10 #1): their official rows-only
# record is no longer a silent pass but a live assert, and refreshing
# them demonstrates the gates in the official window. The remaining 23
# slots refresh the r7-latest cohort in registration order. After this
# round no query's newest official row is older than r7, and ~26 r7
# oracled stragglers remain for the round-12 lead.
DRIVER_WINDOW: tuple[str, ...] = (
    # --- new this round (r11; zero official rows) ---
    "q221_sink_upsert_mor",
    "q222_cdc_schema_evolution_sync",
    "q223_repeated_span_removal",
    "q224_consumer_aware_vacuum",
    "q225_sink_binpack_optimize",
    "q226_unaligned_span_removal",
    # --- r6-latest oracled stragglers (complete) ---
    "q111_key_skew_profile",
    "q114_series_outliers",
    "q117_incremental_quantile_rollup",
    "q118_chisquare_independence",
    "q119_numeric_correlations",
    "q120_theta_returning_users",
    "q121_column_profile",
    "q123_interval_join_attribution",
    "q126_filtered_cosine_topk",
    "q127_unpivot_metrics",
    "q129_null_safe_join",
    "q130_cdc_latest_state",
    # --- the nine self-verifying rows-only ANN queries (in-query
    # recall/precision gates, r10 commit c6951a1; 7 are r6-latest) ---
    "q33_simhash_near_dups",
    "q36_lsh_ann_topk",
    "q38_embedding_near_dups_blocked",
    "q39_ivf_ann_topk",
    "q63_embedding_near_dups_lsh",
    "q88_ivf_int8_serving",
    "q92_semantic_dedup",
    "q145_pq_ann_topk",
    "q175_ivfpq_topk",
    # --- r7-latest cohort, registration order (first 23) ---
    "q136_bm25_ranking",
    "q137_repeated_passages",
    "q140_token_balanced_shards",
    "q144_bpe_pair_stats",
    "q148_html_strip_roundtrip",
    "q149_url_canonicalize",
    "q150_chat_flatten",
    "q153_length_bucketed_batches",
    "q154_preference_pairs",
    "q132_image_pixel_checksum",
    "q142_audio_sample_checksum",
    "q143_audio_activity_frames",
    "q147_video_frame_checksum",
    "q138_orc_source",
    "q146_avro_file_source",
    "q135_expectation_checks",
    "q14_running_customer_spend",
    "q15_union_all_counts",
    "q16_intersect_except",
    "q17_string_functions",
    "q18_date_functions",
    "q19_ship_delay",
    "q20_math_functions",
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
