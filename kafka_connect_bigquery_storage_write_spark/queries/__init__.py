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
# Round-8 rotation (VERDICT r7 next-round #1 + ADVICE r7): lead with the
# NINE queries added late in round 7 that have ZERO official rows
# (q155-q163 — they landed after the r7 window was fixed, so they jump
# the rotation per the zero-row rule), then the queries NEW this round,
# then the r4-latest stragglers (q49/q98/q97), then the r5-latest cohort
# in registration order until the window holds exactly 50. The r5
# remainder + r6-latest cohort lead round 9.
#
# Mid-round update: q179-q191 (thirteen queries added in the round-8
# continuation session) also have zero official rows, so they join the
# zero-row block ahead of q49/q98/q97; the r5 cohort tail shrinks to
# keep the window at exactly 50. Displaced r5 names stay next in the
# round-9 rotation order.
#
# Second continuation update: q192-q204 (thirteen more new-this-round
# queries, zero official rows) extend the same block; the remaining r5
# fills (q45/q46/q43/q57/q66/q42/q44/q40/q41/q105) and r4 stragglers
# q49/q98/q97 roll to the round-9 rotation head — the window is now
# EXACTLY the 50 queries with zero official rows (q155-q204).
DRIVER_WINDOW: tuple[str, ...] = (
    # --- never officially windowed (added late in r7; sim-green) ---
    "q155_bigram_surprisal",
    "q156_source_js_divergence",
    "q157_boilerplate_salvage",
    "q158_lateral_topk",
    "q159_hourly_autocorrelation",
    "q160_rare_phrase_postings",
    "q161_image_ahash_dups",
    "q162_map_in_arrow_charge",
    "q163_full_outer_attribution",
    # --- new this round (r8) --- (inserted here as they land)
    "q164_bpe_encode",
    "q165_jpeg_block_checksum",
    "q166_audio_fingerprint_dups",
    "q167_xml_source",
    "q168_triangle_count",
    "q169_sink_pruned_read",
    "q170_sink_time_travel",
    "q171_schema_evolution_read",
    "q172_reachability_bfs",
    "q173_bpe_token_shards",
    "q174_ivfpq_exact_topk",
    "q175_ivfpq_topk",
    "q176_sink_merge_upsert",
    "q177_cdc_upsert_pipeline",
    "q178_pmi_collocations",
    # --- new in the round-8 continuation (zero official rows) ---
    "q179_protobuf_wire_roundtrip",
    "q180_sink_bloom_pruned_read",
    "q181_sink_zorder_read",
    "q182_jl_projection",
    "q183_group_disjoint_split",
    "q184_ppjoin_jaccard_pairs",
    "q185_trigram_backoff_lm",
    "q186_video_scene_cuts",
    "q187_winsorized_stats",
    "q188_equidepth_binning",
    "q189_cohort_retention",
    "q190_entity_resolution",
    "q191_asof_directions",
    "q192_image_resize_checksum",
    "q193_hard_negative_mining",
    "q194_sparse_cosine_topk",
    "q195_ewma_user_scores",
    "q196_bitext_margin_mining",
    "q197_sink_stats_only_agg",
    "q198_phrase_blocklist",
    "q199_k_anonymity_audit",
    "q200_audio_decimate_checksum",
    "q201_kcore_peel_trace",
    "q202_image_equalize_checksum",
    "q203_mmr_diversified_topk",
    "q204_unigram_viterbi",
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
