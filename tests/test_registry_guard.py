"""Registry-scale invariants (VERDICT r9 #8): with 215+ registered
queries, future growth must not silently add an oracle-less query. Every
registered query either carries a DuckDB oracle or is on the FROZEN
rows-only allowlist below — each of those 9 is approximate/engine-specific
BY DESIGN and pinned by a dedicated exactness/recall pytest (documented
per-family in COVERAGE.md §2). Adding a name here requires adding that
pin and the COVERAGE.md rationale."""

from __future__ import annotations

from kafka_connect_bigquery_storage_write_spark.queries import ORACLE, QUERIES, load_all

load_all()

# the documented rows-only set: approximate ANN / LSH / SimHash / semantic
# dedup operators whose outputs are engine-specific by design; their
# correctness pins live in tests/test_dedup_similarity.py and
# tests/test_oracle_parity.py (recall bounds, full-probe == brute force,
# planted-pair exactness)
ROWS_ONLY_ALLOWLIST = frozenset(
    {
        "q33_simhash_near_dups",
        "q36_lsh_ann_topk",
        "q38_embedding_near_dups_blocked",
        "q39_ivf_ann_topk",
        "q63_embedding_near_dups_lsh",
        "q88_ivf_int8_serving",
        "q92_semantic_dedup",
        "q145_pq_ann_topk",
        "q175_ivfpq_topk",
    }
)


def test_every_query_is_oracled_or_on_the_frozen_rows_only_list():
    rows_only = set(QUERIES) - set(ORACLE)
    assert rows_only == set(ROWS_ONLY_ALLOWLIST), (
        "rows-only set drifted: "
        f"unexpected={sorted(rows_only - ROWS_ONLY_ALLOWLIST)} "
        f"missing={sorted(ROWS_ONLY_ALLOWLIST - rows_only)}"
    )


def test_oracles_reference_registered_queries_only():
    stray = set(ORACLE) - set(QUERIES)
    assert not stray, f"oracles without a query: {sorted(stray)}"


def test_driver_window_names_are_registered_and_sized():
    from kafka_connect_bigquery_storage_write_spark.queries import DRIVER_WINDOW

    assert len(DRIVER_WINDOW) == 50
    assert len(set(DRIVER_WINDOW)) == 50
    missing = [n for n in DRIVER_WINDOW if n not in QUERIES]
    assert not missing, missing
    # Amended round 11: a rows-only query may occupy an official slot
    # ONLY if it is on the frozen allowlist — since round 10 every
    # allowlisted query carries an IN-QUERY recall/precision gate, so
    # its official row is a live assert (a quality regression ERRORs the
    # driver row), not a silent rows-only pass. Unlisted rows-only
    # queries still never enter the window.
    unoracled = [n for n in DRIVER_WINDOW if n not in ORACLE]
    stray = [n for n in unoracled if n not in ROWS_ONLY_ALLOWLIST]
    assert not stray, stray
