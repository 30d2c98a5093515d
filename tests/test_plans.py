"""Physical-plan regression tests: the scale properties we designed for
(pushdown, pruning, broadcast) must survive future edits — a correct
query with a degraded plan is a failure at 100TB even when row counts
match (SURVEY.md §4).
"""

from __future__ import annotations

import contextlib
import io

from kafka_connect_bigquery_storage_write_spark.queries import QUERIES, load_all

load_all()


def _plan(spark, sf_dir, name: str) -> str:
    df = QUERIES[name](spark, sf_dir)
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_q01_filter_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q01_pricing_summary")
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # column pruning: the scan must not read join keys it doesn't need
    read_schema = [l for l in plan.splitlines() if "ReadSchema" in l][0]
    assert "l_orderkey" not in read_schema and "l_partkey" not in read_schema


def test_q03_dimension_joins_broadcast(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q03_shipping_priority")
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan  # lineitem must never sort-merge here
    # the segment filter must reach the customer scan
    assert "EqualTo(c_mktsegment,BUILDING)" in plan


def test_q05_star_join_no_fact_shuffle(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q05_supplier_region_volume")
    # formatted plans list each node in both tree and detail sections
    assert plan.count("BroadcastHashJoin") >= 3
    assert "SortMergeJoin" not in plan
    assert "EqualTo(r_name,ASIA)" in plan


def test_q12_topk_never_global_sorts(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q12_top_orders")
    assert "TakeOrderedAndProject" in plan
    # a global Sort exchange would be O(n log n) over the full relation
    assert "rangepartitioning" not in plan.lower()


def test_q06_all_predicates_pushed(spark, sf_dir):
    plan = _plan(spark, sf_dir, "q06_forecast_revenue")
    pushed = [l for l in plan.splitlines() if "PushedFilters" in l][0]
    for key in ("l_shipdate", "l_discount", "l_quantity"):
        assert key in pushed, f"{key} missing from PushedFilters: {pushed}"
