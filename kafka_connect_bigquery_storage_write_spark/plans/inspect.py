"""Physical-plan inspection utilities (SURVEY.md §4).

The engine's optimizer story is "let Catalyst do it" — these helpers make
the resulting plans assertable, so the properties that matter at 100TB
(pushdown, broadcast, no accidental global sorts) are pinned by tests and
checkable by users tuning their own queries.
"""

from __future__ import annotations

import contextlib
import io

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def assert_pushed_filters(df: DataFrame, *fragments: str) -> None:
    """Assert each fragment appears in some scan's PushedFilters."""
    plan = formatted_plan(df)
    pushed = "\n".join(line for line in plan.splitlines() if "PushedFilters" in line)
    missing = [f for f in fragments if f not in pushed]
    if missing:
        raise AssertionError(f"filters not pushed to scan: {missing}\n{pushed}")


def assert_broadcast_join(df: DataFrame, min_count: int = 1) -> None:
    plan = formatted_plan(df)
    # formatted plans list nodes in both the tree and the detail section
    n = plan.count("BroadcastHashJoin") + plan.count("BroadcastNestedLoopJoin")
    if n < min_count:
        raise AssertionError(f"expected >= {min_count} broadcast joins, plan has {n}:\n{plan[:2000]}")


def assert_no_sort_merge_join(df: DataFrame) -> None:
    plan = formatted_plan(df)
    if "SortMergeJoin" in plan:
        raise AssertionError(f"plan contains a SortMergeJoin:\n{plan[:2000]}")
