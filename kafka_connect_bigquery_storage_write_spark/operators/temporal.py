"""Temporal join operators Spark lacks natively: as-of join, range join.

As-of join is implemented as a composition of existing DataFrame ops (the
SURVEY-preferred strategy): union both sides, one shuffle on the join key,
one sort per partition, and a last-non-null window — O(n log n) per key
group, no point-lookup loops, no range explosion. This is the same plan
shape a native as-of operator would produce.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    left_ts: str,
    right_ts: str,
    right_payload: list[str],
    how: str = "inner",
) -> DataFrame:
    """For each left row, the latest right row with right_ts <= left_ts,
    matched within the ``by`` key (backward as-of join, ties match).

    Mechanics: tag + union both sides, window-sort by (ts, right-first),
    carry the right payload forward as one struct via last(ignorenulls)
    — the struct keeps multi-column payloads atomic (per-column lasts
    could mix rows when payload fields are legitimately null).

    Scale: exactly one shuffle (by key) and one within-partition sort —
    the same cost as a single sort-merge join, independent of how many
    left rows share a right match.
    """
    if how not in ("inner", "left"):
        raise ValueError("asof_join supports inner/left")
    payload = F.struct(*[F.col(c) for c in right_payload])
    r = right.select(
        F.col(by).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_is_right"),
        payload.alias("_payload"),
    )
    left_cols = left.columns
    l = left.select(
        F.col(by).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_is_right"),
        F.lit(None).cast(r.schema["_payload"].dataType).alias("_payload"),
        *[F.col(c).alias(f"_l_{c}") for c in left_cols],
    )
    r_aligned = r.select("_k", "_ts", "_is_right", "_payload", *[F.lit(None).cast(left.schema[c].dataType).alias(f"_l_{c}") for c in left_cols])
    unioned = l.unionByName(r_aligned)
    # right rows sort before left rows at equal ts so ties match (>= semantics)
    w = W.partitionBy("_k").orderBy(F.col("_ts"), F.col("_is_right").desc()).rowsBetween(W.unboundedPreceding, W.currentRow)
    matched = unioned.withColumn("_match", F.last("_payload", ignorenulls=True).over(w)).filter(F.col("_is_right") == 0)
    if how == "inner":
        matched = matched.filter(F.col("_match").isNotNull())
    return matched.select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols],
        *[F.col(f"_match.{c}").alias(c) for c in right_payload],
    )
