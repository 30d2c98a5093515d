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
    direction: str = "backward",
) -> DataFrame:
    """For each left row, the latest right row with right_ts <= left_ts
    (``direction="backward"``, the default; ties match) or the earliest
    right row with right_ts >= left_ts (``direction="forward"``) —
    matched within the ``by`` key. Both directions are the SAME one
    shuffle + one sort; forward flips the tie order and reads the
    following frame instead of the preceding one. (The "nearest"
    variant composes the two — see q191.)

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
    if direction not in ("backward", "forward"):
        raise ValueError("asof_join direction must be backward|forward")
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
    if direction == "backward":
        # right rows sort before left rows at equal ts so ties match (>= semantics)
        w = W.partitionBy("_k").orderBy(F.col("_ts"), F.col("_is_right").desc()).rowsBetween(W.unboundedPreceding, W.currentRow)
        match_expr = F.last("_payload", ignorenulls=True).over(w)
    else:
        # right rows sort after left rows at equal ts so the current-row-
        # anchored following frame still sees an equal-ts right (ties match)
        w = W.partitionBy("_k").orderBy(F.col("_ts"), F.col("_is_right").asc()).rowsBetween(W.currentRow, W.unboundedFollowing)
        match_expr = F.first("_payload", ignorenulls=True).over(w)
    matched = unioned.withColumn("_match", match_expr).filter(F.col("_is_right") == 0)
    if how == "inner":
        matched = matched.filter(F.col("_match").isNotNull())
    return matched.select(
        *[F.col(f"_l_{c}").alias(c) for c in left_cols],
        *[F.col(f"_match.{c}").alias(c) for c in right_payload],
    )


def sessionize(
    df: DataFrame,
    key: str,
    ts_col: str,
    gap_seconds: int,
) -> DataFrame:
    """Assign gap-based session numbers per key (batch sessionization —
    the offline analog of E17's session_window).

    A session break happens where the time since the previous event of the
    same key exceeds ``gap_seconds``; the session number is the running
    count of breaks. One shuffle on the key, one within-partition sort,
    two window passes over the same (key, ts) sort order — Catalyst
    collapses them into a single Window exchange+sort.

    Gap comparison is in exact integer MICROSECONDS (unix_micros), never
    float seconds, so engines cannot disagree on borderline gaps.
    Adds column ``session_seq`` (1-based int) to ``df``.
    """
    w = W.partitionBy(key).orderBy(ts_col)
    # NTZ -> TZ cast is identity under the engine's UTC session timezone
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    prev_us = F.lag(us).over(w)
    is_break = F.when(prev_us.isNull() | (us - prev_us > gap_seconds * 1_000_000), 1).otherwise(0)
    run = W.partitionBy(key).orderBy(ts_col).rowsBetween(W.unboundedPreceding, W.currentRow)
    return df.withColumn("session_seq", F.sum(is_break).over(run).cast("int"))
