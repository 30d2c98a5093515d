"""Skew mitigation (SURVEY.md scale mandate): salting for hot keys.

AQE's skew-join handling (on in session.py) covers sort-merge joins at
runtime; these utilities cover the cases AQE can't re-plan — skewed
aggregations and broadcast-averse joins — with explicit salt columns.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from kafka_connect_bigquery_storage_write_spark.sources.tables import local_rows_df


def salted_agg(
    df: DataFrame,
    key_cols: list[str],
    aggs: dict[str, str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Two-stage aggregation through a salt: (key, salt) partial -> key final.

    For decomposable aggregates (sum/count/min/max) on a skewed key, the
    first stage spreads each hot key over ``salt_buckets`` reducers, the
    second combines the partials — the classic fix when one key holds 10%
    of a 100TB table. (Spark's own partial aggregation already does this
    when the map side can combine; explicit salting matters when the
    grouping cardinality is low AND skewed, defeating hash-partition
    balance.)

    aggs: {column: 'sum'|'count'|'min'|'max'} — decomposable only.

    The salt here is deliberately replay-UNSTABLE (partition id + row
    position): decomposable aggregates are salt-invariant — any bucket
    assignment combines to the identical final value — so instability is
    harmless and the salt stays a cheap narrow expression that spreads
    even byte-identical duplicate rows. Do NOT copy this salt into join
    salting: ``salted_join`` must place a row in the SAME bucket on every
    replay and therefore uses a row-content hash instead.
    """
    combiner = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    for fn in aggs.values():
        if fn not in combiner:
            raise ValueError(f"{fn!r} is not decomposable-salting-safe; use sum/count/min/max")
    first = {"sum": F.sum, "count": F.count, "min": F.min, "max": F.max}
    salted = df.withColumn("_salt", F.pmod(F.spark_partition_id() + F.monotonically_increasing_id(), F.lit(salt_buckets)))
    partial = salted.groupBy(*key_cols, "_salt").agg(
        *[first[fn](c).alias(f"_p_{c}") for c, fn in aggs.items()]
    )
    return partial.groupBy(*key_cols).agg(
        *[combiner[fn](f"_p_{c}").alias(f"{fn}_{c}") for c, fn in aggs.items()]
    )


def salted_join(
    skewed: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the skewed side, replicate the other.

    The skewed side's salt is a hash of the whole row, NOT rand(): rand
    is seeded per-partition, so a retried task whose upstream row order
    shifted would re-draw different salts — replay-unstable plans. A
    row-content hash assigns every row the same bucket on every replay
    while still spreading a hot key's (non-identical) rows across
    buckets. The small side is exploded ``buckets`` times so every
    (key, salt) finds its partner. Use when the build side is too big to
    broadcast but the probe side has hot keys; replication factor =
    salt_buckets, so size the bucket count to the skew ratio, not higher.

    Limitation: rows that are byte-identical duplicates hash to ONE salt
    bucket, so a hot key made of identical rows gets no spreading (a
    correctness-preserving worst case, same as unsalted). If that shape
    is expected, deduplicate first (identical rows join identically — a
    count column reconstructs multiplicity after the join) or extend the
    hash with a stable per-row ordinal from the source (e.g. kafka
    offset, file row index); a synthetic ordinal would reintroduce the
    replay instability this hash exists to avoid.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (skewed side preserved)")
    salted = skewed.withColumn(
        "_salt", F.pmod(F.xxhash64(*[F.col(c) for c in skewed.columns]), F.lit(salt_buckets)).cast("int")
    )
    replicated = small.withColumn("_salt", F.explode(F.sequence(F.lit(0), F.lit(salt_buckets - 1))))
    out = salted.join(replicated, [key, "_salt"], how)
    return out.drop("_salt")


def skew_profile(df: DataFrame, key_cols: list[str], top_n: int = 10) -> DataFrame:
    """Key-frequency profile: the diagnostic before choosing a strategy.
    Returns the top-N keys with count and share of total."""
    total = df.count()
    return (
        df.groupBy(*key_cols)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .withColumn("share", F.round(F.col("n_rows") / F.lit(total), 6))
        .orderBy(F.col("n_rows").desc())
        .limit(top_n)
    )


def heavy_hitters(df: DataFrame, col: str, support: float = 0.01) -> DataFrame:
    """Exact heavy hitters at ``support`` frequency via sketch-then-verify.

    Pass 1: ``freqItems`` (Spark's Misra-Gries streaming summary, ~1/support
    counters per partition, merged JVM-side) yields a candidate set with NO
    false negatives — every key above the support threshold is guaranteed
    present. Pass 2 computes exact counts for the (bounded, <= ~1/support)
    candidates only and applies the exact threshold, discarding the
    sketch's false positives. Output is therefore EXACT while never
    grouping the full key space: the only per-key state is the candidate
    list, driver-bounded by construction.

    Columns: <col>, n_rows, share (6dp). share/threshold use the exact
    row count.
    """
    if not (0 < support < 1):
        raise ValueError("support must be in (0, 1)")
    total = df.count()
    # sketch at slightly-below support: freqItems' no-false-negative
    # guarantee covers items with frequency STRICTLY GREATER than its
    # support argument, while pass 2 applies >= — a key sitting exactly on
    # the boundary must still be in the candidate set
    candidates = df.freqItems([col], support * 0.99).first()[0]
    threshold = support * total
    # broadcast semi-join, not isin(list): an In-literal list grows toward
    # 1/support entries and bloats the plan at small support; a broadcast
    # hash semi-join stays flat at any candidate count
    cand_schema = T.StructType([df.schema[col]])
    cand_df = local_rows_df(df.sparkSession, [(c,) for c in candidates], cand_schema)
    return (
        df.join(F.broadcast(cand_df), col, "left_semi")
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("n_rows"))
        .filter(F.col("n_rows") >= threshold)
        .withColumn("share", F.round(F.col("n_rows") / F.lit(total), 6))
    )
