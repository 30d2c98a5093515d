"""Bounded-wait accessor for Observation metrics riding an eager
localCheckpoint (ADVICE r14).

The round-14 optimization rides each iterative loop's convergence probe
on the generation checkpoint as an observed metric — verified live on
Spark 4.1.2 (``Observation`` metrics ARE delivered for the checkpoint's
internal action). That delivery is an internal behavior, not a
documented contract, and ``Observation.get`` blocks indefinitely: if a
future Spark release stops delivering metrics on checkpoint (cf.
historical CollectMetrics gaps like SPARK-35695), every loop — and its
tests — would hang forever instead of failing fast.

``observed_metrics`` therefore waits a BOUNDED time for delivery (normal
case: already delivered, or within milliseconds — the listener bus is
asynchronous), and on timeout degrades to the explicit probe aggregate
over the already-checkpointed generation: the slower-but-correct
pre-round-14 path, costing one extra O(V) action per round instead of a
deadlock.
"""

from __future__ import annotations

import time

from pyspark.sql import Column, DataFrame, Observation


def observed_metrics(
    obs: Observation,
    checkpointed: DataFrame,
    *fallback_aggs: Column,
    timeout_s: float = 30.0,
) -> dict:
    """Metrics of ``obs`` (attached upstream of an eager localCheckpoint
    that has ALREADY run), or — if delivery never happens within
    ``timeout_s`` — the same values recomputed as one explicit aggregate
    action over the checkpointed frame. ``fallback_aggs`` must alias the
    exact metric names the caller reads."""
    jo = getattr(obs, "_jo", None)
    if jo is not None:
        deadline = time.monotonic() + float(timeout_s)
        while True:
            try:
                ready = jo.getRowOrEmpty().isDefined()
            except Exception:
                break  # JVM surface changed: degrade to the explicit probe
            if ready:
                return obs.get
            if time.monotonic() >= deadline:
                break
            time.sleep(0.005)
    # not delivered (or observe was never attached): pre-r14 probe action
    return checkpointed.agg(*fallback_aggs).first().asDict()
