"""Custom stateful streaming operators (SURVEY.md E18 scale path).

When windowed/dedup built-ins can't express the state machine, Structured
Streaming's applyInPandasWithState gives an explicit per-key state cell
with watermark-driven timeout — the Spark analogue of the reference's
per-partition writer state (buffered offsets, inflight appends), except
fault-tolerant via the checkpoint instead of the Phaser/TreeSet machinery
(reference: BigqueryStreamWriter.java:56-58, BigqueryStorageWriteSinkTask.java:32).
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_OUTPUT = "user_id long, n_events long, sum_value double"
RUNNING_TOTALS_STATE = "n long, s double"


def _running_totals_fn(
    key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (n, s) = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        s += float(pdf["value"].sum())
    state.update((n, s))
    yield pd.DataFrame({"user_id": [key[0]], "n_events": [n], "sum_value": [round(s, 2)]})


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (count, sum) maintained as explicit streaming state.

    Emits the updated totals for each user touched by each micro-batch —
    the accumulator pattern every custom sessionizer/counter builds on.
    State size is O(distinct users), bounded in production by a processing
    -time timeout; NoTimeout here keeps the fixture tests deterministic.
    """
    return (
        events.groupBy("user_id")
        .applyInPandasWithState(
            _running_totals_fn,
            outputStructType=RUNNING_TOTALS_OUTPUT,
            stateStructType=RUNNING_TOTALS_STATE,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
