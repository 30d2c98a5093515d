"""Replica of the official correctness driver's result canonicalizer.

The driver compares a Spark result against a DuckDB oracle by loading both
into pandas, sorting with ``DataFrame.sort_values`` over every column, and
hashing the sorted values.  The multi-column sort path
(``lexsort_indexer`` -> ``Categorical`` -> ``factorize``) raises
``TypeError: unhashable type: 'list'`` on list/array-typed cells — which is
exactly how q93/q96 shipped officially red in round 4 while the old
string-normalizing local sim passed them.

Both ``tools/driver_sim.py`` and ``tests/test_oracle_parity.py`` import
this module so that local green predicts official green: any query whose
result the official driver cannot canonicalize fails identically here.
"""

from __future__ import annotations

import math

import pandas as pd


def norm(v):
    """Pre-sort normalization: NaN to a sentinel string, floats to 6dp."""
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6)
    return v


def rowset(rows, cols):
    """Canonicalize a result the way the official driver does.

    Raises ``TypeError`` on list/array/dict-typed cells (driver parity —
    complex-typed output columns are a registry bug, not a tolerable
    variation).  Returns a list of tuples with columns in sorted-name
    order and rows in lexicographic order, missing values mapped to the
    ``"NaN"`` sentinel so tuple equality is well-defined.
    """
    order = sorted(cols)
    df = pd.DataFrame([tuple(norm(v) for v in r) for r in rows], columns=list(cols))[order]
    if len(df):
        df = df.sort_values(by=order, kind="mergesort")

    def _post(v):
        if v is None or (isinstance(v, float) and math.isnan(v)):
            return "NaN"
        return v

    return [tuple(_post(v) for v in r) for r in df.itertuples(index=False, name=None)]
