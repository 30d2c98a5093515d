"""Pins for queries/quality.py constructions that the oracle-parity gate
can't distinguish from coincidence: the Poisson-bootstrap weight ladder
must encode the Poisson(1) CDF exactly (both engines compare against the
same literals, so an edited literal would stay parity-green while
silently changing the resampling distribution)."""

from __future__ import annotations

import math

from kafka_connect_bigquery_storage_write_spark.queries.quality import _BOOT_R, _POISSON_THRESHOLDS


def test_poisson_thresholds_match_analytic_cdf():
    """Each threshold is floor(P(X <= k) * 16^6) for X ~ Poisson(1)."""
    M = 16**6
    cdf = 0.0
    term = math.exp(-1.0)
    for k, t in enumerate(_POISSON_THRESHOLDS):
        cdf += term
        assert t == math.floor(cdf * M), (k, t, math.floor(cdf * M))
        term /= k + 1


def test_poisson_weight_mean_is_one_ish():
    """The capped ladder's expected weight under a uniform 24-bit hash
    stays within 0.1% of 1.0 — the property that makes the Poisson
    bootstrap an unbiased resample in expectation. Computed exactly from
    the integer bucket widths, no sampling."""
    M = 16**6
    bounds = (0,) + _POISSON_THRESHOLDS + (M,)
    expected = sum(k * (bounds[k + 1] - bounds[k]) for k in range(len(bounds) - 1)) / M
    assert abs(expected - 1.0) < 1e-3, expected


def test_ci_order_statistics_are_inside_replicate_range():
    """Ranks 6 and 195 must exist for the configured replicate count."""
    assert _BOOT_R == 200
    assert 6 <= _BOOT_R and 195 <= _BOOT_R
