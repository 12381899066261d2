"""Wave-39 operators: cumulative-gains/lift table (mleval.gains_table)
and Wilson conversion intervals (abtest.conversion_ci)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from grass_spark.operators.abtest import conversion_ci
from grass_spark.operators.mleval import gains_table

T = dt.datetime


def _scored(spark, rows):
    return spark.createDataFrame(rows, "score double, label int")


def test_gains_perfect_separation(spark):
    # scores 1..20, positives = top 10 exactly; 4 bands of 5
    rows = [(float(i), 1 if i > 10 else 0) for i in range(1, 21)]
    out = {r.band: r for r in gains_table(
        _scored(spark, rows), n_buckets=4, checkpoint=False).collect()}
    assert [out[b].n for b in (1, 2, 3, 4)] == [5, 5, 5, 5]
    assert out[1].n_pos == 5 and out[2].n_pos == 5
    assert out[3].n_pos == 0 and out[4].n_pos == 0
    assert out[1].cum_capture == 0.5 and out[2].cum_capture == 1.0
    assert out[1].cum_lift == 2.0      # 5/5 vs base rate 1/2
    assert out[4].cum_lift == 1.0      # whole population
    assert out[1].pos_rate == 1.0 and out[4].pos_rate == 0.0


def test_gains_ties_share_a_band(spark):
    # all scores identical: one band holds everything (band = n_buckets
    # since no threshold is strictly below the score)
    rows = [(7.0, i % 2) for i in range(10)]
    out = gains_table(
        _scored(spark, rows), n_buckets=5, checkpoint=False).collect()
    assert len(out) == 1
    r = out[0]
    assert r.band == 5 and r.n == 10 and r.n_pos == 5
    assert r.cum_capture == 1.0 and r.cum_lift == 1.0


def test_gains_bad_buckets_raises(spark):
    with pytest.raises(ValueError, match="n_buckets"):
        gains_table(_scored(spark, [(1.0, 1)]), n_buckets=1)


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string"
    )


def _wilson(conv, n, z=1.959964):
    p = conv / n
    denom = 1.0 + z * z / n
    center = (p + z * z / (2.0 * n)) / denom
    half = z * math.sqrt(p * (1.0 - p) / n + z * z / (4.0 * n * n)) / denom
    return round(center - half, 6), round(center + half, 6)


def test_conversion_ci_matches_closed_form(spark):
    rows = []
    for u in range(40):
        rows.append((u * 2, T(2024, 1, 1), u, "view"))
        if u % 4 == 0:
            rows.append((u * 2 + 1, T(2024, 1, 2), u, "purchase"))
    out = conversion_ci(_ev(spark, rows)).collect()
    assert {r.variant for r in out} <= {"A", "B"}
    for r in out:
        lo, hi = _wilson(r.n_conv, r.n_users)
        assert (r.ci_lo, r.ci_hi) == (lo, hi)
        assert r.rate == round(r.n_conv / r.n_users, 6)
        # Wilson never leaves [0, 1] even at extreme rates
        assert 0.0 <= r.ci_lo <= r.ci_hi <= 1.0


def test_conversion_ci_zero_conversions_interval_positive(spark):
    rows = [(u, T(2024, 1, 1), u, "view") for u in range(10)]
    out = conversion_ci(_ev(spark, rows)).collect()
    for r in out:
        assert r.n_conv == 0 and r.rate == 0.0
        assert r.ci_lo == 0.0 and r.ci_hi > 0.0  # not a point at zero
