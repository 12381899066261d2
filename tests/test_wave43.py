"""Wave-43 operators: leakage-free churn labels (churn.churn_labels)
and the exact-cent equal-width histogram (profile.value_histogram)."""

from __future__ import annotations

import datetime as dt

import pytest

from grass_spark.operators.churn import churn_labels
from grass_spark.operators.profile import value_histogram

T = dt.datetime


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string"
    )


def test_churn_label_semantics(spark):
    rows = [
        (0, T(2024, 1, 5), 1, "a"),   # user 1: active before AND after
        (1, T(2024, 1, 12), 1, "a"),
        (2, T(2024, 1, 8), 2, "a"),   # user 2: silent after -> churned
        (3, T(2024, 1, 8, 6), 2, "a"),
        (4, T(2024, 1, 15), 3, "a"),  # user 3: first seen after cutoff
        (5, T(2024, 1, 25), 2, "a"),  # beyond window: must NOT rescue 2
    ]
    out = {r.user_id: r for r in churn_labels(
        _ev(spark, rows), "2024-01-10", window_days=10).collect()}
    assert set(out) == {1, 2}          # user 3 has no pre-cutoff history
    assert out[1].churned == 0
    assert out[2].churned == 1         # Jan 25 is outside [10, 20)
    assert out[2].n_events_before == 2
    assert out[2].n_active_days_before == 1   # both events on Jan 8
    assert out[2].recency_days == 2
    assert str(out[1].last_seen_day) == "2024-01-05"


def test_churn_bad_window_raises(spark):
    with pytest.raises(ValueError, match="window_days"):
        churn_labels(_ev(spark, [(0, T(2024, 1, 1), 1, "a")]),
                     "2024-01-10", window_days=0)


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "v double")


def test_histogram_bins_and_densify(spark):
    # cents 100..500, span 401, 4 bins -> width ceil(401/4)=101
    out = value_histogram(
        _vals(spark, [1.0, 1.0, 2.0, 5.0]), value_col="v", n_bins=4
    ).collect()
    assert [r.bin for r in out] == [0, 1, 2, 3]
    assert [r.n for r in out] == [3, 0, 0, 1]     # 2.0 -> bin (200-100)//101=0
    assert out[0].lo_value == 1.0 and out[0].hi_value == 2.0
    assert out[3].hi_value >= 5.0


def test_histogram_constant_column_single_bin(spark):
    out = value_histogram(
        _vals(spark, [7.5, 7.5]), value_col="v", n_bins=10
    ).collect()
    assert len(out) == 1
    assert out[0].n == 2 and out[0].lo_value == 7.5


def test_histogram_bad_bins_raises(spark):
    with pytest.raises(ValueError, match="n_bins"):
        value_histogram(_vals(spark, [1.0]), value_col="v", n_bins=0)
