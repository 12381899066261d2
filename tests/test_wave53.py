"""Wave-53 operators: Kish effective sample size (sampling.ess_report)
and the weight-clipping diagnostic (sampling.clip_report)."""

from __future__ import annotations

import datetime as dt

import pytest

from grass_spark.operators.sampling import clip_report, ess_report

T = dt.datetime


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string, value double"
    )


def test_ess_closed_form(spark):
    rows = [
        (0, T(2024, 1, 1), 1, "a", 1.0),
        (1, T(2024, 1, 1), 1, "a", 1.0),   # equal weights: ess = n
        (2, T(2024, 1, 1), 1, "b", 1.0),
        (3, T(2024, 1, 1), 1, "b", 3.0),   # skewed: (400)^2/100^2+300^2
        (4, T(2024, 1, 1), 1, "b", 0.0),   # excluded
        (5, T(2024, 1, 1), 1, "b", None),  # excluded
    ]
    out = {r.group: r for r in ess_report(
        _ev(spark, rows), group_col="event_type", weight_col="value"
    ).collect()}
    assert out["a"].ess == 2.0 and out["a"].ess_ratio == 1.0
    assert out["b"].n == 2 and out["b"].n_excluded == 2
    assert out["b"].ess == round(400.0 ** 2 / (100.0 ** 2 + 300.0 ** 2), 6)


def test_clip_report_flattens_tail(spark):
    # 99 weights of 1.0 plus one of 1000: clipping at p99 slashes the
    # dominance and ESS jumps
    rows = [(i, T(2024, 1, 1), 1, "a", 1.0) for i in range(99)] + [
        (99, T(2024, 1, 1), 1, "a", 1000.0)
    ]
    out = clip_report(
        _ev(spark, rows), weight_col="value", clip_prob=0.99
    ).collect()[0]
    assert out.n == 100
    assert out.frac_clipped == 0.01     # only the huge weight clips
    assert out.ess_clipped > out.ess_raw * 5
    assert out.clip_threshold < 1000.0


def test_clip_report_bad_prob(spark):
    with pytest.raises(ValueError, match="clip_prob"):
        clip_report(
            _ev(spark, [(0, T(2024, 1, 1), 1, "a", 1.0)]),
            weight_col="value", clip_prob=1.0,
        )
