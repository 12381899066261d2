"""Wave-36 operators: lagged daily cross-correlation (ccf.py) and
next-event conditional entropy (transitions.transition_entropy)."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from grass_spark.operators.ccf import cross_correlation
from grass_spark.operators.transitions import transition_entropy

T = dt.datetime


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string"
    )


def _np_ccf(xs, ys, lag):
    x = xs[: len(xs) - lag]
    y = ys[lag:]
    n = len(x)
    sx, sy = sum(x), sum(y)
    sxy = sum(a * b for a, b in zip(x, y))
    sxx = sum(a * a for a in x)
    syy = sum(b * b for b in y)
    den = math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy)
    return None if den <= 0 else round((n * sxy - sx * sy) / den, 6)


def test_ccf_matches_closed_form_with_gap_densify(spark):
    # clicks on days 1..6 (day 4 has none -> zero), purchases lag by 1
    rows = []
    eid = 0
    clicks = {1: 3, 2: 1, 3: 4, 5: 2, 6: 5}  # day 4 missing
    for d, c in clicks.items():
        for _ in range(c):
            rows.append((eid, T(2024, 1, d, 12), 1, "click"))
            eid += 1
        for _ in range(c):
            rows.append((eid, T(2024, 1, d + 1, 12), 1, "purchase"))
            eid += 1
    rows.append((eid, T(2024, 1, 3), 2, "view"))  # other type ignored
    out = {
        r.lag: r
        for r in cross_correlation(
            _ev(spark, rows), type_x="click", type_y="purchase",
            max_lag=3, checkpoint=False,
        ).collect()
    }
    # grid spans day1..day7: x = [3,1,4,0,2,5,0], y shifted +1
    xs = [3, 1, 4, 0, 2, 5, 0]
    ys = [0, 3, 1, 4, 0, 2, 5]
    for lag in range(4):
        assert out[lag].n_days == 7 - lag
        assert out[lag].r == _np_ccf(xs, ys, lag), lag
    # perfect lead-lag: correlation at lag 1 is exactly 1
    assert out[1].r == 1.0


def test_ccf_constant_series_is_null(spark):
    rows = [
        (i, T(2024, 1, 1 + i), 1, t)
        for i, t in enumerate(["click", "click", "click"])
    ] + [(10 + i, T(2024, 1, 1 + i), 1, "purchase") for i in range(3)]
    out = cross_correlation(
        _ev(spark, rows), type_x="click", type_y="purchase",
        max_lag=1, checkpoint=False,
    ).collect()
    assert all(r.r is None for r in out)  # both series constant 1/day


def test_ccf_negative_lag_raises(spark):
    with pytest.raises(ValueError, match="max_lag"):
        cross_correlation(
            _ev(spark, [(1, T(2024, 1, 1), 1, "a")]),
            type_x="a", type_y="b", max_lag=-1,
        )


# ------------------------------------------------------------ entropy
def test_transition_entropy_closed_form(spark):
    # user 1: a->b, b->a, a->b, b->c  => from a: {b:2}; from b: {a:1,c:1}
    seq = ["a", "b", "a", "b", "c"]
    rows = [(i, T(2024, 1, 1, 0, i), 1, t) for i, t in enumerate(seq)]
    out = {r.from_type: r for r in transition_entropy(
        _ev(spark, rows)).collect()}
    assert out["a"].n_obs == 2 and out["a"].n_next_types == 1
    assert out["a"].entropy == 0.0  # deterministic successor
    assert out["a"].entropy_norm is None
    assert out["b"].n_obs == 2 and out["b"].n_next_types == 2
    assert out["b"].entropy == round(math.log(2), 6)
    assert out["b"].entropy_norm == 1.0  # perfectly uniform
    assert "c" not in out  # terminal event has no successor


def test_transition_entropy_per_user_streams_independent(spark):
    # the a->b of user 1 and b->a of user 2 never cross users
    rows = [
        (0, T(2024, 1, 1, 0, 0), 1, "a"),
        (1, T(2024, 1, 1, 0, 1), 1, "b"),
        (2, T(2024, 1, 1, 0, 0), 2, "b"),
        (3, T(2024, 1, 1, 0, 1), 2, "a"),
    ]
    out = {r.from_type: r for r in transition_entropy(
        _ev(spark, rows)).collect()}
    assert out["a"].n_obs == 1 and out["b"].n_obs == 1
    assert out["a"].entropy == 0.0 and out["b"].entropy == 0.0
