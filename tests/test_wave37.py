"""Wave-37 operators: per-state occupancy time (occupancy.py) and
Cohen's kappa agreement (agreement.py)."""

from __future__ import annotations

import datetime as dt

from grass_spark.operators.agreement import cohens_kappa
from grass_spark.operators.occupancy import state_occupancy

T = dt.datetime


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string"
    )


def test_occupancy_closed_form(spark):
    rows = [
        (0, T(2024, 1, 1, 0, 0, 0), 1, "a"),
        (1, T(2024, 1, 1, 0, 0, 10), 1, "b"),
        (2, T(2024, 1, 1, 0, 0, 25), 1, "a"),  # last: opens no interval
        (3, T(2024, 1, 1, 0, 0, 0), 2, "c"),   # lone event: nothing
    ]
    out = {r.state: r for r in state_occupancy(_ev(spark, rows)).collect()}
    assert set(out) == {"a", "b"}
    assert out["a"].n_intervals == 1 and out["a"].total_s == 10.0
    assert out["b"].n_intervals == 1 and out["b"].total_s == 15.0
    assert out["a"].share == 0.4 and out["b"].share == 0.6


def test_occupancy_cross_bucket_stitch_matches_finer_bucket(spark):
    # the x interval crosses the day boundary: 23:00 -> 01:00 next day
    rows = [
        (0, T(2024, 1, 1, 23, 0, 0), 1, "x"),
        (1, T(2024, 1, 2, 1, 0, 0), 1, "y"),
        (2, T(2024, 1, 2, 2, 0, 0), 1, "z"),
    ]
    day = {r.state: r for r in state_occupancy(
        _ev(spark, rows), bucket="day").collect()}
    assert day["x"].total_s == 7200.0 and day["y"].total_s == 3600.0
    # decomposition invariance: any bucket granularity agrees
    hour = {r.state: r for r in state_occupancy(
        _ev(spark, rows), bucket="hour").collect()}
    assert {k: (v.n_intervals, v.total_s, v.share)
            for k, v in day.items()} == \
           {k: (v.n_intervals, v.total_s, v.share)
            for k, v in hour.items()}


def test_occupancy_equal_ts_tie_order(spark):
    # two events at the same instant: the lower-id state holds a
    # zero-length interval, the higher-id one holds to the next event
    rows = [
        (0, T(2024, 1, 1, 0, 0, 0), 1, "a"),
        (1, T(2024, 1, 1, 0, 0, 0), 1, "b"),
        (2, T(2024, 1, 1, 0, 1, 0), 1, "c"),
    ]
    out = {r.state: r for r in state_occupancy(_ev(spark, rows)).collect()}
    assert out["a"].n_intervals == 1 and out["a"].total_s == 0.0
    assert out["b"].n_intervals == 1 and out["b"].total_s == 60.0
    assert "c" not in out


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "a string, b string")


def test_kappa_closed_form(spark):
    out = cohens_kappa(
        _pairs(spark, [("a", "a"), ("a", "b"), ("b", "b"), ("b", "b")]),
        col_a="a", col_b="b", checkpoint=False,
    ).collect()[0]
    # n=4 agree=3; rows a:2 b:2, cols a:1 b:3 -> pes=2*1+2*3=8
    assert out.n_items == 4 and out.n_agree == 3
    assert out.po == 0.75 and out.pe == 0.5
    assert out.kappa == 0.5  # (12-8)/(16-8)


def test_kappa_perfect_and_degenerate(spark):
    perfect = cohens_kappa(
        _pairs(spark, [("a", "a"), ("b", "b")]),
        col_a="a", col_b="b", checkpoint=False,
    ).collect()[0]
    assert perfect.kappa == 1.0
    # both labelers constant on one class: 1 - pe == 0 -> NULL
    degen = cohens_kappa(
        _pairs(spark, [("a", "a"), ("a", "a")]),
        col_a="a", col_b="b", checkpoint=False,
    ).collect()[0]
    assert degen.po == 1.0 and degen.kappa is None


def test_kappa_null_labels_excluded(spark):
    out = cohens_kappa(
        _pairs(spark, [("a", "a"), (None, "b"), ("b", None)]),
        col_a="a", col_b="b", checkpoint=False,
    ).collect()[0]
    assert out.n_items == 1 and out.n_agree == 1
