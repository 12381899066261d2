"""Wave-28 operators: Theil–Sen slope, seasonal-naive eval, SCD-2 join."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.scd import scd2_join
from grass_spark.operators.trend import seasonal_naive_eval, theil_sen_daily


def _events(spark, spec):
    """spec: list of (key, day_offset, n_events)."""
    d0 = dt.datetime(2024, 1, 1)
    rows = []
    for k, off, n in spec:
        rows += [
            (k, d0 + dt.timedelta(days=off, minutes=i)) for i in range(n)
        ]
    return spark.createDataFrame(rows, "event_type string, ts timestamp")


# ---------------------------------------------------------- theil-sen
def test_theil_sen_exact_linear_series(spark):
    # counts 2, 4, 6, 8 on consecutive days -> every pair slope == 2
    df = _events(spark, [("a", i, 2 * (i + 1)) for i in range(4)])
    r = theil_sen_daily(df).collect()[0]
    assert r.n_days == 4 and r.n_pairs == 6 and r.slope == 2.0


def test_theil_sen_robust_to_one_outlier(spark):
    # linear slope 1 with one wild day: the MEDIAN pair slope stays
    # near 1 while the OLS slope would be dragged up
    spec = [("a", i, 10 + i) for i in range(9)] + [("a", 9, 500)]
    r = theil_sen_daily(_events(spark, spec)).collect()[0]
    assert abs(r.slope - 1.0) < 0.75


def test_theil_sen_single_day_null(spark):
    r = theil_sen_daily(_events(spark, [("a", 0, 5)])).collect()[0]
    assert r.n_days == 1 and r.n_pairs == 0 and r.slope is None


# ------------------------------------------------------ seasonal naive
def test_seasonal_naive_exact_errors(spark):
    # week 1: 10 each day; week 2: 13 each day -> |err| = 3 on 7 days
    spec = [("a", i, 10) for i in range(7)] + [
        ("a", 7 + i, 13) for i in range(7)
    ]
    r = seasonal_naive_eval(_events(spark, spec)).collect()[0]
    assert r.n_eval_days == 7
    assert r.mae == 3.0 and r.rmse == 3.0
    assert abs(r.mape - 3.0 / 13.0) < 1e-6


def test_seasonal_naive_skips_missing_lag_days(spark):
    # day 8 has data, day 1 (its lag) does not -> day 8 not evaluated
    spec = [("a", 0, 10), ("a", 7, 12), ("a", 8, 99)]
    r = seasonal_naive_eval(_events(spark, spec)).collect()[0]
    assert r.n_eval_days == 1 and r.mae == 2.0
    with pytest.raises(ValueError):
        seasonal_naive_eval(_events(spark, spec), season_days=0)


# ------------------------------------------------------------- scd2
def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, seg string, valid_from date, valid_to date"
    )


def test_scd2_join_picks_effective_version(spark):
    dim = _dim(
        spark,
        [
            (1, "OLD", dt.date(2020, 1, 1), dt.date(2022, 1, 1)),
            (1, "NEW", dt.date(2022, 1, 1), dt.date(2099, 1, 1)),
            (2, "ONLY", dt.date(2021, 1, 1), dt.date(2021, 6, 1)),
        ],
    )
    fact = spark.createDataFrame(
        [
            (1, dt.date(2021, 12, 31), 100),
            (1, dt.date(2022, 1, 1), 200),   # boundary: [from, to)
            (2, dt.date(2021, 3, 1), 300),
            (2, dt.date(2023, 1, 1), 400),   # orphan (window expired)
        ],
        "k bigint, od date, v int",
    )
    inner = scd2_join(fact, dim, "k", ts_col="od").collect()
    got = {(r.v, r.seg) for r in inner}
    assert got == {(100, "OLD"), (200, "NEW"), (300, "ONLY")}
    left = scd2_join(fact, dim, "k", ts_col="od", how="left").collect()
    assert {(r.v, r.seg) for r in left} == got | {(400, None)}


def test_scd2_join_validate_catches_overlap(spark):
    dim = _dim(
        spark,
        [
            (1, "A", dt.date(2020, 1, 1), dt.date(2022, 1, 1)),
            (1, "B", dt.date(2021, 6, 1), dt.date(2099, 1, 1)),  # overlap
        ],
    )
    fact = spark.createDataFrame(
        [(1, dt.date(2021, 12, 1), 1)], "k bigint, od date, v int"
    )
    with pytest.raises(Exception):
        scd2_join(fact, dim, "k", ts_col="od", validate=True).collect()
    # clean windows pass validation
    ok = _dim(
        spark,
        [
            (1, "A", dt.date(2020, 1, 1), dt.date(2022, 1, 1)),
            (1, "B", dt.date(2022, 1, 1), dt.date(2099, 1, 1)),
        ],
    )
    out = scd2_join(fact, ok, "k", ts_col="od", validate=True).collect()
    assert len(out) == 1 and out[0].seg == "A"
    with pytest.raises(ValueError):
        scd2_join(fact, ok, "k", ts_col="od", how="full")
