"""Granularity machinery vs the reference's doctest expectations (F4)."""

from __future__ import annotations

from datetime import datetime

import pytest

from grass_spark.functions.granularity import (
    adjust_datetime_to_granularity,
    bucket_end_col,
    bucket_start_col,
    compute_datetime_delta,
    granule_series,
    increment_datetime,
    infer_granularity_absolute,
    infer_granularity_relative,
    parse_granularity,
)

dt = datetime


# --- adjust_datetime_to_granularity (datetime_math.py doctests) -----------


@pytest.mark.parametrize(
    ("gran", "expected"),
    [
        ("5 seconds", dt(2001, 8, 8, 12, 30, 30)),
        ("20 minutes", dt(2001, 8, 8, 12, 30)),
        ("3 hours", dt(2001, 8, 8, 12, 0)),
        ("5 days", dt(2001, 8, 8)),
        ("2 weeks", dt(2001, 8, 6)),  # Monday
        ("6 months", dt(2001, 8, 1)),
        ("2 years", dt(2001, 1, 1)),
    ],
)
def test_adjust_to_granularity(gran, expected):
    assert adjust_datetime_to_granularity(dt(2001, 8, 8, 12, 30, 30), gran) == expected


# --- increment (datetime_math.py:128-199 doctests) -------------------------


@pytest.mark.parametrize(
    ("start", "gran", "mult", "expected"),
    [
        (dt(2001, 11, 1), "1 month", 1, dt(2001, 12, 1)),
        (dt(2001, 11, 1), "13 months", 1, dt(2002, 12, 1)),
        (dt(2001, 1, 1), "72 months", 1, dt(2007, 1, 1)),
        (dt(2001, 1, 1), "5 minutes", 1, dt(2001, 1, 1, 0, 5)),
        (dt(2001, 1, 1), "49 hours", 1, dt(2001, 1, 3, 1, 0)),
        (dt(2001, 1, 1), "3600 seconds", 1, dt(2001, 1, 1, 1, 0)),
        (dt(2001, 1, 1), "30 days", 1, dt(2001, 1, 31)),
        (dt(2001, 1, 1), "1 month", 3, dt(2001, 4, 1)),
        (dt(2001, 1, 1), "1 year", 2, dt(2003, 1, 1)),
    ],
)
def test_increment(start, gran, mult, expected):
    assert increment_datetime(start, gran, mult) == expected


# --- compute_datetime_delta (spot checks of the reference doctests) --------


@pytest.mark.parametrize(
    ("s", "e", "key", "val"),
    [
        (dt(2001, 1, 1, 0, 0, 14), dt(2001, 1, 1, 0, 0, 44), "second", 30),
        (dt(2001, 1, 1, 0, 0, 30), dt(2001, 1, 1, 0, 5, 30), "second", 300),
        (dt(2011, 10, 31, 0, 45), dt(2011, 10, 31, 12, 15), "minute", 690),
        (dt(2011, 11, 1), dt(2011, 12, 1, 1), "hour", 721),
        (dt(2011, 11, 1), dt(2011, 11, 5), "day", 4),
        (dt(2011, 1, 1), dt(2011, 2, 1), "month", 1),
        (dt(2011, 12, 1), dt(2012, 1, 1), "month", 1),
        (dt(2011, 12, 1), dt(2012, 6, 1), "month", 6),
        (dt(2011, 6, 1), dt(2021, 6, 1), "month", 120),
        (dt(2011, 6, 1), dt(2012, 6, 1, 12), "hour", 8796),
    ],
)
def test_datetime_delta(s, e, key, val):
    assert compute_datetime_delta(s, e)[key] == val


# --- granularity inference (temporal_granularity.py doctests, F4) ----------


def test_infer_months():
    assert infer_granularity_absolute([(dt(2000, 1, 1), None), (dt(2000, 2, 1), None)]) == "1 month"


def test_infer_days():
    times = [(dt(2000, 1, 1), None), (dt(2000, 1, 2), None), (dt(2000, 1, 3), None)]
    assert infer_granularity_absolute(times) == "1 day"


def test_infer_mixed_seconds():
    times = [(dt(2000, 1, 1), None), (dt(2000, 1, 2), None), (dt(2000, 5, 4, 0, 5, 30), None)]
    assert infer_granularity_absolute(times) == "30 seconds"


def test_infer_interval_plus_instant_hours():
    times = [(dt(2000, 1, 1), dt(2000, 5, 2)), (dt(2000, 5, 4, 2), None)]
    assert infer_granularity_absolute(times) == "2 hours"


def test_infer_six_hours():
    times = [(dt(2000, 1, 1), dt(2000, 2, 1)), (dt(2005, 5, 4, 12), dt(2007, 5, 20, 6))]
    assert infer_granularity_absolute(times) == "6 hours"


def test_infer_relative():
    assert infer_granularity_relative([(0, 3), (3, 6), (6, 9)]) == 3
    assert infer_granularity_relative([(0, 3), (4, 6), (8, 11)]) == 1
    assert infer_granularity_relative([(0, 21)]) == 21


# --- granule generation -----------------------------------------------------


def test_granule_series_monthly():
    g = granule_series(dt(2001, 1, 15, 12, 5, 45), dt(2001, 4, 9, 12, 5, 45), "1 month",
                       include_end_equal=False)
    # aligned start 2001-01-01; granules Jan, Feb, Mar, Apr (last instant at
    # Apr 9 still inside the April granule)
    assert g[0] == (dt(2001, 1, 1), dt(2001, 2, 1))
    assert g[-1][0] == dt(2001, 4, 1)
    assert len(g) == 4


# --- Spark bucket assignment parity with driver-side stepping ---------------


def test_bucket_start_col_matches_python(spark):
    from pyspark.sql import functions as F

    times = [
        dt(2001, 1, 15, 12, 5, 45),
        dt(2001, 1, 29, 12, 5, 45),
        dt(2001, 2, 12, 12, 5, 45),
        dt(2001, 3, 26, 12, 5, 45),
        dt(2003, 12, 31, 23, 59, 59),
    ]
    df = spark.createDataFrame([(t,) for t in times], "ts timestamp")
    for gran, origin in [
        ("1 month", dt(2001, 1, 1)),
        ("3 months", dt(2001, 1, 1)),
        ("14 days", dt(2001, 1, 1)),
        ("12 hours", dt(2001, 1, 1)),
        ("30 seconds", dt(2001, 1, 1)),
        ("2 years", dt(2001, 1, 1)),
        ("1 week", dt(2001, 1, 1)),
    ]:
        rows = df.select(
            "ts",
            bucket_start_col("ts", gran, origin).alias("b"),
            bucket_end_col(bucket_start_col("ts", gran, origin), gran).alias("e"),
        ).collect()
        for r in rows:
            # python reference: step granules from origin until ts falls in
            cur = origin
            while increment_datetime(cur, gran) <= r["ts"]:
                cur = increment_datetime(cur, gran)
            assert r["b"] == cur, (gran, r["ts"])
            assert r["e"] == increment_datetime(cur, gran)
            assert r["b"] <= r["ts"] < r["e"]


def test_parse_granularity():
    assert parse_granularity("30 seconds") == (30, "second")
    assert parse_granularity("1 day") == (1, "day")
    assert parse_granularity("minute") == (1, "minute")
