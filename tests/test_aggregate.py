"""Golden aggregation tests translated from the reference gunittests.

F1 — t.rast.series golden values (test_series.py:92-165)
F2 — t.rast.aggregate 14-day/1-month alignment (test_aggregation_absolute.py)
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.aggregate import aggregate, series

dt = datetime


@pytest.fixture()
def f1_series(spark):
    """4 values 100,200,300,400 in consecutive monthly buckets (F1)."""
    rows = [
        ("c1", i, dt(2001, 1 + i, 1), float((i + 1) * 100)) for i in range(4)
    ]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp, value double")


def test_f1_series_golden(f1_series):
    row = series(
        f1_series,
        ["average", "maximum", "minimum", "median"],
        value_col="value",
    ).collect()[0]
    assert row["average"] == 250.0
    assert row["maximum"] == 400.0
    assert row["minimum"] == 100.0
    # quantile(0.5) over [100..400] type-7 = 250; the reference's golden 300
    # is its *lower-median* quantile path; GRASS median kernel = mean of
    # middle two = 250 for even n (c_median.c:12)
    assert row["median"] == 250.0


def test_f1_series_where(f1_series):
    row = series(
        f1_series,
        ["minimum"],
        value_col="value",
        where="ts >= timestamp'2001-03-01'",
    ).collect()[0]
    assert row["minimum"] == 300.0


@pytest.fixture()
def f2_turns(spark):
    """7 instants at 14-day steps from 2001-01-15 12:05:45; values
    100..600 then NULL (F2 / test_aggregation_absolute.py:26-127)."""
    t0 = dt(2001, 1, 15, 12, 5, 45)
    rows = [
        ("c1", k, t0 + timedelta(days=14 * k), float((k + 1) * 100) if k < 6 else None)
        for k in range(7)
    ]
    return spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp, value double")


def test_f2_monthly_maximum(f2_turns):
    out = aggregate(f2_turns, "1 month", ["maximum"], value_col="value")
    rows = {r["bucket_start"]: r["maximum"] for r in out.collect()}
    # aligned to 2001-01-01; instants: Jan{100,200} Feb{300,400} Mar{500,600}
    # Apr{NULL} -> dropped
    assert rows == {
        dt(2001, 1, 1): 200.0,
        dt(2001, 2, 1): 400.0,
        dt(2001, 3, 1): 600.0,
    }
    # bucket_end present and exclusive
    ends = {r["bucket_start"]: r["bucket_end"] for r in out.collect()}
    assert ends[dt(2001, 1, 1)] == dt(2001, 2, 1)


def test_f2_register_null_keeps_empty(f2_turns):
    out = aggregate(f2_turns, "1 month", ["maximum"], value_col="value", register_null=True)
    rows = {r["bucket_start"]: r["maximum"] for r in out.collect()}
    assert rows[dt(2001, 4, 1)] is None
    assert len(rows) == 4


def test_f2_two_month_minimum(f2_turns):
    out = aggregate(f2_turns, "2 months", ["minimum"], value_col="value")
    rows = {r["bucket_start"]: r["minimum"] for r in out.collect()}
    assert rows == {dt(2001, 1, 1): 100.0, dt(2001, 3, 1): 500.0}


def test_f2_three_month_sum(f2_turns):
    out = aggregate(f2_turns, "3 months", ["sum"], value_col="value")
    rows = {r["bucket_start"]: r["sum"] for r in out.collect()}
    # Jan+Feb+Mar granule: 100+...+600 = 2100; Apr granule all-null dropped.
    assert rows == {dt(2001, 1, 1): 2100.0}


def test_f2_interval_contains_strictness(spark):
    """A 14-day INTERVAL starting Jan 29 12:05 spans into February, so it is
    NOT contained in the January granule (strict interval contains,
    temporal_extent.py:786-788) — FIXTURES.md F2."""
    t0 = dt(2001, 1, 15, 12, 5, 45)
    rows = []
    for k in range(6):
        s = t0 + timedelta(days=14 * k)
        rows.append(("c1", k, s, s + timedelta(days=14), float((k + 1) * 100)))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts timestamp, ts_end timestamp, value double"
    )
    out = aggregate(df, "1 month", ["maximum"], value_col="value", end_col="ts_end")
    rows = {r["bucket_start"]: r["maximum"] for r in out.collect()}
    # only intervals fully inside a month count: Jan: [Jan15,Jan29) -> 100;
    # boundary-crossers ([Jan29,Feb12) etc.) are excluded everywhere.
    assert rows[dt(2001, 1, 1)] == 100.0
    assert rows[dt(2001, 2, 1)] == 300.0  # [Feb12,Feb26) only
    assert rows[dt(2001, 3, 1)] == 500.0  # [Mar12,Mar26) only


def test_f2_interval_overlaps_sampling(spark):
    """sampling=(contains, overlaps, overlapped) picks boundary-crossing
    intervals into both granules they touch."""
    t0 = dt(2001, 1, 15, 12, 5, 45)
    rows = []
    for k in range(4):
        s = t0 + timedelta(days=14 * k)
        rows.append(("c1", k, s, s + timedelta(days=14), float((k + 1) * 100)))
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, ts timestamp, ts_end timestamp, value double"
    )
    out = aggregate(
        df, "1 month", ["count"], value_col="value", end_col="ts_end",
        sampling=("contains", "overlaps", "overlapped"),
    )
    rows = {r["bucket_start"]: r["count"] for r in out.collect()}
    # granule overlaps map (granule starts first): Jan vs [Jan29,Feb12): yes.
    # granule overlapped map (map starts first): Feb vs [Jan29,Feb12): yes.
    assert rows[dt(2001, 1, 1)] == 2  # [Jan15) contained + [Jan29) overlapped
    # Feb: [Jan29) overlapped-by + [Feb12) contained + [Feb26) overlaps
    assert rows[dt(2001, 2, 1)] == 3


def test_multi_conv_independent(spark):
    rows = [
        ("a", 0, dt(2001, 1, 2), 10.0),
        ("a", 1, dt(2001, 1, 3), 20.0),
        ("b", 0, dt(2001, 1, 2), 100.0),
    ]
    df = spark.createDataFrame(rows, "conv_id string, turn_idx int, ts timestamp, value double")
    out = aggregate(df, "1 day", ["sum"], value_col="value")
    got = {(r["conv_id"], r["bucket_start"]): r["sum"] for r in out.collect()}
    assert got == {
        ("a", dt(2001, 1, 2)): 10.0,
        ("a", dt(2001, 1, 3)): 20.0,
        ("b", dt(2001, 1, 2)): 100.0,
    }


# ---------------- relative time (FIXTURES F1 twin) ----------------


def test_aggregate_relative_series_golden(spark):
    """t.rast.series relative twin (test_series.py:168-257): values
    100..400 at days 0,14,28,42, granularity 14 -> per-bucket identity;
    coarse granularity 56 -> avg 250, min 100, max 400."""
    from grass_spark.operators.aggregate import aggregate_relative

    rows = [("c", d, float(v)) for d, v in zip((0, 14, 28, 42), (100, 200, 300, 400))]
    df = spark.createDataFrame(rows, ["conv_id", "t", "value"])

    fine = aggregate_relative(df, 14, ["average", "count"], ts_col="t")
    got = {r["bucket_start"]: (r["average"], r["count"]) for r in fine.collect()}
    assert got == {0: (100.0, 1), 14: (200.0, 1), 28: (300.0, 1), 42: (400.0, 1)}

    coarse = aggregate_relative(
        df, 56, ["average", "minimum", "maximum", "median"], ts_col="t"
    ).collect()
    assert len(coarse) == 1
    r = coarse[0]
    assert (r["average"], r["minimum"], r["maximum"], r["median"]) == (
        250.0, 100.0, 400.0, 250.0,
    )
    assert r["bucket_start"] == 0 and r["bucket_end"] == 56


def test_aggregate_relative_where_and_origin(spark):
    from grass_spark.operators.aggregate import aggregate_relative

    rows = [("c", d, float(v)) for d, v in zip((0, 14, 28, 42), (100, 200, 300, 400))]
    df = spark.createDataFrame(rows, ["conv_id", "t", "value"])
    out = aggregate_relative(
        df, 100, ["minimum"], ts_col="t", where="t >= 28"
    ).collect()
    assert out[0]["minimum"] == 300.0


def test_parallel_aggregation_golden_540(spark):
    """Mirror of test_aggregation_absolute_parallel.py:29-80: 540
    instants at 4-hour steps aggregated to 12 hours and 1 day — bucket
    counts and per-bucket membership must be exact."""
    t0 = dt(2001, 1, 1)
    rows = [
        ("c1", k, t0 + timedelta(hours=4 * k), float(k)) for k in range(540)
    ]
    df = spark.createDataFrame(rows, ["conv_id", "turn_idx", "ts", "value"])
    from grass_spark.operators.aggregate import aggregate

    h12 = aggregate(df, "12 hours", ["count", "sum"], value_col="value")
    assert h12.count() == 180            # 540 * 4h / 12h
    assert h12.filter("count <> 3").count() == 0
    d1 = aggregate(df, "1 day", ["count", "minimum", "maximum"], value_col="value")
    assert d1.count() == 90
    assert d1.filter("count <> 6").count() == 0
    first = d1.orderBy("bucket_start").first()
    assert first["minimum"] == 0.0 and first["maximum"] == 5.0
    # total conservation through both granularities
    assert h12.agg(F.sum("sum")).collect()[0][0] == sum(range(540))
