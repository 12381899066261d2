"""Wave-52 operators: weekly type-mix drift (trending.type_mix_drift)
and weekly quantile bands (seasonal.weekly_quantiles)."""

from __future__ import annotations

import datetime as dt

from grass_spark.operators.seasonal import weekly_quantiles
from grass_spark.operators.trending import type_mix_drift

T = dt.datetime


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string"
    )


def test_type_mix_drift_closed_form(spark):
    # week 1: a x3, b x1; week 2: a x1, b x3.  Overall: a 4/8, b 4/8.
    # TV each week = 0.5*(|3/4-1/2| + |1/4-1/2|) = 0.25
    rows, eid = [], 0
    for n, t, d in [(3, "a", 1), (1, "b", 1), (1, "a", 8), (3, "b", 8)]:
        for _ in range(n):
            rows.append((eid, T(2024, 1, d, 12), 1, t))
            eid += 1
    out = {str(r.week_start): r for r in type_mix_drift(
        _ev(spark, rows)).collect()}
    assert out["2024-01-01"].tv_dist == 0.25
    assert out["2024-01-08"].tv_dist == 0.25
    assert out["2024-01-01"].n_events == 4


def test_type_mix_drift_absent_type_counts(spark):
    # week 2 has NO b events: its TV must include the missing mass
    rows = [
        (0, T(2024, 1, 1), 1, "a"), (1, T(2024, 1, 1), 1, "b"),
        (2, T(2024, 1, 8), 1, "a"), (3, T(2024, 1, 8), 1, "a"),
    ]
    out = {str(r.week_start): r for r in type_mix_drift(
        _ev(spark, rows)).collect()}
    # overall: a 3/4, b 1/4; week2: a 1, b 0 -> 0.5*(1/4 + 1/4) = 0.25
    assert out["2024-01-08"].tv_dist == 0.25


def test_weekly_quantiles_type7(spark):
    rows = [(T(2024, 1, 1 + i), float(v)) for i, v in
            enumerate([1, 2, 3, 4, 5])]
    df = spark.createDataFrame(rows, "ts timestamp, v double")
    out = weekly_quantiles(
        df, ts_col="ts", value_col="v", probs=(0.5, 0.95)
    ).collect()
    # Jan 1-5 2024 all in the week of Mon Jan 1
    assert len(out) == 1
    r = out[0]
    assert r.n == 5 and r.q_0_5 == 3.0
    assert r.q_0_95 == round(4 + 0.8, 6)  # type-7: v[3] + .8*(v[4]-v[3])
