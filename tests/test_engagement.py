"""Engagement & monitoring analytics (operators/engagement.py):
rolling actives via the interval sweep, RFM census quintiles, CUSUM
prefix-sum identity, and type correlations — each pinned against an
independent brute-force / numpy recurrence."""

from __future__ import annotations

import datetime as dt
import random

import pytest
from pyspark.sql import types as T

from grass_spark.operators.engagement import (
    activity_histogram,
    cusum_alarms,
    rfm_segments,
    rolling_active_users,
    type_correlations,
)

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
    ]
)

_D0 = dt.datetime(2024, 3, 1, 12, 0, 0)


def _ev(i, u, day_off, typ="click", value=1.0):
    return (i, u, _D0 + dt.timedelta(days=day_off), typ, value)


def _random_events(n_users=12, n_days=20, p_active=0.35, seed=7):
    rng = random.Random(seed)
    rows, i = [], 0
    for u in range(n_users):
        for d in range(n_days):
            if rng.random() < p_active:
                for _ in range(rng.randint(1, 4)):
                    rows.append(_ev(i, u, d, value=rng.randint(1, 50) / 1.0))
                    i += 1
    return rows


# ---------------------------------------------------------------- WAU


def test_rolling_active_users_vs_bruteforce(spark):
    rows = _random_events()
    df = spark.createDataFrame(rows, EV_SCHEMA)
    w = 7
    got = {
        r.day: (r.dau, r.wau, r.stickiness)
        for r in rolling_active_users(df, window_days=w).collect()
    }

    # brute force: per day, distinct users active in [d-w+1, d]
    active = {}
    for _, u, ts, _, _ in rows:
        active.setdefault(ts.date(), set()).add(u)
    lo, hi = min(active), max(active)
    d = lo
    while d <= hi:
        dau = len(active.get(d, ()))
        wau = len(
            set().union(
                *(
                    active.get(d - dt.timedelta(days=k), set())
                    for k in range(w)
                )
            )
        )
        exp_stick = round(dau / wau, 6) if wau else None
        assert got[d] == (dau, wau, exp_stick), d
        d += dt.timedelta(days=1)
    assert len(got) == (hi - lo).days + 1


def test_rolling_actives_gap_day_zero_coverage(spark):
    # one user, active day 0 and day 20, window 3: days 3..19 have
    # wau 0 and NULL stickiness
    df = spark.createDataFrame(
        [_ev(0, 1, 0), _ev(1, 1, 20)], EV_SCHEMA
    )
    out = {
        r.day: (r.dau, r.wau, r.stickiness)
        for r in rolling_active_users(df, window_days=3).collect()
    }
    d0 = _D0.date()
    assert out[d0] == (1, 1, 1.0)
    assert out[d0 + dt.timedelta(days=2)] == (0, 1, 0.0)
    assert out[d0 + dt.timedelta(days=3)] == (0, 0, None)
    assert out[d0 + dt.timedelta(days=19)] == (0, 0, None)
    assert out[d0 + dt.timedelta(days=20)] == (1, 1, 1.0)
    assert len(out) == 21


def test_rolling_actives_interval_merge(spark):
    # gaps <= w merge into one coverage interval: active days 0, 3, 6
    # with w=4 cover days 0..9 continuously
    df = spark.createDataFrame(
        [_ev(0, 1, 0), _ev(1, 1, 3), _ev(2, 1, 6)], EV_SCHEMA
    )
    out = {
        r.day: r.wau
        for r in rolling_active_users(df, window_days=4).collect()
    }
    assert all(out[_D0.date() + dt.timedelta(days=k)] == 1 for k in range(7))


def test_rolling_actives_window_validation(spark):
    df = spark.createDataFrame([_ev(0, 1, 0)], EV_SCHEMA)
    with pytest.raises(ValueError):
        rolling_active_users(df, window_days=0)


# ---------------------------------------------------------------- RFM


def test_rfm_ties_at_best_value_score_5(spark):
    # 5 users all last active on the final day -> recency 0 for all
    # -> everyone r_score 5 (the "bought today" convention)
    rows = [_ev(i, u, 9, "purchase", 10.0 + u) for i, u in enumerate(range(5))]
    out = {r.user_id: r for r in rfm_segments(spark.createDataFrame(rows, EV_SCHEMA)).collect()}
    assert all(out[u].r_score == 5 for u in range(5))
    # distinct monetary values 10..14 -> quintiles 1..5 ascending
    assert [out[u].m_score for u in range(5)] == [1, 2, 3, 4, 5]
    assert out[4].segment == "555"  # f all-tie -> everyone f_score 5


def test_rfm_monetary_exact_cents(spark):
    rows = [
        _ev(0, 1, 0, "purchase", 0.1),
        _ev(1, 1, 0, "purchase", 0.2),
        _ev(2, 2, 0, "click", 99.0),  # non-purchase ignored
    ]
    out = {r.user_id: r for r in rfm_segments(spark.createDataFrame(rows, EV_SCHEMA)).collect()}
    assert out[1].monetary == 0.3  # exact in cents, not 0.30000000000000004
    assert out[2].monetary == 0.0


def test_rfm_recency_direction(spark):
    # user 1 active day 9 (recency 0), user 2 active day 0 (recency 9)
    rows = [_ev(0, 1, 9), _ev(1, 2, 0)]
    out = {r.user_id: r for r in rfm_segments(spark.createDataFrame(rows, EV_SCHEMA)).collect()}
    assert out[1].recency_days == 0 and out[1].r_score == 5
    assert out[2].recency_days == 9 and out[2].r_score <= 3


# -------------------------------------------------------------- CUSUM


def test_cusum_identity_vs_sequential_recurrence(spark):
    rows = _random_events(n_users=10, n_days=25, p_active=0.5, seed=13)
    df = spark.createDataFrame(rows, EV_SCHEMA)
    k, h = 2, 4
    got = {
        r.user_id: (r.alarm_day, r.max_s)
        for r in cusum_alarms(df, drift=k, threshold=h).collect()
    }

    # sequential reference: S_i = max(0, S_{i-1} + x_i - k) over the
    # user's dense [first, last] day span
    counts = {}
    for _, u, ts, _, _ in rows:
        counts.setdefault(u, {}).setdefault(ts.date(), 0)
        counts[u][ts.date()] += 1
    for u, per_day in counts.items():
        lo, hi = min(per_day), max(per_day)
        s, max_s, alarm = 0, 0, None
        d = lo
        while d <= hi:
            s = max(0, s + per_day.get(d, 0) - k)
            max_s = max(max_s, s)
            if alarm is None and s > h:
                alarm = d
            d += dt.timedelta(days=1)
        assert got[u] == (alarm, max_s), u
    assert any(a is not None for a, _ in got.values())  # exercised


def test_cusum_validation(spark):
    df = spark.createDataFrame([_ev(0, 1, 0)], EV_SCHEMA)
    with pytest.raises(ValueError):
        cusum_alarms(df, drift=-1, threshold=0)


# ------------------------------------------------------ correlations


def test_type_correlations_vs_numpy(spark):
    np = pytest.importorskip("numpy")
    rng = random.Random(3)
    rows, i = [], 0
    for d in range(15):
        for typ, lam in (("a", 3), ("b", 6), ("c", 2)):
            for _ in range(rng.randint(0, lam * 2)):
                rows.append(_ev(i, rng.randint(1, 5), d, typ))
                i += 1
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {
        (r.type_a, r.type_b): r.corr
        for r in type_correlations(df).collect()
    }

    days = sorted({ts.date() for _, _, ts, _, _ in rows})
    lo, hi = min(days), max(days)
    span = [(lo + dt.timedelta(days=k)) for k in range((hi - lo).days + 1)]
    series = {}
    for typ in "abc":
        per = {}
        for _, _, ts, t, _ in rows:
            if t == typ:
                per[ts.date()] = per.get(ts.date(), 0) + 1
        series[typ] = [per.get(d, 0) for d in span]
    for a, b in (("a", "b"), ("a", "c"), ("b", "c")):
        exp = float(np.corrcoef(series[a], series[b])[0, 1])
        assert got[(a, b)] == pytest.approx(exp, abs=2e-6)


def test_type_correlations_constant_series_null(spark):
    # type "c" fires exactly once/day -> zero variance -> NULL corr
    rows = []
    for d in range(6):
        rows.append(_ev(len(rows), 1, d, "c"))
        for _ in range(d % 3):
            rows.append(_ev(len(rows), 1, d, "a"))
    got = {
        (r.type_a, r.type_b): r.corr
        for r in type_correlations(
            spark.createDataFrame(rows, EV_SCHEMA)
        ).collect()
    }
    assert got[("a", "c")] is None


# ---------------------------------------------------------- histogram


def test_activity_histogram(spark):
    rows = [_ev(0, 1, 0), _ev(1, 1, 0), _ev(2, 1, 1), _ev(3, 2, 5)]
    out = {
        r.n_days_active: r.n_users
        for r in activity_histogram(
            spark.createDataFrame(rows, EV_SCHEMA)
        ).collect()
    }
    assert out == {1: 1, 2: 1}
