"""Wave-19 operators: Spearman rank correlation, PSI drift bins,
gaps-and-islands user streaks, Benford first-digit screen."""

from __future__ import annotations

import datetime as dt

import pytest

from grass_spark.operators.divergence import psi_bins, psi_drift
from grass_spark.operators.engagement import user_streaks
from grass_spark.operators.stats import benford_digits, spearman_corr


# ---------------------------------------------------------------- spearman


def test_spearman_matches_scipy_formula(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    x = rng.integers(0, 25, size=200).astype(float)  # heavy ties
    y = x * 2 + rng.normal(0, 8, size=200)
    df = spark.createDataFrame(
        [(float(a), float(b)) for a, b in zip(x, y)], "x double, y double"
    )
    r = spearman_corr(df, "x", "y").collect()[0]

    def tie_ranks(v):
        order = np.argsort(v, kind="stable")
        ranks = np.empty(len(v))
        sv = v[order]
        i, pos = 0, 1
        while i < len(sv):
            j = i
            while j < len(sv) and sv[j] == sv[i]:
                j += 1
            ranks[order[i:j]] = (pos + pos + (j - i) - 1) / 2.0
            pos += j - i
            i = j
        return ranks

    rx, ry = tie_ranks(x), tie_ranks(y)
    expected = np.corrcoef(rx, ry)[0, 1]
    assert r.n == 200
    assert r.rho == pytest.approx(round(expected, 6), abs=1e-6)


def test_spearman_perfect_monotone_is_one(spark):
    df = spark.createDataFrame(
        [(float(i), float(i * i)) for i in range(50)], "x double, y double"
    )
    r = spearman_corr(df, "x", "y").collect()[0]
    assert r.rho == 1.0


def test_spearman_constant_column_null(spark):
    df = spark.createDataFrame(
        [(1.0, float(i)) for i in range(10)], "x double, y double"
    )
    assert spearman_corr(df, "x", "y").collect()[0].rho is None


# --------------------------------------------------------------------- psi


def test_psi_identical_distributions_near_zero(spark):
    rows = [(float(i % 37),) for i in range(1000)]
    a = spark.createDataFrame(rows, "v double")
    b = spark.createDataFrame(rows, "v double")
    r = psi_drift(a, b, value_col="v").collect()[0]
    assert r.n_ref == 1000 and r.n_cur == 1000 and r.n_bins == 10
    assert abs(r.psi) < 1e-5  # smoothing-only residual


def test_psi_shifted_distribution_flags(spark):
    a = spark.createDataFrame([(float(i % 100),) for i in range(1000)], "v double")
    b = spark.createDataFrame(
        [(float(i % 100 + 60),) for i in range(1000)], "v double"
    )
    r = psi_drift(a, b, value_col="v").collect()[0]
    assert r.psi > 0.25  # "shifted" rule-of-thumb threshold


def test_psi_bins_integer_bucket_edges(spark):
    # 10 values x 100 rows each: bucket(v_i) = i exactly (pure int math)
    a = spark.createDataFrame(
        [(float(i),) for i in range(10) for _ in range(100)], "v double"
    )
    b = spark.createDataFrame([(float(9),)] * 50, "v double")
    bins = psi_bins(a, b, value_col="v").collect()
    assert [r.bucket for r in bins] == list(range(10))
    assert all(r.ref_n == 100 for r in bins)
    assert [r.cur_n for r in bins] == [0] * 9 + [50]
    # out-of-range current values clamp to the edge buckets
    c = spark.createDataFrame([(-5.0,), (99.0,)], "v double")
    edges = {r.bucket: r.cur_n for r in psi_bins(a, c, value_col="v").collect()}
    assert edges[0] == 1 and edges[9] == 1


def test_psi_requires_two_bins(spark):
    a = spark.createDataFrame([(1.0,)], "v double")
    with pytest.raises(ValueError):
        psi_bins(a, a, value_col="v", n_bins=1)


# ----------------------------------------------------------------- streaks


def _ev(spark, rows):
    return spark.createDataFrame(
        [(u, dt.datetime(2024, 1, d, 9, 0, 0)) for u, d in rows],
        "user_id long, ts timestamp_ntz",
    )


def test_user_streaks_islands(spark):
    # user 1: days 1-3 (streak 3), 5 (streak 1), 10-11 (streak 2)
    # user 2: one day only
    df = _ev(spark, [(1, 1), (1, 2), (1, 3), (1, 5), (1, 10), (1, 11), (2, 20)])
    out = {r.user_id: r for r in user_streaks(df).collect()}
    r1 = out[1]
    assert r1.n_active_days == 6 and r1.n_streaks == 3
    assert r1.longest_streak == 3
    assert r1.longest_start == dt.date(2024, 1, 1)
    assert r1.last_streak == 2 and r1.last_day == dt.date(2024, 1, 11)
    r2 = out[2]
    assert (r2.n_active_days, r2.n_streaks, r2.longest_streak) == (1, 1, 1)
    assert r2.last_streak == 1


def test_user_streaks_tie_breaks_to_earliest(spark):
    # two length-2 streaks: longest_start must be the EARLIER one
    df = _ev(spark, [(7, 1), (7, 2), (7, 8), (7, 9)])
    r = user_streaks(df).collect()[0]
    assert r.longest_streak == 2 and r.longest_start == dt.date(2024, 1, 1)


def test_user_streaks_dedups_intraday_events(spark):
    # 3 events on the same day = one active day
    df = _ev(spark, [(3, 4), (3, 4), (3, 4), (3, 5)])
    r = user_streaks(df).collect()[0]
    assert r.n_active_days == 2 and r.longest_streak == 2


# ----------------------------------------------------------------- benford


def test_benford_digit_extraction_and_probs(spark):
    # 1.23 -> cents 123 -> digit 1; 0.05 -> 5 -> digit 5; 91.0 -> 9100 -> 9
    df = spark.createDataFrame(
        [(1.23,), (0.05,), (91.0,), (-1.99,), (0.0,), (None,)],
        "value double",
    )
    out = {r.digit: r for r in benford_digits(df).collect()}
    assert out[1].n == 2  # 1.23 and -1.99 (abs)
    assert out[5].n == 1 and out[9].n == 1
    assert 0 not in out and sum(r.n for r in out.values()) == 4
    assert out[1].p_benford == pytest.approx(0.30103, abs=1e-6)
    assert out[1].p_obs == pytest.approx(0.5, abs=1e-9)


def test_benford_uniform_data_deviates(spark):
    # uniform leading digits deviate from Benford on digit 1
    df = spark.createDataFrame(
        [(float(d),) for d in range(1, 10) for _ in range(100)],
        "value double",
    )
    out = {r.digit: r for r in benford_digits(df).collect()}
    assert all(r.p_obs == pytest.approx(1 / 9, abs=1e-6) for r in out.values())
    assert out[1].abs_dev > 0.18
