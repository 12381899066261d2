"""Wave-15 operators: seasonal hour-of-week anomalies, per-source
entropy, Zipf slope."""

from __future__ import annotations

import datetime as dt
import math

import pytest

from grass_spark.operators.corpusstats import source_entropy, zipf_slope
from grass_spark.operators.seasonal import hourly_cells, seasonal_anomalies


def test_hourly_cells_spine_complete_and_dow(spark):
    t0 = dt.datetime(2024, 1, 1, 5)  # 2024-01-01 is a Monday
    rows = [("a", t0), ("a", t0), ("b", t0 + dt.timedelta(days=1, hours=3))]
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp_ntz")
    cells = hourly_cells(ev).collect()
    # 2 days x 2 types x 24 hours
    assert len(cells) == 96
    by_key = {(r.event_type, r.day.isoformat(), r.hour): r for r in cells}
    assert by_key[("a", "2024-01-01", 5)].x == 2
    assert by_key[("b", "2024-01-02", 8)].x == 1  # 05:00 + 3h = hour 8
    assert by_key[("a", "2024-01-02", 3)].x == 0  # zero-filled
    assert by_key[("a", "2024-01-01", 5)].dow == 0  # Monday
    assert by_key[("b", "2024-01-02", 8)].dow == 1  # Tuesday


def test_seasonal_anomalies_flags_planted_spike(spark):
    # 4 Mondays with a steady 10 events at hour 9; the 5th Monday
    # spikes to 40 -> that cell must flag, the steady ones must not
    rows = []
    for wk in range(5):
        day = dt.datetime(2024, 1, 1, 9) + dt.timedelta(weeks=wk)
        n = 40 if wk == 4 else 10
        rows += [("click", day)] * n
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp_ntz")
    # one outlier among 5 weekly samples sits at EXACTLY z = 2
    # (dev = 2*sigma algebraically) and the flag is strictly-greater,
    # so gate at 1.9
    out = seasonal_anomalies(ev, z=1.9).collect()
    flagged = {(r.day.isoformat(), r.hour) for r in out}
    assert ("2024-01-29", 9) in flagged
    r = [x for x in out if x.day.isoformat() == "2024-01-29"][0]
    assert r.x == 40 and r.dow == 0
    # baseline over the 5 Mondays: mu = 16, sigma = 12
    assert r.mu == pytest.approx(16.0, abs=1e-6)
    assert r.sigma == pytest.approx(12.0, abs=1e-6)


def test_seasonal_constant_cell_never_flags(spark):
    rows = []
    for wk in range(4):
        day = dt.datetime(2024, 1, 1, 9) + dt.timedelta(weeks=wk)
        rows += [("click", day)] * 7
    ev = spark.createDataFrame(rows, "event_type string, ts timestamp_ntz")
    assert seasonal_anomalies(ev, z=0.5).count() == 0  # sigma == 0


def test_source_entropy_uniform_vs_degenerate(spark):
    docs = spark.createDataFrame(
        [
            ("u", "a b c d a b c d"),  # uniform over 4 words
            ("d", "x x x x x x x y"),  # near-degenerate
        ],
        "source string, text string",
    )
    out = {r.source: r for r in source_entropy(docs).collect()}
    assert out["u"].n_tokens == 8 and out["u"].vocab == 4
    assert out["u"].entropy == pytest.approx(math.log(4), abs=1e-6)
    assert out["u"].entropy_norm == pytest.approx(1.0, abs=1e-6)
    assert out["d"].entropy < out["u"].entropy
    assert out["d"].perplexity == pytest.approx(
        round(math.exp(out["d"].entropy), 6), abs=1e-6
    )


def test_source_entropy_single_word_norm_null(spark):
    docs = spark.createDataFrame(
        [("s", "same same same")], "source string, text string"
    )
    r = source_entropy(docs).collect()[0]
    assert r.entropy == 0.0 and r.entropy_norm is None
    assert r.perplexity == 1.0


def test_zipf_slope_recovers_exponent(spark):
    # build a corpus whose word frequencies follow freq = C / rank
    # exactly: word_i appears round(1200/i) times, i = 1..50
    words = []
    for i in range(1, 51):
        words += [f"w{i:03d}"] * round(1200 / i)
    docs = spark.createDataFrame(
        [("s", " ".join(words))], "source string, text string"
    )
    r = zipf_slope(docs, n_top=50).collect()[0]
    assert r.n_top == 50
    assert r.slope == pytest.approx(-1.0, abs=0.02)
    assert r.r2 > 0.999


def test_zipf_slope_degenerate_uniform(spark):
    # all words equally frequent -> zero y-variance -> slope 0, r2 NULL
    docs = spark.createDataFrame(
        [("s", "a a b b c c d d")], "source string, text string"
    )
    r = zipf_slope(docs, n_top=10).collect()[0]
    assert r.slope == 0.0
    assert r.r2 is None


def test_zipf_slope_single_word_null(spark):
    docs = spark.createDataFrame(
        [("s", "only only only")], "source string, text string"
    )
    r = zipf_slope(docs, n_top=10).collect()[0]
    assert r.n_top == 1 and r.slope is None and r.r2 is None


def test_zipf_n_top_validation(spark):
    docs = spark.createDataFrame([("s", "a b")], "source string, text string")
    with pytest.raises(ValueError):
        zipf_slope(docs, n_top=1)
