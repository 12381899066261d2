"""Wave-44 operators: geometric means (stats.geometric_means) and the
weekly funnel trend (funnel.funnel_weekly)."""

from __future__ import annotations

import datetime as dt
import math

from grass_spark.operators.funnel import funnel_weekly
from grass_spark.operators.stats import geometric_means

T = dt.datetime


def test_geo_means_closed_form(spark):
    df = spark.createDataFrame(
        [("a", 2.0), ("a", 4.0), ("a", 8.0), ("a", 0.0), ("a", None),
         ("b", 5.0)],
        "g string, value double",
    )
    out = {r.group: r for r in geometric_means(
        df, group_col="g").collect()}
    # geo(2, 4, 8) = 4; zeros/nulls excluded.  Three values keep the
    # rounded-ln mean off the .5 ulp boundary (python round is
    # banker's, the engines are half-up — a 2-value mean of 6-dp
    # terms lands exactly on the boundary).
    assert out["a"].n_pos == 3 and out["a"].n_excluded == 2
    ml = round(sum(round(math.log(v), 6) for v in (2.0, 4.0, 8.0)) / 3, 6)
    assert out["a"].geo_mean == round(math.exp(ml), 6)
    assert out["a"].arith_mean == round(14.0 / 3.0, 6)
    assert out["b"].geo_mean == 5.0 and out["b"].n_excluded == 0


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string"
    )


def test_funnel_weekly_cohorting_and_conversion(spark):
    rows = [
        # user 1: first click week of Jan 1, purchase after -> converts
        (0, T(2024, 1, 2, 10), 1, "click"),
        (1, T(2024, 1, 5, 10), 1, "purchase"),
        # user 2: same week, purchase BEFORE the click -> no conversion
        (2, T(2024, 1, 1, 9), 2, "purchase"),
        (3, T(2024, 1, 3, 9), 2, "click"),
        # user 3: clicks the next week, never purchases
        (4, T(2024, 1, 10, 8), 3, "click"),
        # user 4: purchase only — not in any cohort
        (5, T(2024, 1, 2, 8), 4, "purchase"),
    ]
    out = {str(r.week_start): r for r in funnel_weekly(
        _ev(spark, rows), step1="click", step2="purchase",
        checkpoint=False).collect()}
    w1, w2 = out["2024-01-01"], out["2024-01-08"]
    assert w1.n_cohort == 2 and w1.n_converted == 1 and w1.cvr == 0.5
    assert w2.n_cohort == 1 and w2.n_converted == 0 and w2.cvr == 0.0


def test_funnel_weekly_same_ts_tie_uses_id_order(spark):
    # purchase at the SAME timestamp as the first click: converts only
    # if its event_id is greater
    rows = [
        (10, T(2024, 1, 2, 10), 1, "click"),
        (11, T(2024, 1, 2, 10), 1, "purchase"),   # id 11 > 10: counts
        (20, T(2024, 1, 2, 10), 2, "purchase"),   # id 20 < 21: does not
        (21, T(2024, 1, 2, 10), 2, "click"),
    ]
    out = funnel_weekly(
        _ev(spark, rows), step1="click", step2="purchase",
        checkpoint=False).collect()[0]
    assert out.n_cohort == 2 and out.n_converted == 1
