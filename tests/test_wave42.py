"""Wave-42 operators: parent/detail total reconciliation
(reconcile.reconcile_totals) and the session engagement summary
(transitions.session_summary)."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from grass_spark.operators.reconcile import reconcile_totals
from grass_spark.operators.transitions import session_summary

T = dt.datetime


def test_reconcile_mixed_outcomes(spark):
    parent = spark.createDataFrame(
        [(1, 30.0), (2, 10.0), (3, 7.0)], "k bigint, total double"
    )
    detail = spark.createDataFrame(
        [(1, 10.0), (1, 20.0),      # exact match
         (2, 10.5)],                # off by 50 cents; order 3 has none
        "k bigint, amt double",
    )
    out = reconcile_totals(
        parent, detail, parent_key="k", detail_key="k",
        total_expr=F.col("total"), line_expr=F.col("amt"),
    ).collect()[0]
    assert out.n_parents == 3 and out.n_no_detail == 1
    assert out.n_match == 1 and out.n_mismatch == 1
    assert out.max_abs_diff_cents == 50
    assert out.total_abs_diff_cents == 50


def test_reconcile_cent_rounding_is_per_row(spark):
    # two detail rows of 0.005 each round to 1 cent each (half-up),
    # parent 0.01 rounds to 1 cent -> mismatch of exactly 1 cent
    parent = spark.createDataFrame([(1, 0.01)], "k bigint, total double")
    detail = spark.createDataFrame(
        [(1, 0.005), (1, 0.005)], "k bigint, amt double"
    )
    out = reconcile_totals(
        parent, detail, parent_key="k", detail_key="k",
        total_expr=F.col("total"), line_expr=F.col("amt"),
    ).collect()[0]
    assert out.n_mismatch == 1 and out.max_abs_diff_cents == 1


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string"
    )


def test_session_summary_closed_form(spark):
    rows = [
        # user 1: session of 3 (gaps < 1h), then a bounce 3h later
        (0, T(2024, 1, 1, 0, 0), 1, "a"),
        (1, T(2024, 1, 1, 0, 30), 1, "a"),
        (2, T(2024, 1, 1, 0, 50), 1, "a"),
        (3, T(2024, 1, 1, 4, 0), 1, "a"),
        # user 2: one bounce
        (4, T(2024, 1, 2, 0, 0), 2, "a"),
    ]
    out = session_summary(_ev(spark, rows), 3600).collect()[0]
    assert out.n_sessions == 3 and out.n_users == 2
    assert out.n_events == 5 and out.bounce_sessions == 2
    assert out.bounce_rate == round(2 / 3, 6)
    assert out.mean_depth == round(5 / 3, 6)
    assert out.p50_depth == 1.0   # depths {3, 1, 1} -> median 1
    assert out.p95_depth == round(1 + 0.9 * 2, 6)  # type-7 interp
