"""Wave-30 operators: multiclass eval (confusion/F1) + cohort LTV."""

from __future__ import annotations

import datetime as dt

from grass_spark.operators.ltv import cohort_ltv
from grass_spark.operators.mleval import class_metrics, confusion_matrix


def _preds(spark, pairs):
    return spark.createDataFrame(pairs, "actual string, predicted string")


def test_confusion_matrix_census(spark):
    df = _preds(
        spark,
        [("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), (None, "a"),
         ("b", None)],
    )
    out = {(r.actual, r.predicted): r.n for r in confusion_matrix(df).collect()}
    # NULL on either side drops
    assert out == {("a", "a"): 2, ("a", "b"): 1, ("b", "b"): 1}


def test_class_metrics_hand_checked(spark):
    # actual: a x3, b x2; predictions: a->a, a->a, a->b, b->b, b->c
    df = _preds(
        spark,
        [("a", "a"), ("a", "a"), ("a", "b"), ("b", "b"), ("b", "c")],
    )
    m = {r["class"]: r for r in class_metrics(df).collect()}
    # class a: tp=2, predicted=2, actual=3
    assert m["a"].tp == 2 and m["a"].precision == 1.0
    assert abs(m["a"].recall - 2 / 3) < 1e-6
    # class b: tp=1, predicted=2, actual=2
    assert m["b"].precision == 0.5 and m["b"].recall == 0.5
    assert m["b"].f1 == 0.5
    # class c: predicted-only — recall NULL, precision 0, f1 NULL
    assert m["c"].n_actual == 0 and m["c"].tp == 0
    assert m["c"].precision == 0.0 and m["c"].recall is None
    assert m["c"].f1 is None


def test_cohort_ltv_curve(spark):
    d0 = dt.datetime(2024, 1, 1)
    rows = [
        # user 1 and 2 start day 0 (cohort A); user 3 starts day 1
        (1, d0, 10.0),
        (2, d0, 20.0),
        (1, d0 + dt.timedelta(days=2), 5.0),
        (3, d0 + dt.timedelta(days=1), 7.0),
        (3, d0 + dt.timedelta(days=1, hours=2), 3.0),
    ]
    df = spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, value double"
    )
    out = {
        (r.cohort.isoformat(), r.age): r for r in cohort_ltv(df).collect()
    }
    a0 = out[("2024-01-01", 0)]
    assert a0.n_cohort_users == 2 and a0.n_active_users == 2
    assert a0.day_value == 30.0 and a0.ltv_per_user == 15.0
    a2 = out[("2024-01-01", 2)]
    assert a2.n_active_users == 1 and a2.cum_value == 35.0
    assert a2.ltv_per_user == 17.5
    b0 = out[("2024-01-02", 0)]
    assert b0.n_cohort_users == 1 and b0.day_value == 10.0
    # only active (cohort, age) pairs emit
    assert ("2024-01-01", 1) not in out
