"""Wave-24 operators: exact AUC, calibration bins, PR threshold
sweep, corpus snapshot diff."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.corpusstats import corpus_diff
from grass_spark.operators.mleval import (
    auc_eval,
    calibration_bins,
    pr_thresholds,
)


def _scored(spark, rows):
    return spark.createDataFrame(rows, "score double, label int")


# ------------------------------------------------------------ auc


def test_auc_perfect_and_inverted(spark):
    perfect = _scored(
        spark, [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)]
    )
    r = auc_eval(perfect).collect()[0]
    assert (r.n_pos, r.n_neg, r.auc) == (2, 2, 1.0)
    inverted = _scored(
        spark, [(0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0)]
    )
    assert auc_eval(inverted).collect()[0].auc == 0.0


def test_auc_ties_and_hand_value(spark):
    # pos scores {0.5, 0.7}, neg {0.5, 0.3}:
    # pairs: (.5,.5) tie=0.5, (.5,.3) win, (.7,.5) win, (.7,.3) win
    # U = 3.5 -> auc = 3.5/4
    df = _scored(spark, [(0.5, 1), (0.7, 1), (0.5, 0), (0.3, 0)])
    r = auc_eval(df).collect()[0]
    assert r.auc == pytest.approx(0.875)
    # one-class input: auc NULL, not 0
    one = _scored(spark, [(0.5, 1), (0.7, 1)])
    r1 = auc_eval(one).collect()[0]
    assert r1.auc is None and r1.n_neg == 0


def test_auc_random_is_half_on_symmetric_ties(spark):
    # every score identical -> all pairs tie -> auc exactly 0.5
    df = _scored(spark, [(0.4, 1)] * 5 + [(0.4, 0)] * 7)
    assert auc_eval(df).collect()[0].auc == 0.5


# ------------------------------------------------------------ calibration


def test_calibration_bins_edges_and_fracs(spark):
    df = _scored(
        spark,
        [(0.05, 0), (0.05, 1), (0.95, 1), (1.0, 1), (0.101, 0)],
    )
    out = {r.bin: r for r in calibration_bins(df, n_bins=10).collect()}
    assert out[0].n == 2 and out[0].frac_pos == 0.5
    assert out[0].mean_score == pytest.approx(0.05)
    # score exactly 1.0 clamps into the top bin
    assert out[9].n == 2 and out[9].n_pos == 2
    assert out[1].n == 1
    with pytest.raises(ValueError):
        calibration_bins(df, n_bins=1)


# ------------------------------------------------------------ pr sweep


def test_pr_thresholds_hand_counts(spark):
    df = _scored(
        spark, [(0.9, 1), (0.6, 1), (0.4, 0), (0.8, 0), (0.2, 1)]
    )
    out = {
        round(r.threshold, 3): r
        for r in pr_thresholds(df, [0.5, 0.95]).collect()
    }
    r5 = out[0.5]
    # >= 0.5: scores .9(+), .6(+), .8(-) -> tp=2 fp=1 fn=1
    assert (r5.tp, r5.fp, r5.fn) == (2, 1, 1)
    assert r5.precision == pytest.approx(round(2 / 3, 6))
    assert r5.recall == pytest.approx(round(2 / 3, 6))
    r95 = out[0.95]
    # nothing predicted positive -> precision NULL, recall 0, f1 NULL
    assert (r95.tp, r95.fp, r95.fn) == (0, 0, 3)
    assert r95.precision is None and r95.recall == 0.0 and r95.f1 is None
    with pytest.raises(ValueError):
        pr_thresholds(df, [])


# ------------------------------------------------------------ diff


def test_corpus_diff_all_statuses(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "doc_id bigint, text string"
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "B2"), (4, "d")], "doc_id bigint, text string"
    )
    out = {r.status: r.n_docs for r in corpus_diff(old, new).collect()}
    assert out == {"added": 1, "removed": 1, "changed": 1, "unchanged": 1}
    # identical snapshots: zero-filled statuses still present
    same = {r.status: r.n_docs for r in corpus_diff(old, old).collect()}
    assert same == {
        "added": 0, "removed": 0, "changed": 0, "unchanged": 3
    }


def test_corpus_diff_plan_has_no_cartesian(spark):
    old = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    plan = corpus_diff(old, old)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "CartesianProduct" not in plan
