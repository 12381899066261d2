"""Wave-38 operators: MRR/AP@k retrieval eval (fusion.mrr_ap_at_k)
and post-stratified ATE (abtest.stratified_ate)."""

from __future__ import annotations

import pytest

from grass_spark.operators.abtest import stratified_ate
from grass_spark.operators.fusion import mrr_ap_at_k


def _ranked(spark, rows):
    return spark.createDataFrame(rows, "q_id bigint, rank int, rel int")


def _totals(spark, rows):
    return spark.createDataFrame(rows, "q_id bigint, n_rel bigint")


def test_mrr_ap_closed_form(spark):
    out = mrr_ap_at_k(
        _ranked(spark, [(1, 1, 0), (1, 2, 1), (1, 3, 0), (1, 4, 1)]),
        _totals(spark, [(1, 3)]),
        k=4,
    ).collect()[0]
    assert out.rel_at_k == 2
    assert out.rr == 0.5  # first hit at rank 2
    # AP = (1/2 + 2/4) / min(4, 3) = 1/3
    assert out.ap == round(1.0 / 3.0, 6)


def test_mrr_ap_miss_and_no_relevant(spark):
    ranked = _ranked(spark, [(1, 1, 0), (2, 1, 0)])
    out = {r.q_id: r for r in mrr_ap_at_k(
        ranked, _totals(spark, [(1, 5), (2, 0)]), k=10,
    ).collect()}
    # relevant exists but top-k missed it: hard zero, not NULL
    assert out[1].rr == 0.0 and out[1].ap == 0.0
    # nothing relevant in the corpus: undefined, NULL
    assert out[2].rr is None and out[2].ap is None


def test_mrr_ap_bad_k_raises(spark):
    with pytest.raises(ValueError, match="k must be"):
        mrr_ap_at_k(
            _ranked(spark, [(1, 1, 1)]), _totals(spark, [(1, 1)]), k=0
        )


def _exp(spark, rows):
    return spark.createDataFrame(rows, "st string, g string, value double")


def test_stratified_ate_closed_form(spark):
    rows = [
        ("X", "B", 10.0), ("X", "B", 20.0), ("X", "A", 10.0),
        ("Y", "B", 5.0), ("Y", "A", 3.0),
    ]
    out = stratified_ate(
        _exp(spark, rows), stratum_col="st", group_col="g",
        treat="B", checkpoint=False,
    ).collect()[0]
    assert out.n_strata_used == 2
    assert out.n_treat == 3 and out.n_ctrl == 2
    # ATE = (3*(15-10) + 2*(5-3)) / 5 = 19/5
    assert out.ate == 3.8
    # unadjusted: mean(10,20,5) - mean(10,3) = 35/3 - 6.5
    assert out.diff_unadj == round(35.0 / 3.0 - 6.5, 6)


def test_stratified_ate_single_arm_stratum_excluded(spark):
    rows = [
        ("X", "B", 10.0), ("X", "A", 4.0),
        ("Z", "B", 100.0),  # no control in Z: excluded from ate
    ]
    out = stratified_ate(
        _exp(spark, rows), stratum_col="st", group_col="g",
        treat="B", checkpoint=False,
    ).collect()[0]
    assert out.n_strata_used == 1 and out.n_treat == 1
    assert out.ate == 6.0
    # unadjusted still sees Z: mean(10,100) - 4 = 51
    assert out.diff_unadj == 51.0


def test_stratified_ate_no_usable_stratum(spark):
    out = stratified_ate(
        _exp(spark, [("X", "B", 1.0), ("Y", "A", 2.0)]),
        stratum_col="st", group_col="g", treat="B", checkpoint=False,
    ).collect()[0]
    assert out.n_strata_used == 0 and out.ate is None
