"""Wave-51 operators: KS two-sample test driver exposure
(divergence.ks_test) and expected calibration error
(mleval.ece_score)."""

from __future__ import annotations

from grass_spark.operators.divergence import ks_test
from grass_spark.operators.mleval import ece_score


def _vals(spark, xs):
    return spark.createDataFrame([(float(x),) for x in xs], "v double")


def test_ks_closed_form(spark):
    # a = {1,2,3,4}, b = {3,4,5,6}: max gap at v=2 -> |2/4 - 0/4| = 0.5
    out = ks_test(
        _vals(spark, [1, 2, 3, 4]), _vals(spark, [3, 4, 5, 6]),
        value_col="v", checkpoint=False,
    ).collect()[0]
    assert out.n_a == 4 and out.n_b == 4
    assert out.ks_stat == 0.5
    assert out.ks_at == 2.0


def test_ks_identical_distributions(spark):
    out = ks_test(
        _vals(spark, [1, 2, 3]), _vals(spark, [1, 2, 3]),
        value_col="v", checkpoint=False,
    ).collect()[0]
    assert out.ks_stat == 0.0


def _scored(spark, rows):
    return spark.createDataFrame(rows, "score double, label int")


def test_ece_closed_form(spark):
    # bin 0 (scores ~0.05): 2 rows, 0 pos -> gap |0 - 0.05| = 0.05
    # bin 9 (scores ~0.95): 2 rows, 1 pos -> gap |0.5 - 0.95| = 0.45
    rows = [(0.05, 0), (0.05, 0), (0.95, 1), (0.95, 0)]
    out = ece_score(_scored(spark, rows), n_bins=10).collect()[0]
    assert out.n == 4 and out.n_bins_used == 2
    assert out.ece == round((2 * 0.05 + 2 * 0.45) / 4, 6)
    assert out.mce == 0.45


def test_ece_perfectly_calibrated(spark):
    # mean score == frac_pos in every bin -> ece 0
    rows = [(0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)]
    out = ece_score(_scored(spark, rows), n_bins=10).collect()[0]
    assert out.ece == 0.0 and out.mce == 0.0
