"""Wave-45 operators: Hill tail-index estimator (stats.hill_tail_index)
and the Brier probabilistic-forecast score (mleval.brier_score)."""

from __future__ import annotations

import math

import pytest

from grass_spark.operators.mleval import brier_score
from grass_spark.operators.stats import hill_tail_index


def _vals(spark, xs):
    return spark.createDataFrame(
        [(i, float(x)) for i, x in enumerate(xs)], "id bigint, v double"
    )


def test_hill_closed_form_pareto_like(spark):
    # top 3 = {8, 4, 2}, threshold x_4 = 1:
    # hill = mean(ln 8, ln 4, ln 2) = 2 ln 2
    out = hill_tail_index(
        _vals(spark, [8, 4, 2, 1, 0.5, 0.25]),
        value_col="v", id_col="id", k=3,
    ).collect()[0]
    assert out.k == 3 and out.x_threshold == 1.0
    expect = round(sum(round(math.log(x), 6) for x in (8, 4, 2)) / 3, 6)
    assert out.hill == expect
    assert out.alpha == round(1.0 / expect, 6)


def test_hill_insufficient_or_degenerate(spark):
    # fewer than k+1 positive values -> all NULL
    short = hill_tail_index(
        _vals(spark, [3, 2, -1]), value_col="v", id_col="id", k=3
    ).collect()[0]
    assert short.k is None and short.hill is None
    # all-equal top: hill = 0 -> alpha NULL, hill reported
    flat = hill_tail_index(
        _vals(spark, [5, 5, 5, 5, 5]), value_col="v", id_col="id", k=3
    ).collect()[0]
    assert flat.hill == 0.0 and flat.alpha is None


def test_hill_bad_k_raises(spark):
    with pytest.raises(ValueError, match="k must be"):
        hill_tail_index(_vals(spark, [1]), value_col="v", id_col="id", k=1)


def test_brier_closed_form(spark):
    df = spark.createDataFrame(
        [(0.8, 1), (0.3, 0), (0.5, 1), (0.9, 0)],
        "prob double, label int",
    )
    out = brier_score(df).collect()[0]
    assert out.n == 4 and out.n_pos == 2
    se = 0.2 ** 2 + 0.3 ** 2 + 0.5 ** 2 + 0.9 ** 2
    assert out.brier == round(se / 4, 6)
    assert out.brier_base == 0.25      # base rate 0.5
    assert out.skill == round(1 - round(se / 4, 6) / 0.25, 6)


def test_brier_single_class_skill_null(spark):
    df = spark.createDataFrame([(0.9, 1), (0.7, 1)], "prob double, label int")
    out = brier_score(df).collect()[0]
    assert out.brier_base == 0.0 and out.skill is None
