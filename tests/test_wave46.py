"""Wave-46 operators: quantile treatment effects
(abtest.quantile_effects) and day-of-week seasonal indices
(seasonal.dow_index)."""

from __future__ import annotations

import datetime as dt

import pytest

from grass_spark.operators.abtest import quantile_effects
from grass_spark.operators.seasonal import dow_index

T = dt.datetime


def _exp(spark, rows):
    return spark.createDataFrame(rows, "g string, value double")


def test_qte_median_shift(spark):
    # control 1..5, treat = control + 10: every quantile shifts by 10
    rows = [("A", float(v)) for v in range(1, 6)] + [
        ("B", float(v + 10)) for v in range(1, 6)
    ]
    out = {r.p: r for r in quantile_effects(
        _exp(spark, rows), group_col="g", value_col="value", treat="B",
        probs=(0.25, 0.5, 0.75),
    ).collect()}
    assert out[0.5].q_ctrl == 3.0 and out[0.5].q_treat == 13.0
    for r in out.values():
        assert r.qte == 10.0
    # type-7 interpolation at p=0.25 over 5 values: v[1] = 2
    assert out[0.25].q_ctrl == 2.0


def test_qte_missing_arm_is_null(spark):
    out = quantile_effects(
        _exp(spark, [("A", 1.0), ("A", 2.0)]),
        group_col="g", value_col="value", treat="B", probs=(0.5,),
    ).collect()[0]
    assert out.q_ctrl == 1.5 and out.q_treat is None and out.qte is None


def test_qte_bad_probs_raise(spark):
    with pytest.raises(ValueError, match="probs"):
        quantile_effects(
            _exp(spark, [("A", 1.0)]), group_col="g",
            value_col="value", treat="B", probs=(),
        )


def _orders(spark, rows):
    return spark.createDataFrame(rows, "ts timestamp, v double")


def test_dow_index_closed_form(spark):
    # Mon 2024-01-01: 300, Tue: 100, Wed (gap): 0, Thu: 200
    rows = [
        (T(2024, 1, 1), 100.0), (T(2024, 1, 1), 200.0),
        (T(2024, 1, 2), 100.0),
        (T(2024, 1, 4), 200.0),
    ]
    out = {r.dow: r for r in dow_index(
        _orders(spark, rows), ts_col="ts", value_col="v").collect()}
    assert set(out) == {0, 1, 2, 3}          # span Mon..Thu only
    assert out[2].day_value_mean == 0.0      # densified gap Wednesday
    assert out[0].day_value_mean == 300.0
    # overall daily mean = 600/4 = 150 -> Monday index 2.0
    # (r["index"]: attribute access collides with tuple.index)
    assert out[0]["index"] == 2.0
    assert out[2]["index"] == 0.0
    assert all(r.n_days == 1 for r in out.values())
