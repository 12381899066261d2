"""Wave-32 operators: ABC/Pareto classification + Gini coefficient."""

from __future__ import annotations

import pytest

from grass_spark.operators.pareto import abc_analysis, gini_coefficient


def _orders(spark, rows):
    return spark.createDataFrame(rows, "k bigint, v double")


def test_abc_classes_hand_checked(spark):
    # key totals: 80, 15, 3, 1, 1 (total 100)
    rows = []
    for k, total in [(1, 80.0), (2, 15.0), (3, 3.0), (4, 1.0), (5, 1.0)]:
        rows.append((k, total))
    out = {
        r.abc_class: r
        for r in abc_analysis(
            _orders(spark, rows), key_col="k", value_col="v"
        ).collect()
    }
    # cum-from-top shares: key1 0.80 (A), key2 0.95 (B),
    # key3 0.98 (C), keys 4+5 1.00 (C)
    assert out["A"].n_keys == 1 and out["A"].value_sum == 80.0
    assert out["B"].n_keys == 1 and out["B"].value_share == 0.15
    assert out["C"].n_keys == 3 and out["C"].value_sum == 5.0
    with pytest.raises(ValueError):
        abc_analysis(_orders(spark, rows), key_col="k", value_col="v",
                     thresholds=(0.9, 0.5))


def test_abc_ties_classify_together(spark):
    rows = [(k, 10.0) for k in range(1, 5)]
    out = abc_analysis(
        _orders(spark, rows), key_col="k", value_col="v"
    ).collect()
    # every key has the same value -> one group, cum share 1.0 -> all C
    assert len(out) == 1 and out[0].abc_class == "C" and out[0].n_keys == 4


def test_gini_extremes(spark):
    # perfectly equal -> 0
    eq = _orders(spark, [(k, 10.0) for k in range(1, 6)])
    r = gini_coefficient(eq, key_col="k", value_col="v").collect()[0]
    assert r.gini == 0.0 and r.n_keys == 5 and r.total_value == 50.0
    # one key holds everything among N=2 -> grouped-data max (N-1)/N = 0.5
    one = _orders(spark, [(1, 100.0), (2, 0.0)])
    r = gini_coefficient(one, key_col="k", value_col="v").collect()[0]
    assert r.gini == 0.5
    # all-zero total -> NULL
    z = _orders(spark, [(1, 0.0), (2, 0.0)])
    r = gini_coefficient(z, key_col="k", value_col="v").collect()[0]
    assert r.gini is None


def test_gini_known_value(spark):
    # totals 1, 2, 3, 4 -> grouped Gini = 1 - sum n(2Yprev+s)/(N*S)
    # = 1 - [1*(0+1) + 1*(2+2) + 1*(6+3) + 1*(12+4)] / (4*10) = 0.25
    df = _orders(spark, [(1, 0.01), (2, 0.02), (3, 0.03), (4, 0.04)])
    r = gini_coefficient(df, key_col="k", value_col="v").collect()[0]
    assert r.gini == 0.25


def test_abc_multi_row_keys_aggregate_first(spark):
    # key 1 reaches 80 via multiple rows; classification is on TOTALS
    rows = [(1, 40.0), (1, 40.0), (2, 15.0), (3, 5.0)]
    out = {
        r.abc_class: r
        for r in abc_analysis(
            _orders(spark, rows), key_col="k", value_col="v"
        ).collect()
    }
    assert out["A"].n_keys == 1 and out["A"].value_sum == 80.0
