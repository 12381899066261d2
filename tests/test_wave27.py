"""Wave-27 operators: generic skew-safe join + z-order layout key."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.skewjoin import skew_join
from grass_spark.operators.zorder import with_zorder, zorder_key


def _skewed(spark):
    # key 1 carries 60% of the fact side; keys 2..50 share the rest;
    # key 999 has no dim row; dim key 77 has no fact rows.
    rows = [(1, i) for i in range(600)]
    rows += [(2 + (i % 49), 1000 + i) for i in range(400)]
    rows += [(999, 9999)]
    fact = spark.createDataFrame(rows, "k bigint, fid bigint")
    dim = spark.createDataFrame(
        [(i, f"d{i}") for i in list(range(1, 51)) + [77]],
        "k bigint, dval string",
    )
    return fact, dim


def _as_set(df):
    return {tuple(r) for r in df.collect()}


def test_skew_join_inner_equals_plain(spark):
    fact, dim = _skewed(spark)
    got = skew_join(fact, dim, "k", how="inner", hot_threshold=50)
    want = fact.join(dim, "k", "inner")
    assert _as_set(got) == _as_set(want)
    assert got.columns == want.columns


def test_skew_join_left_keeps_unmatched_hot_and_cold(spark):
    fact, dim = _skewed(spark)
    # threshold 0 would reject; 1 makes even key 999 (1 row) cold
    got = skew_join(fact, dim, "k", how="left", hot_threshold=50)
    want = fact.join(dim, "k", "left")
    assert _as_set(got) == _as_set(want)
    # the dim-less fact key survives with a NULL dim column
    assert (999, 9999, None) in _as_set(got)


def test_skew_join_multi_key_and_plan(spark):
    fact = spark.createDataFrame(
        [(1, "a", i) for i in range(100)] + [(2, "b", 0)],
        "k1 bigint, k2 string, fid bigint",
    )
    dim = spark.createDataFrame(
        [(1, "a", "x"), (2, "b", "y")], "k1 bigint, k2 string, dval string"
    )
    got = skew_join(fact, dim, ["k1", "k2"], hot_threshold=10)
    want = fact.join(dim, ["k1", "k2"])
    assert _as_set(got) == _as_set(want)
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_skew_join_rejects_bad_args(spark):
    fact, dim = _skewed(spark)
    with pytest.raises(ValueError):
        skew_join(fact, dim, "k", how="full")
    with pytest.raises(ValueError):
        skew_join(fact, dim, "k", hot_threshold=0)


# -------------------------------------------------------------- zorder
def test_zorder_key_interleaves_bits(spark):
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (3, 5)], "a bigint, b bigint"
    )
    out = {
        (r.a, r.b): r.z
        for r in with_zorder(df, ["a", "b"], bits=4).collect()
    }
    # bit i of a -> position 2i; bit i of b -> position 2i+1
    assert out[(0, 0)] == 0
    assert out[(1, 0)] == 1
    assert out[(0, 1)] == 2
    # a=3 (bits 0,1), b=5 (bits 0,2): 1 + 2 + 4 + 32 = 39
    assert out[(3, 5)] == 39


def test_zorder_monotone_in_each_axis(spark):
    df = spark.createDataFrame(
        [(i, 0) for i in range(16)] + [(0, j) for j in range(16)],
        "a bigint, b bigint",
    )
    rows = with_zorder(df, ["a", "b"], bits=4).collect()
    za = sorted({(r.a, r.z) for r in rows if r.b == 0})
    zb = sorted({(r.b, r.z) for r in rows if r.a == 0 and r.b > 0})
    assert all(x[1] < y[1] for x, y in zip(za, za[1:]))
    assert all(x[1] < y[1] for x, y in zip(zb, zb[1:]))


def test_zorder_out_of_range_raises(spark):
    df = spark.createDataFrame([(99, 0)], "a bigint, b bigint")
    with pytest.raises(Exception):
        with_zorder(df, ["a", "b"], bits=4).collect()
    with pytest.raises(ValueError):
        zorder_key([F.col("a")], bits=4)
    with pytest.raises(ValueError):
        zorder_key([F.col("a"), F.col("b")], bits=40)
