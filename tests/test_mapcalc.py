"""r.mapcalc function translation table (lib/calc/function.c inventory)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grass_spark.functions.mapcalc import fn


def _one(spark, col, **cols):
    row = spark.createDataFrame(
        [tuple(cols.values())], list(cols.keys())
    ).select(col.alias("out")).collect()[0]
    return row["out"]


def test_basic_math(spark):
    assert _one(spark, fn("abs", F.col("a")), a=-3.5) == 3.5
    assert _one(spark, fn("pow", F.col("a"), F.lit(2.0)), a=3.0) == 9.0
    assert _one(spark, fn("int", F.col("a")), a=3.9) == 3
    assert _one(spark, fn("round", F.col("a")), a=3.6) == 4.0


def test_null_rules_nary(spark):
    # plain max: any NULL -> NULL; nmax skips NULLs
    df = spark.createDataFrame([(1.0, None)], "a double, b double")
    got = df.select(
        fn("max", F.col("a"), F.col("b")).alias("m"),
        fn("nmax", F.col("a"), F.col("b")).alias("nm"),
    ).collect()[0]
    assert got["m"] is None and got["nm"] == 1.0


def test_median_mode_nary(spark):
    df = spark.createDataFrame([(1.0, 5.0, 2.0, 5.0)], "a double, b double, c double, d double")
    args = [F.col(c) for c in "abcd"]
    got = df.select(
        fn("nmedian", *args).alias("med"),
        fn("nmode", *args).alias("mode"),
    ).collect()[0]
    assert got["med"] == 3.5   # mean of middle two (2, 5)
    assert got["mode"] == 5.0  # most frequent


def test_mode_tie_smallest(spark):
    df = spark.createDataFrame([(1.0, 2.0)], "a double, b double")
    got = _one(spark, fn("nmode", F.col("a"), F.col("b")), a=1.0, b=2.0)
    assert got == 1.0  # tie -> smallest


def test_graph_piecewise(spark):
    g = lambda x: fn(  # noqa: E731
        "graph", F.lit(float(x)), F.lit(0.0), F.lit(0.0), F.lit(10.0), F.lit(100.0)
    )
    assert _one(spark, g(5.0), dummy=0) == 50.0      # interpolated
    assert _one(spark, g(-1.0), dummy=0) == 0.0      # clamped left
    assert _one(spark, g(20.0), dummy=0) == 100.0    # clamped right


def test_if_and_null(spark):
    df = spark.createDataFrame([(5.0,)], "a double")
    got = df.select(
        fn("if", F.col("a") > 3, F.lit(1.0), F.lit(0.0)).alias("x"),
        fn("if", F.col("a") > 9, F.lit(1.0)).alias("y"),
        fn("isnull", fn("null")).alias("z"),
    ).collect()[0]
    assert got["x"] == 1.0 and got["y"] is None and got["z"] is True


def test_bit_ops_and_shifts(spark):
    df = spark.createDataFrame([(12, 10)], "a long, b long")
    got = df.select(
        fn("bitand", F.col("a"), F.col("b")).alias("ba"),
        fn("bitor", F.col("a"), F.col("b")).alias("bo"),
        fn("bitxor", F.col("a"), F.col("b")).alias("bx"),
        fn("shiftl", F.col("a"), F.lit(2)).alias("sl"),
        fn("shiftr", F.col("a"), F.lit(2)).alias("sr"),
    ).collect()[0]
    assert (got["ba"], got["bo"], got["bx"]) == (8, 14, 6)
    assert got["sl"] == 48 and got["sr"] == 3


def test_rand_range_and_unknown(spark):
    df = spark.createDataFrame([(0,)], "a int")
    v = df.select(fn("rand", F.lit(5.0), F.lit(6.0)).alias("r")).collect()[0]["r"]
    assert 5.0 <= v < 6.0
    with pytest.raises(KeyError):
        fn("nosuchfn", F.lit(1))
