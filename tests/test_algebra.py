"""Map-algebra front-end vs reference semantics
(unittests_temporal_algebra.py patterns translated)."""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from grass_spark.algebra import TemporalAlgebra, parse, tokenize


@pytest.fixture()
def env(spark):
    def mk(vals):
        rows = [
            ("c", datetime(2001, 1, 1 + i), datetime(2001, 1, 2 + i), float(v))
            for i, v in enumerate(vals)
        ]
        return spark.createDataFrame(
            rows, ["conv_id", "bucket_start", "bucket_end", "value"]
        )

    return {"A": mk([100, 200, 300, 400]), "B": mk([10, 20, 30, 40]).limit(4)}


@pytest.fixture()
def alg():
    return TemporalAlgebra()


def _vals(df):
    return [r["value"] for r in df.orderBy("bucket_start").collect()]


def test_tokenize_temporal_operator():
    toks = tokenize("A {+,equal,l} B")
    assert ("topr", "{+,equal,l}") in toks


def test_scalar_arithmetic(alg, env):
    assert _vals(alg.eval("A + 100", env)) == [200.0, 300.0, 400.0, 500.0]
    assert _vals(alg.eval("A * 2 - 50", env)) == [150.0, 350.0, 550.0, 750.0]
    assert _vals(alg.eval("-A", env)) == [-100.0, -200.0, -300.0, -400.0]


def test_dataset_arithmetic_equal_join(alg, env):
    assert _vals(alg.eval("A + B", env)) == [110.0, 220.0, 330.0, 440.0]
    assert _vals(alg.eval("A {+,equal,l} B", env)) == [110.0, 220.0, 330.0, 440.0]
    assert _vals(alg.eval("A / B", env)) == [10.0, 10.0, 10.0, 10.0]


def test_relation_arithmetic_no_match_is_empty(alg, env):
    # identical extents are never 'during' each other -> empty result
    assert alg.eval("A {+,during,u} B", env).count() == 0


def test_unsupported_policy_raises(alg, env):
    with pytest.raises(NotImplementedError):
        alg.eval("A {+,equal,d} B", env)


def test_if_conditional(alg, env):
    got = _vals(alg.eval("if(A > 200, A, null())", env))
    assert got == [None, None, 300.0, 400.0]
    got = _vals(alg.eval("if(A > 200, A, 0)", env))
    assert got == [0.0, 0.0, 300.0, 400.0]


def test_if_with_dataset_branches(alg, env):
    got = _vals(alg.eval("if(A >= 300, B, A)", env))
    assert got == [100.0, 200.0, 30.0, 40.0]


def test_selection(alg, spark, env):
    b_sub = env["B"].filter("value >= 30")
    env2 = {**env, "B": b_sub}
    got = _vals(alg.eval("A : B", env2))
    assert got == [300.0, 400.0]
    got = _vals(alg.eval("A !: B", env2))
    assert got == [100.0, 200.0]


def test_mapcalc_functions(alg, env):
    got = _vals(alg.eval("sqrt(A)", env))
    assert got[0] == pytest.approx(10.0)
    got = _vals(alg.eval("int(A / 3)", env))
    assert got == [33, 66, 100, 133]
    got = _vals(alg.eval("min(A, B)", env))
    assert got == [10.0, 20.0, 30.0, 40.0]
    got = _vals(alg.eval("pow(B, 2)", env))
    assert got == [100.0, 400.0, 900.0, 1600.0]
    got = _vals(alg.eval("if(isnull(A), 1, 0)", env))
    assert got == [0.0, 0.0, 0.0, 0.0]


def test_temporal_accessors(alg, env):
    got = _vals(alg.eval("A * 0 + start_day()", env))
    assert got == [1.0, 2.0, 3.0, 4.0]
    got = _vals(alg.eval("A + start_month()", env))
    assert got == [101.0, 201.0, 301.0, 401.0]
    # td() = bucket length in seconds (1 day)
    got = _vals(alg.eval("A * 0 + td()", env))
    assert got == [86400.0] * 4


def test_merge(alg, spark, env):
    out = alg.eval("merge(A, B)", env)
    assert out.count() == 8


def test_boolean_combinators(alg, env):
    got = _vals(alg.eval("if(A > 100 && A < 400, A, 0)", env))
    assert got == [0.0, 200.0, 300.0, 0.0]
    got = _vals(alg.eval("if(A == 100 || A == 400, 1, 0)", env))
    assert got == [1.0, 0.0, 0.0, 1.0]


def test_parse_errors():
    with pytest.raises(SyntaxError):
        parse("A +")
    with pytest.raises(SyntaxError):
        parse("A ? B")
    with pytest.raises(SyntaxError):
        parse("(A + B")


def test_unknown_dataset(alg, env):
    with pytest.raises(KeyError):
        alg.eval("A + ZZZ", env)


def test_mapcalc_fallback_functions(alg, env):
    # graph(): piecewise linear of A
    got = _vals(alg.eval("graph(A, 0, 0, 400, 100)", env))
    assert got == [25.0, 50.0, 75.0, 100.0]
    # nmax with a dataset and literal
    got = _vals(alg.eval("nmax(A, 250)", env))
    assert got == [250.0, 250.0, 300.0, 400.0]
    # bit ops through the algebra surface
    got = _vals(alg.eval("bitand(int(A / 100), 3)", env))
    assert got == [1, 2, 3, 0]


def test_parameterized_select_relations(alg, spark):
    """A {:,during} B — keep A rows whose extent is during some B extent."""
    from datetime import datetime

    a = spark.createDataFrame(
        [("c", datetime(2001, 1, 10), datetime(2001, 1, 20), 1.0),
         ("c", datetime(2001, 3, 10), datetime(2001, 3, 20), 2.0)],
        ["conv_id", "bucket_start", "bucket_end", "value"],
    )
    b = spark.createDataFrame(
        [("c", datetime(2001, 1, 1), datetime(2001, 2, 1), 0.0)],
        ["conv_id", "bucket_start", "bucket_end", "value"],
    )
    env = {"A": a, "B": b}
    got = _vals(alg.eval("A {:,during} B", env))
    assert got == [1.0]
    got = _vals(alg.eval("A {!:,during} B", env))
    assert got == [2.0]
    # multi-relation spec
    got = _vals(alg.eval("A {:,during|equal} B", env))
    assert got == [1.0]


def test_relation_arithmetic_with_policies(alg, spark):
    """A {+,contains,l} B: A's month intervals contain B's day
    intervals; policies choose the result extent."""
    from datetime import datetime

    a = spark.createDataFrame(
        [("c", datetime(2001, 1, 1), datetime(2001, 2, 1), 100.0)],
        ["conv_id", "bucket_start", "bucket_end", "value"],
    )
    b = spark.createDataFrame(
        [("c", datetime(2001, 1, 10), datetime(2001, 1, 11), 7.0),
         ("c", datetime(2001, 3, 10), datetime(2001, 3, 11), 9.0)],
        ["conv_id", "bucket_start", "bucket_end", "value"],
    )
    env = {"A": a, "B": b}
    out = alg.eval("A {+,contains,l} B", env).collect()
    assert len(out) == 1
    r = out[0]
    assert r["value"] == 107.0
    assert r["bucket_start"] == datetime(2001, 1, 1)       # left extent
    assert r["bucket_end"] == datetime(2001, 2, 1)

    r = alg.eval("A {+,contains,r} B", env).collect()[0]
    assert (r["bucket_start"], r["bucket_end"]) == (
        datetime(2001, 1, 10), datetime(2001, 1, 11))      # right extent

    r = alg.eval("A {*,contains,i} B", env).collect()[0]
    assert r["value"] == 700.0
    assert (r["bucket_start"], r["bucket_end"]) == (
        datetime(2001, 1, 10), datetime(2001, 1, 11))      # intersection

    r = alg.eval("A {+,contains,u} B", env).collect()[0]
    assert (r["bucket_start"], r["bucket_end"]) == (
        datetime(2001, 1, 1), datetime(2001, 2, 1))        # union

    with pytest.raises(NotImplementedError):
        alg.eval("A {+,contains,d} B", env)
