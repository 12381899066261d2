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
    with pytest.raises((NotImplementedError, SyntaxError)):
        alg.eval("A {+,equal,x} B", env)


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
    # td() = bucket length in DAYS for absolute time
    # (time_delta_to_relative_time, datetime_math.py:40-42)
    got = _vals(alg.eval("A * 0 + td()", env))
    assert got == [1.0] * 4


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

    r = alg.eval("A {+,contains,d} B", env).collect()[0]
    assert (r["bucket_start"], r["bucket_end"]) == (
        datetime(2001, 1, 1), datetime(2001, 2, 1))        # disjoint union


# ---------------------------------------------------------------------------
# round-2 grammar: #, {&&,…}, buff_t/tsnap/tshift, elif/time-var if, d policy
# ---------------------------------------------------------------------------


@pytest.fixture()
def rel_env(spark):
    """A: two month-long intervals; B: day intervals, 3 inside A1, 1
    inside A2, plus one unrelated."""
    a = spark.createDataFrame(
        [("c", datetime(2001, 1, 1), datetime(2001, 2, 1), 100.0),
         ("c", datetime(2001, 3, 1), datetime(2001, 4, 1), 200.0),
         ("c", datetime(2001, 6, 1), datetime(2001, 7, 1), 300.0)],
        ["conv_id", "bucket_start", "bucket_end", "value"],
    )
    b = spark.createDataFrame(
        [("c", datetime(2001, 1, 5), datetime(2001, 1, 6), 1.0),
         ("c", datetime(2001, 1, 10), datetime(2001, 1, 11), 2.0),
         ("c", datetime(2001, 1, 20), datetime(2001, 1, 21), 3.0),
         ("c", datetime(2001, 3, 15), datetime(2001, 3, 16), 4.0)],
        ["conv_id", "bucket_start", "bucket_end", "value"],
    )
    return {"A": a, "B": b}


def test_hash_operator_relations(alg, rel_env):
    """A {#,contains} B counts contained B granules per A granule;
    A granules with no related B are dropped (temporal_algebra.py:
    1609-1620 resultdict semantics)."""
    out = alg.eval("A {#,contains} B", rel_env).orderBy("bucket_start").collect()
    assert [(r["bucket_start"].month, r["value"]) for r in out] == [(1, 3), (3, 1)]
    # extent stays left
    assert out[0]["bucket_end"] == datetime(2001, 2, 1)


def test_hash_operator_equal(alg, env):
    out = alg.eval("A # B", env)
    assert _vals(out) == [1, 1, 1, 1]


def test_hash_in_comparison(alg, rel_env):
    """if(A {#,contains} B > 1, …) — hash binds tighter than cmp."""
    out = alg.eval("if(A {#,contains} B > 1, 1, 0)", rel_env)
    got = [r["value"] for r in out.orderBy("bucket_start").collect()]
    assert got == [1.0, 0.0]


def test_disjoint_union_policy(alg, spark):
    """{+,follows,d}: extents that don't touch still produce the
    min-start..max-end span (temporal_extent.py:210-258); 'u' drops
    strictly-disjoint pairs (union() returns None for before/after)."""
    a = spark.createDataFrame(
        [("c", datetime(2001, 1, 10), datetime(2001, 1, 12), 1.0)],
        ["conv_id", "bucket_start", "bucket_end", "value"],
    )
    b = spark.createDataFrame(
        [("c", datetime(2001, 1, 1), datetime(2001, 1, 5), 2.0)],
        ["conv_id", "bucket_start", "bucket_end", "value"],
    )
    env = {"A": a, "B": b}
    out = alg.eval("A {+,follows|precedes|after|before,d} B", env).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["bucket_start"], r["bucket_end"]) == (
        datetime(2001, 1, 1), datetime(2001, 1, 12))
    assert r["value"] == 3.0
    # union policy drops the strictly-disjoint pair
    assert alg.eval("A {+,after|before,u} B", env).count() == 0


def test_comp_operator_parameterized(alg, spark):
    """Boolean {&&,contains,|}: left bool && any(related bools)."""
    a = spark.createDataFrame(
        [("c", datetime(2001, 1, 1), datetime(2001, 2, 1), True),
         ("c", datetime(2001, 3, 1), datetime(2001, 4, 1), True)],
        ["conv_id", "bucket_start", "bucket_end", "value"],
    )
    b = spark.createDataFrame(
        [("c", datetime(2001, 1, 5), datetime(2001, 1, 6), False),
         ("c", datetime(2001, 1, 10), datetime(2001, 1, 11), True),
         ("c", datetime(2001, 3, 15), datetime(2001, 3, 16), False)],
        ["conv_id", "bucket_start", "bucket_end", "value"],
    )
    env = {"A": a, "B": b}
    out = alg.eval("A {&&,contains,|} B", env).orderBy("bucket_start").collect()
    # A1: true && (false | true) = true; A2: true && (false) = false
    assert [r["value"] for r in out] == [True, False]
    out = alg.eval("A {&&,contains,&} B", env).orderBy("bucket_start").collect()
    assert [r["value"] for r in out] == [False, False]


def test_buff_t_expression(alg, env):
    """buff_t(A, "1 days"): start-1d, end+1d
    (abstract_map_dataset.py:719-817)."""
    out = alg.eval('buff_t(A, "1 days")', env).orderBy("bucket_start").collect()
    assert out[0]["bucket_start"] == datetime(2000, 12, 31)
    assert out[0]["bucket_end"] == datetime(2001, 1, 3)
    assert out[0]["value"] == 100.0


def test_buff_t_instant_becomes_interval(spark):
    alg = TemporalAlgebra(end_col=None)
    a = spark.createDataFrame(
        [("c", datetime(2001, 1, 10), 5.0)],
        ["conv_id", "bucket_start", "value"],
    )
    out = TemporalAlgebra(end_col="bucket_end").eval.__self__  # noqa: F841
    alg2 = TemporalAlgebra(end_col="bucket_end")
    res = alg2.eval('buff_t(A, "2 hours")', {"A": a}).collect()[0]
    assert res["bucket_start"] == datetime(2001, 1, 9, 22)
    assert res["bucket_end"] == datetime(2001, 1, 10, 2)


def test_tshift_expression(alg, env):
    out = alg.eval('tshift(A, "1 days")', env).orderBy("bucket_start").collect()
    assert out[0]["bucket_start"] == datetime(2001, 1, 2)
    assert out[0]["bucket_end"] == datetime(2001, 1, 3)
    # numeric increment = seconds
    out = alg.eval("tshift(A, 3600)", env).orderBy("bucket_start").collect()
    assert out[0]["bucket_start"] == datetime(2001, 1, 1, 1)


def test_tsnap_expression(alg, spark):
    """tsnap closes gaps: end := next start; last keeps its end."""
    a = spark.createDataFrame(
        [("c", datetime(2001, 1, 1), datetime(2001, 1, 2), 1.0),
         ("c", datetime(2001, 1, 5), datetime(2001, 1, 6), 2.0),
         ("c", datetime(2001, 1, 9), datetime(2001, 1, 10), 3.0)],
        ["conv_id", "bucket_start", "bucket_end", "value"],
    )
    out = alg.eval("tsnap(A)", {"A": a}).orderBy("bucket_start").collect()
    assert [r["bucket_end"] for r in out] == [
        datetime(2001, 1, 5), datetime(2001, 1, 9), datetime(2001, 1, 10)]


def test_tsnap_equal_starts_inherit_next_end(alg, spark):
    """Reference quirk (abstract_space_time_dataset.py:2182-2198): with
    equal start stamps the earlier row inherits the *next* row's end
    (the loop clobbers ``end`` with maps[i+1]'s end)."""
    a = spark.createDataFrame(
        [("c", datetime(2001, 1, 1), datetime(2001, 1, 2), 1.0),
         ("c", datetime(2001, 1, 1), datetime(2001, 1, 3), 2.0),
         ("c", datetime(2001, 1, 8), datetime(2001, 1, 9), 3.0)],
        ["conv_id", "bucket_start", "bucket_end", "value"],
    )
    out = alg.eval("tsnap(A)", {"A": a}).orderBy("bucket_start", "value").collect()
    # row1 (end 1/2) has equal-start twin -> inherits twin's end 1/3
    assert out[0]["bucket_end"] == datetime(2001, 1, 3)
    # row2 snaps to next start 1/8
    assert out[1]["bucket_end"] == datetime(2001, 1, 8)
    assert out[2]["bucket_end"] == datetime(2001, 1, 9)


def test_if_time_variable_condition_else(alg, env):
    """if(start_day() <= 2, A, B) — per-branch filter + inverse union
    (temporal_algebra.py:3130-3169 'elif' production)."""
    out = alg.eval("if(start_day() <= 2, A, B)", env)
    got = _vals(out)
    assert got == [100.0, 200.0, 30.0, 40.0]
    # no-else variant filters only
    out = alg.eval("if(start_day() <= 2, A)", env)
    assert _vals(out) == [100.0, 200.0]


def test_if_datetime_literal_condition(alg, env):
    out = alg.eval('if(start_datetime() < "2001-01-03", A, B)', env)
    assert _vals(out) == [100.0, 200.0, 30.0, 40.0]
    out = alg.eval('if(start_date() == "2001-01-02", A)', env)
    assert _vals(out) == [200.0]


def test_end_accessors(alg, env):
    got = _vals(alg.eval("A * 0 + end_day()", env))
    assert got == [2.0, 3.0, 4.0, 5.0]
    out = alg.eval('if(end_datetime() < "2001-01-03", A)', env)
    assert _vals(out) == [100.0]


def test_if_relation_parameterized(alg, rel_env, spark):
    """if({during}, cond, then, else): branch granules keep/flip by the
    fold over related condition granules; unrelated granules fold True
    (assign_bool_value all([]) semantics)."""
    cond = spark.createDataFrame(
        [("c", datetime(2001, 1, 1), datetime(2001, 2, 1), True),
         ("c", datetime(2001, 3, 1), datetime(2001, 4, 1), False)],
        ["conv_id", "bucket_start", "bucket_end", "value"],
    )
    b = rel_env["B"]
    out = alg.eval("if({during}, C, B)", {"C": cond, "B": b})
    got = sorted(r["value"] for r in out.collect())
    # Jan B-rows (1,2,3) are during C-true; Mar row (4) during C-false -> dropped
    assert got == [1.0, 2.0, 3.0]
    # with else: the Mar row comes from the else branch
    out = alg.eval("if({during}, C, B, B)", {"C": cond, "B": b})
    assert sorted(r["value"] for r in out.collect()) == [1.0, 2.0, 3.0, 4.0]


def test_nested_expression_with_new_ops(alg, rel_env):
    """Compose: hash + arithmetic + conditional in one expression."""
    out = alg.eval(
        "if(A {#,contains} B >= 2, A {+,contains,l} B, null())", rel_env
    )
    rows = out.orderBy("bucket_start").collect()
    # A1 has 3 contained B rows -> kept; the reference FOLDS the
    # operation over every related map (unittests_temporal_raster_
    # algebra test_raster_arithmetic_relation_1): 100 + 1 + 2 + 3
    vals = sorted(r["value"] for r in rows if r["value"] is not None)
    assert vals == [106.0]


def test_time_const_neighbour_indexing(alg, env):
    """start_day(A, -1): previous granule's start-day as the value,
    current granule's extent; first granule drops (out of range) —
    p_expr_time_const, temporal_algebra.py:3330-3369."""
    out = alg.eval("start_day(A, -1)", env).orderBy("bucket_start").collect()
    # A granules start Jan 1..4; row i carries previous row's day
    assert [r["bucket_start"].day for r in out] == [2, 3, 4]
    assert [r["value"] for r in out] == [1.0, 2.0, 3.0]
    # forward neighbour
    out = alg.eval("start_day(A, 1)", env).orderBy("bucket_start").collect()
    assert [r["value"] for r in out] == [2.0, 3.0, 4.0]
    # composes with arithmetic: day-over-day delta of start days
    got = _vals(alg.eval("A * 0 + start_day() - start_day(A, -1)", env))
    assert got == [1.0, 1.0, 1.0]
