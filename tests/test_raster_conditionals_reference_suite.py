"""The reference's raster-conditionals suite as goldens.

Every case is a (expression, expected) pair lifted verbatim from
``/root/reference/python/grass/temporal/testsuite/
unittests_temporal_raster_conditionals.py`` (CI-green upstream) over
its canonical fixture:

    A = a1..a4 (values 1..4),  daily intervals from 2001-01-01
    B = b1,b2  (values 5,6),   2-day intervals from 2001-01-01
    C = c1     (value 7),      2-day interval  from 2001-01-02
    D = d1..d4 (values 8..11), daily intervals from 2001-01-03

The reference asserts (map count, min value, max value, dataset start,
dataset end) per expression — exactly what these tests pin.  The suite
is the authority for the r.mapcalc conditional semantics:

* two-arg ``if(c, t)`` fills 0 where c is false (spatial_conditional_1
  has min 0), while a ``null()`` else DROPS the false maps entirely
  (spatial_conditional_2 has 2 maps);
* map/map conclusions pair by EQUAL and unmatched then maps drop
  (spatial_conditional_3: only the two A maps with an equal D map
  survive);
* relation conditionals emit one map per (condition, conclusion) pair
  with the CONCLUSION extent (temporal_conditional_relation_1: four
  maps, each B extent twice, invalid topology upstream);
* pure-temporal conditions (td, start_date alone) keep SELECTION
  semantics instead (temporal_conditional_1 drops the unrelated D
  maps; no 0-fill).

``unittests_temporal_raster_conditionals_complement_else.py`` is NOT
mined here: the reference excludes it from its own CI as known-broken
("tests which can (and should) be fixed",
.github/workflows/macos_gunittest.cfg), so it documents aspirational
complement semantics no implementation exhibits.

The second class mines ``unittests_temporal_raster_algebra_equal_ts.py``
(implicit aggregation over same-instant maps: ``R = A + A`` over four
maps at one instant is a_i + a1 + a2 + a3 + a4 per map).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from grass_spark.algebra import TemporalAlgebra

D1 = datetime(2001, 1, 1)


def _ds(spark, specs):
    """specs: [(value, start_day, end_day)] -> dataset DataFrame."""
    rows = [
        ("k", datetime(2001, 1, s), datetime(2001, 1, e), float(v))
        for v, s, e in specs
    ]
    return spark.createDataFrame(
        rows,
        "k string, bucket_start timestamp, bucket_end timestamp, value double",
    )


@pytest.fixture(scope="module")
def env_c(spark):
    return {
        "A": _ds(spark, [(1, 1, 2), (2, 2, 3), (3, 3, 4), (4, 4, 5)]),
        "B": _ds(spark, [(5, 1, 3), (6, 3, 5)]),
        "C": _ds(spark, [(7, 2, 4)]),
        "D": _ds(spark, [(8, 3, 4), (9, 4, 5), (10, 5, 6), (11, 6, 7)]),
    }


@pytest.fixture(scope="module")
def ralg():
    return TemporalAlgebra(keys=["k"], flavor="raster")


# (reference test name, expression, n_maps, min, max, start_day, end_day)
COND_CASES = [
    ("temporal_conditional_time_dimension_bug",
     "if({contains}, B == 5, A - 1, A + 1)", 4, 0, 5, 1, 5),
    ("temporal_conditional_1", "if(td(A) == 1, D * 2, D)", 2, 16, 18, 3, 5),
    ("temporal_conditional_relation_1",
     "if({during}, exist(A), B - 1, B + 1)", 4, 4, 5, 1, 5),
    ("spatial_conditional_1",
     "if(A > 1 && A < 4 && isntnull(A), A)", 4, 0, 3, 1, 5),
    ("spatial_conditional_2",
     "if(A > 1 && A < 4 && isntnull(A), A, null())", 2, 2, 3, 2, 4),
    ("spatial_conditional_3", "if(A > 1, A, D)", 2, 3, 4, 3, 5),
    ("spatial_conditional_4", "if(A > 0, A)", 4, 1, 4, 1, 5),
    ("spatial_conditional_5",
     "if(B > 5 {&&,contains,l} A < 5, B)", 2, 0, 6, 1, 5),
    ("spatial_conditional_relation_1",
     "if({contains},B > 5, D)", 2, 8, 9, 3, 5),
    ("spatial_conditional_relation_2",
     "if({contains}, B <= 5, A, A * 2)", 4, 1, 8, 1, 5),
    ("spatial_conditional_numeric_relation_1",
     "if({contains}, B > 5, A, 10)", 4, 3, 10, 1, 5),
    ("spatial_conditional_numeric_relation_2",
     "if({contains},B > 5, A + 2 / 4.0)", 4, 0, 4.5, 1, 5),
    ("spatial_conditional_numeric_1", "if(A > 2, 0, A)", 4, 0, 2, 1, 5),
    ("spatial_conditional_numeric_2", "if(A > 2, A, 8)", 4, 3, 8, 1, 5),
    ("spatial_conditional_numeric_3", "if(A > 2, 1, 0)", 4, 0, 1, 1, 5),
    ("spatial_conditional_numeric_4", "if(A > 2, null())", 2, 0, 0, 1, 3),
    ("spatiotemporal_conditional_1",
     'if(A < 2 && start_date(A) < "2001-01-03", A)', 4, 0, 1, 1, 5),
    ("spatiotemporal_conditional_2",
     'if(A < 3 || start_date(A) < "2001-01-04", A + 1, A - 1)',
     4, 2, 4, 1, 5),
    ("spatiotemporal_conditional_relation_1",
     "if({contains},B > 5 && start_day(B) < 3, D)", 2, 0, 0, 3, 5),
    ("spatiotemporal_conditional_relation_2",
     'if({contains}, start_date(B) < "2001-01-03" || B <= 5, A, A * 2)',
     4, 1, 8, 1, 5),
    ("spatiotemporal_conditional_numeric_relation_1",
     'if({contains}, start_date(B) >= "2001-01-03" && B > 5, A, 10)',
     4, 3, 10, 1, 5),
    ("spatiotemporal_conditional_numeric_relation_2",
     'if({contains},td(B) == 2 && start_date(B) == "2001-01-03" && B > 5 ,'
     " A + 2 / 4.0)", 4, 0, 4.5, 1, 5),
    ("spatiotemporal_conditional_numeric_1",
     'if(start_date(A) < "2001-01-04" && A > 2, 0, A)', 4, 0, 4, 1, 5),
    ("spatiotemporal_conditional_numeric_2",
     'if(A > 2 || start_date(A) > "2001-01-01" && start_date(A) <'
     ' "2001-01-04", A, 8)', 4, 2, 8, 1, 5),
    ("spatiotemporal_conditional_numeric_3",
     'if(start_date(A) < "2001-01-04" && A > 2, 1, 0)', 4, 0, 1, 1, 5),
    ("spatiotemporal_conditional_numeric_4",
     'if(A > 2 || start_date(A) > "2001-01-01", null())', 1, 0, 0, 1, 2),
]


@pytest.mark.parametrize(
    "name,expr,n,vmin,vmax,sday,eday", COND_CASES,
    ids=[c[0] for c in COND_CASES],
)
def test_reference_raster_conditional(ralg, env_c, name, expr, n, vmin, vmax,
                                      sday, eday):
    out = ralg.eval(expr, env_c)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.min("bucket_start").alias("start"),
        F.max("bucket_end").alias("end"),
    ).collect()[0]
    assert agg["n"] == n, f"{name}: {expr}"
    assert agg["vmin"] == vmin and agg["vmax"] == vmax, f"{name}: {expr}"
    assert agg["start"] == datetime(2001, 1, sday), f"{name}: {expr}"
    assert agg["end"] == datetime(2001, 1, eday), f"{name}: {expr}"


# ---------------------------------------------------------------------------
# unittests_temporal_raster_algebra_equal_ts.py — implicit aggregation
# over maps sharing one instant (point time, no intervals)
# ---------------------------------------------------------------------------


def _instants(spark, values):
    rows = [("k", D1, float(v)) for v in values]
    return spark.createDataFrame(
        rows, "k string, bucket_start timestamp, value double"
    )


@pytest.fixture(scope="module")
def env_eq(spark):
    return {
        "A": _instants(spark, [1, 2, 3, 4]),
        "singletmap": _instants(spark, [100]),
    }


# (reference test name, expression, n_maps, min, max)
EQUAL_TS_CASES = [
    # r_i = a_i + a1 + a2 + a3 + a4
    ("simple_operator", "A + A", 4, 11, 14),
    ("complex_operator", "A {+, equal,l} A", 4, 11, 14),
    ("single_map_complex_operator", "tmap(singletmap) {+, equal,l} A",
     1, 110, 110),
    ("single_map_simple_operator", "tmap(singletmap) + A", 1, 110, 110),
    # 'r': one result per related right map, same fully-folded value
    ("single_map_complex_operator_right_ts",
     "tmap(singletmap) {+, equal,r} A", 4, 110, 110),
]


@pytest.mark.parametrize(
    "name,expr,n,vmin,vmax", EQUAL_TS_CASES,
    ids=[c[0] for c in EQUAL_TS_CASES],
)
def test_reference_equal_ts_case(env_eq, name, expr, n, vmin, vmax):
    alg = TemporalAlgebra(keys=["k"], flavor="raster")
    out = alg.eval(expr, env_eq)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.min("bucket_start").alias("start"),
    ).collect()[0]
    assert agg["n"] == n, f"{name}: {expr}"
    assert agg["vmin"] == vmin and agg["vmax"] == vmax, f"{name}: {expr}"
    assert agg["start"] == D1, f"{name}: {expr}"
