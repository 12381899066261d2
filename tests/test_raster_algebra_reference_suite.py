"""The reference's t.rast.algebra suite as goldens.

Cases lifted verbatim from ``/root/reference/python/grass/temporal/
testsuite/unittests_temporal_raster_algebra.py`` over the canonical
fixture (same A/B/C/D as the plain-algebra suite, plus
``singletmap`` = value 99 at [2001-01-03, 2001-01-04) and
``singlemap`` = a timeless map of value 100).  The parser mirrored
here is TemporalRasterAlgebraParser — ``flavor="raster"``: identical
grammar, but map-valued conditionals relate condition-to-branch in
the INVERSE orientation of the plain algebra (the "time dimension
bug" test pins it).

Each case asserts (map count, min value, max value, dataset start,
dataset end) exactly as the reference does.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from grass_spark.algebra import TemporalAlgebra


def _ds(spark, specs):
    rows = [
        ("k", datetime(2001, 1, s), datetime(2001, 1, e), float(v))
        for v, s, e in specs
    ]
    return spark.createDataFrame(
        rows, "k string, bucket_start timestamp, bucket_end timestamp, value double"
    )


@pytest.fixture(scope="module")
def env_r(spark):
    return {
        "A": _ds(spark, [(1, 1, 2), (2, 2, 3), (3, 3, 4), (4, 4, 5)]),
        "B": _ds(spark, [(5, 1, 3), (6, 3, 5)]),
        "C": _ds(spark, [(7, 2, 4)]),
        "D": _ds(spark, [(8, 3, 4), (9, 4, 5), (10, 5, 6)]),
        "singletmap": _ds(spark, [(99, 3, 4)]),
        "singlemap": 100.0,
    }


@pytest.fixture(scope="module")
def ralg():
    return TemporalAlgebra(keys=["k"], flavor="raster")


# (reference test name, expression, n, min, max, start_day, end_day)
RASTER_CASES = [
    ("extent1", "A {:,during,r} C", 2, 2, 3, 2, 4),
    ("time_dimension_bug", "if({contains}, B == 5,  A - 1,  A + 1)",
     4, 0, 5, 1, 5),
    ("arith_hash_1", "A + (A {#, equal,l} A)", 4, 2, 5, 1, 5),
    ("arith_td_1", "A + td(A)", 4, 2, 5, 1, 5),
    ("arith_td_2", "A / td(A)", 4, 1, 4, 1, 5),
    ("arith_td_3", "A {+,equal} td(A)", 4, 2, 5, 1, 5),
    ("arith_td_4", "A {/, equal} td(A)", 4, 1, 4, 1, 5),
    ("arith_if_1", 'if({equal}, start_date(A) >= "2001-01-02", A + A)',
     3, 4, 8, 2, 5),
    ("arith_if_2", "if({equal}, A#A == 1, A - A)", 4, 0, 0, 1, 5),
    ("complex_arith_if_1",
     'if(start_date(A) < "2001-01-03" && A#A == 1, A{+, starts,l}C, A{+, finishes,l}C)',
     2, 9, 10, 2, 4),
    ("arith_1", "A {*, equal} A {+, equal} A", 4, 2, 20, 1, 5),
    ("arith_3", "A / A + A*A/A", 4, 2, 5, 1, 5),
    ("intersection_2", "A {+,during,i} B", 4, 6, 10, 1, 5),
    ("intersection_3", "A {+,starts,i} B", 2, 6, 9, 1, 4),
    ("intersection_4", "A {+,finishes,intersect} B", 2, 7, 10, 2, 5),
    ("intersection_5", "A {+,starts|finishes,i} B", 4, 6, 10, 1, 5),
    ("intersection_6", "B {+,overlaps,u} C", 1, 12, 12, 1, 4),
    ("intersection_7", "B {+,overlapped,u} C", 1, 13, 13, 2, 5),
    ("intersection_8", 'A {+,during,l} buff_t(C, "1 day")', 4, 8, 11, 1, 5),
    ("neighbors_1", "A[-1] + A[1]", 2, 4, 6, 2, 4),
    ("neighbors_2", "A[0,0,-1] + A[0,0,1]", 2, 4, 6, 2, 4),
    ("tmap_function1", "tmap(singletmap)", 1, 99, 99, 3, 4),
    ("tmap_function2", "tmap(singletmap) + 1", 1, 100, 100, 3, 4),
    ("map_function1", "map(singlemap) + A", 4, 101, 104, 1, 5),
    ("map_function2", "A * map(singlemap)", 4, 100, 400, 1, 5),
    ("select_same_left_right", "A : A", 4, 1, 4, 1, 5),
    ("select", "A : D", 2, 3, 4, 3, 5),
    ("select_operators2", "A {!:,during} C", 2, 1, 4, 1, 5),
    ("select_operators3", "A {:,during,d} B", 4, 1, 4, 1, 5),
    ("select_operators4", "A {:,equal|during,r} C", 2, 2, 3, 2, 4),
    ("hash_operator1", "if(A # D == 1, A)", 2, 3, 4, 3, 5),
    ("hash_operator2", "A # D", 2, 1, 1, 3, 5),
    ("hash_operator3", "C {#,contains} A", 1, 2, 2, 2, 4),
    ("hash_operator4", "if({contains},A # D == 1, C {#,contains} A)",
     1, 2, 2, 2, 4),
    ("arithmetic_relation_1", "B {+,contains,l} A", 2, 8, 13, 1, 5),
    ("arithmetic_relation_2", "B {*,contains,l} A", 2, 10, 72, 1, 5),
    ("arithmetic_relation_4", "B {+,contains,r} A", 4, 8, 13, 1, 5),
    ("arithmetic_relation_5",
     "tmap(singletmap) {+,equal| precedes| follows,l} A + map(singlemap)",
     1, 208, 208, 3, 4),
]

# empty-result cases (the reference asserts number_of_maps == 0)
RASTER_EMPTY = [
    ("arith_2", "A {*, during} A {+, during} A"),
    ("intersection_1", "A {+,equal,i} B"),
]


@pytest.mark.parametrize(
    "name,expr,n,vmin,vmax,sday,eday", RASTER_CASES,
    ids=[c[0] for c in RASTER_CASES],
)
def test_reference_raster_algebra_case(ralg, env_r, name, expr, n, vmin, vmax,
                                       sday, eday):
    out = ralg.eval(expr, env_r)
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


@pytest.mark.parametrize(
    "name,expr", RASTER_EMPTY, ids=[c[0] for c in RASTER_EMPTY]
)
def test_reference_raster_algebra_empty(ralg, env_r, name, expr):
    assert ralg.eval(expr, env_r).count() == 0, f"{name}: {expr}"
