"""The reference's own algebra suite as goldens.

Every case is a (expression, expected) pair lifted verbatim from
``/root/reference/python/grass/temporal/testsuite/
unittests_temporal_algebra.py`` over its canonical fixture:

    A = a1..a4 (values 1..4), daily intervals from 2001-01-01
    B = b1,b2  (values 5,6),  2-day intervals from 2001-01-01
    C = c1     (value 7),     2-day interval  from 2001-01-02
    D = d1..d3 (values 8..10),daily intervals from 2001-01-03
    singletmap (value 99),    [2001-01-03, 2001-01-04)

The reference asserts (map count, min value, max value, dataset start,
dataset end) per expression — exactly what these tests pin.  The
during/contains selections exercise the topology builder's WIDENED
lists (a2 merely *starts* c1 and a3 *finishes* it, yet both are in
``A {:,during} C`` — spatio_temporal_relationships.py:608-672).
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
        rows, "k string, bucket_start timestamp, bucket_end timestamp, value double"
    )


@pytest.fixture(scope="module")
def env(spark):
    return {
        "A": _ds(spark, [(1, 1, 2), (2, 2, 3), (3, 3, 4), (4, 4, 5)]),
        "B": _ds(spark, [(5, 1, 3), (6, 3, 5)]),
        "C": _ds(spark, [(7, 2, 4)]),
        "D": _ds(spark, [(8, 3, 4), (9, 4, 5), (10, 5, 6)]),
        "singletmap": _ds(spark, [(99, 3, 4)]),
    }


@pytest.fixture(scope="module")
def alg():
    return TemporalAlgebra(keys=["k"])


# (reference test name, expression, n_maps, min, max, start_day, end_day)
CASES = [
    ("select1", "A : A", 4, 1, 4, 1, 5),
    ("select2", "A : D", 2, 3, 4, 3, 5),
    ("select3", "A !: D", 2, 1, 2, 1, 3),
    ("select_operators1", "A {:,during} C", 2, 2, 3, 2, 4),
    ("select_operators2", "A {:,equal|during} C", 2, 2, 3, 2, 4),
    ("select_operators3", "A {!:,during} C", 2, 1, 4, 1, 5),
    ("select_operators4", "A {:,during,d} C", 2, 2, 3, 2, 4),
    ("select_operators5", "C {:,contains} A", 1, 7, 7, 2, 4),
    ("extent1", "A {:,during,r} C", 2, 2, 3, 2, 4),
    ("extent3", "A {:,during,u} C", 2, 2, 3, 2, 4),
    ("hash1", "if(A # D == 1, A)", 2, 3, 4, 3, 5),
    ("hash_operator1", "if(A {#,during} C == 1, A)", 2, 2, 3, 2, 4),
    ("hash_operator2", "if({during}, C {#,contains} A == 2, A)", 2, 2, 3, 2, 4),
    ("tmap_function1", "tmap(singletmap)", 1, 99, 99, 3, 4),
    ("tmap_function2", "A : tmap(singletmap)", 1, 3, 3, 3, 4),
    ("merge_function1", "merge(A, D)", 7, 1, 10, 1, 6),
    ("merge_function2", "merge(A, B {!:,contains} A)", 4, 1, 4, 1, 5),
]


@pytest.mark.parametrize(
    "name,expr,n,vmin,vmax,sday,eday", CASES, ids=[c[0] for c in CASES]
)
def test_reference_algebra_case(alg, env, name, expr, n, vmin, vmax, sday, eday):
    out = alg.eval(expr, env)
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


# ---------------------------------------------------------------------
# unittests_temporal_conditionals.py — the same fixture plus
#   E = e1,e2,e3 (values 11..13), 2-day intervals from 2000-12-31
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def env_c(spark, env):
    e = spark.createDataFrame(
        [
            ("k", datetime(2000, 12, 31), datetime(2001, 1, 2), 11.0),
            ("k", datetime(2001, 1, 2), datetime(2001, 1, 4), 12.0),
            ("k", datetime(2001, 1, 4), datetime(2001, 1, 6), 13.0),
        ],
        "k string, bucket_start timestamp, bucket_end timestamp, value double",
    )
    return {**env, "E": e}


COND_CASES = [
    ("condition_1", 'if(start_date(A) >= "2001-01-03", A)',
     2, 3, 4, (2001, 1, 3), (2001, 1, 5)),
    ("condition_2", "if(td(A) == 1, A)",
     4, 1, 4, (2001, 1, 1), (2001, 1, 5)),
    ("condition_3", 'if(td(A) == 1 || start_date(A) >= "2001-01-03", A)',
     4, 1, 4, (2001, 1, 1), (2001, 1, 5)),
    ("condition_5", "if(start_day(A) <= 2, A)",
     2, 1, 2, (2001, 1, 1), (2001, 1, 3)),
    ("condition_6", 'if(td(A) == 1 {||,during} start_date(C) < "2001-01-02", A)',
     2, 2, 3, (2001, 1, 2), (2001, 1, 4)),
    ("condition_7",
     'if({over},start_date(C) == "2001-01-02" {&&,contains} td(A) == 1, B)',
     2, 5, 6, (2001, 1, 1), (2001, 1, 5)),
    ("condition_8",
     'if(start_date(B) <= "2001-01-01" {||,over,|} td(E) == 2, B)',
     2, 5, 6, (2001, 1, 1), (2001, 1, 5)),
    ("condition_9",
     'if(start_date(B) <= "2001-01-01" {&&,over,&} td(E) == 2, B)',
     1, 5, 5, (2001, 1, 1), (2001, 1, 3)),
    ("condition_10",
     'if(start_date(B) <= "2001-01-01" {||,over,|,r} td(E) == 2, E)',
     3, 11, 13, (2000, 12, 31), (2001, 1, 6)),
    ("condition_11",
     'if(start_date(B) <= "2001-01-01" {&&,over,r} td(E) == 2, E)',
     1, 11, 11, (2000, 12, 31), (2001, 1, 2)),
    ("condition_12",
     'if(start_date(B) <= "2001-01-01" {&&,over,|,r} td(E) == 2, E)',
     1, 11, 11, (2000, 12, 31), (2001, 1, 2)),
    ("conditional_13",
     "if({equal|during},td(B) == 2 {&&,contains} td(A) == 1, A)",
     4, 1, 4, (2001, 1, 1), (2001, 1, 5)),
    ("condition_else_1", 'if(start_date(A) <= "2001-01-03", A, D)',
     4, 1, 9, (2001, 1, 1), (2001, 1, 5)),
    ("condition_else_2",
     'if(td(D) == 1 && start_date(A) >= "2001-01-04", A, D)',
     2, 4, 8, (2001, 1, 3), (2001, 1, 5)),
    ("condition_else_3",
     'if({during},td(B) == 2 {&&,contains} start_date(D) >= "2001-01-04", A, D)',
     2, 8, 9, (2001, 1, 3), (2001, 1, 5)),
    ("condition_else_4",
     'if({equal|over},start_date(B) <= "2001-01-01" {&&,over,|,r} td(E) == 2, E, B)',
     3, 5, 11, (2000, 12, 31), (2001, 1, 5)),
]


@pytest.mark.parametrize(
    "name,expr,n,vmin,vmax,sd,ed", COND_CASES, ids=[c[0] for c in COND_CASES]
)
def test_reference_conditionals_case(alg, env_c, name, expr, n, vmin, vmax, sd, ed):
    out = alg.eval(expr, env_c)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.min("bucket_start").alias("start"),
        F.max("bucket_end").alias("end"),
    ).collect()[0]
    assert agg["n"] == n, f"{name}: {expr}"
    assert agg["vmin"] == vmin and agg["vmax"] == vmax, f"{name}: {expr}"
    assert agg["start"] == datetime(*sd), f"{name}: {expr}"
    assert agg["end"] == datetime(*ed), f"{name}: {expr}"


# ---------------------------------------------------------------------
# remaining unittests_temporal_algebra.py cases: the dry-run tests
# (buff_t / tshift / time-constant / merge complement) assert only the
# register count upstream; value/extent expectations here follow the
# operator definitions those counts imply (buff_t widens both ends,
# tshift moves both, start_doy(A, 1) reads the next granule's doy)
# ---------------------------------------------------------------------

EXTRA_CASES = [
    ("buffer1", 'buff_t(A, "1 day")', 4, 1, 4,
     (2000, 12, 31), (2001, 1, 6)),
    ("buff2", 'buff_t(A, "1 day") {:,contains,l} C', 2, 2, 3,
     (2001, 1, 1), (2001, 1, 5)),
    ("shift1", 'tshift(A, "3 days")', 4, 1, 4,
     (2001, 1, 4), (2001, 1, 8)),
    ("shift2", 'tshift(A, "2 days") {:,during,l} C', 1, 1, 1,
     (2001, 1, 3), (2001, 1, 4)),
    ("time_constant", "if(start_doy(A)<3,start_doy(A, 1), A)", 4, 2, 4,
     (2001, 1, 1), (2001, 1, 5)),
    ("merge_function3", "merge(A, D {!:,equal} A)", 5, 1, 10,
     (2001, 1, 1), (2001, 1, 6)),
    ("condition_4", 'if(start_date(A) >= "2001-01-03", A)', 2, 3, 4,
     (2001, 1, 3), (2001, 1, 5)),
]


@pytest.mark.parametrize(
    "name,expr,n,vmin,vmax,start,end", EXTRA_CASES,
    ids=[c[0] for c in EXTRA_CASES],
)
def test_reference_algebra_extra(alg, env, name, expr, n, vmin, vmax,
                                 start, end):
    out = alg.eval(expr, env)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.min("bucket_start").alias("start"),
        F.max("bucket_end").alias("end"),
    ).collect()[0]
    assert agg["n"] == n, f"{name}: {expr}"
    assert agg["vmin"] == vmin and agg["vmax"] == vmax, f"{name}: {expr}"
    assert agg["start"] == datetime(*start), f"{name}: {expr}"
    assert agg["end"] == datetime(*end), f"{name}: {expr}"


# ---------------------------------------------------------------------
# unittests_temporal_algebra_mixed_stds.py — cross-type selections and
# hashes (str3ds A, strds B, stvds C).  The type constructors erase to
# plain frames here; the temporal semantics are identical.  The vector
# dataset C carries no raster value — modelled as value 7 (never
# asserted by the reference for vector outputs).
# ---------------------------------------------------------------------

MIXED_CASES = [
    ("mixed_select_operators1", "A {:,during} stvds(C)", 2, 2, 3, 2, 4),
    ("mixed_select_operators2", "A {:,equal|during} stvds(C)",
     2, 2, 3, 2, 4),
    ("mixed_select_operators3", "A {!:,during} stvds(C)", 2, 1, 4, 1, 5),
    ("mixed_select_operators5", "A {:,during} strds(B)", 4, 1, 4, 1, 5),
    ("mixed_hash_operator1", "if(A {#,during} stvds(C) == 1, A)",
     2, 2, 3, 2, 4),
    ("mixed_hash_operator2", "if({during}, stvds(C) {#,contains} A == 2, A)",
     2, 2, 3, 2, 4),
    ("mixed_stds_handling1",
     "if({during}, stvds(C) {#,contains} str3ds(A) == 2, str3ds(A))",
     2, 2, 3, 2, 4),
    ("mixed_stds_handling2",
     "if({during}, (stvds(C) {#,contains} str3ds(A)) == 2, str3ds(A))",
     2, 2, 3, 2, 4),
]


@pytest.mark.parametrize(
    "name,expr,n,vmin,vmax,sday,eday", MIXED_CASES,
    ids=[c[0] for c in MIXED_CASES],
)
def test_reference_algebra_mixed(alg, env, name, expr, n, vmin, vmax,
                                 sday, eday):
    out = alg.eval(expr, env)
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


def test_reference_algebra_mixed_vector_output(alg, env):
    # V = C {:,contains} str3ds(A): one vector map, extent Jan2-Jan4
    # (test_temporal_select_operators4 — value unasserted upstream)
    out = alg.eval("C {:,contains} str3ds(A)", env)
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0]["bucket_start"] == datetime(2001, 1, 2)
    assert rows[0]["bucket_end"] == datetime(2001, 1, 4)
