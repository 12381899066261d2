"""The reference's granularity-mode RASTER algebra suite as goldens.

Cases lifted verbatim from ``/root/reference/python/grass/temporal/
testsuite/unittests_temporal_raster_algebra_grs.py`` (``t.rast.algebra
-g`` with the raster parser: ``setup_common_granularity`` + mapcalc
evaluation on the resampled lists) over its fixture:

    A = a1..a6 (1..6),   1-month intervals from 2001-01-01
    B = b1,b2  (7,8),    3-month intervals from 2001-01-01
    C = c1     (9),      1-year interval from 2001-01-01
    D = d1,d2,d3 (10,11,12), 5-DAY intervals at 2001-01-01 /
        2001-03-01 / 2001-05-01 (so A×D forces a "1 day" common
        granularity, unlike the temporal-suite fixture's 31-day D)
    singletmap = 99 at [2001-03-01, 2001-04-01)
    nullmap    = all-null map at [2001-01-01, 2001-07-01)

Semantics these cases pin beyond the temporal grs suite:

* mixed month/day datasets resample to "1 day";
* an all-null map is an ABSENT dataset (test_3 registers 0 maps);
* ``map(X)`` accepts the same single-map entry tmap() uses, as a
  timeless constant (test_tmap_map);
* value conditions (``D == 11``, ``A#A == 1``) and mixed
  t_var && s_var conditions run through the mapcalc conditional
  pipeline on the granule lattice;
* neighbour indexing ``A[-1]``/``A[1]`` shifts by one GRANULE of the
  common lattice.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from grass_spark.algebra import TemporalAlgebra


def _ds(spark, specs):
    """specs: [(value | None, (y,m,d) start, (y,m,d) end)]"""
    rows = [
        ("k", datetime(*s), datetime(*e), None if v is None else float(v))
        for v, s, e in specs
    ]
    return spark.createDataFrame(
        rows,
        "k string, bucket_start timestamp, bucket_end timestamp, value double",
    )


@pytest.fixture(scope="module")
def env_rg(spark):
    d_specs = [
        (10, (2001, 1, 1), (2001, 1, 6)),
        (11, (2001, 3, 1), (2001, 3, 6)),
        (12, (2001, 5, 1), (2001, 5, 6)),
    ]
    return {
        "A": _ds(spark, [
            (1, (2001, 1, 1), (2001, 2, 1)), (2, (2001, 2, 1), (2001, 3, 1)),
            (3, (2001, 3, 1), (2001, 4, 1)), (4, (2001, 4, 1), (2001, 5, 1)),
            (5, (2001, 5, 1), (2001, 6, 1)), (6, (2001, 6, 1), (2001, 7, 1)),
        ]),
        "B": _ds(spark, [
            (7, (2001, 1, 1), (2001, 4, 1)), (8, (2001, 4, 1), (2001, 7, 1)),
        ]),
        "C": _ds(spark, [(9, (2001, 1, 1), (2002, 1, 1))]),
        "D": _ds(spark, d_specs),
        "singletmap": _ds(spark, [(99, (2001, 3, 1), (2001, 4, 1))]),
        "nullmap": _ds(spark, [(None, (2001, 1, 1), (2001, 7, 1))]),
    }


@pytest.fixture(scope="module")
def rg(spark):
    return TemporalAlgebra(keys=["k"], flavor="raster")


# (reference test name, expression, n, min, max, (y,m,d) start, (y,m,d) end)
RG_CASES = [
    ("test_1", "if(C == 9,  A - 1)", 6, 0, 5, (2001, 1, 1), (2001, 7, 1)),
    ("test_2", "A + B + C", 6, 17, 23, (2001, 1, 1), (2001, 7, 1)),
    ("test_4", "if(D == 11,  A - 1, A + 1)", 15, 2, 6,
     (2001, 1, 1), (2001, 5, 6)),
    ("arith_td_1", "A + td(A:D)", 15, 2, 6, (2001, 1, 1), (2001, 5, 6)),
    ("arith_if_1", 'if(start_date(A) >= "2001-02-01", A + A)', 5, 4, 12,
     (2001, 2, 1), (2001, 7, 1)),
    ("arith_if_2", "if(A#A == 1, A - A)", 6, 0, 0,
     (2001, 1, 1), (2001, 7, 1)),
    ("complex_arith_if_1",
     'if(start_date(A) < "2001-03-01" && A#A == 1, A+C, A-C)', 6, -6, 11,
     (2001, 1, 1), (2001, 7, 1)),
    ("temporal_neighbors", "(A[-1] : D) + (A[1] : D)", 14, 2, 10,
     (2001, 1, 2), (2001, 5, 6)),
    ("test_map", "A + map(singletmap)", 6, 100, 105,
     (2001, 1, 1), (2001, 7, 1)),
    ("test_tmap_map", "tmap(singletmap) + A + map(singletmap)", 1, 201, 201,
     (2001, 3, 1), (2001, 4, 1)),
]


@pytest.mark.parametrize(
    "name,expr,n,vmin,vmax,start,end", RG_CASES, ids=[c[0] for c in RG_CASES]
)
def test_reference_raster_gran_case(rg, env_rg, name, expr, n, vmin, vmax,
                                    start, end):
    out = rg.eval_gran(expr, env_rg)
    agg = out.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.min("bucket_start").alias("start"),
        F.max("bucket_end").alias("end"),
    ).collect()[0]
    assert agg["n"] == n, f"{name}: {expr} -> n={agg['n']}"
    assert agg["vmin"] == vmin and agg["vmax"] == vmax, (
        f"{name}: {expr} -> [{agg['vmin']}, {agg['vmax']}]"
    )
    assert agg["start"] == datetime(*start), f"{name}: {expr}"
    assert agg["end"] == datetime(*end), f"{name}: {expr}"


def test_3_nullmap_empties_the_result(rg, env_rg):
    """A + B + C + tmap(nullmap): the all-null map is an absent dataset
    — the reference registers ZERO maps and runs ZERO processes."""
    out = rg.eval_gran("A + B + C + tmap(nullmap)", env_rg)
    assert out.count() == 0
