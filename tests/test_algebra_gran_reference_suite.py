"""The reference's granularity-mode algebra suite as goldens.

Cases lifted verbatim from ``/root/reference/python/grass/temporal/
testsuite/unittests_temporal_algebra_grs.py`` (``t.rast.algebra -g``:
``setup_common_granularity`` + granularity-resampled map lists) over
its fixture:

    A = a1..a6 (values 1..6), 1-month intervals from 2001-01-01
    B = b1,b2  (values 7,8),   3-month intervals from 2001-01-01
    C = c1     (value 9),      1-year interval   from 2001-01-01
    D = d1,d2,d3 (10,11,12),  31-day intervals at 2001-01-01 /
        2001-03-01 / 2001-05-01 (1-month gaps between them)

The mode computes the COMMON granularity of all datasets ("1 month"
here), splits every map into the granules its extent intersects, and
evaluates with equal topology; granules falling in a dataset's gaps
simply don't exist (test_common_granularity_3: A : D keeps only the
Jan/Mar/May granules).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from grass_spark.algebra import TemporalAlgebra
from grass_spark.functions.granularity import common_granularity


def _ds(spark, specs):
    """specs: [(value, (y,m,d) start, (y,m,d) end)] -> DataFrame."""
    rows = [
        ("k", datetime(*s), datetime(*e), float(v)) for v, s, e in specs
    ]
    return spark.createDataFrame(
        rows,
        "k string, bucket_start timestamp, bucket_end timestamp, value double",
    )


@pytest.fixture(scope="module")
def env_g(spark):
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
        # 31-day registrations land on month boundaries: Jan, Mar, May
        "D": _ds(spark, [
            (10, (2001, 1, 1), (2001, 2, 1)),
            (11, (2001, 3, 1), (2001, 4, 1)),
            (12, (2001, 5, 1), (2001, 6, 1)),
        ]),
    }


@pytest.fixture(scope="module")
def alg():
    return TemporalAlgebra(keys=["k"])


def test_common_granularity_value(env_g):
    # ta.granularity == "1 month" after setup (test_common_granularity_1)
    assert common_granularity(
        ["1 month", "3 months"], [datetime(2001, 1, 1)] * 2
    ) == "1 month"
    assert common_granularity(
        ["1 month", "1 year"], [datetime(2001, 1, 1)] * 2
    ) == "1 month"


def test_granularity_split_counts(alg, env_g):
    # reference test_common_granularity_1 (expr "R = A : B"):
    # check_stds("B") -> 6 granule maps — each 3-month B map splits into
    # three 1-month granules under the A×B common granularity.  The
    # expression below surfaces B's split values directly; "B : B" alone
    # would stay at B's own "3 months" (granularity scope = names IN the
    # expression, temporal_algebra.py:897-950).
    out = alg.eval_gran("B + (A - A)", env_g)
    assert out.count() == 6
    vals = sorted(r.value for r in out.collect())
    assert vals == [7.0, 7.0, 7.0, 8.0, 8.0, 8.0]


# (reference test name, expression, n, min, max, (y,m,d) start, (y,m,d) end)
GRS_CASES = [
    ("common_granularity_1", "A : B", 6, 1, 6, (2001, 1, 1), (2001, 7, 1)),
    ("common_granularity_2", "A : C", 6, 1, 6, (2001, 1, 1), (2001, 7, 1)),
    ("common_granularity_3", "A : D", 3, 1, 5, (2001, 1, 1), (2001, 6, 1)),
    ("common_granularity_4", "C : D", 3, 9, 9, (2001, 1, 1), (2001, 6, 1)),
    ("common_granularity_5", "A : C : D", 3, 1, 5,
     (2001, 1, 1), (2001, 6, 1)),
    ("common_granularity_6", "if(start_month(A) > 2, A : C : D)", 2, 3, 5,
     (2001, 3, 1), (2001, 6, 1)),
]


@pytest.mark.parametrize(
    "name,expr,n,vmin,vmax,start,end", GRS_CASES,
    ids=[c[0] for c in GRS_CASES],
)
def test_reference_gran_algebra_case(alg, env_g, name, expr, n, vmin, vmax,
                                     start, end):
    out = alg.eval_gran(expr, env_g)
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


def test_strds_args_contribute_to_common_granularity(alg, env_g):
    # The reference's setup_common_granularity ignores ONLY names
    # preceded by MAP/TMAP tokens (temporal_algebra.py:905-910); a
    # dataset referenced via strds(X) still contributes.  With A (1
    # month) in scope via strds(), B (3 months) splits into 6 monthly
    # granules; were strds(A) stripped, B : B would stay at 2 maps.
    out = alg.eval_gran("B + (strds(A) - strds(A))", env_g)
    assert out.count() == 6
    vals = sorted(r.value for r in out.collect())
    assert vals == [7.0, 7.0, 7.0, 8.0, 8.0, 8.0]


def test_gran_mode_rejects_topology_operators(alg, env_g):
    with pytest.raises(ValueError, match="topological"):
        alg.eval_gran("A {:,during} B", env_g)


def test_eval_gran_driver_traffic_bounded(spark, env_g, alg, monkeypatch):
    """-g mode collects only (a) distinct lag-delta structs and (b) one
    min(start) scalar per dataset — O(datasets), never O(rows).  Guard
    by counting rows through DataFrame.collect during an eval_gran."""
    from pyspark.sql import DataFrame

    collected = []
    orig = DataFrame.collect

    def counting_collect(self):
        rows = orig(self)
        collected.append(len(rows))
        return rows

    monkeypatch.setattr(DataFrame, "collect", counting_collect)
    out = alg.eval_gran("A : B", env_g)
    # evaluation itself is lazy; the collects so far are the mode's
    # driver traffic.  2 datasets -> 2 delta collections + 2 min-starts,
    # each a handful of rows.
    assert len(collected) <= 8
    assert all(n <= 16 for n in collected)
    monkeypatch.undo()
    assert out.count() == 6
