"""Gap-fill parity with the reference golden table.

Reference: ``temporal/t.rast.gapfill/testsuite/test_gapfill.py:103-116`` —
values 100 @ 2001-01, 400 @ 2001-04, 1200 @ 2001-12 at 1-month
granularity fill to Feb=200, Mar=300, May=500 ... Nov=1100 (equally
spaced linear steps at positions i/(k+1),
``raster/r.series.interp/main.c:412-445``).
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.gapfill import gapfill, gaps_report


def _mk(spark, rows, cols=("conv_id", "bucket_start", "v")):
    return spark.createDataFrame(rows, list(cols))


GOLDEN = [
    ("c", datetime(2001, 1, 1), 100.0),
    ("c", datetime(2001, 4, 1), 400.0),
    ("c", datetime(2001, 12, 1), 1200.0),
]


def test_gapfill_golden_monthly(spark):
    out = gapfill(_mk(spark, GOLDEN), "1 month", value_cols=["v"])
    got = {
        r["bucket_start"].month: r["v"]
        for r in out.filter("filled").collect()
    }
    expected = {2: 200.0, 3: 300.0, 5: 500.0, 6: 600.0, 7: 700.0,
                8: 800.0, 9: 900.0, 10: 1000.0, 11: 1100.0}
    # the reference golden shows integers because its test maps are CELL
    # rasters; the C double formula (1-pos)*l + pos*r itself yields
    # 299.99999999999994 for pos=2/3 — we match the C arithmetic, so
    # compare at double precision, not the int-rounded golden.
    assert set(got) == set(expected)
    for m, v in expected.items():
        assert got[m] == pytest.approx(v), (m, got[m])


def test_gapfill_keeps_originals_and_marks(spark):
    out = gapfill(_mk(spark, GOLDEN), "1 month", value_cols=["v"])
    orig = out.filter(~F.col("filled")).collect()
    assert sorted(r["v"] for r in orig) == [100.0, 400.0, 1200.0]
    assert out.count() == 12  # full Jan..Dec


def test_gapfill_null_neighbor_gives_null(spark):
    rows = [
        ("c", datetime(2001, 1, 1), None),
        ("c", datetime(2001, 4, 1), 400.0),
    ]
    df = spark.createDataFrame(rows, "conv_id string, bucket_start timestamp, v double")
    out = gapfill(df, "1 month", value_cols=["v"])
    filled = out.filter("filled").collect()
    assert len(filled) == 2
    assert all(r["v"] is None for r in filled)


def test_gapfill_no_gaps_is_identity(spark):
    rows = [("c", datetime(2001, 1, 1), 1.0), ("c", datetime(2001, 2, 1), 2.0)]
    out = gapfill(_mk(spark, rows), "1 month", value_cols=["v"])
    assert out.filter("filled").count() == 0
    assert out.count() == 2


def test_gapfill_per_key_independent(spark):
    rows = [
        ("a", datetime(2001, 1, 1), 0.0),
        ("a", datetime(2001, 3, 1), 2.0),
        ("b", datetime(2001, 1, 1), 10.0),
        ("b", datetime(2001, 2, 1), 20.0),
    ]
    out = gapfill(_mk(spark, rows), "1 month", value_cols=["v"])
    filled = out.filter("filled").collect()
    assert len(filled) == 1
    assert filled[0]["conv_id"] == "a" and filled[0]["v"] == 1.0


def test_gapfill_sub_day_granularity(spark):
    rows = [
        ("c", datetime(2024, 1, 1, 0, 0), 0.0),
        ("c", datetime(2024, 1, 1, 0, 4), 40.0),
    ]
    out = gapfill(_mk(spark, rows), "1 minute", value_cols=["v"])
    got = {r["bucket_start"].minute: r["v"] for r in out.filter("filled").collect()}
    assert got == {1: 10.0, 2: 20.0, 3: 30.0}


def test_gapfill_multiple_value_cols(spark):
    rows = [
        ("c", datetime(2001, 1, 1), 100.0, 1.0),
        ("c", datetime(2001, 3, 1), 300.0, 3.0),
    ]
    df = _mk(spark, rows, cols=("conv_id", "bucket_start", "v", "w"))
    filled = gapfill(df, "1 month", value_cols=["v", "w"]).filter("filled").collect()
    assert len(filled) == 1
    assert filled[0]["v"] == 200.0 and filled[0]["w"] == 2.0


def test_gaps_report(spark):
    rep = gaps_report(_mk(spark, GOLDEN), "1 month").collect()
    got = {(r["gap_start"].month, r["gap_end"].month): r["gap_len"] for r in rep}
    assert got == {(2, 4): 2, (5, 12): 7}


def test_gapfill_bucket_end_column(spark):
    df = _mk(spark, GOLDEN).withColumn(
        "bucket_end", F.add_months("bucket_start", 1).cast("timestamp")
    )
    out = gapfill(df, "1 month", value_cols=["v"])
    row = out.filter("filled and month(bucket_start) = 2").collect()[0]
    assert row["bucket_end"] == datetime(2001, 3, 1)
