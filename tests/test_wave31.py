"""Wave-31 operators: CDC merge + month-over-month share shift."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.cdc import apply_cdc
from grass_spark.operators.olap import share_shift


def _snap(spark):
    return spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0), (3, "c", 30.0)],
        "k bigint, name string, price double",
    )


def _changes(spark, rows):
    return spark.createDataFrame(
        rows, "k bigint, name string, price double, op string, seq int"
    )


def test_apply_cdc_upsert_delete_latest_wins(spark):
    changes = _changes(
        spark,
        [
            (2, "b2", 21.0, "U", 1),
            (2, "b3", 22.0, "U", 2),     # latest wins
            (3, None, None, "D", 1),     # delete
            (9, "new", 99.0, "I", 1),    # insert
            (9, None, None, "D", 2),     # ...then deleted again
            (4, "late", 44.0, "U", 1),   # update to absent key = insert
        ],
    )
    out = {r.k: (r.name, r.price) for r in
           apply_cdc(_snap(spark), changes, "k").collect()}
    assert out == {
        1: ("a", 10.0),      # untouched
        2: ("b3", 22.0),     # latest update
        4: ("late", 44.0),   # upsert of absent key
    }


def test_apply_cdc_validate_and_schema_guard(spark):
    dup = _changes(spark, [(1, "x", 1.0, "U", 1), (1, "y", 2.0, "U", 1)])
    with pytest.raises(Exception):
        apply_cdc(_snap(spark), dup, "k", validate=True).collect()
    with pytest.raises(ValueError):
        apply_cdc(_snap(spark), dup.drop("price"), "k")
    # clean log passes validation
    ok = _changes(spark, [(1, "x", 1.0, "U", 1), (1, "y", 2.0, "U", 2)])
    out = {r.k: r.name for r in
           apply_cdc(_snap(spark), ok, "k", validate=True).collect()}
    assert out[1] == "y"


def test_apply_cdc_hot_key_is_aggregated_not_windowed(spark):
    hot = _changes(
        spark,
        [(1, f"v{i}", float(i), "U", i) for i in range(1, 200)],
    )
    df = apply_cdc(_snap(spark), hot, "k")
    assert {r.name for r in df.collect() if r.k == 1} == {"v199"}
    # the max-struct election sits behind a localCheckpoint (the final
    # plan shows Scan ExistingRDD); the meaningful pin is that nothing
    # ever windows the change log
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan


# --------------------------------------------------------- share shift
def test_share_shift_explicit_calendar_month(spark):
    m1, m2, m4 = (
        dt.datetime(2024, 1, 5),
        dt.datetime(2024, 2, 10),
        dt.datetime(2024, 4, 1),
    )
    df = spark.createDataFrame(
        [
            ("a", m1, 30.0), ("b", m1, 70.0),
            ("a", m2, 50.0), ("b", m2, 50.0),
            ("a", m4, 10.0),  # month 3 is a GAP
        ],
        "g string, ts timestamp, v double",
    )
    out = {
        (r.month.isoformat(), r.g): r
        for r in share_shift(
            df, ts_col="ts", group_col="g", value_col="v"
        ).collect()
    }
    assert out[("2024-01-01", "a")].share == 0.3
    assert out[("2024-01-01", "a")].share_prev is None
    r2 = out[("2024-02-01", "a")]
    assert r2.share == 0.5 and r2.share_prev == 0.3
    assert abs(r2.share_delta - 0.2) < 1e-9
    # the gap month yields NULL prev, never a cross-hole compare
    r4 = out[("2024-04-01", "a")]
    assert r4.share == 1.0 and r4.share_prev is None and r4.share_delta is None
