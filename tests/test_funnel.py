"""Event-funnel / retention / props-extraction semantics and plan shape."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.funnel import (
    event_funnel,
    extract_props,
    retention_cohorts,
)


def _ts(day, h=0, m=0, s=0):
    return dt.datetime(2024, 1, day, h, m, s)


def test_extract_props_stream_matches_batch(spark, tmp_path):
    """extract_props is a stateless projection — composes onto
    readStream unchanged and emits batch-identical rows."""
    rows = [
        (1, _ts(1), '{"k": 7, "s": "x"}'),
        (2, _ts(2), '{"k": "12"}'),      # string number still casts
        (3, _ts(3), 'not json at all'),  # -> NULL, never fails the scan
        (4, _ts(4), '{"other": 1}'),     # absent path -> NULL
    ]
    schema = "event_id bigint, ts timestamp, props string"
    df = spark.createDataFrame(rows, schema)
    in_dir = str(tmp_path / "in")
    df.repartition(2).write.parquet(in_dir)

    fields = {"k": ("$.k", "bigint")}
    batch = {
        r.event_id: r.k
        for r in extract_props(spark.read.parquet(in_dir), fields).collect()
    }
    out = str(tmp_path / "out")
    stream = spark.readStream.schema(schema).option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    q = (
        extract_props(stream, fields)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()  # availableNow drains deterministically
    got = {r.event_id: r.k for r in spark.read.parquet(out).collect()}
    assert got == batch == {1: 7, 2: 12, 3: None, 4: None}


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "user_id bigint, ts timestamp, event_type string"
    )


STEPS = ("view", "click", "purchase")
WEEK = 7 * 86400


def test_funnel_semantics(spark):
    rows = [
        # u1: full funnel inside the window
        (1, _ts(1), "view"), (1, _ts(2), "click"), (1, _ts(3), "purchase"),
        # u2: click BEFORE the first view — doesn't count; no later click
        (2, _ts(2), "view"), (2, _ts(1), "click"),
        # u3: click at EXACTLY t1 — strict >, doesn't count; later one does
        (3, _ts(1), "view"), (3, _ts(1), "click"), (3, _ts(1, 1), "click"),
        # u4: click past the 7-day window
        (4, _ts(1), "view"), (4, _ts(9), "click"),
        # u5: click at exactly t1 + window (boundary INCLUSIVE)
        (5, _ts(1), "view"), (5, _ts(8), "click"),
        # u6: no view at all — absent from output
        (6, _ts(1), "click"), (6, _ts(2), "purchase"),
        # u7: purchase lands before the click — step 3 needs ts > t2
        (7, _ts(1), "view"), (7, _ts(3), "click"), (7, _ts(2), "purchase"),
    ]
    out = event_funnel(_events(spark, rows), STEPS, WEEK)
    got = {
        r.user_id: (r.entered_at, r.steps_completed) for r in out.collect()
    }
    assert got == {
        1: (_ts(1), 3),
        2: (_ts(2), 1),
        3: (_ts(1), 2),
        4: (_ts(1), 1),
        5: (_ts(1), 2),
        7: (_ts(1), 2),
    }


def test_funnel_entry_is_earliest_first_step(spark):
    # two views: the funnel anchors (and windows) from the FIRST one
    rows = [
        (1, _ts(1), "view"), (1, _ts(10), "view"), (1, _ts(11), "click"),
    ]
    out = event_funnel(_events(spark, rows), STEPS, WEEK).collect()
    assert len(out) == 1
    assert out[0].entered_at == _ts(1)
    # day 11 is past day-1 + 7d: click doesn't count from the first view
    assert out[0].steps_completed == 1


def test_funnel_repeated_step_types(spark):
    # view -> view requires a strictly later second view
    rows = [
        (1, _ts(1), "view"), (1, _ts(2), "view"),
        (2, _ts(1), "view"),
    ]
    out = event_funnel(_events(spark, rows), ("view", "view"), WEEK)
    got = {r.user_id: r.steps_completed for r in out.collect()}
    assert got == {1: 2, 2: 1}


def test_funnel_validation(spark):
    df = _events(spark, [(1, _ts(1), "view")])
    with pytest.raises(ValueError):
        event_funnel(df, ("view",), WEEK)
    with pytest.raises(ValueError):
        event_funnel(df, STEPS, 0)


def test_funnel_plan_no_window_no_cartesian(spark):
    df = _events(spark, [(1, _ts(1), "view"), (1, _ts(2), "click")])
    plan = event_funnel(
        df, STEPS, WEEK, checkpoint=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "BatchEvalPython" not in plan
    # per-step mins must combine map-side (partial aggregate on min)
    assert "partial_min" in plan


def test_retention_cohorts(spark):
    rows = [
        # u1: first day 1, active days 1/2/5 (two events on day 2 dedup)
        (1, _ts(1), "view"), (1, _ts(2), "view"), (1, _ts(2, 5), "click"),
        (1, _ts(5), "view"),
        # u2: first day 2, active days 2/5
        (2, _ts(2), "view"), (2, _ts(5), "view"),
    ]
    out = retention_cohorts(_events(spark, rows))
    got = {
        (r.cohort, r.offset_days): r.n_users for r in out.collect()
    }
    d1, d2 = dt.date(2024, 1, 1), dt.date(2024, 1, 2)
    assert got == {
        (d1, 0): 1, (d1, 1): 1, (d1, 4): 1,
        (d2, 0): 1, (d2, 3): 1,
    }


def test_retention_single_user_exchange(spark):
    df = _events(spark, [(1, _ts(1), "view")])
    plan = retention_cohorts(df)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    assert "CartesianProduct" not in plan
    # exactly two exchanges: user key, then (cohort, offset)
    assert plan.count("Exchange") == 2


def test_extract_props_types_and_nulls(spark):
    df = spark.createDataFrame(
        [(1, '{"k": 69, "tag": "a"}'), (2, '{"tag": "b"}'), (3, "not json")],
        "id bigint, props string",
    )
    out = extract_props(
        df, {"k": ("$.k", "bigint"), "tag": ("$.tag", "string")}
    )
    assert dict(out.dtypes)["k"] == "bigint"
    got = {r.id: (r.k, r.tag) for r in out.collect()}
    assert got == {1: (69, "a"), 2: (None, "b"), 3: (None, None)}
    with pytest.raises(ValueError):
        extract_props(df, {})


def test_extract_props_is_scan_stage(spark):
    df = spark.createDataFrame([(1, '{"k": 1}')], "id bigint, props string")
    plan = extract_props(df, {"k": ("$.k", "bigint")})._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan
