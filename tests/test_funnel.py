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


# ---------------------------------------------------------------------
# multi_touch_attribution
# ---------------------------------------------------------------------

from grass_spark.operators.funnel import multi_touch_attribution

EV_SCHEMA = "event_id bigint, user_id bigint, ts timestamp, event_type string"
_TS0 = dt.datetime(2024, 1, 1)


def _mta_naive(rows, look_s, half_s):
    """{(conv_id, touch_id): (n, w_linear, w_decay)} ground truth."""
    convs = [(e, u, ts) for e, u, ts, t in rows if t == "purchase"]
    touches = [(e, u, ts, t) for e, u, ts, t in rows
               if t in ("view", "click")]
    out = {}
    for cid, cu, cts in convs:
        cands = [
            (tid, tts, tt) for tid, tu, tts, tt in touches
            if tu == cu and tts <= cts
            and (cts - tts).total_seconds() <= look_s
        ]
        if not cands:
            continue
        ws = {
            tid: round(0.5 ** ((cts - tts).total_seconds() / half_s), 6)
            for tid, tts, _ in cands
        }
        s = round(sum(ws.values()), 6)
        for tid, tts, tt in cands:
            out[(cid, tid)] = (
                len(cands),
                round(1.0 / len(cands), 6),
                round(ws[tid] / s, 6),
            )
    return out


def test_multi_touch_semantics(spark):
    import random

    rng = random.Random(5)
    rows = []
    for eid in range(500):
        u = rng.randrange(6)
        ts = _TS0 + dt.timedelta(seconds=rng.randrange(10 * 86400))
        t = rng.choice(["view", "view", "click", "purchase", "error"])
        rows.append((eid, u, ts, t))
    df = spark.createDataFrame(rows, EV_SCHEMA)
    look, half = 2 * 86400, 6 * 3600
    got = {
        (r.conv_id, r.touch_id): (r.n_touches, r.w_linear, r.w_decay)
        for r in multi_touch_attribution(
            df, lookback_seconds=look, half_life_seconds=half
        ).collect()
    }
    want = _mta_naive(rows, look, half)
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0]
        assert got[k][1] == pytest.approx(want[k][1], abs=2e-6)
        assert got[k][2] == pytest.approx(want[k][2], abs=2e-6)


def test_multi_touch_weights_normalize(spark):
    rows = [
        (1, 1, _TS0, "view"),
        (2, 1, _TS0 + dt.timedelta(hours=1), "click"),
        (3, 1, _TS0 + dt.timedelta(hours=2), "purchase"),
        (4, 2, _TS0, "purchase"),          # conversion with no touch
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = multi_touch_attribution(df, half_life_seconds=3600).collect()
    assert {r.conv_id for r in out} == {3}          # conv 4 drops
    assert sum(r.w_linear for r in out) == pytest.approx(1.0, abs=1e-5)
    assert sum(r.w_decay for r in out) == pytest.approx(1.0, abs=1e-5)
    by_touch = {r.touch_id: r for r in out}
    # the closer touch (click, 1h old) out-weights the view (2h old)
    assert by_touch[2].w_decay > by_touch[1].w_decay
    assert by_touch[2].w_decay == pytest.approx(2 / 3, abs=1e-5)


def test_multi_touch_plan_no_window_no_cartesian(spark):
    rows = [(1, 1, _TS0, "view"), (2, 1, _TS0, "purchase")]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    plan = multi_touch_attribution(df)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Window" not in plan
    assert "partial_count" in plan or "partial_sum" in plan


def test_multi_touch_validation(spark):
    df = spark.createDataFrame([], EV_SCHEMA)
    with pytest.raises(ValueError):
        multi_touch_attribution(df, lookback_seconds=0)


def test_funnel_composite_key(spark):
    """Multi-column user_col scopes the funnel to the composite key."""
    rows = [
        # (user 1, session 0): view -> click completes
        (1, 1, _TS0, "view"),
        (2, 1, _TS0 + dt.timedelta(minutes=5), "click"),
        # (user 1, session 1): view only — the click belongs to sess 0
        (3, 1, _TS0 + dt.timedelta(hours=12), "view"),
        # user 2, one session, click precedes view: 1 step
        (4, 2, _TS0, "click"),
        (5, 2, _TS0 + dt.timedelta(minutes=1), "view"),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA).withColumn(
        "session_idx",
        F.when(F.col("event_id") == 3, F.lit(1)).otherwise(F.lit(0)),
    )
    got = {
        (r.user_id, r.session_idx): r.steps_completed
        for r in event_funnel(
            df, ("view", "click"), 3600,
            user_col=["user_id", "session_idx"],
        ).collect()
    }
    assert got == {(1, 0): 2, (1, 1): 1, (2, 0): 1}


def test_funnel_return_times(spark):
    rows = [
        (1, 1, _TS0, "view"),
        (2, 1, _TS0 + dt.timedelta(hours=1), "click"),
        (3, 1, _TS0 + dt.timedelta(hours=2), "purchase"),
        (4, 2, _TS0, "view"),
        (5, 2, _TS0 + dt.timedelta(hours=3), "click"),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    out = {
        r.user_id: r
        for r in event_funnel(
            df, ("view", "click", "purchase"), 86400, return_times=True
        ).collect()
    }
    assert out[1].step_ts_2 == _TS0 + dt.timedelta(hours=1)
    assert out[1].step_ts_3 == _TS0 + dt.timedelta(hours=2)
    assert out[2].step_ts_2 == _TS0 + dt.timedelta(hours=3)
    assert out[2].step_ts_3 is None
    # default output keeps the original 3-column contract
    slim = event_funnel(df, ("view", "click", "purchase"), 86400)
    assert slim.columns == ["user_id", "entered_at", "steps_completed"]
