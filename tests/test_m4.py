"""M4 downsampling semantics and the combinable-election plan shape."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from grass_spark.operators.m4 import m4_downsample

SCHEMA = "event_id bigint, event_type string, ts timestamp, value double"


def _naive(rows, n_buckets):
    lo = min(int(r[2].timestamp() * 1e6) for r in rows)
    hi = max(int(r[2].timestamp() * 1e6) for r in rows)
    per: dict = {}
    for eid, s, ts, v in rows:
        t = int(ts.timestamp() * 1e6)
        b = (t - lo) * n_buckets // (hi - lo + 1)
        per.setdefault((s, b), []).append((t, eid, v, ts))
    out = {}
    for key, pts in per.items():
        first = min(pts)
        last = max(pts)
        vmin = min(pts, key=lambda p: (p[2], p[0], p[1]))
        vmax = max(pts, key=lambda p: (p[2], p[0], p[1]))
        out[key] = (
            first[3], round(first[2], 6), last[3], round(last[2], 6),
            vmin[3], round(vmin[2], 6), vmax[3], round(vmax[2], 6),
            len(pts),
        )
    return out


@pytest.mark.parametrize("n_buckets", [1, 7, 50])
def test_m4_matches_naive(spark, n_buckets):
    rng = random.Random(31)
    rows = [
        (i, rng.choice(["a", "b"]),
         dt.datetime(2024, 1, rng.randint(1, 9), rng.randint(0, 23),
                     rng.randint(0, 59), tzinfo=dt.timezone.utc)
         .replace(tzinfo=None),
         round(rng.uniform(-5, 5), 3))
        for i in range(400)
    ]
    got = {
        (r.series, r.bucket): (
            r.t_first, r.v_first, r.t_last, r.v_last,
            r.t_min, r.v_min, r.t_max, r.v_max, r.n,
        )
        for r in m4_downsample(
            spark.createDataFrame(rows, SCHEMA), n_buckets
        ).collect()
    }
    # naive bucketing uses UTC epoch micros; Spark's cast uses the
    # session tz — bucket ids only depend on (t - lo), so both agree
    naive = _naive(
        [(i, s, ts.replace(tzinfo=dt.timezone.utc), v)
         for i, s, ts, v in rows], n_buckets)
    naive = {k: tuple(
        x.replace(tzinfo=None) if isinstance(x, dt.datetime) else x
        for x in v) for k, v in naive.items()}
    assert got == naive


def test_m4_bucket_count_bound(spark):
    rows = [(i, "a", dt.datetime(2024, 1, 1, 0, 0, i), float(i))
            for i in range(60)]
    out = m4_downsample(spark.createDataFrame(rows, SCHEMA), 10).collect()
    assert len(out) == 10
    assert all(0 <= r.bucket < 10 for r in out)
    assert sum(r.n for r in out) == 60


def test_m4_plan_is_one_combinable_groupby(spark):
    rows = [(i, "a", dt.datetime(2024, 1, 1, 0, 0, i), float(i))
            for i in range(30)]
    plan = m4_downsample(spark.createDataFrame(rows, SCHEMA), 5) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan and "partial_max" in plan
    assert "Window" not in plan


def test_m4_validation(spark):
    df = spark.createDataFrame(
        [(1, "a", dt.datetime(2024, 1, 1), 1.0)], SCHEMA)
    with pytest.raises(ValueError):
        m4_downsample(df, 0)
    with pytest.raises(ValueError):
        m4_downsample(df.where("value > 99"), 5)  # empty input