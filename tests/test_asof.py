"""as-of join semantics (both directions, tolerance, ties) and the
bucket-decomposition exactness / skew-safe plan shape."""

from __future__ import annotations

import datetime as dt
import random

import pytest

from grass_spark.operators.asof import asof_join

L_SCHEMA = "lid bigint, user_id bigint, ts timestamp"
R_SCHEMA = "rid bigint, user_id bigint, ts timestamp, v double"


def _ts(day, h=0, m=0, s=0):
    return dt.datetime(2024, 1, day, h, m, s)


def _naive(lrows, rrows, direction="backward", tol=None):
    """Ground truth per left row: (matched_ts, matched_rid, matched_v)."""
    out = {}
    for lid, u, lts in lrows:
        cands = [(rts, rid, v) for rid, ru, rts, v in rrows if ru == u]
        if direction == "backward":
            cands = [c for c in cands if c[0] <= lts]
            best = max(cands) if cands else None
            if best and tol is not None and (lts - best[0]).total_seconds() > tol:
                best = None
        else:
            cands = [c for c in cands if c[0] >= lts]
            best = min(cands) if cands else None
            if best and tol is not None and (best[0] - lts).total_seconds() > tol:
                best = None
        out[lid] = best and (best[0], best[1], best[2])
    return out


def _got(df):
    return {
        r.lid: (None if r.ts_r is None else (r.ts_r, r.rid_r, r.v_r))
        for r in df.collect()
    }


def test_backward_semantics(spark):
    lrows = [(1, 1, _ts(2)), (2, 1, _ts(1)), (3, 2, _ts(3)), (4, 3, _ts(3))]
    rrows = [
        (10, 1, _ts(1), 1.0),   # exactly at left 2's ts — inclusive
        (11, 1, _ts(1, 12), 2.0),
        (12, 2, _ts(4), 3.0),   # after left 3 — no backward match
    ]
    left = spark.createDataFrame(lrows, L_SCHEMA)
    right = spark.createDataFrame(rrows, R_SCHEMA)
    out = asof_join(left, right, on="user_id", tie_col="rid")
    assert _got(out) == _naive(lrows, rrows)


def test_forward_semantics_and_tolerance(spark):
    lrows = [(1, 1, _ts(1)), (2, 1, _ts(5)), (3, 2, _ts(1))]
    rrows = [(10, 1, _ts(1), 1.0), (11, 1, _ts(9), 2.0)]
    left = spark.createDataFrame(lrows, L_SCHEMA)
    right = spark.createDataFrame(rrows, R_SCHEMA)
    for tol in (None, 86400):
        out = asof_join(
            left, right, on="user_id", direction="forward",
            tolerance_seconds=tol, tie_col="rid",
        )
        assert _got(out) == _naive(lrows, rrows, "forward", tol)


def test_tie_break(spark):
    # two right rows at the winning ts (== the left ts, inclusive both
    # ways): backward takes greatest rid, forward the smallest.
    lrows = [(1, 1, _ts(1))]
    rrows = [(10, 1, _ts(1), 1.0), (11, 1, _ts(1), 2.0)]
    left = spark.createDataFrame(lrows, L_SCHEMA)
    right = spark.createDataFrame(rrows, R_SCHEMA)
    back = asof_join(left, right, on="user_id", tie_col="rid").collect()[0]
    assert (back.rid_r, back.v_r) == (11, 2.0)
    fwd = asof_join(
        left, right, on="user_id", direction="forward", tie_col="rid"
    ).collect()[0]
    assert (fwd.rid_r, fwd.v_r) == (10, 1.0)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("bucket", ["day", "hour"])
def test_bucket_decomposition_exact(spark, direction, bucket):
    """Random data incl. cross-bucket matches, empty buckets on either
    side, and left-only buckets that need a multi-bucket carry."""
    rng = random.Random(13)
    lrows, rrows = [], []
    for i in range(250):
        lrows.append((i, rng.randint(1, 8),
                      dt.datetime(2024, 1, rng.randint(1, 6),
                                  rng.randint(0, 23), rng.randint(0, 59))))
    for i in range(120):
        rrows.append((i, rng.randint(1, 10),
                      dt.datetime(2024, 1, rng.randint(1, 6),
                                  rng.randint(0, 23), rng.randint(0, 59)),
                      float(i)))
    left = spark.createDataFrame(lrows, L_SCHEMA)
    right = spark.createDataFrame(rrows, R_SCHEMA)
    out = asof_join(left, right, on="user_id", direction=direction,
                    tie_col="rid", bucket=bucket)
    assert _got(out) == _naive(lrows, rrows, direction)


def test_plan_is_skew_safe(spark):
    """ONE full-frame sort total: the running match and the bucket-edge
    flag share a window spec; the carry runs over the one-row-per-bucket
    frame.  No struct election anywhere (min/max over STRUCT falls back
    to SortAggregate = a hidden second full sort)."""
    left = spark.createDataFrame([(1, 1, _ts(1))], L_SCHEMA)
    right = spark.createDataFrame([(1, 1, _ts(1), 1.0)], R_SCHEMA)
    plan = asof_join(left, right, on="user_id", tie_col="rid",
                     checkpoint=False) \
        ._jdf.queryExecution().executedPlan().toString()
    # within-(k,b) running match + edge flag (the lead/lag frame may
    # split into a sibling Window node sharing the sort) + the
    # per-bucket carry window
    assert plan.count("Window") <= 3
    assert "SortAggregate" not in plan


def test_multi_key(spark):
    # composite key (user_id, region): matches only within the pair
    left = spark.createDataFrame(
        [(1, 1, "us", _ts(2)), (2, 1, "eu", _ts(2))],
        "lid bigint, user_id bigint, region string, ts timestamp",
    )
    right = spark.createDataFrame(
        [(10, 1, "us", _ts(1), 1.0), (11, 1, "eu", _ts(1, 12), 2.0)],
        "rid bigint, user_id bigint, region string, ts timestamp, v double",
    )
    out = {r.lid: (r.rid_r, r.v_r) for r in asof_join(
        left, right, on=["user_id", "region"], tie_col="rid"
    ).collect()}
    assert out == {1: (10, 1.0), 2: (11, 2.0)}


def test_validation(spark):
    left = spark.createDataFrame([(1, 1, _ts(1))], L_SCHEMA)
    right = spark.createDataFrame([(1, 1, _ts(1), 1.0)], R_SCHEMA)
    with pytest.raises(ValueError):
        asof_join(left, right, on="user_id", direction="nearest")
    with pytest.raises(ValueError):
        asof_join(left, right, on="user_id", bucket="week")


# ---------------------------------------------------------------------
# resample_locf
# ---------------------------------------------------------------------

from grass_spark.operators import asof as asof_mod
from grass_spark.operators.asof import resample_locf

E_SCHEMA = "event_id bigint, user_id bigint, ts timestamp, value double"


def _locf_naive(rows, step_s, stale_s=None):
    """Pure-python LOCF grid per user: {(u, gts): (obs_ts, value)}."""
    from collections import defaultdict

    by_u = defaultdict(list)
    for eid, u, ts, v in rows:
        by_u[u].append((ts, eid, v))
    out = {}
    epoch = dt.datetime(1970, 1, 1)
    for u, obs in by_u.items():
        obs.sort()
        lo = min(o[0] for o in obs)
        hi = max(o[0] for o in obs)
        k = -(-int((lo - epoch).total_seconds() * 1e6) // (step_s * 10**6))
        khi = int((hi - epoch).total_seconds() * 1e6) // (step_s * 10**6)
        while k <= khi:
            gts = epoch + dt.timedelta(seconds=k * step_s)
            cands = [o for o in obs if o[0] <= gts]
            best = max(cands) if cands else None
            if best and stale_s is not None and \
                    (gts - best[0]).total_seconds() > stale_s:
                best = None
            out[(u, gts)] = best and (best[0], best[2])
            k += 1
    return out


def _resample_got(df):
    return {
        (r.user_id, r.gts): (
            None if r.ts_r is None else (r.ts_r, r.value_r)
        )
        for r in df.collect()
    }


def test_resample_locf_hand_case(spark):
    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 0, 30), 1.0),
        (2, 1, dt.datetime(2024, 1, 1, 2, 15), 2.0),
        (3, 1, dt.datetime(2024, 1, 1, 9, 0), 3.0),
    ]
    df = spark.createDataFrame(rows, E_SCHEMA)
    got = _resample_got(
        resample_locf(df, step_seconds=3600, tie_col="event_id")
    )
    # grid 01:00..09:00; LOCF carries 1.0 until 02:15 etc.
    assert got[(1, dt.datetime(2024, 1, 1, 1))] == \
        (dt.datetime(2024, 1, 1, 0, 30), 1.0)
    assert got[(1, dt.datetime(2024, 1, 1, 2))] == \
        (dt.datetime(2024, 1, 1, 0, 30), 1.0)
    assert got[(1, dt.datetime(2024, 1, 1, 3))] == \
        (dt.datetime(2024, 1, 1, 2, 15), 2.0)
    assert got[(1, dt.datetime(2024, 1, 1, 9))] == \
        (dt.datetime(2024, 1, 1, 9), 3.0)
    assert len(got) == 9


def test_resample_locf_staleness_and_short_span(spark):
    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 0, 0, 1), 1.0),
        (2, 1, dt.datetime(2024, 1, 2, 23, 0), 2.0),
        # user 2's span (20 min) contains no 1h grid point
        (3, 2, dt.datetime(2024, 1, 1, 3, 10), 9.0),
        (4, 2, dt.datetime(2024, 1, 1, 3, 30), 9.5),
    ]
    df = spark.createDataFrame(rows, E_SCHEMA)
    got = _resample_got(
        resample_locf(
            df, step_seconds=3600, tie_col="event_id",
            max_staleness_seconds=7200,
        )
    )
    assert all(u == 1 for (u, _) in got)       # user 2 has no grid point
    assert got[(1, dt.datetime(2024, 1, 1, 1))] == \
        (dt.datetime(2024, 1, 1, 0, 0, 1), 1.0)
    assert got[(1, dt.datetime(2024, 1, 1, 2))] == \
        (dt.datetime(2024, 1, 1, 0, 0, 1), 1.0)
    assert got[(1, dt.datetime(2024, 1, 1, 3))] is None   # stale
    assert got[(1, dt.datetime(2024, 1, 2, 23))] == \
        (dt.datetime(2024, 1, 2, 23), 2.0)


def test_resample_locf_ties_and_random(spark):
    rng = random.Random(7)
    rows = []
    for eid in range(300):
        u = rng.randrange(5)
        ts = dt.datetime(2024, 1, 1) + dt.timedelta(
            seconds=rng.randrange(4 * 86400)
        )
        rows.append((eid, u, ts, float(rng.randrange(100))))
    # planted tie: two rows at one ts — greatest event_id wins
    rows.append((900, 0, dt.datetime(2024, 1, 2, 0, 0, 0), 1.0))
    rows.append((901, 0, dt.datetime(2024, 1, 2, 0, 0, 0), 2.0))
    df = spark.createDataFrame(rows, E_SCHEMA)
    for stale in (None, 3600 * 3):
        got = _resample_got(
            resample_locf(
                df, step_seconds=7200, tie_col="event_id",
                max_staleness_seconds=stale, bucket="day",
            )
        )
        assert got == _locf_naive(rows, 7200, stale)


def test_resample_locf_grid_block_split(spark, monkeypatch):
    """Chunked grid generation must be invisible: tiny block == default."""
    rows = [
        (1, 1, dt.datetime(2024, 1, 1, 0, 30), 1.0),
        (2, 1, dt.datetime(2024, 1, 3, 11, 45), 2.0),
    ]
    df = spark.createDataFrame(rows, E_SCHEMA)
    base = _resample_got(
        resample_locf(df, step_seconds=3600, tie_col="event_id")
    )
    monkeypatch.setattr(asof_mod, "_GRID_BLOCK", 3)
    split = _resample_got(
        resample_locf(df, step_seconds=3600, tie_col="event_id")
    )
    assert split == base
    assert len(base) == 59  # 01:00 .. 2024-01-03 11:00 hourly inclusive


def test_resample_locf_rejects_bad_step(spark):
    df = spark.createDataFrame([], E_SCHEMA)
    with pytest.raises(ValueError):
        resample_locf(df, step_seconds=0)
