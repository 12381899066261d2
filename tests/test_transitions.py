"""Transition-matrix / rate-anomaly semantics, bucket-decomposition
exactness, and the skew-safe plan shape."""

from __future__ import annotations

import datetime as dt
import math
import random

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.sessionize import sessionize
from grass_spark.operators.transitions import (
    event_ngrams,
    event_transitions,
    rate_anomalies,
    sessionize_events,
)

SCHEMA = "event_id bigint, user_id bigint, ts timestamp, event_type string"


def _ev(spark, rows):
    return spark.createDataFrame(rows, SCHEMA)


def _ts(day, h=0, m=0, s=0):
    return dt.datetime(2024, 1, day, h, m, s)


def _naive_transitions(rows):
    """Ground truth: global per-user (ts, id) order, consecutive pairs."""
    per_user: dict = {}
    for eid, u, ts, et in rows:
        per_user.setdefault(u, []).append((ts, eid, et))
    pairs: dict = {}
    for seq in per_user.values():
        seq.sort()
        for (_, _, a), (_, _, b) in zip(seq, seq[1:]):
            pairs[(a, b)] = pairs.get((a, b), 0) + 1
    totals: dict = {}
    for (a, _), n in pairs.items():
        totals[a] = totals.get(a, 0) + n
    return {
        (a, b): (n, round(n / totals[a], 6)) for (a, b), n in pairs.items()
    }


def test_transitions_semantics(spark):
    rows = [
        # u1 crosses a day boundary: view(d1) -> click(d1) -> view(d2)
        (1, 1, _ts(1, 10), "view"),
        (2, 1, _ts(1, 11), "click"),
        (3, 1, _ts(2, 9), "view"),
        # u2: same-ts tie broken by event_id (4 before 5)
        (4, 2, _ts(1, 12), "click"),
        (5, 2, _ts(1, 12), "view"),
        # u3: single event — contributes no pair
        (6, 3, _ts(1), "purchase"),
    ]
    got = {
        (r.from_type, r.to_type): (r.n, r.p)
        for r in event_transitions(_ev(spark, rows)).collect()
    }
    assert got == _naive_transitions(rows)


@pytest.mark.parametrize("bucket", ["day", "hour", "minute"])
def test_transitions_bucket_decomposition_exact(spark, bucket):
    """Any bucket granularity reproduces the global-order ground truth,
    including single-event buckets and multi-bucket gaps."""
    rng = random.Random(7)
    types = ["view", "click", "purchase", "refund"]
    rows = []
    eid = 0
    for u in range(1, 13):
        for _ in range(rng.randint(1, 40)):
            eid += 1
            ts = dt.datetime(2024, 1, rng.randint(1, 5), rng.randint(0, 23),
                             rng.choice([0, 15, 30, 59]))
            rows.append((eid, u, ts, rng.choice(types)))
    out = event_transitions(_ev(spark, rows), bucket=bucket)
    got = {(r.from_type, r.to_type): (r.n, r.p) for r in out.collect()}
    assert got == _naive_transitions(rows)


def test_transitions_plan_is_skew_safe(spark):
    """The boundary-stitch aggregate must be map-side combinable
    (partial min/max on (user, bucket)) and no window may partition by
    the bare user key over the raw event frame — the only bare-user
    window runs over the per-bucket frame."""
    rows = [(i, i % 3, _ts(1 + i % 5, i % 24), "view") for i in range(60)]
    plan = event_transitions(_ev(spark, rows), checkpoint=False) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan and "partial_max" in plan
    # lead + first/last flags share one partition/order spec (the lag
    # frame may split into a sibling Window node but reuses the same
    # sort); per-bucket lag + the |types|^2 normalising window follow.
    assert plan.count("Window") <= 4
    # one full-frame Sort total: the edge election runs over <= 2 rows
    # per bucket, so no SortAggregate (struct/when fallback) appears
    assert "SortAggregate" not in plan


def _naive_ngrams(rows, n):
    per_user: dict = {}
    for eid, u, ts, et in rows:
        per_user.setdefault(u, []).append((ts, eid, et))
    grams: dict = {}
    for seq in per_user.values():
        seq.sort()
        ets = [e for _, _, e in seq]
        for i in range(len(ets) - n + 1):
            g = tuple(ets[i:i + n])
            grams[g] = grams.get(g, 0) + 1
    return grams


@pytest.mark.parametrize("n", [2, 3, 4])
@pytest.mark.parametrize("bucket", ["day", "hour"])
def test_ngrams_decomposition_exact(spark, n, bucket):
    """Random data with single-event buckets (grams spanning >2
    boundaries), bot-dense buckets, and gaps — must equal the
    global-order ground truth for every n and granularity."""
    rng = random.Random(n * 17 + len(bucket))
    types = ["view", "click", "purchase", "refund"]
    rows = []
    eid = 0
    for u in range(1, 11):
        for _ in range(rng.randint(1, 50)):
            eid += 1
            ts = dt.datetime(2024, 1, rng.randint(1, 5), rng.randint(0, 23),
                             rng.choice([0, 30]))
            rows.append((eid, u, ts, rng.choice(types)))
    out = event_ngrams(_ev(spark, rows), n, bucket=bucket)
    gcols = [f"g{i + 1}" for i in range(n)]
    got = {tuple(r[g] for g in gcols): r.n_paths for r in out.collect()}
    assert got == _naive_ngrams(rows, n)


def test_ngrams_n2_equals_transitions(spark):
    rng = random.Random(5)
    rows = [(i, rng.randint(1, 6),
             dt.datetime(2024, 1, rng.randint(1, 4), rng.randint(0, 23)),
             rng.choice(["a", "b", "c"])) for i in range(300)]
    tr = {(r.from_type, r.to_type): r.n
          for r in event_transitions(_ev(spark, rows)).collect()}
    ng = {(r.g1, r.g2): r.n_paths
          for r in event_ngrams(_ev(spark, rows), 2).collect()}
    assert tr == ng


def test_ngrams_validation(spark):
    df = _ev(spark, [(1, 1, _ts(1), "view")])
    with pytest.raises(ValueError):
        event_ngrams(df, 1)
    with pytest.raises(ValueError):
        event_ngrams(df, 3, bucket="week")


def test_rate_anomalies_matches_numpy(spark):
    rng = random.Random(11)
    rows = []
    eid = 0
    for u in (1, 2):
        for d in range(1, 21):
            if rng.random() < 0.2:
                continue  # calendar gap
            for _ in range(rng.randint(1, 9)):
                eid += 1
                rows.append((eid, u, _ts(d, rng.randint(0, 23)), "view"))
    out = rate_anomalies(_ev(spark, rows), trailing_days=7, min_days=3)
    got = {(r.user_id, r.day): (r.n_events, r.n_prev, r.z)
           for r in out.collect()}

    daily: dict = {}
    for _, u, ts, _t in rows:
        daily[(u, ts.date())] = daily.get((u, ts.date()), 0) + 1
    for (u, day), c in daily.items():
        prev = [daily[(u2, d2)] for (u2, d2) in daily
                if u2 == u and 1 <= (day - d2).days <= 7]
        n, n_prev, z = got[(u, day)]
        assert n == c and n_prev == len(prev)
        if len(prev) >= 3:
            mean = sum(prev) / len(prev)
            var = sum(x * x for x in prev) / len(prev) - mean * mean
            if var > 0:
                assert z == pytest.approx(
                    round((c - mean) / math.sqrt(var), 6), abs=1e-9)
            else:
                assert z is None
        else:
            assert z is None


def test_rate_anomalies_range_frame_honours_gaps(spark):
    # days 1..3 active, then a 10-day gap: day 14's trailing-7 window is
    # EMPTY (a rows-based frame would wrongly see days 1-3).
    rows = [(i, 1, _ts(d), "view")
            for i, d in enumerate([1, 1, 1, 2, 2, 3, 14])]
    out = {r.day: (r.n_prev, r.z)
           for r in rate_anomalies(_ev(spark, rows)).collect()}
    assert out[dt.date(2024, 1, 14)] == (0, None)
    assert out[dt.date(2024, 1, 3)][0] == 2  # days 1-2 in window, < min_days
    assert out[dt.date(2024, 1, 3)][1] is None


def test_rate_anomalies_zero_variance_is_null(spark):
    rows = [(i, 1, _ts(1 + i), "view") for i in range(5)]  # 1 event/day
    out = rate_anomalies(_ev(spark, rows)).collect()
    assert all(r.z is None for r in out)


@pytest.mark.parametrize("bucket", ["day", "hour"])
def test_sessionize_events_matches_bare_window(spark, bucket):
    """The decomposition must reproduce the bare-key-window sessionize
    exactly — including multi-day sessions (gap < timeout across a
    bucket boundary), all-gap buckets, and same-ts ties."""
    rng = random.Random(23)
    rows = []
    eid = 0
    for u in range(1, 9):
        for _ in range(rng.randint(1, 60)):
            eid += 1
            rows.append((eid, u,
                         dt.datetime(2024, 1, rng.randint(1, 6),
                                     rng.randint(0, 23), rng.randint(0, 59)),
                         "view"))
    # duplicate-ts tie for determinism coverage
    rows.append((eid + 1, 1, rows[0][2], "view"))
    df = _ev(spark, rows)
    got = {r.event_id: (r.session_idx, r.session_id)
           for r in sessionize_events(df, 6 * 3600, bucket=bucket).collect()}
    ref = {r.event_id: (r.session_idx, r.session_id)
           for r in sessionize(df, 6 * 3600, keys=["user_id"],
                               order_cols=["event_id"]).collect()}
    assert got == ref


def test_sessionize_events_gap_boundary(spark):
    # gap EXACTLY == timeout stays in the same session (strict >)
    rows = [
        (1, 1, _ts(1, 0), "view"),
        (2, 1, _ts(1, 1), "view"),       # +1h == timeout -> same session
        (3, 1, _ts(1, 2, 0, 1), "view"),  # +1h1s -> new session
    ]
    out = {r.event_id: r.session_idx
           for r in sessionize_events(_ev(spark, rows), 3600).collect()}
    assert out == {1: 0, 2: 0, 3: 1}


def test_sessionize_events_plan_no_bare_user_window(spark):
    """Data-scale windows partition by (user, bucket); the bare-user
    window runs only over the per-bucket frame.  The flagged frame is
    single-executed (lazy checkpoint cuts the double consumption)."""
    rows = [(i, i % 3, _ts(1 + i % 5, i % 24), "view") for i in range(60)]
    plan = sessionize_events(_ev(spark, rows), 3600, checkpoint=False) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "partial_min" in plan or "partial_max" in plan


def test_validation(spark):
    df = _ev(spark, [(1, 1, _ts(1), "view")])
    with pytest.raises(ValueError):
        event_transitions(df, bucket="week")
    with pytest.raises(ValueError):
        rate_anomalies(df, trailing_days=0)
    with pytest.raises(ValueError):
        rate_anomalies(df, min_days=0)
    with pytest.raises(ValueError):
        sessionize_events(df, 0)
    with pytest.raises(ValueError):
        sessionize_events(df, 3600, bucket="week")


# ---------------------------------------------------------------------
# interevent_stats
# ---------------------------------------------------------------------

from grass_spark.operators.transitions import interevent_stats


def _naive_interevent(rows):
    """{user: (n_events, sorted gap list in seconds)}."""
    per_user: dict = {}
    for eid, u, ts, _ in rows:
        per_user.setdefault(u, []).append((ts, eid))
    out = {}
    for u, seq in per_user.items():
        seq.sort()
        gaps = [
            (b[0] - a[0]).total_seconds()
            for a, b in zip(seq, seq[1:])
        ]
        out[u] = (len(seq), sorted(gaps))
    return out


def test_interevent_hand_case(spark):
    rows = [
        (1, 1, _ts(1, 0, 0), "a"),
        (2, 1, _ts(1, 0, 10), "a"),     # gap 600 s
        (3, 1, _ts(1, 0, 40), "a"),     # gap 1800 s
        (4, 2, _ts(1), "a"),            # single event: no gaps
    ]
    got = {r.user_id: r for r in interevent_stats(_ev(spark, rows)).collect()}
    r1 = got[1]
    assert (r1.n_events, r1.n_gaps) == (3, 2)
    assert r1.mean_gap_s == 1200.0
    assert r1.std_gap_s == 600.0          # population stddev of {600,1800}
    assert r1.cv_gap == 0.5
    assert (r1.min_gap_s, r1.max_gap_s) == (600.0, 1800.0)
    r2 = got[2]
    assert (r2.n_events, r2.n_gaps) == (1, 0)
    assert r2.mean_gap_s is None and r2.std_gap_s is None
    assert r2.cv_gap is None


def test_interevent_ties_zero_gaps(spark):
    rows = [
        (1, 1, _ts(1, 0, 0), "a"),
        (2, 1, _ts(1, 0, 0), "a"),      # tie: zero gap
        (3, 1, _ts(1, 1, 0), "a"),
    ]
    r = interevent_stats(_ev(spark, rows)).collect()[0]
    assert r.n_gaps == 2
    assert r.min_gap_s == 0.0
    assert r.max_gap_s == 3600.0
    assert r.mean_gap_s == 1800.0


@pytest.mark.parametrize("bucket", ["day", "hour", "minute"])
def test_interevent_bucket_decomposition_exact(spark, bucket):
    """Results identical for every bucket granularity, vs ground truth."""
    rng = random.Random(13)
    rows = [
        (
            eid,
            rng.randrange(4),
            _ts(1 + rng.randrange(6), rng.randrange(24), rng.randrange(60),
                rng.randrange(60)),
            "a",
        )
        for eid in range(400)
    ]
    want = _naive_interevent(rows)
    got = {
        r.user_id: r
        for r in interevent_stats(_ev(spark, rows), bucket=bucket).collect()
    }
    assert set(got) == set(want)
    for u, (n_events, gaps) in want.items():
        r = got[u]
        assert r.n_events == n_events
        assert r.n_gaps == len(gaps)
        if gaps:
            mean = sum(gaps) / len(gaps)
            var = sum(g * g for g in gaps) / len(gaps) - mean * mean
            assert r.mean_gap_s == pytest.approx(mean, abs=1e-5)
            assert r.std_gap_s == pytest.approx(
                math.sqrt(max(var, 0.0)), abs=1e-5
            )
            assert r.min_gap_s == pytest.approx(gaps[0], abs=1e-6)
            assert r.max_gap_s == pytest.approx(gaps[-1], abs=1e-6)


def test_interevent_plan_is_skew_safe(spark):
    """Per-bucket ends are plain combinable min/max (no struct, no
    SortAggregate); the only bare-user window runs over the per-bucket
    frame."""
    rows = [(i, i % 3, _ts(1 + i % 5, i % 24), "a") for i in range(60)]
    plan = interevent_stats(_ev(spark, rows))._jdf.queryExecution() \
        .executedPlan().toString()
    assert "partial_min" in plan and "partial_max" in plan
    assert "SortAggregate" not in plan
