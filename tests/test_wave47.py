"""Wave-47 operators: next-event top-k (transitions.next_event_top)
and the per-group freshness audit (profile.freshness_report)."""

from __future__ import annotations

import datetime as dt

import pytest

from grass_spark.operators.profile import freshness_report
from grass_spark.operators.transitions import next_event_top

T = dt.datetime


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string"
    )


def test_next_event_top_ranks_and_truncates(spark):
    # from a: b x2, c x1, d x1 -> top-2 = [b, c] (count then name)
    seq = ["a", "b", "a", "b", "a", "c", "a", "d"]
    rows = [(i, T(2024, 1, 1, 0, i), 1, t) for i, t in enumerate(seq)]
    out = next_event_top(_ev(spark, rows), k=2).collect()
    a_rows = [r for r in out if r.from_type == "a"]
    assert [(r.rank, r.to_type, r.n) for r in a_rows] == [
        (1, "b", 2), (2, "c", 1)
    ]
    assert a_rows[0].p == 0.5
    # every from_type emits at most k rows
    from collections import Counter
    assert max(Counter(r.from_type for r in out).values()) <= 2


def test_next_event_top_bad_k(spark):
    with pytest.raises(ValueError, match="k must be"):
        next_event_top(_ev(spark, [(0, T(2024, 1, 1), 1, "a")]), k=0)


def test_freshness_lag_and_recent_counts(spark):
    rows = [
        (0, T(2024, 1, 20), 1, "fresh"),
        (1, T(2024, 1, 19), 1, "fresh"),
        (2, T(2024, 1, 10), 1, "stale"),
        (3, T(2024, 1, 2), 1, "stale"),
    ]
    out = {r.group: r for r in freshness_report(
        _ev(spark, rows), group_col="event_type", recent_days=7
    ).collect()}
    f, s = out["fresh"], out["stale"]
    assert f.days_behind == 0 and str(f.last_day) == "2024-01-20"
    assert f.n_recent == 2
    assert s.days_behind == 10 and s.n_recent == 0
    assert s.n_rows == 2
