"""Wave-50 operators: pre-join cardinality report
(profile.join_cardinality) and per-user Herfindahl concentration
(engagement.user_hhi)."""

from __future__ import annotations

import datetime as dt

from grass_spark.operators.engagement import user_hhi
from grass_spark.operators.profile import join_cardinality

T = dt.datetime


def test_join_cardinality_exact_counts(spark):
    left = spark.createDataFrame(
        [(1,), (1,), (2,), (3,), (None,)], "k bigint"
    )
    right = spark.createDataFrame(
        [(1,), (1,), (1,), (2,), (9,)], "k bigint"
    )
    out = join_cardinality(
        left, right, left_key="k", right_key="k"
    ).collect()[0]
    assert out.n_left_rows == 4 and out.n_left_keys == 3   # NULL dropped
    assert out.n_right_rows == 5 and out.n_right_keys == 3
    assert out.n_matched_keys == 2                          # keys 1, 2
    assert out.max_left_fanout == 2 and out.max_right_fanout == 3
    assert out.exact_join_rows == 2 * 3 + 1 * 1             # 7


def test_join_cardinality_disjoint(spark):
    a = spark.createDataFrame([(1,)], "k bigint")
    b = spark.createDataFrame([(2,)], "k bigint")
    out = join_cardinality(a, b, left_key="k", right_key="k").collect()[0]
    assert out.n_matched_keys == 0 and out.exact_join_rows == 0


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string"
    )


def test_user_hhi_closed_form(spark):
    rows = (
        [(i, T(2024, 1, 1), 1, "a") for i in range(2)]
        + [(10 + i, T(2024, 1, 1), 1, "b") for i in range(2)]
        + [(20, T(2024, 1, 1), 2, "x")]
    )
    out = {r.user_id: r for r in user_hhi(_ev(spark, rows)).collect()}
    # user 1: even 2-type mix -> hhi = 0.5; user 2: single type -> 1.0
    assert out[1].n_events == 4 and out[1].n_types == 2
    assert out[1].hhi == 0.5
    assert out[2].hhi == 1.0
