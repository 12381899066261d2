"""Wave-40 operators: fk-orphan audit (integrity.fk_orphans) and the
cumulative user-growth curve (engagement.user_growth)."""

from __future__ import annotations

import datetime as dt

import pytest

from grass_spark.operators.engagement import user_growth
from grass_spark.operators.integrity import fk_orphans

T = dt.datetime


def test_fk_orphans_counts(spark):
    child = spark.createDataFrame(
        [(1, 10), (2, 10), (3, 20), (4, 99), (5, 99), (6, None)],
        "id bigint, fk bigint",
    )
    parent = spark.createDataFrame([(10,), (20,), (30,)], "pk bigint")
    out = fk_orphans([("c->p", child, "fk", parent, "pk")]).collect()[0]
    assert out.relationship == "c->p"
    assert out.n_rows == 5 and out.n_null == 1
    assert out.n_orphan_keys == 1      # key 99
    assert out.n_orphan_rows == 2      # rows 4, 5
    assert out.orphan_rate == 0.4


def test_fk_orphans_clean_and_multi(spark):
    child = spark.createDataFrame([(1, 10)], "id bigint, fk bigint")
    parent = spark.createDataFrame([(10,)], "pk bigint")
    out = {r.relationship: r for r in fk_orphans(
        [("clean", child, "fk", parent, "pk"),
         ("self", parent, "pk", parent, "pk")]
    ).collect()}
    assert out["clean"].n_orphan_rows == 0
    assert out["clean"].orphan_rate == 0.0
    assert set(out) == {"clean", "self"}


def test_fk_orphans_empty_spec_raises(spark):
    with pytest.raises(ValueError, match="relationship"):
        fk_orphans([])


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string"
    )


def test_user_growth_densified_cumulative(spark):
    rows = [
        (0, T(2024, 1, 1), 1, "a"),
        (1, T(2024, 1, 1), 2, "a"),
        (2, T(2024, 1, 3), 1, "a"),   # user 1 again: not new
        (3, T(2024, 1, 4), 3, "a"),
    ]
    out = user_growth(_ev(spark, rows)).collect()
    days = [(str(r.day), r.n_new_users, r.cum_users) for r in out]
    assert days == [
        ("2024-01-01", 2, 2),
        ("2024-01-02", 0, 2),   # gap day densified to zero
        ("2024-01-03", 0, 2),
        ("2024-01-04", 1, 3),
    ]
