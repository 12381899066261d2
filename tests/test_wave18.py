"""Wave-18 operators: interval overlap join, quantile rank."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql.utils import AnalysisException  # noqa: F401

from grass_spark.operators.interval import (
    _bucket_micros,
    interval_overlap_join,
)
from grass_spark.operators.robust import quantile_rank

T0 = dt.datetime(2024, 5, 1, 0, 0, 0)


def _iv(spark, rows, side):
    return spark.createDataFrame(
        rows,
        f"user_id bigint, {side}_id bigint, {side}_start timestamp_ntz, "
        f"{side}_end timestamp_ntz",
    )


def _m(minutes):
    return T0 + dt.timedelta(minutes=minutes)


def test_interval_join_basic_overlaps(spark):
    a = _iv(spark, [(1, 10, _m(0), _m(60)), (1, 11, _m(120), _m(180))], "a")
    b = _iv(
        spark,
        [
            (1, 20, _m(30), _m(90)),     # overlaps a10 [30, 60)
            (1, 21, _m(60), _m(120)),    # touches a10 end: NO (half-open)
            (1, 22, _m(170), _m(175)),   # inside a11
            (2, 23, _m(0), _m(60)),      # other user: NO
        ],
        "b",
    )
    out = interval_overlap_join(a, b, on=["user_id"], bucket="1 hour")
    got = {(r.a_id, r.b_id): r for r in out.collect()}
    assert set(got) == {(10, 20), (11, 22)}
    r = got[(10, 20)]
    assert r.overlap_start == _m(30) and r.overlap_end == _m(60)
    assert r.overlap_us == 30 * 60 * 1_000_000
    assert got[(11, 22)].overlap_us == 5 * 60 * 1_000_000


def test_interval_join_exactly_once_across_buckets(spark):
    # both intervals span many buckets and overlap in several — the
    # owner-bucket rule must emit the pair exactly once
    a = _iv(spark, [(1, 1, _m(0), _m(600))], "a")
    b = _iv(spark, [(1, 2, _m(30), _m(540))], "b")
    out = interval_overlap_join(
        a, b, on=["user_id"], bucket="1 hour"
    ).collect()
    assert len(out) == 1
    assert out[0].overlap_us == 510 * 60 * 1_000_000


def test_interval_join_matches_naive(spark):
    import random

    rng = random.Random(3)

    def mk(base):
        rows = []
        for i in range(60):
            u = rng.choice([1, 2, 3])
            s = _m(rng.randint(0, 500))
            rows.append(
                (u, base + i, s, s + dt.timedelta(minutes=rng.randint(1, 90)))
            )
        return rows

    arows, brows = mk(0), mk(1000)
    a, b = _iv(spark, arows, "a"), _iv(spark, brows, "b")
    got = {
        (r.a_id, r.b_id)
        for r in interval_overlap_join(
            a, b, on=["user_id"], bucket="30 minutes"
        ).collect()
    }
    naive = {
        (ra.a_id, rb.b_id)
        for ra in a.collect()
        for rb in b.collect()
        if ra.user_id == rb.user_id
        and ra.a_start < rb.b_end
        and rb.b_start < ra.a_end
    }
    assert got == naive and len(naive) > 10


def test_interval_join_empty_and_guards(spark):
    a = _iv(spark, [(1, 1, _m(60), _m(60))], "a")  # empty interval
    b = _iv(spark, [(1, 2, _m(0), _m(120))], "b")
    assert (
        interval_overlap_join(a, b, on=["user_id"], bucket="1 hour").count()
        == 0
    )
    with pytest.raises(ValueError):
        interval_overlap_join(a, b, a_start="x", a_end="x")
    with pytest.raises(ValueError):
        _bucket_micros("1 fortnight")
    # colliding non-key column names
    bad = b.withColumnRenamed("b_id", "a_id")
    with pytest.raises(ValueError):
        interval_overlap_join(a, bad, on=["user_id"])


def test_interval_join_max_buckets_raises_at_execution(spark):
    a = _iv(spark, [(1, 1, _m(0), _m(60 * 25))], "a")
    b = _iv(spark, [(1, 2, _m(0), _m(30))], "b")
    out = interval_overlap_join(
        a, b, on=["user_id"], bucket="1 minute", max_buckets=1000
    )
    with pytest.raises(Exception) as ei:
        out.collect()
    assert "coarser bucket" in str(ei.value)


# ---------------------------------------------------------------- ecdf
def test_quantile_rank_values(spark):
    rows = [(i, "s", v) for i, v in enumerate([10, 20, 20, 30])]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_chars int")
    out = {r.doc_id: r.ecdf for r in quantile_rank(df).collect()}
    assert out[0] == 0.25
    assert out[1] == 0.75 and out[2] == 0.75  # ties share ECDF
    assert out[3] == 1.0


def test_quantile_rank_per_group(spark):
    rows = [(1, "a", 5), (2, "a", 9), (3, "b", 5)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string, n_chars int")
    out = {r.doc_id: r.ecdf for r in quantile_rank(df).collect()}
    assert out[1] == 0.5 and out[2] == 1.0
    assert out[3] == 1.0  # group b has one row
