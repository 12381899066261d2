"""Wave-41 operators: week-over-week trending ranks (trending.py) and
the Heaps vocabulary-growth curve (corpusstats.vocab_growth)."""

from __future__ import annotations

import datetime as dt

import pytest

from grass_spark.operators.corpusstats import vocab_growth
from grass_spark.operators.trending import trending_ranks

T = dt.datetime


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string"
    )


def test_trending_rank_movement(spark):
    # week 1 (Mon 2024-01-01): a x3, b x1 -> a=1, b=2
    # week 2 (Mon 2024-01-08): b x5, a x2 -> b=1 (delta +1), a=2 (-1)
    rows, eid = [], 0
    for n, t, d in [(3, "a", 1), (1, "b", 2), (5, "b", 8), (2, "a", 9)]:
        for _ in range(n):
            rows.append((eid, T(2024, 1, d, 12), 1, t))
            eid += 1
    out = {(str(r.week_start), r.event_type): r
           for r in trending_ranks(_ev(spark, rows)).collect()}
    w1, w2 = "2024-01-01", "2024-01-08"
    assert out[(w1, "a")].rnk == 1 and out[(w1, "b")].rnk == 2
    assert out[(w1, "a")].prev_rnk is None  # no earlier week
    assert out[(w2, "b")].rnk == 1 and out[(w2, "b")].rank_delta == 1
    assert out[(w2, "a")].rnk == 2 and out[(w2, "a")].rank_delta == -1


def test_trending_week_anchor_is_monday(spark):
    # Sunday 2024-01-07 belongs to the week starting Mon 2024-01-01
    out = trending_ranks(
        _ev(spark, [(0, T(2024, 1, 7, 23), 1, "x")])
    ).collect()
    assert str(out[0].week_start) == "2024-01-01"


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_vocab_growth_first_occurrence_accounting(spark):
    rows = [
        (0, "a b c"),        # bucket 0: vocab {a,b,c}
        (1, "a b"),          # nothing new
        (2, "c d"),          # bucket 1: d is new
        (3, "d e  f"),       # e, f new (double space ignored)
    ]
    out = {r.bucket: r for r in vocab_growth(
        _docs(spark, rows), bucket_size=2).collect()}
    assert out[0].n_docs == 2 and out[0].bucket_tokens == 5
    assert out[0].new_words == 3 and out[0].cum_vocab == 3
    assert out[1].new_words == 3 and out[1].cum_vocab == 6
    assert out[1].cum_tokens == 10
    assert out[0].cum_tokens == 5


def test_vocab_growth_bad_bucket_raises(spark):
    with pytest.raises(ValueError, match="bucket_size"):
        vocab_growth(_docs(spark, [(1, "x")]), bucket_size=0)
