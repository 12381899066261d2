"""Pipeline-audit operators (operators/basket.py, operators/audit.py)
pinned against brute-force Python references."""

from __future__ import annotations

import datetime as dt
import itertools
import random

import pytest
from pyspark.sql import types as T

from grass_spark.operators import basket as basket_mod
from grass_spark.operators.audit import skew_report, source_overlap
from grass_spark.operators.basket import association_rules

EV_SCHEMA = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("ts", T.TimestampNTZType()),
        T.StructField("event_type", T.StringType()),
    ]
)

_D0 = dt.datetime(2024, 3, 1, 8, 0, 0)


def _ev(i, u, day_off, typ):
    return (i, u, _D0 + dt.timedelta(days=day_off), typ)


# ------------------------------------------------------------- basket


def test_association_rules_vs_bruteforce(spark):
    rng = random.Random(5)
    rows, i = [], 0
    for u in range(8):
        for d in range(6):
            for typ in "abcd":
                if rng.random() < 0.4:
                    # duplicates within a basket must not change counts
                    for _ in range(rng.randint(1, 2)):
                        rows.append(_ev(i, u, d, typ))
                        i += 1
    df = spark.createDataFrame(rows, EV_SCHEMA)
    got = {
        (r.antecedent, r.consequent): r
        for r in association_rules(df).collect()
    }

    baskets = {}
    for _, u, ts, typ in rows:
        baskets.setdefault((u, ts.date()), set()).add(typ)
    n = len(baskets)
    item_c = {}
    pair_c = {}
    for items in baskets.values():
        for t in items:
            item_c[t] = item_c.get(t, 0) + 1
        for a, b in itertools.permutations(items, 2):
            pair_c[(a, b)] = pair_c.get((a, b), 0) + 1
    assert set(got) == set(pair_c)
    for (a, b), pc in pair_c.items():
        r = got[(a, b)]
        assert r.pair_count == pc
        assert r.support == round(pc / n, 6)
        assert r.confidence == round(pc / item_c[a], 6)
        assert r.lift == round(pc * n / (item_c[a] * item_c[b]), 6)


def test_association_rules_custom_basket_and_min_count(spark):
    rows = [
        _ev(0, 1, 0, "a"), _ev(1, 1, 0, "b"),
        _ev(2, 1, 3, "a"), _ev(3, 1, 3, "b"),
        _ev(4, 2, 0, "a"), _ev(5, 2, 0, "c"),
    ]
    df = spark.createDataFrame(rows, EV_SCHEMA)
    # basket = whole user (ignore day): (a,b) together for user 1 only
    got = {
        (r.antecedent, r.consequent): r.pair_count
        for r in association_rules(
            df, basket_cols=["user_id"], min_pair_count=1
        ).collect()
    }
    assert got[("a", "b")] == 1 and got[("a", "c")] == 1
    got2 = association_rules(
        df, basket_cols=["user_id"], min_pair_count=2
    ).collect()
    assert got2 == []


def test_association_rules_vocab_guard(spark, monkeypatch):
    monkeypatch.setattr(basket_mod, "_MAX_ITEMS", 2)
    rows = [_ev(i, 1, 0, t) for i, t in enumerate("abc")]
    with pytest.raises(ValueError, match="vocabulary"):
        association_rules(spark.createDataFrame(rows, EV_SCHEMA))


# ------------------------------------------------------------ overlap

DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
        T.StructField("source", T.StringType()),
    ]
)


def test_source_overlap_known_jaccard(spark):
    # bigrams: s1 doc has {a b, b c}, s2 doc has {b c, c d} -> J=1/3;
    # s3 shares nothing
    rows = [
        (0, "a b c", "s1"),
        (1, "b c d", "s2"),
        (2, "x y z", "s3"),
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    got = {
        (r.source_a, r.source_b): r
        for r in source_overlap(df, n=2).collect()
    }
    assert set(got) == {("s1", "s2")}
    r = got[("s1", "s2")]
    assert (r.shingles_a, r.shingles_b, r.common) == (2, 2, 1)
    assert r.jaccard == round(1 / 3, 6)


def test_source_overlap_short_doc_fallback_and_dedup(spark):
    # doc shorter than n contributes its whole text; duplicate
    # shingles within a source count once
    rows = [
        (0, "hello", "s1"),
        (1, "hello", "s2"),
        (2, "hello", "s2"),
        (3, "hello world extra", "s2"),
    ]
    df = spark.createDataFrame(rows, DOC_SCHEMA)
    r = source_overlap(df, n=4).collect()[0]
    # s1 = {hello}; s2 = {hello, hello world extra}
    assert (r.shingles_a, r.shingles_b, r.common) == (1, 2, 1)
    assert r.jaccard == 0.5


# --------------------------------------------------------------- skew


def _ref_skew(freqs):
    fs = sorted(freqs)
    n, rows = len(fs), sum(fs)
    srf = sum((i + 1) * f for i, f in enumerate(fs))
    gini = 2 * srf / (n * rows) - (n + 1) / n

    def q(p_num, p_den):
        need = -(-p_num * n // p_den)  # ceil
        return fs[need - 1]

    return {
        "n_rows": rows,
        "n_keys": n,
        "max_freq": fs[-1],
        "p50_freq": q(1, 2),
        "p90_freq": q(9, 10),
        "p99_freq": q(99, 100),
        "top_share": round(fs[-1] / rows, 6),
        "gini": round(gini, 6),
    }


def test_skew_report_vs_reference(spark):
    rng = random.Random(17)
    # zipf-ish key draw
    rows = []
    for i in range(4000):
        k = min(int(1 / max(rng.random(), 1e-9)), 500)
        rows.append((i, k))
    df = spark.createDataFrame(rows, ["row_id", "key"])
    got = skew_report(df, "key").collect()[0].asDict()

    freqs = {}
    for _, k in rows:
        freqs[k] = freqs.get(k, 0) + 1
    exp = _ref_skew(list(freqs.values()))
    assert got == exp


def test_skew_report_uniform_and_single_key(spark):
    uni = spark.createDataFrame(
        [(i, i % 10) for i in range(100)], ["row_id", "key"]
    )
    r = skew_report(uni, "key").collect()[0]
    assert r.gini == 0.0 and r.n_keys == 10 and r.max_freq == 10
    one = spark.createDataFrame([(i, 1) for i in range(50)], ["r", "key"])
    r1 = skew_report(one, "key").collect()[0]
    assert r1.gini == 0.0 and r1.n_keys == 1 and r1.top_share == 1.0


def test_skew_report_composite_key(spark):
    df = spark.createDataFrame(
        [(1, "a", 1), (2, "a", 1), (3, "a", 2), (4, "b", 1)],
        ["row_id", "k1", "k2"],
    )
    r = skew_report(df, ["k1", "k2"]).collect()[0]
    assert r.n_keys == 3 and r.n_rows == 4 and r.max_freq == 2
