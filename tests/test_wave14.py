"""Wave-14 operators: BM25 retrieval, PMI collocations, median/MAD
outliers, Kaplan-Meier survival, daily-series ACF."""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from grass_spark.operators.acf import acf_daily, daily_counts
from grass_spark.operators.collocations import bigram_counts, pmi_collocations
from grass_spark.operators.robust import _census_median, mad_outliers
from grass_spark.operators.search import bm25_search
from grass_spark.operators.survival import km_survival


# ---------------------------------------------------------------- bm25
def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def test_bm25_ranks_matching_docs(spark):
    docs = _docs(
        spark,
        [
            (1, "hash join hash join hash"),
            (2, "hash once in a much longer document full of filler " * 3),
            (3, "nothing relevant here at all"),
            (4, "join tables with a hash join strategy"),
        ],
    )
    q = spark.createDataFrame(
        [(1, "hash join")], "query_id int, q_text string"
    )
    out = bm25_search(docs, q, top_k=10).orderBy("rank").collect()
    ids = [r.doc_id for r in out]
    assert 3 not in ids  # no query term -> absent
    assert ids[0] in (1, 4)  # term-dense short docs beat the long one
    assert ids[-1] == 2  # long filler doc ranks last of the matches
    assert all(out[i].score >= out[i + 1].score for i in range(len(out) - 1))
    # n_terms counts DISTINCT matched query terms
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].n_terms == 2 and by_id[2].n_terms == 1


def test_bm25_query_term_multiplicity_ignored(spark):
    docs = _docs(spark, [(1, "alpha beta"), (2, "alpha gamma")])
    q1 = spark.createDataFrame(
        [(1, "alpha alpha alpha")], "query_id int, q_text string"
    )
    q2 = spark.createDataFrame([(1, "alpha")], "query_id int, q_text string")
    s1 = {(r.doc_id, r.score) for r in bm25_search(docs, q1).collect()}
    s2 = {(r.doc_id, r.score) for r in bm25_search(docs, q2).collect()}
    assert s1 == s2


def test_bm25_scan_equals_census(spark):
    import random

    rng = random.Random(13)
    vocab = [f"t{i}" for i in range(30)]
    docs = _docs(
        spark,
        [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(1, 15))))
            for i in range(300)
        ],
    )
    q = spark.createDataFrame(
        [(1, "t0 t7 t7 t13"), (2, "t1"), (3, "zzz")],
        "query_id int, q_text string",
    )
    a = bm25_search(docs, q, top_k=7, method="scan").orderBy(
        "query_id", "rank"
    ).collect()
    b = bm25_search(docs, q, top_k=7, method="census").orderBy(
        "query_id", "rank"
    ).collect()
    assert len(a) > 0
    assert [tuple(r) for r in a] == [tuple(r) for r in b]


def test_bm25_empty_query_vocab(spark):
    docs = _docs(spark, [(1, "alpha beta")])
    q = spark.createDataFrame([(1, "!!! ???")], "query_id int, q_text string")
    assert bm25_search(docs, q, method="scan").count() == 0
    assert bm25_search(docs, q, method="census").count() == 0


def test_bm25_two_stage_topk_equals_bare_window(spark):
    import random

    rng = random.Random(7)
    vocab = ["alpha", "beta", "gamma", "delta"]
    docs = _docs(
        spark,
        [
            (i, " ".join(rng.choice(vocab) for _ in range(rng.randint(3, 12))))
            for i in range(200)
        ],
    )
    q = spark.createDataFrame(
        [(1, "alpha delta"), (2, "beta")], "query_id int, q_text string"
    )
    got = bm25_search(docs, q, top_k=5, salts=4).orderBy(
        "query_id", "rank"
    ).collect()
    ref = bm25_search(docs, q, top_k=5, salts=1).orderBy(
        "query_id", "rank"
    ).collect()
    assert [tuple(r) for r in got] == [tuple(r) for r in ref]


# -------------------------------------------------------- collocations
def test_bigram_counts_adjacency(spark):
    docs = spark.createDataFrame(
        [("a b c b c",), ("b c",), ("solo",)], "text string"
    )
    got = {
        (r.w1, r.w2): r.cxy for r in bigram_counts(docs).collect()
    }
    assert got == {("a", "b"): 1, ("b", "c"): 3, ("c", "b"): 1}


def test_pmi_prefers_exclusive_pairs(spark):
    # "x y" always adjacent and exclusive; "a b" adjacent but a, b also
    # appear everywhere else -> PMI(x,y) > PMI(a,b)
    rows = [("x y a b",)] * 6 + [("a c b d a e b f",)] * 6
    docs = spark.createDataFrame(rows, "text string")
    out = pmi_collocations(docs, min_count=3, top_k=10).collect()
    by_pair = {(r.w1, r.w2): r for r in out}
    assert ("x", "y") in by_pair and ("a", "b") in by_pair
    assert by_pair[("x", "y")].pmi > by_pair[("a", "b")].pmi
    assert by_pair[("x", "y")].rank == 1
    # exact PMI check: counts are deterministic
    r = by_pair[("x", "y")]
    n1 = 6 * 4 + 6 * 8
    nb = 6 * 3 + 6 * 7
    want = round(math.log((r.cxy * n1 * n1) / (nb * r.c1 * r.c2)), 6)
    assert r.pmi == pytest.approx(want, abs=1e-9)


def test_pmi_min_count_filters(spark):
    docs = spark.createDataFrame([("p q",), ("p q",), ("r s",)], "text string")
    out = pmi_collocations(docs, min_count=2, top_k=10).collect()
    pairs = {(r.w1, r.w2) for r in out}
    assert pairs == {("p", "q")}


# -------------------------------------------------------------- robust
def test_census_median_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(3)
    vals = rng.integers(0, 50, size=501).tolist() + rng.integers(
        0, 7, size=500
    ).tolist()
    groups = ["a"] * 501 + ["b"] * 500
    df = spark.createDataFrame(
        list(zip(groups, map(int, vals))), "g string, v int"
    )
    census = df.groupBy("g", "v").agg(F.count(F.lit(1)).alias("c"))
    got = {
        r.g: (r.med, r.n)
        for r in _census_median(census, "g", "v", "c").collect()
    }
    va = np.array(vals[:501])
    vb = np.array(vals[501:])
    assert got["a"][1] == 501 and got["b"][1] == 500
    assert got["a"][0] == pytest.approx(float(np.median(va)), abs=0)
    assert got["b"][0] == pytest.approx(float(np.median(vb)), abs=0)


def test_mad_outliers_flags_planted(spark):
    rows = [("s", 100 + (i % 11) - 5) for i in range(200)]
    rows += [("s", 10_000)] * 3  # planted far outliers
    df = spark.createDataFrame(rows, "source string, n_chars int")
    out = mad_outliers(df, k=3.0).collect()
    assert len(out) == 1
    r = out[0]
    assert r.n == 203
    assert r.n_outliers == 3
    assert abs(r.med - 100.0) <= 1.0
    assert r.outlier_frac == pytest.approx(round(3 / 203, 6), abs=1e-9)


def test_mad_outliers_zero_mad_degenerate(spark):
    # constant column: med = v, mad = 0, cutoff 0 -> only off-value rows flag
    rows = [("s", 5)] * 50 + [("s", 6)] * 2
    df = spark.createDataFrame(rows, "source string, n_chars int")
    r = mad_outliers(df, k=3.0).collect()[0]
    assert r.mad == 0.0 and r.cutoff == 0.0
    assert r.n_outliers == 2


# ------------------------------------------------------------ survival
def _ev(spark, rows):
    return spark.createDataFrame(rows, "user_id bigint, ts timestamp_ntz")


def test_km_survival_hand_computed(spark):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    # 2 users churn at lifetime 0 (last event long before max), 1 user
    # churns at lifetime 2, 1 user censored at lifetime 29 (defines max)
    rows += [(1, t0), (2, t0)]
    rows += [(3, t0), (3, t0 + dt.timedelta(days=2))]
    rows += [(4, t0), (4, t0 + dt.timedelta(days=29))]
    out = km_survival(_ev(spark, rows), churn_gap_days=7).collect()
    by_day = {r.lifetime_day: r for r in out}
    assert by_day[0].n_at_risk == 4 and by_day[0].n_churned == 2
    # S(0) = 1 - 2/4 = 0.5
    assert by_day[0].survival == pytest.approx(0.5, abs=1e-6)
    assert by_day[2].n_at_risk == 2 and by_day[2].n_churned == 1
    # S(2) = 0.5 * (1 - 1/2) = 0.25
    assert by_day[2].survival == pytest.approx(0.25, abs=1e-6)
    # censored tail: factor 1, survival carries through
    assert by_day[29].n_churned == 0 and by_day[29].n_censored == 1
    assert by_day[29].survival == pytest.approx(0.25, abs=1e-6)


def test_km_survival_churn_and_censor_same_day(spark):
    t0 = dt.datetime(2024, 1, 1)
    # users 1, 2 churn at lifetime 0; user 9 (defines max) is censored
    # at lifetime 0 on the SAME census row -> d=2, c=1, n=3
    rows = [(1, t0), (2, t0), (9, t0 + dt.timedelta(days=40))]
    out = km_survival(_ev(spark, rows), churn_gap_days=7).collect()
    by_day = {r.lifetime_day: r for r in out}
    # at lifetime 0: users 1, 2 churned, user 9 also lifetime 0 but
    # censored (it IS the max) -> d=2, n=3, S = 1/3
    assert by_day[0].n_churned == 2 and by_day[0].n_censored == 1
    assert by_day[0].survival == pytest.approx(round(1 / 3, 6), abs=1e-9)


def test_km_survival_d_equals_n_guard(spark):
    # everyone still at risk churns on the same lifetime day: the
    # ln(1 - d/n) = ln(0) branch must never evaluate (DuckDB raises;
    # the Spark side NULL-guards it) and survival lands exactly 0.
    t0 = dt.datetime(2024, 1, 1)
    rows = [
        (1, t0), (1, t0 + dt.timedelta(days=1)),   # lifetime 1, churned
        (2, t0), (2, t0 + dt.timedelta(days=1)),   # lifetime 1, churned
        (3, t0 + dt.timedelta(days=30)),           # lifetime 0, censored
    ]
    out = km_survival(_ev(spark, rows), churn_gap_days=5).collect()
    by_day = {r.lifetime_day: r for r in out}
    assert by_day[0].n_churned == 0 and by_day[0].n_censored == 1
    assert by_day[0].n_at_risk == 3
    assert by_day[0].survival == pytest.approx(1.0, abs=1e-9)
    assert by_day[1].n_churned == 2 and by_day[1].n_at_risk == 2
    assert by_day[1].survival == 0.0


# ----------------------------------------------------------------- acf
def test_daily_counts_gap_filled(spark):
    t0 = dt.datetime(2024, 3, 1)
    rows = [(t0,), (t0,), (t0 + dt.timedelta(days=3),)]
    ev = spark.createDataFrame(rows, "ts timestamp_ntz")
    got = {r.day.isoformat(): r.x for r in daily_counts(ev).collect()}
    assert got == {
        "2024-03-01": 2,
        "2024-03-02": 0,
        "2024-03-03": 0,
        "2024-03-04": 1,
    }


def test_acf_period2_series(spark):
    # alternating high/low daily counts -> acf(1) < 0 < acf(2)
    t0 = dt.datetime(2024, 3, 1)
    rows = []
    for i in range(20):
        n = 8 if i % 2 == 0 else 2
        rows += [(t0 + dt.timedelta(days=i),)] * n
    ev = spark.createDataFrame(rows, "ts timestamp_ntz")
    got = {r.lag: r.acf for r in acf_daily(ev, max_lag=3).collect()}
    assert got[1] < 0 < got[2]
    assert got[2] > abs(got[3]) or got[3] < 0  # period-2 dominates


def test_acf_constant_series_null(spark):
    t0 = dt.datetime(2024, 3, 1)
    rows = [(t0 + dt.timedelta(days=i),) for i in range(10)]
    ev = spark.createDataFrame(rows, "ts timestamp_ntz")
    out = acf_daily(ev, max_lag=2).collect()
    assert all(r.acf is None for r in out)
    assert {r.lag: r.n_pairs for r in out} == {1: 9, 2: 8}


def test_acf_matches_numpy(spark):
    import numpy as np

    rng = np.random.default_rng(11)
    counts = rng.integers(1, 30, size=25)
    t0 = dt.datetime(2024, 3, 1)
    rows = []
    for i, c in enumerate(counts):
        rows += [(t0 + dt.timedelta(days=i),)] * int(c)
    ev = spark.createDataFrame(rows, "ts timestamp_ntz")
    got = {r.lag: r.acf for r in acf_daily(ev, max_lag=4).collect()}
    x = counts.astype(float)
    xbar = x.mean()
    den = ((x - xbar) ** 2).sum()
    for k in range(1, 5):
        want = (((x[:-k] - xbar) * (x[k:] - xbar)).sum()) / den
        assert got[k] == pytest.approx(want, abs=1e-6)


# ------------------------------------------------------- plan contracts
def _nscans(df):
    return df._jdf.queryExecution().executedPlan().toString().count(
        "Scan parquet"
    )


def test_bm25_single_corpus_tokenize_scan(spark, tmp_path):
    # tf feeds 4 consumers; the lazy checkpoint must hold the plan to
    # one tokenize scan (+ the column-less n_docs count scan).  Was 5
    # scans / 0 reuse before the fix.
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(20)],
        "doc_id bigint, text string",
    ).write.parquet(p)
    docs = spark.read.parquet(p)
    q = spark.createDataFrame([(1, "alpha")], "query_id int, q_text string")
    assert _nscans(bm25_search(docs, q, top_k=3, method="census")) <= 3
    assert _nscans(bm25_search(docs, q, top_k=3, method="scan")) <= 2


def test_pmi_two_census_scans_only(spark, tmp_path):
    p = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [("alpha beta gamma",)] * 20, "text string"
    ).write.parquet(p)
    docs = spark.read.parquet(p)
    assert _nscans(pmi_collocations(docs, min_count=2, top_k=5)) <= 2
