"""Wave-23 operators: weighted sampling (exponential race), RBO,
phrase search, k-anonymity audit."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from grass_spark.operators.audit import k_anonymity
from grass_spark.operators.fusion import rbo_overlap
from grass_spark.operators.sampling import uniform_hash, weighted_sample
from grass_spark.operators.search import phrase_search


# ------------------------------------------------------------ weighted


def _docs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id bigint, source string, n_chars bigint"
    )


def test_weighted_sample_equals_naive_window(spark):
    # the two-stage skew-safe selection must equal the single-window
    # answer exactly, for a group over k and a group under k
    rows = [(i, "a", (i % 7) + 1) for i in range(40)]
    rows += [(100 + i, "b", 3) for i in range(3)]
    df = _docs(spark, rows)
    got = {
        (r.source, r.doc_id)
        for r in weighted_sample(
            df, 5, weight_col="n_chars", group_col="source", salt="t"
        ).collect()
    }
    key = F.round(
        -F.log(uniform_hash(F.col("doc_id"), "t") + F.lit(0.5 / 2**32))
        / F.col("n_chars").cast("double"),
        9,
    )
    w = Window.partitionBy("source").orderBy(
        F.asc("_k"), F.asc("doc_id")
    )
    naive = {
        (r.source, r.doc_id)
        for r in df.withColumn("_k", key)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= 5)
        .collect()
    }
    assert got == naive
    # under-k group keeps everything
    assert {(s, d) for (s, d) in got if s == "b"} == {
        ("b", 100), ("b", 101), ("b", 102)
    }


def test_weighted_sample_weight_dominance_and_exclusions(spark):
    # one item with 10000x the weight of 49 others: its Exp(10000)
    # arrival beats theirs with probability ~1 - 5*10^-4 per salt
    rows = [(i, "g", 10000 if i == 7 else 1) for i in range(50)]
    df = _docs(spark, rows)
    for salt in ("s1", "s2", "s3"):
        ids = {
            r.doc_id
            for r in weighted_sample(
                df, 5, weight_col="n_chars", group_col="source", salt=salt
            ).collect()
        }
        assert 7 in ids and len(ids) == 5
    # null / non-positive weights never win
    bad = _docs(spark, [(1, "g", 0), (2, "g", -3), (3, "g", None)])
    assert weighted_sample(
        bad, 2, weight_col="n_chars", group_col="source"
    ).count() == 0
    with pytest.raises(ValueError):
        weighted_sample(df, 0, weight_col="n_chars")


def test_weighted_sample_global_no_group(spark):
    df = _docs(spark, [(i, "x", 1) for i in range(30)])
    out = weighted_sample(df, 4, weight_col="n_chars").collect()
    assert len(out) == 4
    assert set(out[0].asDict()) == {"doc_id", "source", "n_chars"}


# ------------------------------------------------------------ rbo


def test_rbo_identical_rankings_hit_truncated_max(spark):
    a = spark.createDataFrame(
        [(1, i, i) for i in range(1, 11)], "query_id int, doc_id int, rank int"
    )
    out = rbo_overlap(a, a, k=10, p=0.9).collect()[0]
    # truncated (no-extrapolation) RBO of identical lists = 1 - p^k
    assert out.rbo == pytest.approx(1 - 0.9**10, abs=2e-6)
    assert out.overlap_at_k == 10


def test_rbo_disjoint_and_partial(spark):
    a = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2)], "query_id int, doc_id int, rank int"
    )
    b = spark.createDataFrame(
        [(1, 20, 1), (1, 21, 2), (2, 10, 1)],
        "query_id int, doc_id int, rank int",
    )
    out = {r.query_id: r for r in rbo_overlap(a, b, k=10, p=0.9).collect()}
    # q1 disjoint -> 0; q2 appears only in b -> 0 with a row present
    assert out[1].rbo == 0.0 and out[1].overlap_at_k == 0
    assert out[2].rbo == 0.0 and out[2].overlap_at_k == 0
    with pytest.raises(ValueError):
        rbo_overlap(a, b, k=0)
    with pytest.raises(ValueError):
        rbo_overlap(a, b, p=1.0)


def test_rbo_top_heavy_agreement_outweighs_tail(spark):
    # same top item, disjoint tails  >  disjoint top, same tail item
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "query_id int, doc_id int, rank int"
    )
    top = rbo_overlap(
        mk([(1, 5, 1), (1, 6, 2)]), mk([(1, 5, 1), (1, 7, 2)]), k=10
    ).collect()[0].rbo
    tail = rbo_overlap(
        mk([(1, 6, 1), (1, 5, 10)]), mk([(1, 7, 1), (1, 5, 10)]), k=10
    ).collect()[0].rbo
    assert top > tail > 0


# ------------------------------------------------------------ phrase


def test_phrase_search_consecutive_only(spark):
    docs = spark.createDataFrame(
        [
            (1, "a b c a b"),
            (2, "a x b"),          # non-consecutive: no match
            (3, "A, b! c"),        # tokenizer lowercases + strips punct
            (4, "a"),              # shorter than phrase
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in phrase_search(docs, "a b").collect()}
    assert set(out) == {1, 3}
    assert out[1].n_matches == 2 and out[1].first_pos == 1
    assert out[3].n_matches == 1 and out[3].first_pos == 1


def test_phrase_search_overlapping_and_longer(spark):
    docs = spark.createDataFrame(
        [(1, "a a a"), (2, "b c a b c")], "doc_id bigint, text string"
    )
    out = {r.doc_id: r for r in phrase_search(docs, "a a").collect()}
    # positional semantics: overlapping occurrences both count
    assert out[1].n_matches == 2 and out[1].first_pos == 1
    out3 = {r.doc_id: r for r in phrase_search(docs, "c a b").collect()}
    assert set(out3) == {2} and out3[2].first_pos == 2
    with pytest.raises(ValueError):
        phrase_search(docs, "!!!")


# ------------------------------------------------------------ k-anon


def test_k_anonymity_counts(spark):
    df = spark.createDataFrame(
        [("a", 1)] * 5 + [("a", 2)] * 2 + [("b", None)] * 1,
        "t string, v int",
    )
    r = k_anonymity(df, ["t", "v"], k=5).collect()[0]
    assert r.k == 5 and r.n_rows == 8 and r.n_groups == 3
    # ("a",2) x2 and ("b",NULL) x1 are risky; NULL is its own class
    assert r.n_risky_groups == 2 and r.n_risky_rows == 3
    assert r.min_group_n == 1
    assert r.risky_row_frac == pytest.approx(round(3 / 8, 6))
    with pytest.raises(ValueError):
        k_anonymity(df, [], k=5)
    with pytest.raises(ValueError):
        k_anonymity(df, ["t"], k=1)
