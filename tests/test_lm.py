"""N-gram LM perplexity (operators/lm.py): hand-computed smoothed
probabilities, unseen-bigram floor, self- vs reference-trained modes,
CCNet per-language head/middle/tail buckets."""

from __future__ import annotations

import math

import numpy as np
import pytest

from grass_spark.operators.lm import (
    bigram_model,
    ccnet_filter,
    lm_score,
    perplexity_buckets,
)


@pytest.fixture(scope="module")
def train(spark):
    # bigrams: (a b), (b a), (a c); c(a.)=2, c(b.)=1; V={a,b,c}=3
    return spark.createDataFrame([(1, "a b a c")], ["doc_id", "text"])


def test_hand_computed_smoothed_prob(spark, train):
    model = bigram_model(train)
    score = spark.createDataFrame([(10, "a b")], ["doc_id", "text"])
    r = lm_score(score, model).collect()[0]
    # P(b|a) = (1 + .5) / (2 + .5*3) = 3/7
    want_nlp = -math.log2(3 / 7)
    assert r["n_bigrams"] == 1
    assert r["logprob"] == pytest.approx(want_nlp)
    assert r["perplexity"] == pytest.approx(7 / 3)


def test_unseen_bigram_takes_smoothed_floor(spark, train):
    model = bigram_model(train)
    score = spark.createDataFrame(
        [(10, "b c"), (11, "z z")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in lm_score(score, model).collect()}
    # b->c unseen but b seen as first word: (0+.5)/(c(b.)=1 + 1.5) = 0.2
    assert out[10]["logprob"] == pytest.approx(-math.log2(0.2))
    # z unknown entirely: (0+.5)/(0+1.5) = 1/3
    assert out[11]["logprob"] == pytest.approx(-math.log2(1 / 3))
    # a common bigram scores better than an unseen one
    common = lm_score(
        spark.createDataFrame([(12, "a b")], ["doc_id", "text"]), model
    ).collect()[0]
    assert common["perplexity"] < out[11]["perplexity"]


def test_short_docs_absent_and_self_mode(spark):
    docs = spark.createDataFrame(
        [(1, "x y x y x y"), (2, "solo"), (3, "x y")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in lm_score(docs).collect()}
    assert 2 not in out  # no bigram positions
    assert out[1]["n_bigrams"] == 5 and out[3]["n_bigrams"] == 1
    # doc 3's single bigram (x y) is the corpus's most common -> its
    # perplexity can't exceed doc 1's mix of (x y)+(y x)
    assert out[3]["perplexity"] <= out[1]["perplexity"]


# ---------------------------------------------------------------------
# CCNet perplexity buckets
# ---------------------------------------------------------------------


@pytest.fixture(scope="module")
def lang_docs(spark):
    """Two languages with deliberately different perplexity spreads:
    'en' docs reuse the common (x y) bigram at varying rates, 'de'
    docs are each other's vocabulary outliers."""
    rows = [
        (1, "en", "x y x y x y x y"),
        (2, "en", "x y x y q r"),
        (3, "en", "q r s t u v"),
        (4, "de", "aa bb aa bb aa bb"),
        (5, "de", "aa bb cc dd"),
        (6, "de", "ee ff gg hh ii jj"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


def test_buckets_match_numpy_hf7(spark, lang_docs):
    out = {r["doc_id"]: r for r in perplexity_buckets(lang_docs).collect()}
    assert len(out) == 6
    for lang in ("en", "de"):
        ppls = sorted(
            round(r["perplexity"], 6) for r in out.values()
            if r["lang"] == lang
        )
        c1, c2 = (
            round(float(np.quantile(ppls, 1 / 3, method="linear")), 6),
            round(float(np.quantile(ppls, 2 / 3, method="linear")), 6),
        )
        for r in out.values():
            if r["lang"] != lang:
                continue
            assert r["ppl_head_cut"] == pytest.approx(c1, abs=1e-9)
            assert r["ppl_middle_cut"] == pytest.approx(c2, abs=1e-9)
            want = ("head" if r["perplexity"] <= c1
                    else "middle" if r["perplexity"] <= c2 else "tail")
            assert r["bucket"] == want, (r, c1, c2)
        # with 3 docs per lang the three strata are all inhabited
        got = sorted(r["bucket"] for r in out.values() if r["lang"] == lang)
        assert got == ["head", "middle", "tail"]


def test_buckets_are_per_language(spark):
    """The same document text lands in different buckets depending on
    its language peers — thresholds are per-lang, never global."""
    rows = [
        (1, "en", "x y x y x y"),   # en's best doc
        (2, "en", "x y a b"),
        (3, "en", "c d e f"),
        (4, "de", "x y x y x y"),   # identical text, but de's ONLY doc
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out = {r["doc_id"]: r for r in perplexity_buckets(docs).collect()}
    assert out[1]["bucket"] == "head"
    # a single-doc language is its own quantile: always head
    assert out[4]["bucket"] == "head"
    assert out[1]["perplexity"] == out[4]["perplexity"]


def test_ccnet_filter_drops_tail_keeps_no_evidence(spark, lang_docs):
    docs = lang_docs.union(
        lang_docs.sparkSession.createDataFrame(
            [(7, "en", "solo")], ["doc_id", "lang", "text"]
        )
    )
    kept = {r["doc_id"] for r in ccnet_filter(docs).select("doc_id").collect()}
    buckets = {r["doc_id"]: r["bucket"]
               for r in perplexity_buckets(lang_docs).collect()}
    tails = {d for d, b in buckets.items() if b == "tail"}
    assert kept == ({1, 2, 3, 4, 5, 6, 7} - tails)
    assert 7 in kept  # no bigram -> no evidence -> keep


def test_buckets_approx_mode_and_validation(spark, lang_docs):
    out = {r["doc_id"]: r["bucket"]
           for r in perplexity_buckets(lang_docs, exact=False).collect()}
    assert len(out) == 6  # GK at tiny n is exact enough to run
    with pytest.raises(ValueError, match="cuts"):
        perplexity_buckets(lang_docs, cuts=(0.5, 0.4))
    with pytest.raises(ValueError, match="keep"):
        ccnet_filter(lang_docs, keep=("head", "bogus"))


def test_buckets_threshold_join_broadcasts(lang_docs):
    plan = (
        perplexity_buckets(lang_docs)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
