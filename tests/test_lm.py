"""N-gram LM perplexity (operators/lm.py): hand-computed smoothed
probabilities, unseen-bigram floor, self- vs reference-trained modes."""

from __future__ import annotations

import math

import pytest

from grass_spark.operators.lm import bigram_model, lm_score


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
