"""Hashed linear quality classifier (operators/classify.py)."""

import math

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.classify import (
    hash_bucket,
    linear_quality_score,
    synth_weights,
)


@pytest.fixture(scope="module")
def weights(spark):
    return synth_weights(spark, 64)


def test_synth_weights_deterministic_and_bounded(spark, weights):
    rows = weights.collect()
    assert len(rows) == 64
    assert all(-1.0 <= r["weight"] < 1.0 for r in rows)
    again = {r["bucket"]: r["weight"] for r in synth_weights(spark, 64).collect()}
    assert all(again[r["bucket"]] == r["weight"] for r in rows)


def test_score_is_sum_of_bucket_weights(spark, weights):
    docs = spark.createDataFrame(
        [(1, "alpha beta alpha"), (2, "gamma"), (3, "")],
        ["doc_id", "text"],
    )
    w = {r["bucket"]: r["weight"] for r in weights.collect()}
    b = {
        r["word"]: r["b"]
        for r in spark.createDataFrame(
            [("alpha",), ("beta",), ("gamma",)], ["word"]
        ).select("word", hash_bucket(F.col("word"), 64).alias("b")).collect()
    }
    out = {
        r["doc_id"]: r
        for r in linear_quality_score(docs, weights, n_buckets=64).collect()
    }
    # multiplicity counts: alpha twice
    exp1 = round(2 * w[b["alpha"]] + w[b["beta"]], 6)
    assert out[1]["n_tokens"] == 3 and out[1]["score"] == exp1
    assert out[1]["prob"] == round(1 / (1 + math.exp(-(exp1 / 3))), 6)
    assert out[2]["n_tokens"] == 1 and out[2]["score"] == round(w[b["gamma"]], 6)
    assert 3 not in out  # tokenless docs absent


def test_plan_broadcasts_model_and_combines_mapside(spark, weights):
    docs = spark.createDataFrame([(1, "alpha beta")], ["doc_id", "text"])
    plan = (
        linear_quality_score(docs, weights, n_buckets=64)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_count" in plan or "partial" in plan


def test_degenerate_inputs(spark, weights):
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert linear_quality_score(empty, weights, n_buckets=64).count() == 0


# ---------------- distributed LR training ----------------


def test_train_classifier_separates_planted_labels(spark):
    """Good docs use one vocabulary, bad docs another — a few rounds of
    the distributed LR must drive the loss down and order every good
    doc above every bad doc through linear_quality_score."""
    from grass_spark.operators.classify import (
        linear_quality_score,
        train_classifier,
    )

    good_words = [f"fine{i}" for i in range(30)]
    bad_words = [f"junk{i}" for i in range(30)]
    rows = []
    import random

    rnd = random.Random(4)
    for d in range(60):
        words = rnd.choices(good_words if d % 2 == 0 else bad_words, k=25)
        rows.append((d, 1 - d % 2, " ".join(words)))
    docs = spark.createDataFrame(rows, "doc_id bigint, label int, text string")
    w, hist = train_classifier(docs, rounds=10, lr=32.0, n_buckets=256)
    assert len(hist) == 11
    assert hist[-1] < hist[0] * 0.5  # loss at least halves
    for a, b in zip(hist, hist[1:]):
        assert b <= a + 1e-6  # full-batch GD with this lr stays monotone
    scored = {r.doc_id: r.prob
              for r in linear_quality_score(docs, w, n_buckets=256).collect()}
    good = [scored[d] for d in range(0, 60, 2)]
    bad = [scored[d] for d in range(1, 60, 2)]
    assert min(good) > max(bad)


def test_train_classifier_validates(spark):
    from grass_spark.operators.classify import train_classifier

    docs = spark.createDataFrame(
        [(1, 1, "")], "doc_id bigint, label int, text string"
    )
    import pytest

    with pytest.raises(ValueError, match="no documents"):
        train_classifier(docs, rounds=1)
    docs2 = spark.createDataFrame(
        [(1, 1, "a b")], "doc_id bigint, label int, text string"
    )
    with pytest.raises(ValueError, match="rounds"):
        train_classifier(docs2, rounds=-1)
