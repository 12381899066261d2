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
