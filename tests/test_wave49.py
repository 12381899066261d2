"""Wave-49 operators: water-filling mixture solver
(waterfill.waterfill_mixture) and the duplicate family-size histogram
(dedup.dup_size_distribution)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from grass_spark.operators.dedup import dup_size_distribution
from grass_spark.operators.waterfill import waterfill_mixture


def _rows(spark, pairs):
    # (source, weight) rows
    return spark.createDataFrame(pairs, "source string, w bigint")


def test_waterfill_caps_large_sources_exactly(spark):
    # volumes a=10, b=20, c=70; budget 60 -> L = (60-30)/1 = 30:
    # a, b keep all; c capped at 30
    df = _rows(spark, [("a", 10), ("b", 20), ("c", 70)])
    out = {r.source: r for r in waterfill_mixture(
        df, 60, weight_expr=F.col("w")).collect()}
    assert out["a"].keep_rate == 1.0 and out["b"].keep_rate == 1.0
    assert out["c"].keep_rate == round(30 / 70, 6)
    assert out["c"].alloc_tokens == 30.0
    total = sum(r.alloc_tokens for r in out.values())
    assert total == 60.0  # budget met exactly


def test_waterfill_unconstrained_and_fallback(spark):
    df = _rows(spark, [("a", 10), ("b", 20)])
    # budget above total: everyone keeps everything
    free = {r.source: r for r in waterfill_mixture(
        df, 100, weight_expr=F.col("w")).collect()}
    assert all(r.keep_rate == 1.0 for r in free.values())
    # budget below 2 * S_min = 20: level under the smallest source
    tight = {r.source: r for r in waterfill_mixture(
        df, 12, weight_expr=F.col("w")).collect()}
    assert tight["a"].alloc_tokens == 6.0
    assert tight["b"].alloc_tokens == 6.0
    assert tight["a"].keep_rate == 0.6


def test_waterfill_bad_budget(spark):
    with pytest.raises(ValueError, match="budget"):
        waterfill_mixture(_rows(spark, [("a", 1)]), 0)


def test_dup_size_histogram(spark):
    docs = spark.createDataFrame(
        [(1, "x"), (2, "x"), (3, "x"), (4, "y"), (5, "z"), (6, "z")],
        "doc_id bigint, text string",
    )
    out = {r.family_size: r for r in dup_size_distribution(docs).collect()}
    assert out[1].n_families == 1 and out[1].n_docs == 1
    assert out[2].n_families == 1 and out[2].n_docs == 2
    assert out[3].n_families == 1 and out[3].n_docs == 3
    assert out[3].frac_docs == 0.5
