"""Corpus heavy-hitters (operators/heavyhitters.py): correctness on a
known corpus + the scale-shape plan contract (per-partition top-k via
TakeOrderedAndProject, no global sort)."""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.heavyhitters import ngram_heavy_hitters


def test_heavy_hitters_known_corpus(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps"),
            (2, "the quick brown dog sits"),
            (3, "the quick brown fox runs"),
            (4, "a completely different sentence here"),
        ],
        "doc_id int, text string",
    )
    out = ngram_heavy_hitters(docs, n=3, k=3).collect()
    assert out[0].gram == "the quick brown" and out[0].doc_freq == 3
    assert out[1].gram == "quick brown fox" and out[1].doc_freq == 2
    # rank 3 is a tie among doc_freq=1 grams -> smallest gram wins
    assert out[2].doc_freq == 1
    tied = {"brown fox jumps", "brown dog sits", "brown fox runs",
            "quick brown dog", "a completely different",
            "completely different sentence", "different sentence here"}
    assert out[2].gram == min(tied)


def test_heavy_hitters_doc_frequency_not_term_frequency(spark):
    """A gram repeated inside one document counts once (document
    frequency — the boilerplate-detection metric)."""
    docs = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam"), (2, "one two three")],
        "doc_id int, text string",
    )
    out = {r.gram: r.doc_freq for r in
           ngram_heavy_hitters(docs, n=3, k=10).collect()}
    assert out["spam spam spam"] == 1


def test_heavy_hitters_short_docs_fall_back_to_whole_text(spark):
    docs = spark.createDataFrame(
        [(1, "hi there"), (2, "hi there"), (3, "hi there")],
        "doc_id int, text string",
    )
    out = ngram_heavy_hitters(docs, n=3, k=1).collect()
    assert out[0].gram == "hi there" and out[0].doc_freq == 3


def test_heavy_hitters_plan_is_partial_topk(spark):
    """The k-cut compiles to TakeOrderedAndProject (per-partition heaps
    merged on the driver) — NO global Sort of the gram counts, and the
    groupBy keeps its partial-aggregation pair."""
    docs = spark.createDataFrame(
        [(i, f"w{i} w{i+1} w{i+2} w{i+3}") for i in range(50)],
        "doc_id int, text string",
    ).repartition(8)
    plan = (
        ngram_heavy_hitters(docs, n=3, k=5)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan
    assert "Sort " not in plan  # no standalone global sort operator
    assert plan.count("HashAggregate") >= 2  # partial + final
