"""TF-IDF keyword extraction (operators/keywords.py)."""

import math

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.keywords import doc_terms, tfidf_keywords


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "apple banana apple cherry"),
            (2, "banana banana date"),
            (3, "apple date date date"),
            (4, ""),  # no tokens: absent from output, still counts in N
        ],
        ["doc_id", "text"],
    )


def test_doc_terms_counts(docs):
    got = {
        (r["doc_id"], r["word"]): r["tf"] for r in doc_terms(docs).collect()
    }
    assert got[(1, "apple")] == 2
    assert got[(1, "banana")] == 1
    assert got[(2, "banana")] == 2
    assert got[(3, "date")] == 3
    assert (4, "") not in got and len(got) == 7


def test_tfidf_hand_computed(docs):
    # N=4; df: apple 2, banana 2, cherry 1, date 2
    out = tfidf_keywords(docs, top_k=2).orderBy("doc_id", "rank").collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: apple 2*ln(2)=1.386294 > cherry 1*ln(4)=1.386294 — equal
    # rounded; tie-break word asc puts apple first
    assert [r["word"] for r in by_doc[1]] == ["apple", "cherry"]
    assert by_doc[1][0]["score"] == round(2 * math.log(4 / 2), 6)
    assert by_doc[1][1]["score"] == round(1 * math.log(4 / 1), 6)
    # doc 3: date 3*ln(2) > apple 1*ln(2)
    assert [r["word"] for r in by_doc[3]] == ["date", "apple"]
    # empty doc absent; every rank within top_k
    assert 4 not in by_doc
    assert all(r["rank"] <= 2 for r in out)


def test_tfidf_plan_shape(docs):
    plan = tfidf_keywords(docs)._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "partial_count" in plan  # both groupBys map-side combine
    # the only window partitions on the doc id (bounded vocabulary)
    assert "row_number" in plan


def test_tfidf_top_k_validation(docs):
    with pytest.raises(ValueError):
        tfidf_keywords(docs, top_k=0)


def test_degenerate_inputs(spark):
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert tfidf_keywords(empty).count() == 0
    # identical corpus: every word in every doc, idf = ln(1) = 0 — all
    # scores zero, ranks still deterministic (word asc)
    same = spark.createDataFrame(
        [(i, "alpha beta gamma") for i in range(5)],
        "doc_id bigint, text string",
    )
    rows = tfidf_keywords(same, top_k=2).collect()
    assert len(rows) == 10 and all(r["score"] == 0.0 for r in rows)
    first = [r["word"] for r in rows if r["rank"] == 1]
    assert first == ["alpha"] * 5
