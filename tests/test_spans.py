"""Exact-substring duplicate-span detection (operators/spans.py).

Semantics pinned here: window census, first-occurrence protection,
interval merge (overlap AND exact adjacency), self-repetition inside
one document, short-doc passthrough, protect_first=False, and the
plan contract (combinable census, no Window over the gram key).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.spans import duplicate_spans, word_windows


def _by_id(out):
    return {r["doc_id"]: r for r in out.collect()}


def test_cross_doc_dup_span_detected_and_first_protected(spark):
    df = spark.createDataFrame(
        [
            (1, "The quick brown fox jumps over the lazy dog near the river bank today"),
            (2, "Intro words here. the quick brown fox jumps over the lazy dog near the stream"),
            (3, "unrelated text about spark plans and shuffles with no repeats at all ok"),
        ],
        "doc_id long, text string",
    )
    r = _by_id(duplicate_spans(df, n=6))
    # doc 1 holds every first occurrence: duplicated windows counted,
    # nothing removable
    assert r[1]["n_dup_windows"] == 6 and r[1]["n_spans"] == 0
    assert r[1]["clean_text"].startswith("the quick brown fox")
    # doc 2: 6 overlapping duplicated windows merge into ONE maximal
    # span covering the shared 11-word run at word positions 3..13
    assert [(s["start"], s["end"]) for s in r[2]["spans"]] == [(3, 13)]
    assert r[2]["dup_words"] == 11
    assert r[2]["clean_text"] == "intro words here. stream"
    assert r[2]["dup_frac"] == pytest.approx(11 / 15)
    # doc 3: untouched
    assert r[3]["n_dup_windows"] == 0
    assert r[3]["clean_text"] == r[3]["text"].lower()


def test_self_repetition_within_one_doc(spark):
    df = spark.createDataFrame(
        [(5, "aa bb cc dd ee ff gg aa bb cc dd ee ff gg tail words")],
        "doc_id long, text string",
    )
    r = _by_id(duplicate_spans(df, n=6))[5]
    # windows 0,1 == windows 7,8; the second copy is removable
    assert r["n_dup_windows"] == 4
    assert [(s["start"], s["end"]) for s in r["spans"]] == [(7, 13)]
    assert r["clean_text"] == "aa bb cc dd ee ff gg tail words"


def test_short_doc_passthrough(spark):
    df = spark.createDataFrame(
        [(1, "short doc"), (2, "short doc")], "doc_id long, text string"
    )
    r = _by_id(duplicate_spans(df, n=6))
    for k in (1, 2):
        assert r[k]["n_windows"] == 0 and r[k]["n_dup_windows"] == 0
        assert r[k]["clean_text"] == "short doc"


def test_adjacency_merges_gap_splits(spark):
    # one 6-word gram planted at positions 0 and 6 (exact adjacency:
    # contiguous duplicated text) must merge; planted at 0 and 7 (one
    # clean word between) must stay two spans
    g = "p q r s t u"
    adj = spark.createDataFrame(
        [(1, f"{g} {g} x1 y1 z1 w1 v1 u1"), (2, f"{g} a b c d e f g h")],
        "doc_id long, text string",
    )
    r = _by_id(duplicate_spans(adj, n=6, protect_first=False))
    assert [(s["start"], s["end"]) for s in r[1]["spans"]] == [(0, 11)]
    gap = spark.createDataFrame(
        [(1, f"{g} gapword {g} x1 y1 z1 w1 v1 u1"), (2, f"{g} a b c d e f g h")],
        "doc_id long, text string",
    )
    r = _by_id(duplicate_spans(gap, n=6, protect_first=False))
    assert [(s["start"], s["end"]) for s in r[1]["spans"]] == [
        (0, 5),
        (7, 12),
    ]
    assert "gapword" in r[1]["clean_text"]


def test_protect_first_false_removes_every_copy(spark):
    df = spark.createDataFrame(
        [
            (1, "one two three four five six seven"),
            (2, "zz one two three four five six seven yy"),
        ],
        "doc_id long, text string",
    )
    r = _by_id(duplicate_spans(df, n=6, protect_first=False))
    assert r[1]["clean_text"] == ""
    assert r[1]["dup_frac"] == pytest.approx(1.0)
    assert r[2]["clean_text"] == "zz yy"


def test_word_windows_positions(spark):
    df = spark.createDataFrame(
        [(1, "a b  c   d")], "doc_id long, text string"
    )
    rows = sorted(
        word_windows(df, n=2).collect(), key=lambda r: r["pos"]
    )
    assert [(r["pos"], r["gram"]) for r in rows] == [
        (0, "a b"),
        (1, "b c"),
        (2, "c d"),
    ]
    with pytest.raises(ValueError):
        word_windows(df, n=0)


def test_census_is_combinable_and_doc_windows_only(spark):
    """Plan contract: the gram census must be a partial/final aggregate
    pair (map-side combinable on a hot boilerplate gram) with the
    first-occurrence election fused into the same pass (partial_min);
    the only Window node is the doc-local span merge, whose partition
    key includes doc_id — never the gram/hash key."""
    df = spark.createDataFrame(
        [(i, f"shared footer text run here x{i} y{i}") for i in range(8)],
        ["doc_id", "text"],
    )
    plan = (
        duplicate_spans(df, n=6)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "CartesianProduct" not in plan and "BatchEvalPython" not in plan
    assert "partial_min" in plan and "partial_count" in plan
    for line in plan.splitlines():
        if "Window" in line and "windowspecdefinition" in line:
            assert "doc_id" in line


def test_hot_gram_adversarial(spark):
    """ONE boilerplate sentence in 30% of 2000 docs: census absorbs the
    hot gram map-side; every non-first copy is removed, firsts keep."""
    boiler = "all rights reserved contact us at example"
    # the word right after the boilerplate must be per-doc unique or
    # windows sliding past the boundary stay duplicated and the span
    # legitimately grows past the planted 7 words
    rows = [
        (
            i,
            (boiler + " " if i % 3 == 0 else "") + f"x{i} body{i} {i} t{i} u{i} v{i} w{i}",
        )
        for i in range(2000)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = duplicate_spans(df, n=6)
    hot = out.filter(F.col("doc_id") % 3 == 0)
    n_hot = hot.count()
    assert n_hot == 667
    # exactly one survivor keeps the boilerplate words
    keepers = (
        out.filter(F.col("clean_text").contains(boiler)).select("doc_id").collect()
    )
    assert [r["doc_id"] for r in keepers] == [0]
    # all other hot docs lost exactly the 7 boilerplate words
    trimmed = hot.filter(F.col("doc_id") != 0)
    assert trimmed.filter(F.col("dup_words") != 7).count() == 0
    assert (
        trimmed.filter(~F.col("clean_text").startswith("x")).count() == 0
    )
