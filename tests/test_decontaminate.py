"""Benchmark decontamination (operators/decontaminate.py).

The 13-gram overlap rule: a corpus doc is contaminated iff it shares a
distinct word n-gram (default 13) with any benchmark doc; short docs
fall back to whole-text verbatim matching (same rule as the dedup
shingle family).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.decontaminate import (
    contamination_report,
    decontaminate,
)

# 20 words — every corpus doc built from this shares 13-gram spans with
# a benchmark doc that quotes 13+ consecutive words of it.
EVAL_Q = (
    "what is the capital of the ancient kingdom that ruled the northern "
    "river valley for three hundred years before the flood"
)
CLEAN = (
    "completely unrelated prose about distributed query engines shuffling "
    "large partitioned tables across executors with adaptive broadcast "
    "joins and columnar parquet scans at petabyte scale every night"
)


def _words(s, a, b):
    return " ".join(s.split()[a:b])


@pytest.fixture(scope="module")
def frames(spark):
    # corpus doc 1 embeds a verbatim 14-word quote of the benchmark
    # question; doc 2 is clean; doc 3 is short (<13 words) and exactly
    # equals a short benchmark doc modulo case/whitespace.
    quote = _words(EVAL_Q, 0, 14)
    corpus = spark.createDataFrame(
        [
            (1, "students often ask " + quote + " during revision", "a"),
            (2, CLEAN, "b"),
            (3, "  The  SHORT   answer ", "c"),
            (4, "another short doc", "d"),
        ],
        ["doc_id", "text", "extra"],
    )
    bench = spark.createDataFrame(
        [(100, EVAL_Q), (101, "the short answer")], ["doc_id", "text"]
    )
    return corpus, bench


def test_contaminated_doc_flagged(spark, frames):
    corpus, bench = frames
    rep = {r["doc_id"]: r for r in contamination_report(corpus, bench).collect()}
    assert 1 in rep and 2 not in rep
    # the 14-word quote sits at word offset 3 of a 19-word doc: of its
    # 7 distinct 13-shingles, the 2 lying fully inside the quote hit
    r = rep[1]
    assert r["n_shingles"] == 19 - 13 + 1  # 7
    assert r["n_hit_shingles"] == 14 - 13 + 1  # 2 shingles of the quote
    assert r["n_bench_docs"] == 1
    assert r["contamination"] == pytest.approx(2 / 7)


def test_short_doc_whole_text_fallback(spark, frames):
    corpus, bench = frames
    rep = {r["doc_id"]: r for r in contamination_report(corpus, bench).collect()}
    # doc 3 normalizes to "the short answer" == bench 101 verbatim
    assert rep[3]["n_shingles"] == 1 and rep[3]["contamination"] == 1.0
    # doc 4 is short but matches no benchmark text
    assert 4 not in rep


def test_decontaminate_drops_flagged_keeps_columns(spark, frames):
    corpus, bench = frames
    out = decontaminate(corpus, bench)
    assert out.columns == corpus.columns
    kept = sorted(r["doc_id"] for r in out.collect())
    assert kept == [2, 4]


def test_min_hit_shingles_threshold(spark, frames):
    corpus, bench = frames
    # doc 1 has 2 hit shingles and doc 3 has 1: a threshold of 3
    # spares both
    kept = sorted(
        r["doc_id"]
        for r in decontaminate(corpus, bench, min_hit_shingles=3)
        .select("doc_id")
        .collect()
    )
    assert kept == [1, 2, 3, 4]


def test_probe_is_broadcast_no_corpus_shuffle(spark, frames):
    """100-TB shape: the benchmark side broadcasts; the only shuffle in
    the report is the hits-only groupBy, and the anti-join broadcasts."""
    corpus, bench = frames
    plan = contamination_report(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    anti = decontaminate(corpus, bench)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in anti and "LeftAnti" in anti
