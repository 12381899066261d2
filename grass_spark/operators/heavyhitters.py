"""Corpus heavy-hitters — top-k most frequent word n-grams
(boilerplate / template detection for training-data curation).

A standard curation step next to dedup: the most frequent shingles in
a crawl are licence headers, navigation chrome and template text;
surfacing them drives stop-shingle lists and boilerplate strippers.
Shares the shingle machinery with the MinHash stack
(:func:`grass_spark.operators.dedup.with_shingles` — the
inlining-proof zip_with fold).

Scale shape (the part that matters at 100 TB): explode ->
partial-aggregating groupBy(gram) -> ``TakeOrderedAndProject`` — Spark
compiles ``orderBy(...).limit(k)`` into per-partition top-k heaps
merged on the driver, NO global sort, no full shuffle of the gram
counts beyond the aggregation itself.  The plan is pinned by
tests/test_heavyhitters.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grass_spark.operators.dedup import with_shingles


def ngram_heavy_hitters(
    df: DataFrame,
    *,
    text_col: str = "text",
    n: int = 3,
    k: int = 20,
) -> DataFrame:
    """Top-``k`` word ``n``-grams by DOCUMENT frequency (each gram
    counts once per document — ``with_shingles`` distincts within the
    doc), ties broken by gram ascending so the cut is deterministic.

    Returns (gram, doc_freq) with exactly ``k`` rows (fewer only if the
    corpus has fewer distinct grams).
    """
    sh = with_shingles(df, text_col, n)
    counts = (
        sh.select(F.explode("sh_arr").alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("doc_freq"))
    )
    return counts.orderBy(
        F.col("doc_freq").desc(), F.col("gram").asc()
    ).limit(k)
