"""PMI collocation mining — which adjacent word pairs co-occur far
more often than chance (Church & Hanks 1990 pointwise mutual
information over corpus bigrams).

Corpus-curation use: collocations surface boilerplate phrases, domain
jargon and tokenizer-merge candidates; the top-PMI table is the
classic "what multi-word units live in this corpus" diagnostic run
next to the BPE trainer (operators/bpe.py), whose unigram census this
module shares.

Scale shape: ONE corpus scan emits adjacent pairs (a ``zip_with`` over
two shifted slices — argument arrays, no captured derived expression,
so the lambda-capture trap from CLAUDE.md does not apply); the bigram
and unigram censuses are both map-side-combinable groupBys whose
output is (bigram-)vocabulary-sized.  The ``min_count`` filter applies
to the bigram census BEFORE any join, the two unigram joins are
vocabulary-vs-vocabulary, corpus totals ride a 1-row broadcast
crossJoin, and the final top-k is an ``orderBy().limit()``
(TakeOrderedAndProject — never a global sort).

Cross-engine parity: PMI = ln((cxy·N1·N1) / (NB·cx·cy)) is computed in
doubles from exact integer counts (int→double conversion and IEEE
multiply/divide are deterministic; only ``ln`` carries a last-ulp
risk, absorbed by round 6 dp), with the association order mirrored
verbatim in the DuckDB oracle; ranking uses the rounded PMI with
(w1, w2) tie-break.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from grass_spark.operators.keywords import WORD_PATTERN


def bigram_counts(df: DataFrame, *, text_col: str = "text") -> DataFrame:
    """(w1, w2, cxy) — corpus counts of ADJACENT word pairs.

    Docs with fewer than two tokens contribute nothing (filtered at
    the scan, before the slices would see a negative length).
    """
    ws = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
    )
    toks = df.select(ws.alias("_ws")).where(F.size("_ws") >= 2)
    pair = F.explode(
        F.zip_with(
            F.slice("_ws", 1, F.size("_ws") - 1),
            F.slice(F.col("_ws"), 2, F.size("_ws") - 1),
            lambda x, y: F.struct(x.alias("w1"), y.alias("w2")),
        )
    ).alias("_p")
    return (
        toks.select(pair)
        .select("_p.w1", "_p.w2")
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("cxy"))
    )


def pmi_collocations(
    df: DataFrame,
    *,
    text_col: str = "text",
    min_count: int = 5,
    top_k: int = 20,
) -> DataFrame:
    """Top-``top_k`` adjacent pairs by PMI among pairs seen at least
    ``min_count`` times.

    Returns (w1, w2, cxy, c1, c2, pmi, rank); pmi is 6-dp rounded,
    rank 1..top_k by (pmi desc, w1 asc, w2 asc).  Unigram
    probabilities use the full token census (N1 tokens); the pair
    probability uses the bigram census (NB = N1 - docs-with-tokens…
    exactly: total adjacent positions).
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    if min_count < 1:
        raise ValueError(f"min_count must be >= 1, got {min_count}")
    ws = F.regexp_extract_all(
        F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
    )
    # both censuses feed multiple consumers (totals + joins) with
    # different pruned projections — checkpoint or the corpus scan
    # re-executes per consumer (the BM25/prepare_corpus lesson)
    uni = (
        df.select(F.explode(ws).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cw"))
        .localCheckpoint(eager=False)
    )
    big = bigram_counts(df, text_col=text_col).localCheckpoint(eager=False)
    # totals BEFORE the min_count filter (probabilities are corpus
    # probabilities, not frequent-pair probabilities)
    scalars = uni.agg(F.sum("cw").alias("n1")).crossJoin(
        big.agg(F.sum("cxy").alias("nb"))
    )
    frequent = big.where(F.col("cxy") >= min_count)
    j = (
        frequent.join(
            uni.select(F.col("word").alias("w1"), F.col("cw").alias("c1")),
            "w1",
        )
        .join(
            uni.select(F.col("word").alias("w2"), F.col("cw").alias("c2")),
            "w2",
        )
        .crossJoin(F.broadcast(scalars))
    )
    d = lambda c: F.col(c).cast("double")  # noqa: E731
    pmi = F.round(
        F.log(
            ((d("cxy") * d("n1")) * d("n1"))
            / ((d("nb") * d("c1")) * d("c2"))
        ),
        6,
    )
    top = (
        j.select("w1", "w2", "cxy", "c1", "c2", pmi.alias("pmi"))
        .orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
        .limit(top_k)
    )
    w = Window.orderBy(F.desc("pmi"), F.asc("w1"), F.asc("w2"))
    # rank window runs over <= top_k rows (post-limit) — bounded
    return top.withColumn("rank", F.row_number().over(w))
