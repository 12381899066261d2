"""Benchmark decontamination for training-data pipelines.

Standard LLM-corpus hygiene (the 13-gram overlap rule popularized by
the GPT-3 / "The Pile" data papers): a training document is
*contaminated* if it shares a word n-gram (default n=13) with any
document in a held-out benchmark/eval suite, and contaminated
documents are dropped before training.

Scale shape (100 TB corpus, benchmark = eval-suite-sized, i.e. tiny):

* corpus shingling is an ``explode`` — map-side, no shuffle;
* the benchmark shingle set is distinct-ed and **broadcast**, so the
  overlap probe is a broadcast hash join against every corpus
  partition — the 100-TB side never shuffles;
* the per-document report is one ``groupBy(doc_id)`` over *hit rows
  only* (candidate-sized, not corpus-sized);
* ``decontaminate`` itself is a broadcast **left-anti** join of the
  corpus against the (tiny) flagged-id frame — again no corpus
  shuffle.

Shingling reuses :mod:`grass_spark.operators.dedup`'s zip_with fold
(JVM expressions only; see its perf note on lambda capture).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grass_spark.operators.dedup import with_shingles


def contamination_report(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 13,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Per-document contamination report for corpus docs that share at
    least one word ``n``-gram with the benchmark.

    Returns one row per contaminated corpus document:

    * ``n_shingles``      — distinct shingles in the document;
    * ``n_hit_shingles``  — distinct shingles also present anywhere in
                            the benchmark;
    * ``n_bench_docs``    — distinct benchmark documents sharing at
                            least one shingle;
    * ``contamination``   — ``n_hit_shingles / n_shingles``.

    Documents shorter than ``n`` words fall back to a single
    whole-text shingle (same rule as the dedup family), so a short doc
    is contaminated iff its full normalized text appears verbatim.
    """
    bench_id_col = bench_id_col or id_col
    bench_text_col = bench_text_col or text_col

    sh = with_shingles(corpus, text_col, n).select(
        F.col(id_col),
        F.size("sh_arr").cast("bigint").alias("n_shingles"),
        F.explode("sh_arr").alias("s"),
    )
    bsh = (
        with_shingles(benchmark, bench_text_col, n)
        .select(
            F.col(bench_id_col).alias("bench_id"),
            F.explode("sh_arr").alias("s"),
        )
        .distinct()
    )
    hits = sh.join(F.broadcast(bsh), "s")
    return (
        hits.groupBy(id_col, "n_shingles")
        .agg(
            F.countDistinct("s").alias("n_hit_shingles"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
        )
        .withColumn(
            "contamination", F.col("n_hit_shingles") / F.col("n_shingles")
        )
    )


def decontaminate(
    corpus: DataFrame,
    benchmark: DataFrame,
    *,
    n: int = 13,
    min_hit_shingles: int = 1,
    id_col: str = "doc_id",
    text_col: str = "text",
    bench_id_col: str | None = None,
    bench_text_col: str | None = None,
) -> DataFrame:
    """Drop corpus documents sharing >= ``min_hit_shingles`` distinct
    word ``n``-grams with the benchmark; passes through all corpus
    columns unchanged.  The flagged-id side is benchmark-bounded
    (tiny), so the anti-join broadcasts and the corpus never shuffles.
    """
    rep = contamination_report(
        corpus,
        benchmark,
        n=n,
        id_col=id_col,
        text_col=text_col,
        bench_id_col=bench_id_col,
        bench_text_col=bench_text_col,
    )
    bad = rep.filter(F.col("n_hit_shingles") >= min_hit_shingles).select(id_col)
    return corpus.join(F.broadcast(bad), id_col, "left_anti")
