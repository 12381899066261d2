"""Benchmark decontamination for training-data pipelines.

Standard LLM-corpus hygiene (the 13-gram overlap rule popularized by
the GPT-3 / "The Pile" data papers): a training document is
*contaminated* if it shares a word n-gram (default n=13) with any
document in a held-out benchmark/eval suite, and contaminated
documents are dropped before training.

Scale shape (100 TB corpus, benchmark = eval-suite-sized, i.e. tiny):

* corpus shingling is an index-``explode`` + slice — map-side, no
  shuffle, and the split words array is materialized ONCE per row by
  the Generate (the n=13 zip_with fold used by the MinHash family was
  measured 23x slower here: 12 layers of string-concat churn; the
  fold's sweet spot is small n — see dedup.shingles_of_words);
* the benchmark shingle set is distinct-ed and **broadcast**, so the
  overlap probe is a broadcast hash join against every corpus
  partition — the 100-TB side never shuffles;
* per-document counts are defined over window POSITIONS (doc i's
  ``size(words) - n + 1`` shingle slots), so ``n_shingles`` is a
  map-side expression — no corpus-wide distinct aggregation exists
  anywhere in the plan;
* the per-document report is one ``groupBy(doc_id)`` over *hit rows
  only* (candidate-sized, not corpus-sized);
* ``decontaminate`` itself is a broadcast **left-anti** join of the
  corpus against the (tiny) flagged-id frame — again no corpus
  shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grass_spark.operators.dedup import normalize_text


def shingle_positions(
    df: DataFrame, text_col: str, n: int, *id_cols: str
) -> DataFrame:
    """One row per word-n-gram window position: ``(*id_cols,
    n_shingles, idx, s)``.

    Documents shorter than ``n`` words get a single position holding
    the whole normalized text (same fallback rule as the dedup
    family).  The words array is carried through the Generate row and
    sliced per position — never re-split per element (the
    lambda-capture hazard documented in dedup.shingles_of_words)."""
    d = df.withColumn("_ws", F.split(normalize_text(F.col(text_col)), " "))
    return (
        d.select(
            *id_cols,
            F.greatest(F.size("_ws") - (n - 1), F.lit(1))
            .cast("bigint")
            .alias("n_shingles"),
            F.explode(
                F.sequence(F.lit(0), F.greatest(F.size("_ws") - n, F.lit(0)))
            ).alias("idx"),
            "_ws",
        )
        .withColumn("s", F.array_join(F.slice("_ws", F.col("idx") + 1, n), " "))
        .drop("_ws")
    )


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

    * ``n_shingles``      — n-gram window positions in the document;
    * ``n_hit_shingles``  — positions whose n-gram appears anywhere in
                            the benchmark;
    * ``n_bench_docs``    — distinct benchmark documents sharing at
                            least one n-gram;
    * ``contamination``   — ``n_hit_shingles / n_shingles``.

    Documents shorter than ``n`` words fall back to a single
    whole-text position (same rule as the dedup family), so a short
    doc is contaminated iff its full normalized text appears verbatim.
    """
    bench_id_col = bench_id_col or id_col
    bench_text_col = bench_text_col or text_col

    sh = shingle_positions(corpus, text_col, n, id_col)
    bsh = (
        shingle_positions(benchmark, bench_text_col, n, bench_id_col)
        .select(F.col(bench_id_col).alias("bench_id"), "s")
        .distinct()
    )
    hits = sh.join(F.broadcast(bsh), "s")
    return (
        hits.groupBy(id_col, "n_shingles")
        .agg(
            F.countDistinct("idx").alias("n_hit_shingles"),
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
    """Drop corpus documents with >= ``min_hit_shingles`` positions
    whose word ``n``-gram appears in the benchmark; passes through all
    corpus columns unchanged.  The flagged-id side is
    benchmark-bounded (tiny), so the anti-join broadcasts and the
    corpus never shuffles.
    """
    if min_hit_shingles <= 1:
        # fast path: "any overlap" needs no per-doc counting — a semi
        # join against the broadcast benchmark set + distinct over HIT
        # ids only (candidate-sized), skipping the countDistinct expand
        bench_text_col = bench_text_col or text_col
        sh = shingle_positions(corpus, text_col, n, id_col)
        bsh = (
            shingle_positions(benchmark, bench_text_col, n)
            .select("s")
            .distinct()
        )
        bad = (
            sh.join(F.broadcast(bsh), "s", "left_semi")
            .select(id_col)
            .distinct()
        )
    else:
        rep = contamination_report(
            corpus,
            benchmark,
            n=n,
            id_col=id_col,
            text_col=text_col,
            bench_id_col=bench_id_col,
            bench_text_col=bench_text_col,
        )
        bad = rep.filter(
            F.col("n_hit_shingles") >= min_hit_shingles
        ).select(id_col)
    return corpus.join(F.broadcast(bad), id_col, "left_anti")


def novelty_report(
    corpus: DataFrame,
    reference: DataFrame,
    *,
    n: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
    ref_text_col: str | None = None,
) -> DataFrame:
    """Per-document n-gram novelty against a reference corpus: what
    share of the doc's word-``n``-gram window positions carry a
    shingle NEVER seen in the reference.

    The memorization/freshness dual of :func:`contamination_report`
    (same shingle machinery, opposite sign): high novelty = new
    material; near-zero novelty = the reference already covers the
    doc (stale re-crawl, template spam, or verbatim copy).  Returns
    ONE row per corpus doc — docs with zero reference overlap score
    novelty 1.0, never drop out.

    Plan shape: the corpus never shuffles before the per-doc groupBy
    over its own positions; the reference shingle set is distinct-ed
    and broadcast (reference = curated/eval-sized).  Counts are window
    POSITIONS (map-side, no corpus-wide distinct) — the
    decontaminate convention.
    """
    ref_text_col = ref_text_col or text_col
    sh = shingle_positions(corpus, text_col, n, id_col)
    ref = (
        shingle_positions(reference, ref_text_col, n)
        .select("s")
        .distinct()
        .withColumn("_hit", F.lit(1))
    )
    joined = sh.join(F.broadcast(ref), "s", "left")
    return (
        joined.groupBy(id_col, "n_shingles")
        .agg(F.sum(F.coalesce("_hit", F.lit(0))).alias("n_seen"))
        .select(
            id_col,
            "n_shingles",
            "n_seen",
            F.round(
                F.lit(1.0)
                - F.col("n_seen").cast("double")
                  / F.col("n_shingles").cast("double"),
                6,
            ).alias("novelty"),
        )
    )
