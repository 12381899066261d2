"""Segment-level deduplication (the CCNet / RefinedWeb line-dedup op).

Web corpora repeat boilerplate SPANS (nav bars, license footers,
templated paragraphs) inside otherwise-distinct documents; document
-level dedup never sees them.  Segment dedup splits every document
into segments, keeps only the corpus-wide FIRST occurrence of each
distinct normalized segment (ordered by (doc id, position) — fully
deterministic), and reconstructs the cleaned text.

Segmenters: ``by_separator(regex)`` (paragraphs / lines) for real
corpora, ``by_words(k)`` (fixed k-word chunks) for unstructured
streams.  Both are JVM expressions.

Scale shape (100 TB corpus): segmenting is an index-explode (the words
array is materialized by the Generate row, NOT re-split per segment —
see the lambda-capture note in :func:`dedup.shingles_of_words`); first
-occurrence election is ONE shuffle on the segment hash (same key shape
as exact dedup); reconstruction is one ``groupBy(doc)``.  Nothing is
quadratic and no segment list ever collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from grass_spark.operators.dedup import normalize_text


def segments_by_separator(df: DataFrame, text_col: str, sep: str) -> DataFrame:
    """Explode ``text_col`` into (seg_idx, seg) rows split on a regex
    separator; each segment is whitespace-normalized, empties dropped."""
    return (
        df.select(
            "*",
            F.posexplode(F.split(F.col(text_col), sep)).alias("seg_idx", "seg"),
        )
        .withColumn("seg", normalize_text(F.col("seg")))
        .filter(F.col("seg") != "")
    )


def segments_by_words(df: DataFrame, text_col: str, k: int) -> DataFrame:
    """Explode ``text_col`` into non-overlapping k-word chunk rows.

    Two steps so the split array is evaluated ONCE per row: the
    Generate (posexplode over the chunk-start index range) carries the
    materialized words array into each output row, and the chunk slice
    references that attribute — not the upstream split expression.
    """
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    d = df.withColumn("_ws", F.split(normalize_text(F.col(text_col)), " "))
    return (
        d.select(
            "*",
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.ceil(F.size("_ws") / F.lit(k)).cast("int") - 1,
                )
            ).alias("seg_idx", "_start"),
        )
        .withColumn(
            "seg", F.array_join(F.slice("_ws", F.col("_start") * k + 1, k), " ")
        )
        .drop("_ws", "_start")
        .filter(F.col("seg") != "")
    )


def dedup_segments(
    segs: DataFrame,
    *,
    id_col: str = "doc_id",
    seg_col: str = "seg",
    idx_col: str = "seg_idx",
) -> DataFrame:
    """First-occurrence segment dedup + per-document reconstruction.

    Input: a segment frame from one of the segmenters.  A segment
    occurrence survives iff it is the corpus-wide first occurrence of
    its normalized text, ordered by (id, position).  Returns one row
    per input document: ``n_segments``, ``n_kept``, and ``dedup_text``
    (the surviving segments re-joined in original order; empty string
    if nothing survived).
    """
    w = Window.partitionBy(seg_col).orderBy(id_col, idx_col)
    flagged = segs.withColumn(
        "_keep", (F.row_number().over(w) == 1).cast("int")
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_segments"),
        F.sum("_keep").cast("bigint").alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(
                            F.col("_keep") == 1,
                            F.struct(F.col(idx_col), F.col(seg_col).alias("s")),
                        )
                    )
                ),
                lambda x: x["s"],
            ),
            " ",
        ).alias("dedup_text"),
    )
