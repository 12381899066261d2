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
-occurrence election is a map-side-combinable
``groupBy(seg).agg(min(struct(id, idx)))`` — NOT a window over
``partitionBy(seg)``: a boilerplate segment present in 10% of a 1e9-doc
corpus is ~1e8 rows of ONE key, and partial aggregation absorbs that
hot key inside each map task where a window would single-task it.  The
winner joins back on the full ``(seg, id, idx)`` triple (unique per
occurrence, so the join key is well spread even for the hottest
segment); reconstruction is one ``groupBy(doc)``.  Nothing is quadratic
and no segment list ever collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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

    The election is ``min(struct(id, idx))`` per segment — identical
    semantics to a ``row_number`` window ordered by (id, idx) (the pair
    is unique per occurrence so there are no ties), but combinable:
    partial aggregation eats a hot boilerplate segment map-side where
    the window funnels every occurrence into one task.  The winner is
    re-attached via a left join on the (seg, id, idx) triple, whose
    hash spread does not degrade on a hot segment.
    """
    winners = (
        segs.groupBy(seg_col)
        .agg(
            F.min(
                F.struct(
                    F.col(id_col).alias("i"), F.col(idx_col).alias("x")
                )
            ).alias("_w")
        )
        .select(
            seg_col,
            F.col("_w.i").alias(id_col),
            F.col("_w.x").alias(idx_col),
            F.lit(1).alias("_keep"),
        )
    )
    flagged = segs.join(
        winners, on=[seg_col, id_col, idx_col], how="left"
    ).withColumn("_keep", F.coalesce(F.col("_keep"), F.lit(0)))
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
