"""Sliding-window document chunking (RAG / context-window prep).

Split each document into fixed-size word windows advanced by a
configurable stride (``stride == size`` gives non-overlapping chunks;
``stride < size`` gives the overlapping windows retrieval pipelines
index).  The standard pre-processing for embedding-index construction
and for long-document training examples with context overlap.

Scale shape: one Generate per doc (``posexplode`` over the chunk-start
index range — output proportional to chunk count, the
lambda-capture-safe explode+slice pattern from
:func:`grass_spark.operators.segdedup.segments_by_words`), zero
shuffles, zero Python.  A trailing partial window is emitted iff it
starts before the text ends, so every word lands in at least one
chunk and re-runs are byte-deterministic.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grass_spark.operators.dedup import normalize_text


def chunk_documents(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    size: int = 64,
    stride: int | None = None,
) -> DataFrame:
    """(id, chunk_idx, chunk_start, n_chunk_words, chunk_text) rows.

    ``chunk_idx`` counts windows from 0; ``chunk_start`` is the window's
    word offset (``chunk_idx * stride``); the last window may be short.
    Docs whose normalized text is empty produce no chunks.  Words are
    the shared dedup normalization (casefold + collapsed whitespace) so
    chunk text joins exactly against the dedup/span operators.
    """
    stride = size if stride is None else stride
    if size <= 0 or stride <= 0:
        raise ValueError(f"size/stride must be positive, got {size}/{stride}")
    if stride > size:
        raise ValueError(
            f"stride {stride} > size {size} would drop words between windows"
        )
    d = df.withColumn(
        "_ws", F.split(normalize_text(F.col(text_col)), " ")
    ).filter(F.array_join(F.col("_ws"), "") != "")
    n = F.size("_ws")
    # last start = stride * floor((n-1)/stride) — the final window that
    # still begins inside the text; sequence is inclusive of it
    return (
        d.select(
            id_col,
            "_ws",
            F.posexplode(
                F.sequence(
                    F.lit(0),
                    F.floor((n - 1) / stride).cast("int") * stride,
                    F.lit(stride),
                )
            ).alias("chunk_idx", "chunk_start"),
        )
        .select(
            id_col,
            "chunk_idx",
            "chunk_start",
            F.slice("_ws", F.col("chunk_start") + 1, size).alias("_cw"),
        )
        .select(
            id_col,
            "chunk_idx",
            "chunk_start",
            F.size("_cw").alias("n_chunk_words"),
            F.array_join("_cw", " ").alias("chunk_text"),
        )
    )
