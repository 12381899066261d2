"""Corpus TF-IDF keyword extraction for training-data pipelines.

Classic corpus-level term weighting (Sparck Jones 1972): per-document
term frequency times inverse document frequency, top-k terms per doc.
Useful as a cheap topic/keyword signal for mixture construction and
as a per-source content fingerprint.

Scale shape (the whole point):

* tokenisation is a scan-stage ``regexp_extract_all`` + ``explode`` —
  output proportional to token count, nothing collected.
* ``tf`` = groupBy(id, word) and ``df`` = groupBy(word) are BOTH
  map-side combinable (partial_count absorbs hot words before any
  exchange); the document-frequency table is vocabulary-sized, so AQE
  broadcasts it at realistic vocabularies and the corpus-sized ``tf``
  frame shuffles at most once.
* the final top-k is a window over ``partitionBy(id)`` — bounded by a
  single document's distinct-word count, never a corpus-wide sort.
  (Contrast the per-source caps operator, where the bare group key can
  be corpus-hot; a doc's vocabulary cannot.)
* ``N`` (corpus size) is a scalar aggregate — one driver value.

Cross-engine parity: scores are ranked on ``round(score, 6)`` with the
word as tie-break, because ``ln`` may differ in the last ulp between
the JVM and DuckDB's libm; the 6-dp convention matches every other
oracle in this repo (see CLAUDE.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

WORD_PATTERN = "[a-z0-9]+"


def doc_terms(
    df: DataFrame, *, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """(id, word, tf) — per-document term frequencies.

    One map-side-combinable groupBy; words are lowercased alnum runs
    (engine-portable: the pattern means the same in java.util.regex
    and RE2/DuckDB).
    """
    words = F.explode(
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
        )
    ).alias("word")
    return (
        df.select(F.col(id_col), words)
        .groupBy(id_col, "word")
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def tfidf_keywords(
    df: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_k: int = 5,
) -> DataFrame:
    """Top-``top_k`` TF-IDF keywords per document.

    Returns (id, word, tf, score, rank) with
    ``score = tf * ln(N / df)`` rounded to 6 dp and rank 1..top_k by
    (score desc, word asc).  Docs with no alnum token are absent (no
    terms to rank).  ``N`` counts ALL input docs, including empty ones.
    """
    if top_k < 1:
        raise ValueError(f"top_k must be >= 1, got {top_k}")
    n_docs = df.count()  # scalar; the only driver-side value
    tf = doc_terms(df, text_col=text_col, id_col=id_col)
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("df"))
    scored = tf.join(dfreq, "word").withColumn(
        "score",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ),
    )
    w = Window.partitionBy(id_col).orderBy(
        F.col("score").desc(), F.col("word").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top_k)
        .select(id_col, "word", "tf", "score", "rank")
    )
