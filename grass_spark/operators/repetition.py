"""Repetition-based quality signals (the Gopher / MassiveText filters).

Heavily repetitive documents (SEO spam, templated listings, scraper
loops) are the classic low-quality stratum; MassiveText-style
pipelines filter on *repetition fractions*.  Three signals per doc:

* ``word_rep_frac``   — fraction of word occurrences that are repeats
                        (``1 - distinct/total``);
* ``top{n}_frac``     — share of n-gram window positions covered by
                        the single most frequent n-gram (default n=2);
* ``dup{m}_frac``     — share of m-gram positions whose m-gram occurs
                        more than once in the document (default m=5).

Documents with fewer than n (resp. m) words have no window positions;
their fractions are 0 by definition.

Scale shape: word stats are map-side array expressions; each n-gram
signal is one ``groupBy(doc, gram)`` (well-spread key, map-side
combined) followed by a ``groupBy(doc)`` — the same bounded shapes as
exact dedup.  Gram strings never leave their (doc, gram) partition and
nothing is quadratic in document length.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grass_spark.operators.dedup import normalize_text


def _gram_frame(words: DataFrame, id_col: str, n: int, out_prefix: str) -> DataFrame:
    """(id, <prefix>_total, <prefix>_top, <prefix>_dup) n-gram position
    stats; docs shorter than n words are absent (caller fills 0)."""
    grams = (
        words.filter(F.size("_ws") >= n)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.size("_ws") - n)).alias("i"),
            "_ws",
        )
        .select(
            id_col, F.array_join(F.slice("_ws", F.col("i") + 1, n), " ").alias("g")
        )
    )
    per_gram = grams.groupBy(id_col, "g").agg(F.count(F.lit(1)).alias("c"))
    return per_gram.groupBy(id_col).agg(
        F.sum("c").alias(f"{out_prefix}_total"),
        F.max("c").alias(f"{out_prefix}_top"),
        F.sum(F.when(F.col("c") >= 2, F.col("c")).otherwise(0)).alias(
            f"{out_prefix}_dup"
        ),
    )


def repetition_stats(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    top_n: int = 2,
    dup_n: int = 5,
) -> DataFrame:
    """Per-document repetition signals (see module docstring).

    Returns ``(id, n_words, word_rep_frac, top{top_n}_frac,
    dup{dup_n}_frac)`` — one row per input document.
    """
    words = df.select(
        id_col, F.split(normalize_text(F.col(text_col)), " ").alias("_ws")
    )
    base = words.select(
        id_col,
        F.size("_ws").cast("bigint").alias("n_words"),
        (
            1.0
            - F.size(F.array_distinct("_ws"))
            / F.size("_ws").cast("double")
        ).alias("word_rep_frac"),
    )
    top = _gram_frame(words, id_col, top_n, "t")
    dup = _gram_frame(words, id_col, dup_n, "d")
    return (
        base.join(top, id_col, "left")
        .join(dup, id_col, "left")
        .select(
            id_col,
            "n_words",
            "word_rep_frac",
            F.coalesce(
                F.col("t_top") / F.col("t_total").cast("double"), F.lit(0.0)
            ).alias(f"top{top_n}_frac"),
            F.coalesce(
                F.col("d_dup") / F.col("d_total").cast("double"), F.lit(0.0)
            ).alias(f"dup{dup_n}_frac"),
        )
    )
