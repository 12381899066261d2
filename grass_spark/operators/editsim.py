"""Edit-distance verification of near-duplicate candidate pairs:
normalized Levenshtein similarity as the exact re-score after the
MinHash/SimHash candidate generators (``operators/dedup.py``).

Scale shape: Levenshtein is O(len_a x len_b) PER PAIR — it must only
ever run on candidate-bounded input (LSH pairs), never corpus x
corpus.  Two guards keep the quadratic work tight:

* a LENGTH pre-filter runs before the DP: ``lev >= |len_a - len_b|``,
  so ``sim <= min(len)/max(len)`` — pairs whose length ratio already
  caps similarity below the threshold never touch the DP.  The filter
  is scan-stage integer math on the joined lengths.
* texts join onto the pair frame by id (two equi-joins); the corpus
  itself never self-joins here.

Cross-engine parity: Spark ``levenshtein`` counts CHARACTERS while
DuckDB's counts UTF-8 BYTES ('Ü'->'U' costs 1 in Spark, 2 in DuckDB —
pinned in tests) — the oracle contract is ASCII text only; Spark's
char-level distance is the semantically correct one and is what this
operator returns.  ``sim = 1 - lev/greatest(len)`` rounds at 6 dp.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["edit_similarity_pairs"]


def edit_similarity_pairs(
    pairs: DataFrame,
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    threshold: float = 0.8,
) -> DataFrame:
    """Re-score candidate ``(id_a, id_b)`` pairs with normalized
    Levenshtein similarity; keep pairs with ``sim >= threshold``.

    Returns ``(id_a, id_b, len_a, len_b, lev, sim)`` where ``sim =
    round(1 - lev / max(len_a, len_b), 6)`` (two empty texts score
    1.0).  The length pre-filter (module docstring) drops pairs with
    ``min(len) < threshold * max(len)`` before the DP runs.
    """
    t = docs.select(
        F.col(id_col).alias("_id"),
        F.col(text_col).alias("_t"),
        F.length(text_col).alias("_len"),
    ).localCheckpoint(eager=False)  # joined onto both pair sides
    a = t.select(
        F.col("_id").alias("id_a"),
        F.col("_t").alias("_ta"),
        F.col("_len").alias("len_a"),
    )
    b = t.select(
        F.col("_id").alias("id_b"),
        F.col("_t").alias("_tb"),
        F.col("_len").alias("len_b"),
    )
    j = pairs.select("id_a", "id_b").join(a, "id_a").join(b, "id_b")
    mx = F.greatest(F.col("len_a"), F.col("len_b"))
    mn = F.least(F.col("len_a"), F.col("len_b"))
    pre = j.where(
        mn.cast("double") >= F.lit(float(threshold)) * mx.cast("double")
    )
    lev = F.levenshtein(F.col("_ta"), F.col("_tb"))
    scored = pre.select(
        "id_a",
        "id_b",
        "len_a",
        "len_b",
        lev.alias("lev"),
    ).withColumn(
        "sim",
        F.when(F.col("len_a") + F.col("len_b") == 0, F.lit(1.0)).otherwise(
            F.round(
                F.lit(1.0)
                - F.col("lev").cast("double")
                / F.greatest("len_a", "len_b").cast("double"),
                6,
            )
        ),
    )
    return scored.where(F.col("sim") >= float(threshold))
