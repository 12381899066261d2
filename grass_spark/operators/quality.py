"""Rule-based document quality filtering (the Gopher/MassiveText rules).

Published corpus pipelines gate documents on cheap structural signals
before any model-based scoring: word-count bounds, mean word length,
symbol-to-word ratio, bullet/ellipsis line shares, the fraction of
words containing an alphabetic character, and a minimum number of
distinct stopwords (Rae et al. 2021 §A1.1; reused by RefinedWeb and
Dolma).  Every rule here is a pure column expression over one split —
no shuffle, no Python; at 100 TB the whole filter runs inside the
scan's codegen stage and composes with ``prepare_corpus`` as another
stateless keep-mask.

The word/line arrays are materialized as staged columns first: a
higher-order-function lambda that references a derived expression as a
free variable re-evaluates it PER ELEMENT (the engine's measured 10-23x
shingle-path pitfall — see PLANS.md).

Reference analog: none in GRASS — this is the training-corpus quality
gate expressed Spark-first.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: distinct-stopword presence list (Gopher's 8-word "stop word" rule)
STOP_PRESENCE = ("the", "be", "to", "of", "and", "that", "have", "with")


@dataclass(frozen=True)
class QualityRules:
    """Thresholds; defaults are the published Gopher values."""

    min_words: int = 50
    max_words: int = 100_000
    min_mean_word_len: float = 3.0
    max_mean_word_len: float = 10.0
    max_symbol_ratio: float = 0.1
    max_bullet_line_frac: float = 0.9
    max_ellipsis_line_frac: float = 0.3
    min_alpha_word_frac: float = 0.8
    min_stopwords: int = 2


#: (rule name, metric column, predicate builder) in first-fail order
_RULE_ORDER = (
    "n_words_low",
    "n_words_high",
    "mean_word_len",
    "symbol_ratio",
    "bullet_lines",
    "ellipsis_lines",
    "alpha_words",
    "stopwords",
)


def quality_metrics(
    df: DataFrame, *, text_col: str = "text"
) -> DataFrame:
    """Adds the raw quality metrics (no thresholds applied):

    ``n_words``, ``mean_word_len``, ``symbol_ratio``,
    ``bullet_line_frac``, ``ellipsis_line_frac``, ``alpha_word_frac``,
    ``n_stop_present``.  All scan-stage expressions.
    """
    t = F.col(text_col)
    staged = (
        df.withColumn("_words", F.split(F.trim(t), r"\s+"))
        .withColumn("_lines", F.split(t, "\n"))
    )
    words, lines = F.col("_words"), F.col("_lines")
    n_words = F.size(words).cast("long")
    n_lines = F.size(lines).cast("long")
    # mean word length = non-whitespace chars / words (cheaper than a
    # per-element length fold; identical by definition)
    nonspace = F.length(F.regexp_replace(t, r"\s", "")).cast("long")
    # '#' and '...' occurrences; replace() consumes non-overlapping
    # left-to-right in both engines, so count-by-length-delta is portable
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ell = (
        F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))
    ) / 3
    bullet = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"^\s*[-*•]"))
    ).cast("long")
    ellipsis_end = F.size(
        F.filter(lines, lambda ln: ln.rlike(r"\.\.\.\s*$"))
    ).cast("long")
    alpha = F.size(F.filter(words, lambda w: w.rlike("[a-zA-Z]"))).cast(
        "long"
    )
    padded = F.concat(F.lit(" "), F.lower(t), F.lit(" "))
    present = sum(
        (
            F.when(padded.contains(f" {w} "), F.lit(1)).otherwise(F.lit(0))
            for w in STOP_PRESENCE
        ),
        F.lit(0),
    ).cast("long")
    return (
        staged.withColumn("n_words", n_words)
        .withColumn("mean_word_len", nonspace / n_words)
        .withColumn("symbol_ratio", (n_hash + n_ell) / n_words)
        .withColumn("bullet_line_frac", bullet / n_lines)
        .withColumn("ellipsis_line_frac", ellipsis_end / n_lines)
        .withColumn("alpha_word_frac", alpha / n_words)
        .withColumn("n_stop_present", present)
        .drop("_words", "_lines")
    )


def quality_filter(
    df: DataFrame,
    rules: QualityRules = QualityRules(),
    *,
    text_col: str = "text",
) -> DataFrame:
    """Adds the metrics plus ``keep`` (all rules pass) and
    ``reject_reason`` (first failing rule in :data:`_RULE_ORDER`, or
    ``'keep'``).  Filtering is the caller's ``.filter("keep")`` so the
    audit path (reason histograms) reuses the same frame.
    """
    out = quality_metrics(df, text_col=text_col)
    fails = {
        "n_words_low": F.col("n_words") < rules.min_words,
        "n_words_high": F.col("n_words") > rules.max_words,
        "mean_word_len": (F.col("mean_word_len") < rules.min_mean_word_len)
        | (F.col("mean_word_len") > rules.max_mean_word_len),
        "symbol_ratio": F.col("symbol_ratio") > rules.max_symbol_ratio,
        "bullet_lines": F.col("bullet_line_frac")
        > rules.max_bullet_line_frac,
        "ellipsis_lines": F.col("ellipsis_line_frac")
        > rules.max_ellipsis_line_frac,
        "alpha_words": F.col("alpha_word_frac")
        < rules.min_alpha_word_frac,
        "stopwords": F.col("n_stop_present") < rules.min_stopwords,
    }
    reason = F.lit("keep")
    for name in reversed(_RULE_ORDER):
        reason = F.when(fails[name], F.lit(name)).otherwise(reason)
    return out.withColumn("reject_reason", reason).withColumn(
        "keep", reason == F.lit("keep")
    )
