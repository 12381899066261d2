"""Line-level document cleaning (the C4 / RefinedWeb line rules).

Gopher's rules (:mod:`grass_spark.operators.quality`) gate whole
documents; published pipelines also clean WITHIN a document first —
C4 keeps only lines that look like sentences (minimum word count,
terminal punctuation) and drops boilerplate-keyword lines (Raffel et
al. 2020 §2.2); RefinedWeb additionally strips mainly-uppercase and
mainly-numerical lines and rejects the whole document when line
removal deleted too much of it (Penedo et al. 2023 §3.3).

Everything here is a pure scan-stage projection: the line array is
staged once, the per-line predicate is a higher-order ``filter`` whose
lambda references only its own argument (capture-safe — the measured
per-element re-evaluation pitfall applies to *derived* free variables,
see PLANS.md), and the cleaned text is an ``array_join`` of the kept
lines.  Zero shuffles at any scale; composes with ``prepare_corpus``
as a stateless stage and onto ``readStream`` unchanged.

Cross-engine parity: ratios divide exact integer counts (bit-identical
IEEE quotients in JVM and DuckDB), denominators are ``greatest(..,1)``
guarded instead of nullable, and every regex is RE2-safe (no
backreferences, no lookaround).

Reference analog: none in GRASS — training-corpus hygiene expressed
Spark-first.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: lowercase phrases whose presence drops a line (the C4 blocklist
#: spirit: navigation chrome / cookie banners / js warnings)
DROP_PHRASES = (
    "javascript",
    "cookie",
    "sign in",
    "read more",
    "privacy policy",
    "terms of use",
    "all rights reserved",
    "click here",
)

#: doc-level first-fail order
_DOC_RULE_ORDER = ("lorem_ipsum", "curly_brace", "too_few_lines", "removed_frac")


@dataclass(frozen=True)
class LineRules:
    """Thresholds; defaults follow the published C4/RefinedWeb values
    (terminal punctuation ON, 5-word sentences, 3 surviving lines,
    mainly-uppercase / mainly-digit line drops)."""

    min_line_words: int = 5
    require_terminal_punct: bool = True
    max_upper_frac: float = 0.6
    max_digit_frac: float = 0.5
    drop_phrases: tuple = DROP_PHRASES
    min_kept_lines: int = 3
    max_removed_frac: float = 0.5
    drop_lorem_ipsum: bool = True
    drop_curly_brace: bool = True


def _line_keep(ln: Column, rules: LineRules) -> Column:
    """Per-line keep predicate.  References ONLY the lambda argument —
    safe inside a higher-order ``filter``.

    Rules that cannot fail are OMITTED from the chain, not just
    trivially true: each regexp count allocates a full replaced string
    per line, and this pipeline is allocation-bound, not FLOP-bound
    (measured: 650-750%% CPU busy at local[8] with only 1.4x over
    local[2] — the temporaries saturate memory before the cores do)."""
    words = F.filter(F.split(ln, r"\s+"), lambda w: w != F.lit(""))
    keep = F.size(words) >= F.lit(rules.min_line_words)
    if rules.require_terminal_punct:
        keep = keep & ln.rlike(r"[.!?\"']\s*$")
    if rules.drop_phrases:
        low = F.lower(ln)
        for p in rules.drop_phrases:
            keep = keep & ~low.contains(p)
    if rules.max_upper_frac < 1.0:
        n_upper = F.length(F.regexp_replace(ln, "[^A-Z]", ""))
        n_alpha = F.length(F.regexp_replace(ln, "[^A-Za-z]", ""))
        keep = keep & F.when(n_alpha == 0, F.lit(True)).otherwise(
            n_upper.cast("double") / n_alpha <= F.lit(rules.max_upper_frac)
        )
    if rules.max_digit_frac < 1.0:
        n_digit = F.length(F.regexp_replace(ln, "[^0-9]", ""))
        keep = keep & (
            n_digit.cast("double") / F.greatest(F.length(ln), F.lit(1))
            <= F.lit(rules.max_digit_frac)
        )
    return keep


def line_filter(
    df: DataFrame,
    rules: LineRules = LineRules(),
    *,
    text_col: str = "text",
) -> DataFrame:
    """Adds per-document line-cleaning outputs:

    ``n_lines``, ``n_kept_lines``, ``clean_text`` (kept lines joined
    with newlines, in order), ``removed_char_frac`` (character share
    deleted, separators included on both sides of the ratio),
    ``reject_reason`` (first failing doc rule in
    :data:`_DOC_RULE_ORDER`, else ``'keep'``) and ``keep``.

    Filtering/substitution is the caller's choice — ``.filter("keep")``
    then ``clean_text`` as the new text, or keep the audit columns.
    """
    t = F.col(text_col)
    staged = df.withColumn("_lines", F.split(t, "\n"))
    lines = F.col("_lines")
    kept = F.filter(lines, lambda ln: _line_keep(ln, rules))
    out = (
        staged.withColumn("n_lines", F.size(lines).cast("long"))
        .withColumn("n_kept_lines", F.size(kept).cast("long"))
        .withColumn("clean_text", F.array_join(kept, "\n"))
        .withColumn(
            "removed_char_frac",
            (F.length(t) - F.length(F.col("clean_text"))).cast("double")
            / F.greatest(F.length(t), F.lit(1)),
        )
        .drop("_lines")
    )
    fails = []
    if rules.drop_lorem_ipsum:
        fails.append(("lorem_ipsum", F.lower(t).contains("lorem ipsum")))
    if rules.drop_curly_brace:
        fails.append(("curly_brace", t.contains("{")))
    fails.append(
        ("too_few_lines", F.col("n_kept_lines") < F.lit(rules.min_kept_lines))
    )
    fails.append(
        ("removed_frac", F.col("removed_char_frac") > F.lit(rules.max_removed_frac))
    )
    reason = F.lit("keep")
    for name, cond in reversed(fails):
        reason = F.when(cond, F.lit(name)).otherwise(reason)
    return out.withColumn("reject_reason", reason).withColumn(
        "keep", reason == F.lit("keep")
    )
