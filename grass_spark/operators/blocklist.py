"""Word-boundary blocklist gate (the C4 badword-list filter).

C4 removes any page containing a word from the "List of Dirty, Naughty,
Obscene or Otherwise Bad Words" (Raffel et al. 2020 §2.2); most
production corpus pipelines keep a softer variant — count blocklisted
term OCCURRENCES and gate on a count or density threshold so a single
quoted word doesn't nuke an encyclopedia article.

The implementation is the same plan-literal-regex trick as the greedy
subword tokenizer (:mod:`grass_spark.operators.textstats`): the term
list compiles into ONE ``\\b(?:t1|t2|...)\\b`` alternation sorted by
(-len, term) — leftmost-first + length-desc == greedy longest match in
BOTH java.util.regex and RE2/DuckDB, and both engines consume matches
non-overlapping left-to-right, so the occurrence count is bit-portable.
``\\b`` is the ASCII word boundary in both engines, so phrases match
only at word edges ("fast" never fires inside "fastx"; multi-word
phrases anchor both ends).

Scale shape: a pure scan-stage projection — zero Exchange, zero
Python, the term list ships inside the plan (same budget guard as the
tokenizer vocab).  Composes with ``prepare_corpus`` as a stateless
stage and onto ``readStream`` unchanged.

Reference analog: none in GRASS — training-corpus hygiene expressed
Spark-first.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: plan-literal budget: len(alternation) is bounded so the compiled
#: task binary stays small (same class of guard as the tokenizer's
#: vocab literal and the centroid-literal 4096 rule).
_MAX_PATTERN_CHARS = 65536


def blocklist_pattern(terms: list[str] | tuple[str, ...]) -> str:
    """Compile a term list into the portable word-boundary alternation.

    Terms lowercase (matching runs on ``lower(text)``), must be
    non-empty, and must start/end in a word character (otherwise
    ``\\b`` would invert its meaning at that edge — raise rather than
    silently never match).
    """
    if not terms:
        raise ValueError("blocklist needs at least one term")
    canon = []
    for t in terms:
        t = t.lower().strip()
        if not t:
            raise ValueError("empty blocklist term")
        if not (re.match(r"\w", t[0]) and re.match(r"\w", t[-1])):
            raise ValueError(
                f"term {t!r} must start and end in a word character "
                "(\\b anchors invert at non-word edges)"
            )
        canon.append(t)
    canon = sorted(set(canon), key=lambda t: (-len(t), t))
    pat = r"\b(?:" + "|".join(re.escape(t) for t in canon) + r")\b"
    if len(pat) > _MAX_PATTERN_CHARS:
        raise ValueError(
            f"blocklist pattern {len(pat)} chars exceeds the "
            f"{_MAX_PATTERN_CHARS} plan-literal budget; shard the list"
        )
    return pat


def blocked_count(text: Column, terms: list[str] | tuple[str, ...]) -> Column:
    """Occurrences of any blocklisted term in ``text`` (case-folded,
    non-overlapping left-to-right, longest-alternative-first)."""
    return F.regexp_count(F.lower(text), F.lit(blocklist_pattern(terms)))


def blocklist_stats(
    df: DataFrame,
    terms: list[str] | tuple[str, ...],
    *,
    text_col: str = "text",
    max_hits: int = 0,
    max_frac: float | None = None,
) -> DataFrame:
    """Adds ``n_blocked`` (term occurrences), ``blocked_frac``
    (occurrences per word, 6 dp) and ``keep``.

    ``keep`` is ``n_blocked <= max_hits`` AND (when ``max_frac`` is
    set) ``blocked_frac <= max_frac``; the C4 hard rule is the default
    (``max_hits=0``).  The fraction rounds to 6 dp before the
    comparison so the gate decision is engine-portable.
    """
    t = F.col(text_col)
    n_blocked = blocked_count(t, terms).cast("long")
    n_words = F.size(
        F.filter(F.split(t, r"\s+"), lambda w: w != F.lit(""))
    )
    out = (
        df.withColumn("n_blocked", n_blocked)
        .withColumn(
            "blocked_frac",
            F.round(
                F.col("n_blocked").cast("double")
                / F.greatest(n_words, F.lit(1)).cast("double"),
                6,
            ),
        )
    )
    keep = F.col("n_blocked") <= F.lit(max_hits)
    if max_frac is not None:
        keep = keep & (F.col("blocked_frac") <= F.lit(max_frac))
    return out.withColumn("keep", keep)
