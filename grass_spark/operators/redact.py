"""PII redaction for training corpora.

Pre-training pipelines scrub personally-identifiable strings before
anything else sees the text.  This is the standard regex family —
emails, IPv4 addresses, US-SSN-shaped ids, long digit runs (phone /
account numbers) — each replaced by a typed placeholder token so the
redaction is lossy but structure-preserving (``<EMAIL>`` etc.).

Scale shape: pure column expressions (``regexp_replace`` /
``regexp_count`` — JVM codegen, no shuffle, no UDF).  The patterns are
deliberately RE2-safe (character classes, bounded repeats, ``\\b``) so
the same rules run on any engine; the DuckDB oracle executes them
verbatim.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: ordered (kind, pattern, placeholder) — order matters: emails are
#: redacted before digit runs so 'a1234567890@x.com' never half-matches
PII_RULES: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b", "<IP>"),
    ("ssn", r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b", "<SSN>"),
    ("digits", r"\+?\b[0-9][0-9 ()+.-]{8,}[0-9]\b", "<NUMBER>"),
)


def redact_text(c: Column) -> Column:
    """Apply every PII rule in order; returns the scrubbed text."""
    for _, pat, token in PII_RULES:
        c = F.regexp_replace(c, pat, token)
    return c


def pii_counts(c: Column) -> list[Column]:
    """Per-rule match counts (counted on the PROGRESSIVELY redacted
    text, mirroring :func:`redact_text`'s order, so a string consumed
    by an earlier rule is never double-counted)."""
    out = []
    for kind, pat, token in PII_RULES:
        out.append(F.regexp_count(c, F.lit(pat)).cast("bigint").alias(f"n_{kind}"))
        c = F.regexp_replace(c, pat, token)
    return out


def redact(
    df: DataFrame, *, text_col: str = "text", out_col: str | None = None
) -> DataFrame:
    """Scrub ``text_col`` (in place, or into ``out_col``) and append
    per-rule ``n_<kind>`` count columns."""
    out_col = out_col or text_col
    c = F.col(text_col)
    return df.select(
        "*", *pii_counts(c)
    ).withColumn(out_col, redact_text(c))
