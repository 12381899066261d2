"""Corpus / pipeline audit operators: cross-source shingle overlap
(how much does one ingest source duplicate another) and key-skew
diagnostics (is this join/groupBy key safe at scale).

Reference analog: the reference audits dataset health with
t.info/t.rast.univar-style censuses (``temporal/t.info``); these are
the same census questions asked about corpus sources and shuffle keys.

Scale notes:

* :func:`source_overlap` never compares documents pairwise.  Shingles
  collapse in one distinct on (source, shingle) — map-side combinable;
  per-shingle source membership is a ``collect_set`` bounded by the
  SOURCE VOCABULARY (the one genuinely bounded collect, like
  retention_cohorts' calendar-bounded set), and the pair census
  explodes at most |sources|^2 rows per shingle.  A shingle shared by
  every source costs |sources|^2 rows, not |docs|^2.
* :func:`skew_report` is a census-of-census: ``groupBy(keys).count``
  absorbs row volume map-side, then frequencies group again onto one
  row per DISTINCT frequency (log-scale many in practice).  Quantiles,
  top-share and the Gini coefficient all derive from exact integer
  power sums over that tiny frame (DECIMAL(38,0) products — row counts
  at petabyte scale overflow int64 when multiplied by key ranks), cast
  to double once, so every reported metric is bit-identical across
  engines and shuffle orders.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, Window, functions as F

from grass_spark.operators.decontaminate import shingle_positions

__all__ = ["source_overlap", "skew_report"]

#: pair censuses need a bounded source vocabulary
_MAX_SOURCES = 1_000


def source_overlap(
    df: DataFrame,
    *,
    n: int = 5,
    text_col: str = "text",
    source_col: str = "source",
    checkpoint: bool = True,
) -> DataFrame:
    """Pairwise Jaccard overlap between sources' word-``n``-gram
    shingle sets.

    Returns ``(source_a, source_b, shingles_a, shingles_b, common,
    jaccard)`` for every unordered source pair with at least one
    shared shingle (``source_a < source_b``).  Documents shorter than
    ``n`` words contribute their whole normalized text (the dedup
    family's fallback rule).  Raises when the source vocabulary
    exceeds ``1_000``.
    """
    sh = (
        shingle_positions(df, text_col, n, source_col)
        .select(F.col(source_col).alias("_src"), "s")
        .distinct()
    )
    if checkpoint:  # consumed 3x (guard, sizes, membership census)
        sh = sh.localCheckpoint(eager=False)

    n_sources = (
        sh.select("_src").distinct().limit(_MAX_SOURCES + 1).count()
    )
    if n_sources > _MAX_SOURCES:
        raise ValueError(
            f"source_overlap: source vocabulary exceeds {_MAX_SOURCES}"
        )

    sizes = sh.groupBy("_src").agg(F.count(F.lit(1)).alias("_sz"))

    membership = sh.groupBy("s").agg(
        F.collect_set("_src").alias("_ss")
    )
    pairs = (
        membership.select(F.explode("_ss").alias("source_a"), "_ss")
        .select("source_a", F.explode("_ss").alias("source_b"))
        .where(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.count(F.lit(1)).alias("common"))
    )

    sa = F.broadcast(
        sizes.select(
            F.col("_src").alias("source_a"), F.col("_sz").alias("shingles_a")
        )
    )
    sb = F.broadcast(
        sizes.select(
            F.col("_src").alias("source_b"), F.col("_sz").alias("shingles_b")
        )
    )
    out = pairs.join(sa, "source_a").join(sb, "source_b")
    union = (
        F.col("shingles_a") + F.col("shingles_b") - F.col("common")
    ).cast("double")
    return out.select(
        "source_a",
        "source_b",
        "shingles_a",
        "shingles_b",
        "common",
        F.round(F.col("common").cast("double") / union, 6).alias("jaccard"),
    ).orderBy("source_a", "source_b")


def skew_report(
    df: DataFrame,
    key_cols: Sequence[str] | str,
) -> DataFrame:
    """One-row key-distribution diagnostic for a prospective shuffle
    key: ``(n_rows, n_keys, max_freq, p50_freq, p90_freq, p99_freq,
    top_share, gini)``.

    ``pXX_freq`` is the exact type-1 frequency quantile over keys
    (the smallest frequency f such that at least ``ceil(q *
    n_keys)`` keys have frequency <= f); ``top_share`` = max_freq /
    n_rows; ``gini`` is the exact Gini coefficient of the key
    frequency distribution (0 = uniform keys, -> 1 = one key holds
    everything).  All metrics compose from integer power sums over the
    frequency census — see the module docstring.
    """
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    census = df.groupBy(*[F.col(k) for k in keys]).agg(
        F.count(F.lit(1)).alias("_f")
    )
    c2 = census.groupBy("_f").agg(F.count(F.lit(1)).alias("_c"))

    # windows run over one row per DISTINCT frequency — tiny frame
    cum_w = Window.orderBy("_f").rowsBetween(Window.unboundedPreceding, 0)
    tot_w = Window.partitionBy()
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731

    staged = c2.select(
        "_f",
        "_c",
        F.sum("_c").over(cum_w).alias("_cum"),
        F.sum("_c").over(tot_w).alias("_n"),
    ).withColumn(
        "_r0", F.col("_cum") - F.col("_c")  # keys strictly below this f
    ).withColumn(
        # triangular number c*(c+1)/2 in exact integer math (decimal
        # division would introduce fractional scale): halve whichever
        # of c, c+1 is even BEFORE the decimal product
        "_tri",
        F.when(
            F.col("_c") % 2 == 0,
            dec(F.expr("_c div 2")) * dec(F.col("_c") + 1),
        ).otherwise(dec(F.col("_c")) * dec(F.expr("(_c + 1) div 2"))),
    ).withColumn(
        # sum of rank*f over this tie run: f * (c*r0 + c*(c+1)/2)
        "_rf",
        dec(F.col("_f"))
        * (dec(F.col("_c")) * dec(F.col("_r0")) + F.col("_tri")),
    )

    def _q(num: int, den: int):
        # smallest f with cum >= ceil(num*n/den), integer math
        need = F.expr(f"({num} * _n + {den} - 1) div {den}")
        return F.min(F.when(F.col("_cum") >= need, F.col("_f")))

    agg = staged.agg(
        F.sum(dec(F.col("_f")) * dec(F.col("_c"))).alias("_rows"),
        F.sum("_c").alias("n_keys"),
        F.max("_f").alias("max_freq"),
        _q(1, 2).alias("p50_freq"),
        _q(9, 10).alias("p90_freq"),
        _q(99, 100).alias("p99_freq"),
        F.sum(dec(F.col("_rf"))).alias("_srf"),
    )
    n = F.col("n_keys").cast("double")
    rows = F.col("_rows").cast("double")
    gini = (
        F.lit(2.0) * F.col("_srf").cast("double") / (n * rows)
        - (n + F.lit(1.0)) / n
    )
    return agg.select(
        F.col("_rows").cast("long").alias("n_rows"),
        "n_keys",
        "max_freq",
        "p50_freq",
        "p90_freq",
        "p99_freq",
        F.round(F.col("max_freq").cast("double") / rows, 6).alias(
            "top_share"
        ),
        F.round(gini, 6).alias("gini"),
    )


def k_anonymity(
    df: DataFrame,
    quasi_cols: list[str],
    *,
    k: int = 5,
) -> DataFrame:
    """One-row k-anonymity audit over the quasi-identifier tuple
    ``quasi_cols``: a row is re-identifiable when its QI equivalence
    class holds fewer than ``k`` rows (Sweeney's criterion) — the
    privacy gate a training-data release runs AFTER pii_redact
    (redaction removes direct identifiers; rare attribute
    combinations still single people out).

    Returns (k, n_rows, n_groups, n_risky_groups, n_risky_rows,
    min_group_n, risky_row_frac) — risky_row_frac 6-dp.  NULLs in QI
    columns form their own equivalence class (a NULL combination is
    as linkable as any other value).

    Scale shape: ONE map-side-combinable groupBy on the QI tuple,
    then a 1-row aggregate over the class-size census — the census is
    |distinct QI tuples|-sized, never row-scale, and nothing
    shuffles twice.
    """
    if not quasi_cols:
        raise ValueError("k_anonymity: quasi_cols must be non-empty")
    if k < 2:
        raise ValueError("k_anonymity: k must be >= 2")
    sizes = df.groupBy(*quasi_cols).agg(F.count(F.lit(1)).alias("_n"))
    risky = F.col("_n") < k
    return sizes.agg(
        F.lit(int(k)).alias("k"),
        F.sum("_n").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(risky.cast("long")).alias("n_risky_groups"),
        F.sum(F.when(risky, F.col("_n")).otherwise(0)).cast(
            "bigint"
        ).alias("n_risky_rows"),
        F.min("_n").alias("min_group_n"),
        F.round(
            F.sum(F.when(risky, F.col("_n")).otherwise(0)).cast("double")
            / F.sum("_n").cast("double"),
            6,
        ).alias("risky_row_frac"),
    )
