"""Robust outlier detection: per-group median / MAD (median absolute
deviation) flags over a numeric column — the standard "weird document
length / weird event value" gate that survives heavy tails where a
mean/stddev z-score is itself dragged by the outliers (Hampel;
1.4826·MAD estimates sigma under normality).

Scale shape — the whole module runs on DISTINCT-VALUE CENSUSES, never
on raw rows:

* one map-side-combinable ``groupBy(group, value).count`` collapses
  the corpus; every later step touches one row per distinct value per
  group (doc lengths: thousands of rows per group, independent of doc
  count — the ks_test / engagement-census philosophy).
* medians interpolate Hyndman–Fan type 7 positions directly on the
  census via a cumulative window ``partitionBy(group).orderBy(value)``
  — bounded by the group's DISTINCT-value count, never corpus-hot.
  (Contrast ``F.percentile``: an exact holistic aggregate buffers
  every raw row of the hottest group in one task.)
* the deviation census re-censuses |value − median| (two values can
  collide on one deviation), so the MAD pass is census-sized too.
* group medians join back onto the census as 1-row-per-group
  broadcasts.

Cross-engine parity: census medians interpolate between exact
integers at h = (n−1)/2 (frac is exactly 0 or 0.5 — binary-exact), so
medians and deviations are bit-identical; the outlier cut compares
6-dp-rounded deviation to 6-dp-rounded cutoff (rounded-vs-rounded,
the perplexity_buckets convention) so JVM/libm never flips a flag.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

MAD_SIGMA = 1.4826  # consistency constant: MAD * 1.4826 ~ sigma (normal)


def _census_median(
    census: DataFrame, group_col: str, value_col: str, cnt_col: str
) -> DataFrame:
    """(group, med) — Hyndman–Fan type 7 median from a distinct-value
    census (group, value, count).

    h = (n-1)/2; med = v[floor(h)] + (h - floor(h)) * (v[floor(h)+1] -
    v[floor(h)]) over the 0-indexed value-sorted multiset.  v[p] is
    recovered from the census as the smallest value whose cumulative
    count reaches p+1.  The cumulative window is per-group,
    distinct-value bounded.
    """
    cum_w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot_w = Window.partitionBy(group_col)
    staged = census.select(
        F.col(group_col),
        F.col(value_col).cast("double").alias("_v"),
        F.sum(cnt_col).over(cum_w).alias("_cum"),
        F.sum(cnt_col).over(tot_w).alias("_n"),
    )
    jlo = F.floor((F.col("_n") - 1) / 2)
    frac = (
        (F.col("_n") - 1).cast("double") / F.lit(2.0)
        - jlo.cast("double")
    )
    lo = F.min(F.when(F.col("_cum") >= jlo + 1, F.col("_v")))
    hi = F.min(F.when(F.col("_cum") >= jlo + 2, F.col("_v")))
    return staged.groupBy(group_col).agg(
        (
            lo + F.max(frac) * (F.coalesce(hi, lo) - lo)
        ).alias("med"),
        F.max("_n").alias("n"),
    )


def mad_outliers(
    df: DataFrame,
    *,
    value_col: str = "n_chars",
    group_col: str = "source",
    k: float = 3.0,
) -> DataFrame:
    """Per-group robust-outlier summary over ``value_col``.

    Returns (group, n, med, mad, cutoff, n_outliers, outlier_frac)
    ordered by group: ``cutoff = round(k * 1.4826 * mad, 6)`` and a
    row is an outlier when ``round(|v - med|, 6) > cutoff``.  ``med``
    and ``mad`` are exact interpolated medians (6-dp rounded on
    output); fractions round to 6 dp.
    """
    census = df.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    # the census feeds three consumers (median, deviation census,
    # flag census) — without this the corpus scan re-executes each time
    census = census.localCheckpoint(eager=False)
    med = _census_median(census, group_col, value_col, "_c")
    devs = (
        census.join(F.broadcast(med.select(group_col, "med")), group_col)
        .select(
            F.col(group_col),
            F.abs(F.col(value_col).cast("double") - F.col("med")).alias(
                "_dev"
            ),
            "_c",
        )
        # re-census: distinct values can collide on one deviation
        .groupBy(group_col, "_dev")
        .agg(F.sum("_c").alias("_c"))
    )
    devs = devs.localCheckpoint(eager=False)
    mad = _census_median(devs, group_col, "_dev", "_c").select(
        F.col(group_col), F.col("med").alias("mad")
    )
    cut = F.round(F.lit(float(k)) * F.lit(MAD_SIGMA) * F.col("mad"), 6)
    flags = (
        devs.join(F.broadcast(mad), group_col)
        .select(
            F.col(group_col),
            cut.alias("cutoff"),
            F.when(F.round("_dev", 6) > cut, F.col("_c"))
            .otherwise(F.lit(0))
            .alias("_out"),
            "_c",
        )
        .groupBy(group_col, "cutoff")
        .agg(
            F.sum("_out").alias("n_outliers"),
            F.sum("_c").alias("_n2"),
        )
    )
    return (
        med.join(F.broadcast(mad), group_col)
        .join(F.broadcast(flags), group_col)
        .select(
            F.col(group_col),
            F.col("n"),
            F.round("med", 6).alias("med"),
            F.round("mad", 6).alias("mad"),
            "cutoff",
            "n_outliers",
            F.round(
                F.col("n_outliers").cast("double") / F.col("_n2").cast("double"),
                6,
            ).alias("outlier_frac"),
        )
        .orderBy(group_col)
    )


def quantile_rank(
    df: DataFrame,
    *,
    value_col: str = "n_chars",
    group_col: str = "source",
) -> DataFrame:
    """Adds ``ecdf`` — the within-group empirical CDF value
    P(X <= v), 6-dp rounded — to every row.

    The quantile-normalization primitive (length-percentile features,
    per-source score calibration).  Shape: ONE distinct-value census,
    a census-bounded cumulative window, then an equi-join back onto
    the corpus on (group, value) — the corpus shuffles once, the ECDF
    table is census-sized.  Ties share their ECDF by construction
    (identical to SQL ``cume_dist``).
    """
    census = df.groupBy(group_col, value_col).agg(
        F.count(F.lit(1)).alias("_c")
    )
    cum_w = (
        Window.partitionBy(group_col)
        .orderBy(value_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot_w = Window.partitionBy(group_col)
    ecdf = census.select(
        group_col,
        value_col,
        F.round(
            F.sum("_c").over(cum_w).cast("double")
            / F.sum("_c").over(tot_w).cast("double"),
            6,
        ).alias("ecdf"),
    )
    return df.join(ecdf, [group_col, value_col])


def trimmed_stats(
    df: DataFrame,
    *,
    value_col: str = "n_chars",
    group_col: str = "source",
    trim_frac: float = 0.1,
) -> DataFrame:
    """Per-group trimmed and winsorized means at ``trim_frac`` per
    tail: ``(group_col, n, k, n_kept, lo_cut, hi_cut, trimmed_mean,
    winsor_mean)``.

    ``k = floor(trim_frac * n)`` ranks drop from EACH tail; the
    trimmed mean averages the middle ``n - 2k``; the winsorized mean
    replaces each clipped tail with ``k`` copies of the surviving
    boundary values (``lo_cut`` / ``hi_cut``).  Means are NULL when
    the kept band is empty.

    Census-exact, never rank-per-row: the contribution of a distinct
    value v with rank interval [cum_prev, cum) is its overlap with
    the kept band [k, n-k) — one map-side-combinable value census,
    one per-group census-bounded cumulative window, one groupBy.
    Boundary elections (``min(v | cum >= k+1)``) are combinable aggs,
    no second window.  ``floor(trim_frac * n)`` is the same IEEE
    double product in every engine — portable, even where it differs
    from exact rational arithmetic.
    """
    if not 0 <= trim_frac < 0.5:
        raise ValueError("trimmed_stats: trim_frac must be in [0, 0.5)")
    census = (
        df.select(
            F.col(group_col), F.col(value_col).cast("double").alias("_v")
        )
        .where(F.col("_v").isNotNull())
        .groupBy(group_col, "_v")
        .agg(F.count(F.lit(1)).alias("_c"))
    )
    cum_w = (
        Window.partitionBy(group_col)
        .orderBy("_v")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    tot_w = Window.partitionBy(group_col)
    staged = census.select(
        group_col,
        "_v",
        "_c",
        F.sum("_c").over(cum_w).alias("_cum"),
        F.sum("_c").over(tot_w).alias("_n"),
    ).withColumn(
        "_k",
        F.floor(F.lit(float(trim_frac)) * F.col("_n").cast("double"))
        .cast("long"),
    )
    prev = F.col("_cum") - F.col("_c")
    kept = F.greatest(
        F.lit(0).cast("long"),
        F.least(F.col("_cum"), F.col("_n") - F.col("_k"))
        - F.greatest(prev, F.col("_k")),
    )
    agg = staged.groupBy(group_col).agg(
        F.max("_n").alias("n"),
        F.max("_k").alias("k"),
        F.sum(kept.cast("double") * F.col("_v")).alias("_tsum"),
        F.min(
            F.when(F.col("_cum") >= F.col("_k") + 1, F.col("_v"))
        ).alias("lo_cut"),
        F.min(
            F.when(F.col("_cum") >= F.col("_n") - F.col("_k"), F.col("_v"))
        ).alias("hi_cut"),
    )
    n_kept = F.col("n") - 2 * F.col("k")
    return agg.select(
        group_col,
        "n",
        "k",
        n_kept.alias("n_kept"),
        "lo_cut",
        "hi_cut",
        F.when(
            n_kept > 0,
            F.round(F.col("_tsum") / n_kept.cast("double"), 6),
        ).alias("trimmed_mean"),
        F.when(
            n_kept > 0,
            F.round(
                (
                    F.col("_tsum")
                    + F.col("k").cast("double")
                    * (F.col("lo_cut") + F.col("hi_cut"))
                )
                / F.col("n").cast("double"),
                6,
            ),
        ).alias("winsor_mean"),
    ).orderBy(group_col)
