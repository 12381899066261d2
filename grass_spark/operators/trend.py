"""Robust trend estimation and naive-forecast evaluation over daily
series — the "is this metric drifting, and how fast" companions to
ewma_daily (level), rate_anomalies (spikes) and seasonal_anomalies
(cycle deviations).

``theil_sen_daily``: the Theil–Sen estimator — the MEDIAN of all
pairwise slopes between a key's daily points.  Unlike the OLS slope
(functions/kernels.py regression), one wild day cannot move it: the
breakdown point is ~29%.  The pair set is CALENDAR-BOUNDED (d²/2 pairs
per key for d distinct days — the retention_cohorts argument), so the
per-key self-join is safe at any corpus size: the corpus reduces to
(key, day) censuses map-side first and only censuses join.

``seasonal_naive_eval``: scores the standard "same day last week"
forecast against actuals (MAE / RMSE / MAPE per key) — the baseline
any real forecasting pipeline must beat, and a drift alarm in itself
(a rising MAPE on a stable series means the weekly shape broke).

Cross-engine parity: counts are exact integers; every slope/error is
a double expression over two exact integers (bit-identical in both
engines); medians are exact Hyndman–Fan type-7 (Spark ``percentile``
== DuckDB ``quantile_cont``); outputs round 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["theil_sen_daily", "seasonal_naive_eval"]


def _daily(df: DataFrame, ts_col: str, key_col: str) -> DataFrame:
    return (
        df.select(
            F.col(key_col).alias("_k"),
            F.col(ts_col).cast("date").alias("_d"),
        )
        .groupBy("_k", "_d")
        .agg(F.count(F.lit(1)).alias("_x"))
    )


def theil_sen_daily(
    df: DataFrame, *, ts_col: str = "ts", key_col: str = "event_type"
) -> DataFrame:
    """Per key: ``(key, n_days, n_pairs, slope)`` — Theil–Sen median
    slope of daily counts per day of calendar distance.  Keys with a
    single day report NULL slope (no pairs)."""
    daily = _daily(df, ts_col, key_col).localCheckpoint(
        eager=False
    )  # both join sides
    a = daily.select("_k", F.col("_d").alias("_d1"), F.col("_x").alias("_y1"))
    b = daily.select("_k", F.col("_d").alias("_d2"), F.col("_x").alias("_y2"))
    pairs = a.join(b, "_k").where(F.col("_d1") < F.col("_d2"))
    slope = (F.col("_y2") - F.col("_y1")).cast("double") / F.datediff(
        "_d2", "_d1"
    ).cast("double")
    per_pair = pairs.select("_k", slope.alias("_s"))
    agg = per_pair.groupBy("_k").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.round(F.percentile("_s", F.lit(0.5)), 6).alias("slope"),
    )
    days = daily.groupBy("_k").agg(F.count(F.lit(1)).alias("n_days"))
    return (
        days.join(agg, "_k", "left")
        .select(
            F.col("_k").alias(key_col),
            "n_days",
            F.coalesce("n_pairs", F.lit(0).cast("long")).alias("n_pairs"),
            "slope",
        )
    )


def seasonal_naive_eval(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    key_col: str = "event_type",
    season_days: int = 7,
) -> DataFrame:
    """Per key: ``(key, n_eval_days, mae, rmse, mape)`` for the
    seasonal-naive forecast ``x̂(t) = x(t - season_days)`` over daily
    counts.  Only days whose lagged day EXISTS evaluate (gap-aware —
    a forecast against a missing day is not an error of the method).
    MAPE divides by the actual count (always > 0 for a present day).
    """
    if season_days < 1:
        raise ValueError("seasonal_naive_eval: season_days must be >= 1")
    daily = _daily(df, ts_col, key_col).localCheckpoint(
        eager=False
    )  # both join sides
    actual = daily.select(
        "_k", "_d", F.col("_x").alias("_actual")
    )
    lagged = daily.select(
        "_k",
        F.date_add(F.col("_d"), season_days).alias("_d"),
        F.col("_x").alias("_pred"),
    )
    j = actual.join(lagged, ["_k", "_d"])
    err = (F.col("_actual") - F.col("_pred")).cast("double")
    ape = F.abs(err) / F.col("_actual").cast("double")
    return (
        j.groupBy("_k")
        .agg(
            F.count(F.lit(1)).alias("n_eval_days"),
            F.round(F.avg(F.abs(err)), 6).alias("mae"),
            F.round(F.sqrt(F.avg(err * err)), 6).alias("rmse"),
            F.round(F.avg(ape), 6).alias("mape"),
        )
        .select(
            F.col("_k").alias(key_col), "n_eval_days", "mae", "rmse",
            "mape",
        )
    )
