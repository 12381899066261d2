"""Autocorrelation function of the daily event-count series — the
standard sample ACF (Box–Jenkins) at lags 1..K, the seasonality /
burst-persistence diagnostic an event-stream monitor runs next to the
CUSUM alarms and rate-anomaly gates (operators/engagement.py,
transitions.py).

r_k = Σ_{t≤n−k} (x_t − x̄)(x_{t+k} − x̄) / Σ_{t≤n} (x_t − x̄)²
over the gap-FILLED calendar series (a day with no events is x = 0,
not a missing row — skipping empty days would silently splice the
series and fake correlation).

Scale shape: the only corpus-scale op is the map-side-combinable
``groupBy(day)`` census; the calendar spine, the lag equi-join
(day = day + k — an equi-join on date, never a banded or cross join)
and the per-lag aggregates all run on calendar-bounded rows (n days ×
K lags).  At 100 TB the ACF is one scan plus noise.

Cross-engine parity: all sums are exact integers (cross-products in
DECIMAL(38,0) — daily counts at 10⁹-event scale overflow int64 when
squared, the interevent_stats lesson); the final r_k is one double
expression over exact ints with the association order mirrored
verbatim in the DuckDB oracle, rounded 6 dp.  No transcendentals
anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def daily_counts(
    events: DataFrame, *, ts_col: str = "ts"
) -> DataFrame:
    """(day, x) — gap-filled daily event counts (DATE-typed day;
    missing calendar days carry x = 0)."""
    census = events.groupBy(
        F.col(ts_col).cast("date").alias("day")
    ).agg(F.count(F.lit(1)).alias("_c"))
    spine = (
        census.agg(
            F.min("day").alias("_lo"), F.max("day").alias("_hi")
        )
        .select(
            F.explode(
                F.sequence(
                    F.col("_lo"), F.col("_hi"), F.expr("INTERVAL 1 DAY")
                )
            ).alias("day")
        )
    )
    return spine.join(census, "day", "left").select(
        "day", F.coalesce("_c", F.lit(0)).alias("x")
    )


def acf_daily(
    events: DataFrame, *, ts_col: str = "ts", max_lag: int = 7
) -> DataFrame:
    """(lag, n_pairs, acf) for lags 1..``max_lag``, ordered by lag.

    ``acf`` is the sample autocorrelation of the gap-filled daily
    count series (denominator over the FULL series — the estimator is
    biased-but-standard), 6-dp rounded.  Lags ≥ the series length
    produce no pairs and are absent.
    """
    if max_lag < 1:
        raise ValueError(f"max_lag must be >= 1, got {max_lag}")
    series = daily_counts(events, ts_col=ts_col).localCheckpoint(
        eager=False
    )  # feeds scalars + both join sides — one census, three consumers
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    scalars = series.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("s1"),
        F.sum(dec("x") * dec("x")).alias("s2"),
    )
    lags = series.select(
        "day",
        F.col("x").alias("xa"),
        F.explode(
            F.sequence(F.lit(1), F.lit(int(max_lag)))
        ).alias("lag"),
    ).withColumn("_mday", F.date_add("day", F.col("lag")))
    pairs = lags.join(
        series.select(
            F.col("day").alias("_mday"), F.col("x").alias("xb")
        ),
        "_mday",
    )
    agg = pairs.groupBy("lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum(dec("xa") * dec("xb")).alias("sxy"),
        F.sum("xa").alias("sxa"),
        F.sum("xb").alias("sxb"),
    ).crossJoin(F.broadcast(scalars))
    n_d = F.col("n").cast("double")
    xbar = F.col("s1").cast("double") / n_d
    num = (
        F.col("sxy").cast("double")
        - xbar * (F.col("sxa").cast("double") + F.col("sxb").cast("double"))
        + F.col("n_pairs").cast("double") * (xbar * xbar)
    )
    den = F.col("s2").cast("double") - n_d * (xbar * xbar)
    # constant series: zero variance -> ACF undefined (NULL, mirrored
    # by the oracle's CASE) rather than a NaN that hash-gates apart
    return (
        agg.select(
            "lag",
            "n_pairs",
            F.when(den != F.lit(0.0), F.round(num / den, 6)).alias("acf"),
        )
        .orderBy("lag")
    )
