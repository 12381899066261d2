"""Seasonal (hour-of-week) traffic profile and anomaly flags — the
monitoring gate that knows Tuesday-3pm is always busy: for every
(event_type, day-of-week, hour) cell, a baseline mean/std over the
weeks in the data, then a z-flag on each actual (type, date, hour)
cell against its own seasonal baseline.

Complements the trailing-window rate anomalies (operators/
transitions.py, which detect change-from-recent-past) and CUSUM
(engagement.py, level shifts): this one detects deviation from the
RECURRING pattern, so a quiet Sunday spike flags even when the
trailing week was quieter still.

Scale shape: ONE map-side-combinable groupBy((type, date, hour))
census collapses the event stream; the hour spine (distinct dates ×
24 hours × distinct types — calendar×type bounded, zero-count cells
MUST exist or the baseline mean is biased high) and both aggregates
run on census-sized frames.  Baselines join back per (type, dow,
hour) — a bounded broadcast.

Cross-engine parity: means/variances compose from exact integer power
sums (squared counts in DECIMAL(38,0)); sqrt is IEEE-correctly-rounded
(portable, unlike ln/exp); the flag compares 6-dp-rounded deviation to
6-dp-rounded threshold.  Day-of-week is computed portably as
days-since-a-known-Monday mod 7 (0 = Monday) — Spark ``dayofweek`` and
DuckDB ``dayofweek`` disagree on anchoring.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MONDAY = "1970-01-05"  # a Monday: portable dow = datediff % 7


def hourly_cells(
    events: DataFrame, *, ts_col: str = "ts", type_col: str = "event_type"
) -> DataFrame:
    """(event_type, day, hour, dow, x) — gap-FILLED hourly counts over
    the full (distinct-date × 24 × distinct-type) spine."""
    census = events.groupBy(
        F.col(type_col).alias("event_type"),
        F.col(ts_col).cast("date").alias("day"),
        F.hour(ts_col).alias("hour"),
    ).agg(F.count(F.lit(1)).alias("_c"))
    days = census.select("day").distinct()
    types = census.select("event_type").distinct()
    hours = days.sparkSession.range(24).select(
        F.col("id").cast("int").alias("hour")
    )
    spine = days.crossJoin(F.broadcast(types)).crossJoin(F.broadcast(hours))
    return (
        spine.join(census, ["event_type", "day", "hour"], "left")
        .select(
            "event_type",
            "day",
            "hour",
            F.pmod(
                F.datediff("day", F.lit(_MONDAY).cast("date")), F.lit(7)
            ).alias("dow"),
            F.coalesce("_c", F.lit(0)).alias("x"),
        )
    )


def seasonal_anomalies(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
    z: float = 3.0,
) -> DataFrame:
    """Flagged cells: (event_type, day, hour, dow, x, mu, sigma)
    where ``round(|x - mu|, 6) > round(z * sigma, 6)`` against the
    (type, dow, hour) baseline — AND sigma > 0 (a constant cell can
    never flag).  mu/sigma are population moments over the weeks in
    the data, 6-dp rounded on output; ordered by (type, day, hour).
    """
    cells = hourly_cells(
        events, ts_col=ts_col, type_col=type_col
    ).localCheckpoint(eager=False)  # feeds baseline + flag scan
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    base = cells.groupBy("event_type", "dow", "hour").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("x").alias("_s1"),
        F.sum(dec("x") * dec("x")).alias("_s2"),
    )
    n_d = F.col("_n").cast("double")
    mu = F.col("_s1").cast("double") / n_d
    var = F.col("_s2").cast("double") / n_d - mu * mu
    sigma = F.sqrt(F.greatest(F.round(var, 6), F.lit(0.0)))
    scored = cells.join(
        F.broadcast(base), ["event_type", "dow", "hour"]
    ).select(
        "event_type",
        "day",
        "hour",
        "dow",
        "x",
        mu.alias("_mu"),
        sigma.alias("_sigma"),
    )
    flagged = scored.where(
        (F.col("_sigma") > 0)
        & (
            F.round(F.abs(F.col("x").cast("double") - F.col("_mu")), 6)
            > F.round(F.lit(float(z)) * F.col("_sigma"), 6)
        )
    )
    return flagged.select(
        "event_type",
        "day",
        "hour",
        "dow",
        "x",
        F.round("_mu", 6).alias("mu"),
        F.round("_sigma", 6).alias("sigma"),
    ).orderBy("event_type", "day", "hour")


def dow_index(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
) -> DataFrame:
    """Multiplicative day-of-week seasonal indices over the daily
    value series: ``(dow, n_days, day_value_mean, index)`` with
    ``dow 0 = Monday`` (the portable integer anchor) and ``index =
    dow mean / overall daily mean`` — > 1 means that weekday runs hot.

    Days inside the observed calendar span with no rows count as
    explicit zero days (a quiet Sunday IS seasonal signal — the ccf
    zero-densify contract).  Exactness: daily totals reduce in
    integer cents; the index composes as ``(dow_sum * n_days) /
    (n_dow_days * total)`` in DECIMAL(38) with one double cast, so no
    intermediate mean ever floats.

    Scale shape: one map-side-combinable ``groupBy(day)`` census;
    everything after is calendar-bounded.
    """
    day = F.to_date(F.date_trunc("day", F.col(ts_col)))
    cents = F.round(F.col(value_col).cast("double") * F.lit(100.0)).cast(
        "long"
    )
    cen = (
        df.where(F.col(value_col).isNotNull())
        .select(day.alias("_d"), cents.alias("_c"))
        .groupBy("_d")
        .agg(F.sum("_c").alias("_s"))
    )
    bounds = cen.agg(F.min("_d").alias("lo"), F.max("_d").alias("hi"))
    grid = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    ).join(cen, F.col("day") == F.col("_d"), "left").select(
        "day", F.coalesce("_s", F.lit(0).cast("long")).alias("_s")
    )
    dow = F.pmod(
        F.datediff(F.col("day"), F.lit("1970-01-05").cast("date")), 7
    ).cast("int")
    per_dow = grid.groupBy(dow.alias("dow")).agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum("_s").alias("_ds"),
    )
    tot = per_dow.agg(
        F.sum("n_days").alias("_nd"), F.sum("_ds").alias("_ts")
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    return (
        per_dow.crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "n_days",
            F.round(
                F.col("_ds").cast("double")
                / (F.col("n_days").cast("double") * F.lit(100.0)),
                6,
            ).alias("day_value_mean"),
            F.when(
                F.col("_ts") > 0,
                F.round(
                    (dec("_ds") * dec("_nd")).cast("double")
                    / (dec("n_days") * dec("_ts")).cast("double"),
                    6,
                ),
            ).alias("index"),
        )
        .orderBy("dow")
    )


def weekly_quantiles(
    df: DataFrame,
    *,
    ts_col: str,
    value_col: str,
    probs: tuple = (0.5, 0.95),
) -> DataFrame:
    """Weekly quantile bands of a measure: one row per ISO week with
    the exact type-7 quantiles of that week's values — the latency /
    order-value band chart.  Returns ``(week_start, n, q_<p>...)``
    with one column per prob (dots become underscores: ``q_0_5``).

    Quantiles run over the 6-dp-ROUNDED values (the perplexity_buckets
    discipline) and round again on output; the per-week exact
    percentile buffers one week's values (the documented
    ~10^8-per-group bound — use the sketch tier beyond that).
    The portable Monday anchor keys the weeks.
    """
    if not probs:
        raise ValueError("weekly_quantiles: probs must be non-empty")
    pr = [float(p) for p in probs]
    if not all(0.0 <= p <= 1.0 for p in pr):
        raise ValueError("weekly_quantiles: probs must be in [0, 1]")
    day = F.to_date(F.date_trunc("day", F.col(ts_col)))
    wk = F.date_sub(
        day, F.pmod(F.datediff(day, F.lit("1970-01-05").cast("date")), 7)
    )
    base = df.where(F.col(value_col).isNotNull()).select(
        wk.alias("week_start"),
        F.round(F.col(value_col).cast("double"), 6).alias("_v"),
    )
    aggs = [F.count(F.lit(1)).alias("n")] + [
        F.round(F.percentile("_v", F.lit(p)), 6).alias(
            "q_" + str(p).replace(".", "_")
        )
        for p in pr
    ]
    return base.groupBy("week_start").agg(*aggs).orderBy("week_start")
