"""Lagged cross-correlation (CCF) between the daily count series of
two event types: ``r(k) = corr(x_t, y_{t+k})`` for ``k = 0..max_lag``.

Reference analog: the t.rast.series correlation-flavoured kernels
(r.series "detcoeff"/"slope" family, lib/stats regression kernels) —
extended to the lagged two-series form a lead-lag analysis needs
("do purchases follow clicks by two days?").

Scale shape
-----------
The ONLY corpus-sized stage is the per-day type census (map-side
combinable ``groupBy(day)``).  Everything after runs on the
calendar-bounded daily grid: gap days densify to explicit zeros via
``sequence(min_day, max_day)`` (a missing day is a zero-count day, by
contract), the grid fans out over the ``max_lag + 1`` lags, and the
lagged self-join is a plain equi-join on the shifted date.  Pearson r
composes from EXACT integer power sums (counts and their products in
DECIMAL(38,0) — the interevent_stats discipline), cast once to double
into a single mirrored expression, so Spark and a SQL replay agree
bit-for-bit after round(·, 6).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cross_correlation(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
    type_x: str,
    type_y: str,
    max_lag: int = 7,
    checkpoint: bool = True,
) -> DataFrame:
    """``(lag, n_days, r)`` for ``lag = 0..max_lag``.

    ``r`` is the Pearson correlation of ``(x_t, y_{t+lag})`` over every
    day ``t`` in ``[min_day, max_day - lag]`` of the two types' daily
    count series (zero-filled over the full calendar span), rounded to
    6 dp; NULL when either series is constant over the overlap.
    ``n_days`` is the number of overlapping days.
    """
    if max_lag < 0:
        raise ValueError("cross_correlation: max_lag must be >= 0")

    ev = df.where(F.col(type_col).isin([type_x, type_y])).select(
        F.col(ts_col).cast("date").alias("day"),
        F.col(type_col).alias("_t"),
    )
    cen = ev.groupBy("day").agg(
        F.sum(F.when(F.col("_t") == type_x, 1).otherwise(0)).alias("x"),
        F.sum(F.when(F.col("_t") == type_y, 1).otherwise(0)).alias("y"),
    )

    bounds = cen.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
    days = bounds.select(
        F.explode(F.sequence("lo", "hi")).alias("day")
    )
    grid = days.join(cen, "day", "left").select(
        "day",
        F.coalesce("x", F.lit(0)).cast("long").alias("x"),
        F.coalesce("y", F.lit(0)).cast("long").alias("y"),
    )
    if checkpoint:
        grid = grid.localCheckpoint(eager=False)  # x side + y side

    xs = grid.select(
        "day",
        "x",
        F.explode(F.sequence(F.lit(0), F.lit(int(max_lag)))).alias("lag"),
    ).select(
        "x", "lag", F.expr("date_add(day, lag)").alias("_jday")
    )
    ys = grid.select(F.col("day").alias("_jday"), "y")

    xd = F.col("x").cast("decimal(19,0)")
    yd = F.col("y").cast("decimal(19,0)")
    agg = (
        xs.join(ys, "_jday")
        .groupBy("lag")
        .agg(
            F.count(F.lit(1)).alias("n_days"),
            F.sum("x").alias("_sx"),
            F.sum("y").alias("_sy"),
            F.sum(xd * yd).alias("_sxy"),
            F.sum(xd * xd).alias("_sxx"),
            F.sum(yd * yd).alias("_syy"),
        )
    )
    nd = F.col("n_days").cast("double")
    sxd = F.col("_sx").cast("double")
    syd = F.col("_sy").cast("double")
    num = nd * F.col("_sxy").cast("double") - sxd * syd
    den = F.sqrt(nd * F.col("_sxx").cast("double") - sxd * sxd) * F.sqrt(
        nd * F.col("_syy").cast("double") - syd * syd
    )
    return agg.select(
        F.col("lag").cast("int").alias("lag"),
        "n_days",
        F.when(den > 0, F.round(num / den, 6)).alias("r"),
    ).orderBy("lag")
