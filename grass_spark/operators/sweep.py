"""Sweep-line interval concurrency: peak number of simultaneously
active half-open intervals per calendar day.

Reference analog: the temporal-topology census family (GRASS
t.topology / temporal_extent.py overlap counting) — "how many maps
are active at once" re-expressed as the classic +1/-1 boundary sweep.

Scale shape
-----------
The naive sweep sorts EVERY boundary event globally — a corpus-sized
total order.  Here boundaries collapse FIRST onto the per-day census
(``groupBy(day)`` — map-side combinable, the only corpus-sized
shuffle), and the cumulative sweep runs over that census, which is
CALENDAR-BOUNDED: one row per distinct day regardless of input volume
(the retention_cohorts discipline — the one class of bare global
window that is genuinely safe, because its input cannot exceed the
calendar span).  All arithmetic is exact integers.

Semantics: intervals are half-open ``[start_day, end_day)`` — an
interval ending on day d and another starting on day d do NOT
overlap.  Within a day, ends settle before starts, so the day's peak
is ``greatest(carry_in, active_end)``: the dip while processing ends
never exceeds the day-start value, and the maximum while processing
starts is reached after the last one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def concurrency_sweep(
    df: DataFrame,
    *,
    start_col: str,
    end_col: str,
) -> DataFrame:
    """Per-day concurrency census over half-open ``[start, end)``
    date intervals.

    Returns one row per day that appears as some interval's start or
    end: ``(day, n_start, n_end, carry_in, active_end, peak)`` where
    ``carry_in`` is the number of intervals active entering the day,
    ``active_end`` the number active leaving it, and ``peak`` the
    maximum concurrency observed during it.  Rows with a NULL start
    or end are dropped (an unbounded interval has no sweep events).
    """
    ev = df.select(
        F.col(start_col).cast("date").alias("day"),
        F.lit(1).alias("_d"),
    ).unionAll(
        df.select(
            F.col(end_col).cast("date").alias("day"),
            F.lit(-1).alias("_d"),
        )
    ).where(F.col("day").isNotNull())

    census = ev.groupBy("day").agg(
        F.sum(F.when(F.col("_d") > 0, 1).otherwise(0)).alias("n_start"),
        F.sum(F.when(F.col("_d") < 0, 1).otherwise(0)).alias("n_end"),
        F.sum("_d").alias("_net"),
    )

    # calendar-bounded census: a bare ordered window is safe here
    w = Window.orderBy("day").rowsBetween(Window.unboundedPreceding, 0)
    out = census.withColumn("active_end", F.sum("_net").over(w))
    return out.select(
        "day",
        "n_start",
        "n_end",
        (F.col("active_end") - F.col("_net")).alias("carry_in"),
        "active_end",
        F.greatest(
            F.col("active_end") - F.col("_net"), F.col("active_end")
        ).alias("peak"),
    ).orderBy("day")
