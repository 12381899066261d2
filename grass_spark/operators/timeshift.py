"""Extent surgery operators: ``t.shift`` / ``t.snap`` + listing helpers.

* shift — add a granularity to every extent
  (``abstract_space_time_dataset.py:1953-2097``); calendar-aware for
  month/year (``add_months``), fixed-width otherwise.
* snap — close gaps: each map's end becomes the next map's start; the
  last map keeps its end, or gets start + granularity when it has none
  (``abstract_space_time_dataset.py:2099-2274``).
* list_deltas — ``t.rast.list method=delta/deltagaps`` interval length
  + distance-from-begin columns (``list_stds.py:275-358``).

All pure window/column ops — one shuffle for the per-key sort, nothing
else; identical plan shape at any scale.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from grass_spark.functions.granularity import parse_granularity, _UNIT_SECONDS


def _shift_col(c: Column, gran: str) -> Column:
    num, unit = parse_granularity(gran)
    if unit == "month":
        return F.add_months(c, num).cast("timestamp")
    if unit == "year":
        return F.add_months(c, num * 12).cast("timestamp")
    secs = num * _UNIT_SECONDS[unit]
    return F.timestamp_micros(F.unix_micros(c.cast("timestamp")) + secs * 1_000_000)


def shift(
    df: DataFrame,
    gran: str,
    *,
    start_col: str = "start_time",
    end_col: str | None = "end_time",
) -> DataFrame:
    out = df.withColumn(start_col, _shift_col(F.col(start_col), gran))
    if end_col and end_col in df.columns:
        out = out.withColumn(
            end_col,
            F.when(
                F.col(end_col).isNotNull(), _shift_col(F.col(end_col), gran)
            ),
        )
    return out


def snap(
    df: DataFrame,
    *,
    keys: list[str] | None = None,
    start_col: str = "start_time",
    end_col: str = "end_time",
    gran: str | None = None,
) -> DataFrame:
    """end := next start; last row keeps its end, else start + gran
    (when ``gran`` given), else stays NULL.

    Equal start stamps are "not snapped" per the reference comment, but
    the reference loop has already clobbered ``end`` with the *next*
    map's end when it takes that branch
    (abstract_space_time_dataset.py:2180-2198: ``start_next, end =
    maps[i+1]...``), so a duplicate-start row inherits its twin's end —
    reproduced here for parity.  The window orders by (start, end) so
    ties are deterministic."""
    keys = [] if keys is None else list(keys)
    has_end = end_col in df.columns
    order = [start_col, *( [F.col(end_col).asc_nulls_last()] if has_end else [] )]
    # keyless: deliberate single-task window over a map *list* (catalog
    # scale, thousands of rows); pass keys for data-scale inputs
    w = (Window.partitionBy(*keys).orderBy(*order) if keys
         else Window.orderBy(*order))
    nxt = F.lead(start_col).over(w)
    own_end = F.col(end_col) if has_end else F.lit(None).cast("timestamp")
    nxt_end = F.lead(own_end).over(w)
    last_end = own_end
    if gran is not None:
        last_end = F.coalesce(last_end, _shift_col(F.col(start_col), gran))
    snapped = (
        F.when(nxt.isNull(), last_end)
        .when(nxt != F.col(start_col), nxt)
        .otherwise(nxt_end)
    )
    return df.withColumn(end_col, snapped)


def list_deltas(
    df: DataFrame,
    *,
    keys: list[str] | None = None,
    start_col: str = "start_time",
    end_col: str | None = "end_time",
) -> DataFrame:
    """delta (interval length, sec), distance_from_begin (sec), and
    gap-to-next (sec, NULL when contiguous or last)."""
    keys = [] if keys is None else list(keys)
    w = (Window.partitionBy(*keys).orderBy(start_col) if keys
         else Window.orderBy(start_col))
    s = F.col(start_col).cast("timestamp")
    e = (
        F.col(end_col).cast("timestamp")
        if end_col and end_col in df.columns
        else F.lit(None).cast("timestamp")
    )
    first_start = F.first(start_col).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    nxt_start = F.lead(start_col).over(w)
    us = lambda c: F.unix_micros(c.cast("timestamp"))  # noqa: E731
    delta = F.when(e.isNotNull(), (us(e) - us(s)) / 1e6)
    dist = (us(s) - us(first_start)) / 1e6
    gap = F.when(
        nxt_start.isNotNull() & e.isNotNull() & (us(nxt_start) > us(e)),
        (us(nxt_start) - us(e)) / 1e6,
    )
    return (
        df.withColumn("delta", delta)
        .withColumn("distance_from_begin", dist)
        .withColumn("gap_to_next", gap)
    )
