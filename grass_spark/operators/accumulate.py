"""Cyclic accumulation + pattern detection — ``t.rast.accumulate`` /
``t.rast.accdetect``.

Reference semantics (``temporal/t.rast.accumulate/t.rast.accumulate.py:24-146``,
kernel ``raster/r.series.accumulate/main.c``): accumulate per-cell
contributions along the series inside repeating *cycles* (e.g. every
12 months, for growing-degree-days), with optional lower/upper
thresholds: contribution = max(0, min(v, upper) - lower) in GDD mode,
plain v in sum mode; the accumulator resets at each cycle start.
``t.rast.accdetect`` then finds, per cycle, where the accumulated value
enters/leaves a [range_min, range_max] band.

Spark-first: a cycle is just another granule index, so the whole
operator is one window running-sum partitioned by (keys..., cycle) —
no join, one shuffle, works unchanged at any scale.  The window sort
key is (ts, tiebreak...) for deterministic accumulation order (the
reference orders by start_time).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from grass_spark.functions.granularity import bucket_idx_col


def _contribution(value_col: str, lower, upper, method: str):
    v = F.col(value_col)
    if method == "gdd":
        capped = F.least(v, F.lit(float(upper))) if upper is not None else v
        base = F.lit(float(lower)) if lower is not None else F.lit(0.0)
        return F.greatest(capped - base, F.lit(0.0))
    if method == "sum":
        return v
    raise ValueError(f"unknown accumulate method {method!r} (gdd|sum)")


def accumulate(
    df: DataFrame,
    *,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    value_col: str = "value",
    order_cols: list[str] | None = None,
    lower: float | None = None,
    upper: float | None = None,
    cycle: str | None = None,
    origin: datetime | None = None,
    method: str = "gdd",
) -> DataFrame:
    """Running accumulation; resets per ``cycle`` granularity if given.

    Adds ``cycle_idx`` (0 when no cycle) and ``acc`` columns.
    """
    keys = ["conv_id"] if keys is None else list(keys)
    if cycle is not None:
        if origin is None:
            origin = df.agg(F.min(ts_col).alias("s")).collect()[0]["s"]
        cyc = bucket_idx_col(F.col(ts_col), cycle, origin)
    else:
        cyc = F.lit(0).cast("long")
    out = df.withColumn("cycle_idx", cyc).withColumn(
        "_contrib", _contribution(value_col, lower, upper, method)
    )
    order = [ts_col] + list(order_cols or [])
    w = (
        Window.partitionBy(*keys, "cycle_idx")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return out.withColumn("acc", F.sum("_contrib").over(w)).drop("_contrib")


def accdetect(
    accumulated: DataFrame,
    range_min: float,
    range_max: float,
    *,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    acc_col: str = "acc",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Detect the in-band occurrence pattern per (keys..., cycle_idx).

    Adds:
      * ``in_range`` — acc within [range_min, range_max];
      * ``indicator`` — 1 first in-band row of the cycle, 3 last,
        2 in between, NULL outside (the reference's indicator map
        semantics, ``t.rast.accdetect.py:24-54``);
      * ``occurrence`` — the cycle's first in-band timestamp.
    """
    keys = ["conv_id"] if keys is None else list(keys)
    order = [ts_col] + list(order_cols or [])
    part = [*keys, "cycle_idx"]
    in_range = F.col(acc_col).between(float(range_min), float(range_max))
    df = accumulated.withColumn("in_range", in_range)

    w_all = Window.partitionBy(*part)
    first_ts = F.min(F.when(F.col("in_range"), F.col(ts_col))).over(w_all)
    last_ts = F.max(F.when(F.col("in_range"), F.col(ts_col))).over(w_all)
    df = df.withColumn("occurrence", first_ts)
    indicator = (
        F.when(~F.col("in_range"), F.lit(None).cast("int"))
        .when(F.col(ts_col) == first_ts, F.lit(1))
        .when(F.col(ts_col) == last_ts, F.lit(3))
        .otherwise(F.lit(2))
    )
    return df.withColumn("indicator", indicator)
