"""Gap-fill — the engine's ``t.rast.gapfill`` + ``r.series.interp``.

Reference semantics (``temporal/t.rast.gapfill/t.rast.gapfill.py:72-249``,
``raster/r.series.interp/main.c:412-445``):

* a *gap* is a maximal run of granules with no data between two granules
  that have data (synthetic gap objects from
  ``get_registered_maps_as_objects_with_gaps``,
  ``abstract_space_time_dataset.py:1421-1492``);
* a gap of k missing granules is filled at sampling positions
  ``i/(k+1)`` for i=1..k between the predecessor (position 0) and
  successor (position 1) (``t.rast.gapfill.py:161-210``);
* the filled value is the linear interpolation
  ``v = (1-pos)*left + pos*right``; either neighbor NULL -> NULL
  (``r.series.interp/main.c:412-445``).

Golden table (``test_gapfill.py:103-116``): 100@Jan, 400@Apr, 1200@Dec at
1-month granularity fill to 200,300 (Feb,Mar) and 500..1100 (May..Nov) —
equally spaced linear steps.

Spark-first design: **no densification join**.  One window (``lead`` of
the next present bucket per key) finds every gap; ``explode(sequence)``
synthesizes exactly the missing granule indices; interpolation is pure
column arithmetic.  Cost is one shuffle on the key (the window sort) and
output proportional to the number of *missing* buckets only — at 100 TB
the dense alternative (calendar cross-join) would materialize every
(key, bucket) pair; this touches only real gaps.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from grass_spark.functions.granularity import (
    bucket_end_col,
    bucket_idx_col,
    granule_start_col,
)


def gapfill(
    df: DataFrame,
    granularity: str,
    *,
    keys: list[str] | None = None,
    bucket_col: str = "bucket_start",
    value_cols: list[str] | None = None,
    origin: datetime | None = None,
    mark_filled: bool = True,
) -> DataFrame:
    """Fill missing granules of a rolled-up tier by linear interpolation.

    ``df`` holds one row per (keys..., bucket_col) — a tier produced by
    :func:`grass_spark.operators.aggregate.aggregate`.  Returns the
    union of the original rows and the synthesized gap rows, with a
    boolean ``filled`` column when ``mark_filled``.

    Only ``value_cols`` are interpolated; other non-key columns are NULL
    on filled rows (the reference registers brand-new maps that carry
    only the interpolated band).
    """
    keys = ["conv_id"] if keys is None else list(keys)
    if value_cols is None:
        value_cols = [
            c for c in df.columns
            if c not in keys and c not in (bucket_col, "bucket_end")
        ]
    if origin is None:
        origin = df.agg(F.min(bucket_col).alias("s")).collect()[0]["s"]
        if origin is None:
            return df.withColumn("filled", F.lit(False)) if mark_filled else df

    idx = bucket_idx_col(F.col(bucket_col), granularity, origin)
    w = Window.partitionBy(*keys).orderBy("_gidx")

    # Single pass: every row explodes to the granule indices
    # [own_idx .. next_idx-1]; position 0 reproduces the original row,
    # positions 1..k are the gap fills.  One scan, one window shuffle —
    # no self-union (a union would scan + aggregate the input twice,
    # which the .explain audit showed doubling the plan at scale).
    with_next = (
        df.withColumn("_gidx", idx)
        .withColumn("_next_gidx", F.lead("_gidx").over(w))
        .withColumn(
            "_next_vals",
            F.lead(F.struct(*[F.col(c).alias(c) for c in value_cols])).over(w),
        )
    )
    hi = F.when(
        F.col("_next_gidx").isNotNull(), F.col("_next_gidx") - 1
    ).otherwise(F.col("_gidx"))
    exploded = with_next.withColumn(
        "_fill_gidx", F.explode(F.sequence(F.col("_gidx"), hi))
    )
    is_fill = F.col("_fill_gidx") > F.col("_gidx")
    # sampling position i/(k+1): (fill - left) / (right - left)
    pos = (F.col("_fill_gidx") - F.col("_gidx")) / (
        F.col("_next_gidx") - F.col("_gidx")
    )
    out_start = granule_start_col(F.col("_fill_gidx"), granularity, origin)
    val_exprs = [
        F.when(
            is_fill,
            (F.lit(1.0) - pos) * F.col(c) + pos * F.col("_next_vals")[c],
        ).otherwise(F.col(c)).alias(c)
        for c in value_cols
    ]
    cols = [*keys, out_start.alias(bucket_col), *val_exprs]
    if mark_filled:
        cols.append(is_fill.alias("filled"))
    out = exploded.select(*cols)
    if "bucket_end" in df.columns:
        out = out.withColumn(
            "bucket_end", bucket_end_col(F.col(bucket_col), granularity)
        )
    return out


def gaps_report(
    df: DataFrame,
    granularity: str,
    *,
    keys: list[str] | None = None,
    bucket_col: str = "bucket_start",
    origin: datetime | None = None,
) -> DataFrame:
    """List the gaps per key: (keys..., gap_start_idx, gap_end_idx,
    gap_len) — the engine's ``t.rast.list method=deltagaps`` analog
    (``list_stds.py:275-358``)."""
    keys = ["conv_id"] if keys is None else list(keys)
    if origin is None:
        origin = df.agg(F.min(bucket_col).alias("s")).collect()[0]["s"]
    idx = bucket_idx_col(F.col(bucket_col), granularity, origin)
    w = Window.partitionBy(*keys).orderBy("_gidx")
    return (
        df.withColumn("_gidx", idx)
        .withColumn("_next_gidx", F.lead("_gidx").over(w))
        .filter(F.col("_next_gidx") > F.col("_gidx") + 1)
        .select(
            *keys,
            granule_start_col(F.col("_gidx") + 1, granularity, origin).alias("gap_start"),
            granule_start_col(F.col("_next_gidx"), granularity, origin).alias("gap_end"),
            (F.col("_next_gidx") - F.col("_gidx") - 1).alias("gap_len"),
        )
    )
