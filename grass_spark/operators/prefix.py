"""Distributed exclusive prefix sums over a global value order — the
scalable replacement for ``Window.orderBy(v)`` cumulative sums on
census frames.

An unpartitioned window compiles to ``Exchange SinglePartition``: the
WHOLE frame funnels into one task.  That is fine when the census is
genuinely bounded (24 hours, 101 buckets, a calendar span) but a
census over a CONTINUOUS column (doubles, micros, norms) is
corpus-sized, and the rank/ECDF machinery built on it would
single-task at 100 TB.  This module computes the same exact integer
prefix sums with NO data-sized single-task stage:

1. one 1-row min/max aggregate (broadcast) defines ``n_buckets``
   equal-width monotone range buckets over the order column;
2. the cumulative window runs WITHIN each bucket
   (``partitionBy(bucket)`` — census/n_buckets rows per task);
3. bucket totals (<= n_buckets rows, bounded by CONFIG, not data)
   stitch across buckets via one tiny ordered window, and the
   per-bucket exclusive offsets broadcast-join back.

Bucket boundaries affect only task placement, never results: prefix
sums are exact integers for any monotone bucketing (equal order
values land in the same bucket by construction).  Same stitch
decomposition as the sequence operators' calendar buckets
(``operators/transitions.py``) — here the buckets come from the data
range instead of the calendar.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["exclusive_prefix_sums"]


def exclusive_prefix_sums(
    census: DataFrame,
    order_col: str,
    cols: list[str],
    *,
    n_buckets: int | None = None,
) -> DataFrame:
    """Adds ``_prev_<col>`` — the exact sum of ``col`` over all rows
    with a strictly smaller ``order_col`` — for each col in ``cols``.

    ``census`` must have UNIQUE ``order_col`` values (it is a census:
    one row per distinct value); ``order_col`` must be numeric.
    ``n_buckets`` defaults to 4x the session's shuffle partitions.
    """
    spark = census.sparkSession
    nb = n_buckets or max(
        int(spark.conf.get("spark.sql.shuffle.partitions", "32")) * 4, 8
    )
    bounds = census.agg(
        F.min(order_col).cast("double").alias("_lo"),
        F.max(order_col).cast("double").alias("_hi"),
    )
    span = F.col("_hi") - F.col("_lo")
    bucket = (
        F.when(
            span > 0,
            F.least(
                F.lit(nb - 1),
                F.floor(
                    (F.col(order_col).cast("double") - F.col("_lo"))
                    / span
                    * nb
                ),
            ),
        )
        .otherwise(F.lit(0))
        .cast("long")
    )
    c = (
        census.crossJoin(F.broadcast(bounds))
        .withColumn("_b", bucket)
        .drop("_lo", "_hi")
        .localCheckpoint(eager=False)  # feeds the within-bucket window
        # AND the bucket-total census
    )
    btot = c.groupBy("_b").agg(
        *[F.sum(col).alias(f"_t_{col}") for col in cols]
    )
    # <= n_buckets rows: the ONE ordered window, bounded by config
    off_w = Window.orderBy("_b").rowsBetween(
        Window.unboundedPreceding, -1
    )
    offs = btot.select(
        "_b",
        *[
            F.coalesce(F.sum(f"_t_{col}").over(off_w), F.lit(0)).alias(
                f"_o_{col}"
            )
            for col in cols
        ],
    )
    within = (
        Window.partitionBy("_b")
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    out = c.join(F.broadcast(offs), "_b")
    for col in cols:
        out = out.withColumn(
            f"_prev_{col}",
            F.col(f"_o_{col}") + F.sum(col).over(within) - F.col(col),
        )
    return out.drop("_b", *[f"_o_{col}" for col in cols])
