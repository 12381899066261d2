"""Weighted holistic kernels — GRASS ``w_median`` / ``w_quant`` / ``w_mode``.

The unweighted holistic kernels map to Spark built-ins (``median``,
``percentile``, ``mode``), but GRASS's *weighted* variants use a
different algorithm (``lib/stats/c_median.c:16-41``,
``c_percentile.c:49-75``, ``c_mode.c:39-73``): sort by value, accumulate
weights, pick the first value whose cumulative weight reaches
``total * q`` (lower weighted quantile, q=0.5 for the median); weighted
mode is the value with the largest weight sum (smallest value on ties).

Spark-first: one window pass (sort within key) + one groupBy — the same
two shuffles any holistic kernel costs; no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def weighted_quantile(
    df: DataFrame,
    q: float,
    *,
    keys: list[str],
    value_col: str = "value",
    weight_col: str = "w",
    tiebreak: list[str] | None = None,
    alias: str = "w_quant",
) -> DataFrame:
    """Lower weighted quantile per key (GRASS ``c_percentile.c:49-75``).

    Rows with NULL value or NULL/non-positive weight are skipped (the
    kernels test the value; zero weight contributes nothing).
    """
    tiebreak = tiebreak or []
    base = df.filter(
        F.col(value_col).isNotNull() & F.col(weight_col).isNotNull()
    )
    w_sort = Window.partitionBy(*keys).orderBy(value_col, *tiebreak)
    w_all = Window.partitionBy(*keys)
    cumw = F.sum(weight_col).over(
        w_sort.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = F.sum(weight_col).over(w_all)
    hit = base.withColumn("_cumw", cumw).withColumn("_tot", tot).filter(
        F.col("_cumw") >= F.col("_tot") * float(q)
    )
    # first qualifying value in sort order
    pick = F.min(F.struct(F.col(value_col), *[F.col(t) for t in tiebreak]))
    return (
        hit.groupBy(*keys)
        .agg(pick.alias("_pick"))
        .select(*keys, F.col(f"_pick.{value_col}").alias(alias))
    )


def weighted_median(
    df: DataFrame,
    *,
    keys: list[str],
    value_col: str = "value",
    weight_col: str = "w",
    tiebreak: list[str] | None = None,
    alias: str = "w_median",
) -> DataFrame:
    """GRASS weighted median = lower weighted quantile at 0.5
    (``c_median.c:16-41``)."""
    return weighted_quantile(
        df, 0.5, keys=keys, value_col=value_col, weight_col=weight_col,
        tiebreak=tiebreak, alias=alias,
    )


def weighted_mode(
    df: DataFrame,
    *,
    keys: list[str],
    value_col: str = "value",
    weight_col: str = "w",
    alias: str = "w_mode",
) -> DataFrame:
    """Value with the largest weight sum; smallest value on ties
    (``c_mode.c`` tie rule carried over)."""
    sums = (
        df.filter(F.col(value_col).isNotNull() & F.col(weight_col).isNotNull())
        .groupBy(*keys, value_col)
        .agg(F.sum(weight_col).alias("_wsum"))
    )
    # max over (wsum, -value): largest weight, then smallest value
    pick = F.max_by(
        F.col(value_col),
        F.struct(F.col("_wsum"), (-F.col(value_col)).alias("_nv")),
    )
    return sums.groupBy(*keys).agg(pick.alias(alias))
