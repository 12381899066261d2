"""Multi-level OLAP summary surfaces: ROLLUP reports with grouping
ids — the "one query, every subtotal level" table a monitoring
dashboard reads instead of issuing one groupBy per level.

Spark-first shape: ``df.rollup(...)`` compiles to a single Expand +
partial/final HashAggregate pair — the map side emits one row per
grouping set per input row and partial aggregation combines them
before the ONE shuffle; d rollup dims cost (d+1)x map-side rows, not
(d+1) scans or (d+1) shuffles.  At 100 TB that is the difference
between one pass and a dashboard's worth of passes.

Cross-engine parity: ``grouping_id()`` bit encoding (leftmost dim =
highest bit) matches DuckDB's ``grouping_id()`` exactly (verified);
value sums accumulate in EXACT integer cents (``round(v*100)`` per
row — the rfm_segments convention) so subtotal sums are
order-independent and portable at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["rollup_report", "cube_report", "share_shift"]


def _grouping_report(grouped, dims: list[str], value_col: str | None):
    aggs = [
        F.grouping_id().cast("long").alias("level"),
        F.count(F.lit(1)).alias("n"),
    ]
    if value_col is not None:
        cents = F.sum(
            F.coalesce(
                F.round(F.col(value_col) * 100).cast("long"), F.lit(0)
            )
        )
        aggs.append(F.round(cents / 100.0, 2).alias("value_sum"))
    return grouped.agg(*aggs).orderBy("level", *dims)


def rollup_report(
    df: DataFrame,
    dims: list[str],
    *,
    value_col: str | None = None,
) -> DataFrame:
    """ROLLUP over ``dims`` (left-to-right hierarchy): one row per
    grouping set with ``level`` = grouping_id (0 = finest detail,
    2^d - 1 = grand total), ``n`` = row count, and — when
    ``value_col`` is given — ``value_sum`` = exact-cents sum rounded
    back to 2 dp.  Subtotal dims read NULL (standard ROLLUP output).
    """
    if not dims:
        raise ValueError("rollup_report: dims must be non-empty")
    return _grouping_report(df.rollup(*dims), dims, value_col)


def cube_report(
    df: DataFrame,
    dims: list[str],
    *,
    value_col: str | None = None,
) -> DataFrame:
    """CUBE over ``dims`` — every 2^d dim subset, not just the
    ROLLUP hierarchy's d+1 prefixes; same output contract as
    :func:`rollup_report` (``level`` = grouping_id bit mask, exact-
    cents ``value_sum``).  Still ONE Expand + one partial/final
    HashAggregate pair — d cube dims cost 2^d map-side rows per input
    row and one shuffle, not 2^d scans (the module-docstring plan
    shape; pinned by the wave-22 plan test).
    """
    if not dims:
        raise ValueError("cube_report: dims must be non-empty")
    return _grouping_report(df.cube(*dims), dims, value_col)


def share_shift(
    df,
    *,
    ts_col: str = "ts",
    group_col: str,
    value_col: str,
):
    """Month-over-month market-share shift per group: ``(month, group,
    value_sum, share, share_prev, share_delta)``.

    ``share`` is the group's fraction of that month's total;
    ``share_prev`` comes from an EXPLICIT previous-calendar-month
    self-join (not a lag over present months — a gap month must yield
    NULL delta, not silently compare across the hole).

    Scale shape: one map-side-combinable census on (month, group);
    month totals and the prev-month join run on census-sized frames.
    Values reduce in exact integer cents; shares round 6 and the delta
    subtracts the two ROUNDED shares (deterministic in both engines).
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    cen = (
        df.select(
            F.date_trunc("month", F.col(ts_col).cast("timestamp"))
            .cast("date")
            .alias("month"),
            F.col(group_col).alias("_g"),
            cents.alias("_c"),
        )
        .groupBy("month", "_g")
        .agg(F.sum(F.col("_c").cast("decimal(38,0)")).alias("_v"))
        .localCheckpoint(eager=False)  # totals + self-join + output
    )
    tot = cen.groupBy("month").agg(F.sum("_v").alias("_t"))
    cur = cen.join(tot, "month").select(
        "month",
        "_g",
        F.round(F.col("_v").cast("double") / F.lit(100.0), 6).alias(
            "value_sum"
        ),
        F.round(
            F.col("_v").cast("double") / F.col("_t").cast("double"), 6
        ).alias("share"),
    ).localCheckpoint(eager=False)  # both sides of the shift join
    prev = cur.select(
        F.add_months(F.col("month"), 1).alias("month"),
        F.col("_g"),
        F.col("share").alias("share_prev"),
    )
    return (
        cur.join(prev, ["month", "_g"], "left")
        .select(
            "month",
            F.col("_g").alias(group_col),
            "value_sum",
            "share",
            "share_prev",
            F.round(F.col("share") - F.col("share_prev"), 6).alias(
                "share_delta"
            ),
        )
    )
