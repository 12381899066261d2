"""Sessionization — split each conversation/user stream into sessions
at inactivity gaps.

The GRASS-shaped reading: ``get_registered_maps_as_objects_with_gaps``
finds gaps between extents (``abstract_space_time_dataset.py:1421-1492``);
sessionization is the same gap detection applied as a *segmentation*:
every gap longer than the timeout starts a new session.

Batch form: one window pass — lag(ts), gap > timeout -> boundary flag,
running sum of flags = session index (classic telemetry sessionize; no
UDF, one shuffle).  Streaming form in
:mod:`grass_spark.streaming.sessionize` keeps per-key state across
micro-batches with ``applyInPandasWithState``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sessionize(
    df: DataFrame,
    timeout_s: int,
    *,
    keys: list[str] | None = None,
    ts_col: str = "ts",
    order_cols: list[str] | None = None,
) -> DataFrame:
    """Add ``session_idx`` (0-based per key) and ``session_id``."""
    keys = ["conv_id"] if keys is None else list(keys)
    order = [ts_col] + list(order_cols or [])
    w = Window.partitionBy(*keys).orderBy(*order)
    prev = F.lag(ts_col).over(w)
    gap = F.unix_micros(F.col(ts_col).cast("timestamp")) - F.unix_micros(
        prev.cast("timestamp")
    )
    boundary = F.when(
        prev.isNull() | (gap > timeout_s * 1_000_000), 1
    ).otherwise(0)
    run = Window.partitionBy(*keys).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    out = df.withColumn("session_idx", (F.sum(boundary).over(run) - 1).cast("long"))
    sid = F.concat_ws("#", *[F.col(k).cast("string") for k in keys],
                      F.col("session_idx").cast("string"))
    return out.withColumn("session_id", sid)


def session_stats(
    sessions: DataFrame,
    *,
    keys: list[str] | None = None,
    ts_col: str = "ts",
) -> DataFrame:
    """Per-session rollup: bounds, duration, event count."""
    keys = ["conv_id"] if keys is None else list(keys)
    return sessions.groupBy(*keys, "session_idx").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.round(
            (F.unix_micros(F.max(ts_col).cast("timestamp"))
             - F.unix_micros(F.min(ts_col).cast("timestamp"))) / 1e6, 6
        ).alias("duration_s"),
        F.count(F.lit(1)).alias("n_events"),
    )
