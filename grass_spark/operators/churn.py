"""Point-in-time churn label generation: split each user's history at
a cutoff, derive features from the BEFORE side only and the label
(churned = zero activity in the observation window after the cutoff)
from the AFTER side — the standard leakage-free training-frame
construction for retention models.

Reference analog: the temporal-split semantics of
``t.rast.aggregate``'s ``where='start_time < X'`` pipelines
(``python/grass/temporal/aggregation.py``) — a hard time boundary that
features must not cross.

Scale shape: ONE corpus-sized stage — a map-side-combinable
``groupBy(user)`` of conditional aggregates over the pre-split scan
(the filter on the observation horizon is pushed into the scan; the
window side collapses to one ``max`` flag).  Gap features are exact
integer day arithmetic.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def churn_labels(
    df: DataFrame,
    cutoff: str | dt.date,
    *,
    window_days: int = 30,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per user seen BEFORE ``cutoff``: ``(user, n_events_before,
    n_active_days_before, last_seen_day, recency_days, churned)``.

    ``churned = 1`` when the user has NO event in
    ``[cutoff, cutoff + window_days)``; users first seen at or after
    the cutoff are excluded (no history to featurize); events beyond
    the observation window are ignored entirely (they could not have
    been observed when the label matured).  ``recency_days`` is
    ``cutoff - last_seen_day`` in whole days.
    """
    if window_days < 1:
        raise ValueError("churn_labels: window_days must be >= 1")
    cut = F.lit(str(cutoff)).cast("date")
    day = F.to_date(F.date_trunc("day", F.col(ts_col)))
    base = df.select(
        F.col(user_col).alias("_u"), day.alias("_d")
    ).where(day < F.date_add(cut, int(window_days)))

    before = F.col("_d") < cut
    per_user = base.groupBy("_u").agg(
        F.sum(F.when(before, 1).otherwise(0)).alias("n_events_before"),
        F.countDistinct(F.when(before, F.col("_d")))
        .alias("n_active_days_before"),
        F.max(F.when(before, F.col("_d"))).alias("last_seen_day"),
        F.max(F.when(~before, 1).otherwise(0)).alias("_active_after"),
    )
    return (
        per_user.where(F.col("n_events_before") > 0)
        .select(
            F.col("_u").alias(user_col),
            "n_events_before",
            "n_active_days_before",
            "last_seen_day",
            F.datediff(cut, F.col("last_seen_day")).alias("recency_days"),
            (F.lit(1) - F.col("_active_after")).alias("churned"),
        )
        .orderBy(user_col)
    )
