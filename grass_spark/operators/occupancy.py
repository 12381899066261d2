"""Per-state time-in-state (occupancy): each event puts its user into
state ``event_type`` until that user's next event; the operator reports,
per state, how much wall-clock time users collectively spent in it.

Reference analog: ``t.rast.list method=delta`` consecutive-extent
distances (``python/grass/temporal/list_stds.py``) re-keyed by the map
VALUE instead of the map — "how long does each state persist" is the
transcript-domain twin of per-granule interval coverage.

Scale shape
-----------
The same exact global-order decomposition as
:func:`grass_spark.operators.transitions.interevent_stats`: the per-user
``(ts, id)`` order splits into (a) within-time-bucket ``lead`` windows
(bounded partitions — a hot user spreads across buckets) and (b) a
cross-bucket stitch over per-bucket first/last rows elected by plain
map-side-combinable ``min``/``max(struct)`` aggregates, with the stitch
window running over the calendar-bounded per-bucket frame.  Equal
timestamps never straddle a bucket boundary, so the decomposition is
exact for any bucket granularity.  Gap micros sum in ``DECIMAL(38,0)``
(10^12 events x multi-day gaps overflow BIGINT) and every double is a
fixed expression over exact integers — bit-identical across engines
after ``round(., 6)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from grass_spark.operators.transitions import _BUCKET_SECONDS, _BUCKETS


def state_occupancy(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    bucket: str = "day",
) -> DataFrame:
    """``(state, n_intervals, total_s, share)`` per state.

    An interval is the span from one event to the SAME user's next
    event, attributed to the earlier event's type (the user "is in"
    that state until they do something else); each user's last event
    opens no interval.  ``total_s`` is the exact micro-second sum cast
    to seconds (6 dp); ``share`` is this state's fraction of all
    observed occupancy (6 dp).  Ties on ``ts`` order by ``id_col`` —
    zero-length intervals count with their tie-order state.
    """
    if bucket not in _BUCKETS:
        raise ValueError(f"state_occupancy: bucket must be one of {_BUCKETS}")

    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"CAST(`{ts_col}` AS TIMESTAMP_NTZ))"
    )
    base = df.select(
        F.col(user_col).alias("_u"),
        us.alias("_us"),
        F.col(id_col).alias("_id"),
        F.col(type_col).alias("_et"),
    ).withColumn("_b", F.expr(
        f"_us div {_BUCKET_SECONDS[bucket] * 1_000_000}"
    ))

    # (a) within-bucket intervals: one bounded-partition window; the
    # gap belongs to the EARLIER row's state
    w_in = Window.partitionBy("_u", "_b").orderBy("_us", "_id")
    within = (
        base.withColumn("_nxt", F.lead("_us").over(w_in))
        .where(F.col("_nxt").isNotNull())
        .select("_et", (F.col("_nxt") - F.col("_us")).alias("_g"))
    )

    # (b) cross-bucket intervals: per-bucket last row (max struct
    # election carries its state) to the next active bucket's first
    # micros — plain combinable aggregates, calendar-bounded stitch
    ends = base.groupBy("_u", "_b").agg(
        F.min("_us").alias("_first"),
        F.max(F.struct("_us", "_id", "_et")).alias("_last"),
    )
    w_seq = Window.partitionBy("_u").orderBy("_b")
    across = (
        ends.withColumn("_nxt_first", F.lead("_first").over(w_seq))
        .where(F.col("_nxt_first").isNotNull())
        .select(
            F.col("_last._et").alias("_et"),
            (F.col("_nxt_first") - F.col("_last._us")).alias("_g"),
        )
    )

    cen = (
        within.unionByName(across)
        .groupBy("_et")
        .agg(
            F.count(F.lit(1)).alias("n_intervals"),
            F.sum(F.col("_g").cast("decimal(19,0)")).alias("_s"),
        )
    )
    tot = cen.agg(F.sum("_s").alias("_t"))
    return (
        cen.crossJoin(F.broadcast(tot))
        .select(
            F.col("_et").alias("state"),
            "n_intervals",
            F.round(F.col("_s").cast("double") / 1e6, 6).alias("total_s"),
            F.when(
                F.col("_t").cast("double") > 0,
                F.round(
                    F.col("_s").cast("double") / F.col("_t").cast("double"),
                    6,
                ),
            ).alias("share"),
        )
        .orderBy("state")
    )
