"""Event-sequence analytics: Markov transition matrices and trailing-
window rate anomalies over the ``events`` table.

Reference analog: the reference's t.rast.accdetect / accumulate family
asks "what happens NEXT in this series" per cell
(``temporal/t.rast.accdetect``); a transition matrix is the same
consecutive-step question asked across event types per user, and rate
anomalies are the temporal-neighbourhood deviation question
(``r.series`` stddev kernels over a rolling window,
``raster/r.series/main.c``) asked over per-user daily activity.

Scale notes (the whole point of the shapes here):

* :func:`event_transitions` needs GLOBAL per-user event ordering, but
  never sorts a whole user in one task.  Consecutive pairs decompose
  exactly into (a) pairs WITHIN a time bucket — a ``lead()`` window
  partitioned by ``(user, bucket)``, so the sort partition is bounded
  by per-user-per-bucket volume, not per-user volume — plus (b) pairs
  that CROSS a bucket boundary: the last event of a bucket pairs with
  the first event of the user's next active bucket.  First/last per
  bucket is a map-side-combinable ``min/max(struct(ts, id, type))``
  aggregate (a 10^8-event bot day is absorbed by partial aggregation),
  and the stitch ``lag()`` runs over the per-bucket frame — one row per
  ACTIVE bucket per user, bounded by calendar span regardless of event
  volume.  A hotter stream just needs a finer ``bucket`` ("hour",
  "minute"); the decomposition is exact for any granularity because
  bucket boundaries respect the (ts, id) event order.
* :func:`rate_anomalies` groups on ``(user, day)`` FIRST (the hot user
  spreads across days; partial aggregation absorbs volume map-side),
  then windows over the per-user-day frame — the second exchange moves
  only calendar-bounded rows.  Do NOT "optimize" this into a single
  ``repartition(user)`` pass: that shuffles raw event volume onto the
  bare user key and re-creates the hot-key funnel.
* z-scores compose from EXACT integer power sums (``sum``, ``sum of
  squares``, ``count`` over the trailing range window) — integer sums
  are order-independent, so the derived doubles are bit-identical
  across engines and across shuffle orders; ``stddev`` built-ins are
  not (distributed moment updates differ in the last ulp).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

_BUCKETS = ("day", "hour", "minute")


def event_transitions(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    bucket: str = "day",
) -> DataFrame:
    """Markov transition matrix over consecutive events per user.

    Events are ordered per user by ``(ts, id)`` (the id breaks exact
    timestamp ties deterministically); every consecutive pair
    contributes one ``from_type -> to_type`` observation.  Returns
    ``(from_type, to_type, n, p)`` where ``p = n / sum(n per
    from_type)`` rounded to 6 dp.

    ``bucket`` bounds the window-sort partition at per-user-per-bucket
    volume (see module docstring for the exact boundary-stitch
    decomposition); results are identical for any granularity.
    """
    if bucket not in _BUCKETS:
        raise ValueError(f"event_transitions: bucket must be one of {_BUCKETS}")

    base = df.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        F.col(type_col).alias("_et"),
    ).withColumn("_b", F.date_trunc(bucket, F.col("_ts")))

    # (a) pairs within a bucket: sort partition is (user, bucket).
    w_in = Window.partitionBy("_u", "_b").orderBy("_ts", "_id")
    within = (
        base.withColumn("_nxt", F.lead("_et").over(w_in))
        .where(F.col("_nxt").isNotNull())
        .select(F.col("_et").alias("from_type"), F.col("_nxt").alias("to_type"))
    )

    # (b) pairs across bucket boundaries: last-of-bucket -> first-of-next
    # active bucket.  min/max(struct) is map-side combinable; the lag
    # window sees one row per active bucket per user.
    ends = (
        base.select("_u", "_b", F.struct("_ts", "_id", "_et").alias("_e"))
        .groupBy("_u", "_b")
        .agg(F.min("_e").alias("_first"), F.max("_e").alias("_last"))
    )
    w_seq = Window.partitionBy("_u").orderBy("_b")
    across = (
        ends.withColumn("_prev_last", F.lag("_last").over(w_seq))
        .where(F.col("_prev_last").isNotNull())
        .select(
            F.col("_prev_last._et").alias("from_type"),
            F.col("_first._et").alias("to_type"),
        )
    )

    matrix = (
        within.unionByName(across)
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # |types|^2 rows at most — the normalising window is trivially small.
    w_from = Window.partitionBy("from_type")
    return matrix.select(
        "from_type",
        "to_type",
        "n",
        F.round(F.col("n") / F.sum("n").over(w_from), 6).alias("p"),
    )


def rate_anomalies(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    trailing_days: int = 7,
    min_days: int = 3,
) -> DataFrame:
    """Per-(user, day) activity z-score vs the user's trailing window.

    ``z = (n_events - mean_prev) / stddev_pop_prev`` over the
    ``trailing_days`` days strictly before the row's day (range frame
    on the day NUMBER, so calendar gaps are honoured — a 7-day trail
    sees at most 7 calendar days, not 7 rows).  ``z`` is NULL when
    fewer than ``min_days`` prior active days exist in the window or
    when the prior counts have zero variance.  Returns ``(user_col,
    day, n_events, n_prev, z)`` with ``z`` rounded to 6 dp.
    """
    if trailing_days < 1:
        raise ValueError("rate_anomalies: trailing_days must be >= 1")
    if min_days < 1:
        raise ValueError("rate_anomalies: min_days must be >= 1")

    daily = (
        df.select(
            F.col(user_col).alias("_u"),
            F.to_date(F.date_trunc("day", F.col(ts_col))).alias("day"),
        )
        .groupBy("_u", "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn("_dn", F.datediff("day", F.lit("1970-01-01")))
    )

    w = (
        Window.partitionBy("_u")
        .orderBy("_dn")
        .rangeBetween(-int(trailing_days), -1)
    )
    s1 = F.sum("n_events").over(w)
    s2 = F.sum(F.col("n_events") * F.col("n_events")).over(w)
    m = F.count("n_events").over(w)

    mean = s1.cast("double") / m
    var = s2.cast("double") / m - mean * mean
    z = F.when(
        (m >= min_days) & (var > 0),
        F.round((F.col("n_events") - mean) / F.sqrt(var), 6),
    )
    return daily.select(
        F.col("_u").alias(user_col),
        "day",
        "n_events",
        F.coalesce(m, F.lit(0)).cast("int").alias("n_prev"),
        z.alias("z"),
    )
