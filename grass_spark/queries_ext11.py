"""Eleventh wave of driver-contract queries: engagement & monitoring
analytics — rolling active users (interval sweep, never a banded
calendar join), days-active histogram, RFM quintile segmentation
(distinct-value census, never a global user rank), CUSUM changepoint
alarms (prefix-sum identity, no sequential recurrence), and event-type
daily-count correlations (operators/engagement.py) over ``events``.

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from grass_spark.operators.engagement import (
    activity_histogram,
    cusum_alarms,
    rfm_segments,
    rolling_active_users,
    type_correlations,
)
from grass_spark.queries_ext import _t

EXT11_QUERIES: dict = {}
EXT11_ORACLES: dict = {}


# ---------------------------------------------------------------------
# rolling active users — DAU / 7-day WAU / stickiness per calendar day
# ---------------------------------------------------------------------

_ACTIVE_WINDOW = 7


def q_active_users(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return rolling_active_users(ev, window_days=_ACTIVE_WINDOW)


ORACLE_ACTIVE_USERS = f"""
WITH ud AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
),
cal AS (
  SELECT CAST(unnest(generate_series(min(day), max(day),
              INTERVAL 1 DAY)) AS DATE) AS day
  FROM ud
),
wau AS (
  SELECT c.day, count(DISTINCT u.user_id) AS wau
  FROM cal c
  LEFT JOIN ud u ON u.day BETWEEN c.day - {_ACTIVE_WINDOW - 1} AND c.day
  GROUP BY c.day
),
dau AS (SELECT day, CAST(count(*) AS BIGINT) AS dau FROM ud GROUP BY day)
SELECT c.day,
       CAST(coalesce(d.dau, 0) AS BIGINT) AS dau,
       CAST(w.wau AS BIGINT) AS wau,
       CASE WHEN w.wau > 0
            THEN round(CAST(coalesce(d.dau, 0) AS DOUBLE) / w.wau, 6)
       END AS stickiness
FROM cal c
JOIN wau w ON c.day = w.day
LEFT JOIN dau d ON c.day = d.day
ORDER BY c.day
"""

EXT11_QUERIES["active_users"] = q_active_users
EXT11_ORACLES["active_users"] = ORACLE_ACTIVE_USERS


# ---------------------------------------------------------------------
# power-user curve — users by exact days-active count
# ---------------------------------------------------------------------


def q_activity_histogram(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return activity_histogram(ev)


ORACLE_ACTIVITY_HISTOGRAM = """
WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
pu AS (
  SELECT user_id, CAST(count(*) AS BIGINT) AS n_days_active
  FROM ud GROUP BY user_id
)
SELECT n_days_active, CAST(count(*) AS BIGINT) AS n_users
FROM pu GROUP BY n_days_active ORDER BY n_days_active
"""

EXT11_QUERIES["activity_histogram"] = q_activity_histogram
EXT11_ORACLES["activity_histogram"] = ORACLE_ACTIVITY_HISTOGRAM


# ---------------------------------------------------------------------
# RFM segmentation — exact quintiles via distinct-value census
# ---------------------------------------------------------------------


def q_rfm_segments(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return rfm_segments(ev)


# score = ceil(5 * cum_worse_or_equal / n) in pure integer math; the
# census windows run over DISTINCT metric values (v), mirroring the
# Spark shape exactly.  monetary is exact integer cents.
ORACLE_RFM_SEGMENTS = """
WITH base AS (
  SELECT user_id,
         max(CAST(ts AS DATE)) AS umax,
         CAST(count(*) AS BIGINT) AS frequency,
         CAST(coalesce(sum(CASE WHEN event_type = 'purchase'
              THEN CAST(round(value * 100) AS BIGINT)
              ELSE 0 END), 0) AS BIGINT) AS cents
  FROM events GROUP BY user_id
),
pu AS (
  SELECT user_id,
         CAST(date_diff('day', umax,
              (SELECT max(umax) FROM base)) AS INT) AS recency_days,
         frequency, cents
  FROM base
),
rc AS (SELECT recency_days AS v, count(*) AS c FROM pu GROUP BY 1),
rs AS (
  SELECT v, CAST((5 * sum(c) OVER (ORDER BY v DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              + sum(c) OVER () - 1) // sum(c) OVER () AS INT) AS r_score
  FROM rc
),
fc AS (SELECT frequency AS v, count(*) AS c FROM pu GROUP BY 1),
fs AS (
  SELECT v, CAST((5 * sum(c) OVER (ORDER BY v ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              + sum(c) OVER () - 1) // sum(c) OVER () AS INT) AS f_score
  FROM fc
),
mc AS (SELECT cents AS v, count(*) AS c FROM pu GROUP BY 1),
ms AS (
  SELECT v, CAST((5 * sum(c) OVER (ORDER BY v ASC
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
              + sum(c) OVER () - 1) // sum(c) OVER () AS INT) AS m_score
  FROM mc
)
SELECT p.user_id, p.recency_days, p.frequency,
       round(CAST(p.cents AS DOUBLE) / CAST(100 AS DOUBLE), 2) AS monetary,
       rs.r_score, fs.f_score, ms.m_score,
       CAST(rs.r_score AS VARCHAR) || CAST(fs.f_score AS VARCHAR)
         || CAST(ms.m_score AS VARCHAR) AS segment
FROM pu p
JOIN rs ON p.recency_days = rs.v
JOIN fs ON p.frequency = fs.v
JOIN ms ON p.cents = ms.v
ORDER BY p.user_id
"""

EXT11_QUERIES["rfm_segments"] = q_rfm_segments
EXT11_ORACLES["rfm_segments"] = ORACLE_RFM_SEGMENTS


# ---------------------------------------------------------------------
# CUSUM changepoint alarms on per-user daily activity
# ---------------------------------------------------------------------

_CUSUM_DRIFT = 3
_CUSUM_H = 3


def q_cusum_alarms(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return cusum_alarms(ev, drift=_CUSUM_DRIFT, threshold=_CUSUM_H)


ORACLE_CUSUM_ALARMS = f"""
WITH ud AS (
  SELECT user_id, CAST(ts AS DATE) AS day, CAST(count(*) AS BIGINT) AS x
  FROM events GROUP BY 1, 2
),
span AS (SELECT user_id, min(day) AS lo, max(day) AS hi FROM ud GROUP BY 1),
cal AS (
  SELECT user_id,
         CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
  FROM span
),
dense AS (
  SELECT c.user_id, c.day, coalesce(u.x, 0) AS x
  FROM cal c LEFT JOIN ud u ON c.user_id = u.user_id AND c.day = u.day
),
p AS (
  SELECT user_id, day,
         sum(x - {_CUSUM_DRIFT}) OVER (PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pp
  FROM dense
),
s AS (
  SELECT user_id, day,
         pp - least(0, min(pp) OVER (PARTITION BY user_id ORDER BY day
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS ss
  FROM p
)
SELECT user_id,
       min(day) FILTER (WHERE ss > {_CUSUM_H}) AS alarm_day,
       CAST(max(ss) AS BIGINT) AS max_s
FROM s GROUP BY user_id ORDER BY user_id
"""

EXT11_QUERIES["cusum_alarms"] = q_cusum_alarms
EXT11_ORACLES["cusum_alarms"] = ORACLE_CUSUM_ALARMS


# ---------------------------------------------------------------------
# event-type daily-count Pearson correlations
# ---------------------------------------------------------------------


def q_type_correlations(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return type_correlations(ev)


ORACLE_TYPE_CORRELATIONS = """
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day, event_type AS t,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
cal AS (
  SELECT CAST(unnest(generate_series(min(day), max(day),
              INTERVAL 1 DAY)) AS DATE) AS day
  FROM daily
),
types AS (SELECT DISTINCT t FROM daily),
dense AS (
  SELECT c.day, ty.t, coalesce(d.n, 0) AS n
  FROM cal c CROSS JOIN types ty
  LEFT JOIN daily d ON c.day = d.day AND ty.t = d.t
),
pairs AS (
  SELECT a.t AS type_a, b.t AS type_b, a.n AS xa, b.n AS xb
  FROM dense a JOIN dense b ON a.day = b.day AND a.t < b.t
),
sums AS (
  SELECT type_a, type_b, CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(CAST(xa AS HUGEINT)) AS DOUBLE) AS sx,
         CAST(sum(CAST(xb AS HUGEINT)) AS DOUBLE) AS sy,
         CAST(sum(CAST(xa AS HUGEINT) * xa) AS DOUBLE) AS sxx,
         CAST(sum(CAST(xb AS HUGEINT) * xb) AS DOUBLE) AS syy,
         CAST(sum(CAST(xa AS HUGEINT) * xb) AS DOUBLE) AS sxy
  FROM pairs GROUP BY 1, 2
)
SELECT type_a, type_b, n_days,
       CASE WHEN (n_days * sxx - sx * sx) > 0
             AND (n_days * syy - sy * sy) > 0
            THEN round((n_days * sxy - sx * sy)
                 / sqrt((n_days * sxx - sx * sx)
                        * (n_days * syy - sy * sy)), 6)
       END AS corr
FROM sums ORDER BY type_a, type_b
"""

EXT11_QUERIES["type_correlations"] = q_type_correlations
EXT11_ORACLES["type_correlations"] = ORACLE_TYPE_CORRELATIONS
