"""Forty-second wave of driver-contract queries: order/line-item total
reconciliation (operators/reconcile.py — exact-cent parent-vs-detail
containment check) and the one-row session engagement summary
(operators/transitions.py ``session_summary`` — bounce rate, depth
quantiles over bucket-decomposed sessions, same 6 h gap as the
``sessionize_events`` query so the two artifacts agree).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.reconcile import reconcile_totals
from grass_spark.operators.transitions import session_summary
from grass_spark.queries_ext import _t
from grass_spark.queries_ext10 import _SESSION_GAP

EXT42_QUERIES: dict = {}
EXT42_ORACLES: dict = {}


# ---------------------------------------------------------------------
# order header vs line-item reconciliation
# ---------------------------------------------------------------------


def q_reconcile_orders(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    line = (
        F.col("l_extendedprice")
        * (F.lit(1.0) - F.col("l_discount"))
        * (F.lit(1.0) + F.col("l_tax"))
    )
    return reconcile_totals(
        o, li,
        parent_key="o_orderkey",
        detail_key="l_orderkey",
        total_expr=F.col("o_totalprice"),
        line_expr=line,
    )


ORACLE_RECONCILE_ORDERS = """
WITH det AS (
  SELECT l_orderkey AS k,
         CAST(sum(CAST(round(l_extendedprice
                             * (CAST(1 AS DOUBLE) - l_discount)
                             * (CAST(1 AS DOUBLE) + l_tax)
                             * CAST(100 AS DOUBLE)) AS BIGINT))
              AS BIGINT) AS lc
  FROM lineitem GROUP BY 1
),
par AS (
  SELECT o_orderkey AS k,
         CAST(round(o_totalprice * CAST(100 AS DOUBLE)) AS BIGINT) AS tc
  FROM orders
),
j AS (
  SELECT tc, lc, abs(tc - lc) AS diff, lc IS NOT NULL AS has
  FROM par LEFT JOIN det USING (k)
)
SELECT CAST(count(*) AS BIGINT) AS n_parents,
       CAST(sum(CASE WHEN NOT has THEN 1 ELSE 0 END) AS BIGINT)
         AS n_no_detail,
       CAST(sum(CASE WHEN has AND diff = 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_match,
       CAST(sum(CASE WHEN has AND diff > 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_mismatch,
       max(CASE WHEN has THEN diff END) AS max_abs_diff_cents,
       CAST(coalesce(sum(CASE WHEN has THEN diff END), 0) AS BIGINT)
         AS total_abs_diff_cents
FROM j
"""


# ---------------------------------------------------------------------
# session engagement summary (same 6 h gap as sessionize_events)
# ---------------------------------------------------------------------


def q_session_summary(spark, sf_dir):
    return session_summary(_t(spark, sf_dir, "events"), _SESSION_GAP)


ORACLE_SESSION_SUMMARY = f"""
WITH s AS (
  SELECT event_id, user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
f AS (
  SELECT *, CASE WHEN prev IS NULL
                   OR ts > prev + INTERVAL {_SESSION_GAP} SECOND
                 THEN 1 ELSE 0 END AS flag
  FROM s
),
x AS (
  SELECT user_id,
         CAST(sum(flag) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) - 1 AS BIGINT) AS session_idx
  FROM f
),
dep AS (
  SELECT user_id, session_idx, CAST(count(*) AS BIGINT) AS d
  FROM x GROUP BY 1, 2
),
a AS (
  SELECT CAST(count(*) AS BIGINT) AS n_sessions,
         CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
         CAST(sum(d) AS BIGINT) AS n_events,
         CAST(sum(CASE WHEN d = 1 THEN 1 ELSE 0 END) AS BIGINT)
           AS bounce_sessions,
         round(quantile_cont(d, 0.5), 6) AS p50_depth,
         round(quantile_cont(d, 0.95), 6) AS p95_depth
  FROM dep
)
SELECT n_sessions, n_users, n_events, bounce_sessions,
       round(CAST(bounce_sessions AS DOUBLE)
             / CAST(n_sessions AS DOUBLE), 6) AS bounce_rate,
       round(CAST(n_events AS DOUBLE)
             / CAST(n_sessions AS DOUBLE), 6) AS mean_depth,
       p50_depth, p95_depth
FROM a
"""


EXT42_QUERIES.update(
    {
        "reconcile_orders": q_reconcile_orders,
        "session_summary": q_session_summary,
    }
)
EXT42_ORACLES.update(
    {
        "reconcile_orders": ORACLE_RECONCILE_ORDERS,
        "session_summary": ORACLE_SESSION_SUMMARY,
    }
)
