"""Forty-third wave of driver-contract queries: leakage-free churn
label generation (operators/churn.py — features strictly before the
cutoff, label from the bounded observation window after it) and the
exact-cent equal-width value histogram (operators/profile.py
``value_histogram`` — integer bin arithmetic, empty bins densified).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from grass_spark.operators.churn import churn_labels
from grass_spark.operators.profile import value_histogram
from grass_spark.queries_ext import _t

EXT43_QUERIES: dict = {}
EXT43_ORACLES: dict = {}

_CUTOFF = "2024-01-21"
_CHURN_WINDOW = 10  # observation window [21, 31) sits inside the data


# ---------------------------------------------------------------------
# churn training labels
# ---------------------------------------------------------------------


def q_churn_labels(spark, sf_dir):
    return churn_labels(
        _t(spark, sf_dir, "events"), _CUTOFF, window_days=_CHURN_WINDOW
    )


ORACLE_CHURN_LABELS = f"""
WITH base AS (
  SELECT user_id, CAST(ts AS DATE) AS d FROM events
  WHERE CAST(ts AS DATE) < DATE '{_CUTOFF}' + {_CHURN_WINDOW}
),
pu AS (
  SELECT user_id,
         CAST(sum(CASE WHEN d < DATE '{_CUTOFF}' THEN 1 ELSE 0 END)
              AS BIGINT) AS n_events_before,
         CAST(count(DISTINCT CASE WHEN d < DATE '{_CUTOFF}' THEN d END)
              AS BIGINT) AS n_active_days_before,
         max(CASE WHEN d < DATE '{_CUTOFF}' THEN d END) AS last_seen_day,
         max(CASE WHEN d >= DATE '{_CUTOFF}' THEN 1 ELSE 0 END) AS aft
  FROM base GROUP BY 1
)
SELECT user_id, n_events_before, n_active_days_before, last_seen_day,
       CAST(DATE '{_CUTOFF}' - last_seen_day AS INTEGER) AS recency_days,
       CAST(1 - aft AS INTEGER) AS churned
FROM pu WHERE n_events_before > 0
ORDER BY user_id
"""


# ---------------------------------------------------------------------
# order-value histogram
# ---------------------------------------------------------------------

_HIST_BINS = 20


def q_value_histogram(spark, sf_dir):
    return value_histogram(
        _t(spark, sf_dir, "orders"),
        value_col="o_totalprice",
        n_bins=_HIST_BINS,
    )


ORACLE_VALUE_HISTOGRAM = f"""
WITH vals AS (
  SELECT CAST(round(CAST(o_totalprice AS DOUBLE) * CAST(100 AS DOUBLE))
              AS BIGINT) AS c
  FROM orders WHERE o_totalprice IS NOT NULL
),
bw AS (
  SELECT min(c) AS lo, max(c) AS hi,
         greatest(CAST(1 AS BIGINT),
                  (max(c) - min(c) + {_HIST_BINS}) // {_HIST_BINS}) AS w
  FROM vals
),
cen AS (
  SELECT (c - lo) // w AS bin, CAST(count(*) AS BIGINT) AS n
  FROM vals CROSS JOIN bw GROUP BY 1
),
grid AS (
  SELECT lo, w, unnest(generate_series(0, (hi - lo) // w)) AS bin
  FROM bw
)
SELECT g.bin,
       round(CAST(lo + g.bin * w AS DOUBLE) / CAST(100 AS DOUBLE), 6)
         AS lo_value,
       round(CAST(lo + (g.bin + 1) * w - 1 AS DOUBLE)
             / CAST(100 AS DOUBLE), 6) AS hi_value,
       CAST(coalesce(n, 0) AS BIGINT) AS n
FROM grid g LEFT JOIN cen ON cen.bin = g.bin
ORDER BY g.bin
"""


EXT43_QUERIES.update(
    {
        "churn_labels": q_churn_labels,
        "value_histogram": q_value_histogram,
    }
)
EXT43_ORACLES.update(
    {
        "churn_labels": ORACLE_CHURN_LABELS,
        "value_histogram": ORACLE_VALUE_HISTOGRAM,
    }
)
