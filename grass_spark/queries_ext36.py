"""Thirty-sixth wave of driver-contract queries: lagged daily
cross-correlation between two event-type count series
(operators/ccf.py — does 'purchase' follow 'click'?) and per-state
next-event conditional entropy (operators/transitions.py
``transition_entropy`` — Markov predictability of the event stream).

The CCF oracle mirrors the exact-power-sum Pearson composition
(HUGEINT sums -> one double expression); the entropy oracle reuses the
event_transitions lead-window SQL as a CTE and the source_entropy
``ln(n) - sum(n ln n)/n`` identity with per-term 6-dp rounding.

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from grass_spark.operators.ccf import cross_correlation
from grass_spark.operators.transitions import transition_entropy
from grass_spark.queries_ext import _t

EXT36_QUERIES: dict = {}
EXT36_ORACLES: dict = {}


# ---------------------------------------------------------------------
# click -> purchase daily-count CCF at lags 0..7
# ---------------------------------------------------------------------


def q_ccf_daily(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return cross_correlation(
        ev, type_x="click", type_y="purchase", max_lag=7
    )


ORACLE_CCF_DAILY = """
WITH cen AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END)
              AS BIGINT) AS x,
         CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
              AS BIGINT) AS y
  FROM events WHERE event_type IN ('click', 'purchase')
  GROUP BY 1
),
b AS (SELECT min(day) AS lo, max(day) AS hi FROM cen),
grid AS (
  SELECT d.day, coalesce(cen.x, 0) AS x, coalesce(cen.y, 0) AS y
  FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE
          AS day FROM b) d
  LEFT JOIN cen ON d.day = cen.day
),
lags AS (SELECT unnest(generate_series(0, 7)) AS lag),
j AS (
  SELECT l.lag, gx.x, gy.y
  FROM grid gx CROSS JOIN lags l
  JOIN grid gy ON gy.day = gx.day + CAST(l.lag AS INTEGER)
),
agg AS (
  SELECT lag, count(*) AS n_days,
         CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
         sum(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
         sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx,
         sum(CAST(y AS HUGEINT) * CAST(y AS HUGEINT)) AS syy
  FROM j GROUP BY lag
)
SELECT CAST(lag AS INTEGER) AS lag, n_days,
       CASE WHEN sqrt(CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * sqrt(CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)) > 0
            THEN round(
              (CAST(n_days AS DOUBLE) * CAST(sxy AS DOUBLE)
               - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (sqrt(CAST(n_days AS DOUBLE) * CAST(sxx AS DOUBLE)
                      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                 * sqrt(CAST(n_days AS DOUBLE) * CAST(syy AS DOUBLE)
                        - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 6)
       END AS r
FROM agg
ORDER BY lag
"""


# ---------------------------------------------------------------------
# next-event conditional entropy per from_type
# ---------------------------------------------------------------------


def q_transition_entropy(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return transition_entropy(ev)


ORACLE_TRANSITION_ENTROPY = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS nxt
  FROM events
),
m AS (
  SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
  FROM seq WHERE nxt IS NOT NULL
  GROUP BY 1, 2
),
agg AS (
  SELECT from_type,
         CAST(sum(n) AS BIGINT) AS n_obs,
         CAST(count(*) AS BIGINT) AS n_next_types,
         sum(round(CAST(n AS DOUBLE) * ln(CAST(n AS DOUBLE)), 6))
           AS snln
  FROM m GROUP BY 1
)
SELECT from_type, n_obs, n_next_types,
       round(ln(CAST(n_obs AS DOUBLE))
             - snln / CAST(n_obs AS DOUBLE), 6) AS entropy,
       CASE WHEN n_next_types > 1 THEN
         round(round(ln(CAST(n_obs AS DOUBLE))
                     - snln / CAST(n_obs AS DOUBLE), 6)
               / ln(CAST(n_next_types AS DOUBLE)), 6)
       END AS entropy_norm
FROM agg
ORDER BY from_type
"""


EXT36_QUERIES.update(
    {
        "ccf_daily": q_ccf_daily,
        "transition_entropy": q_transition_entropy,
    }
)
EXT36_ORACLES.update(
    {
        "ccf_daily": ORACLE_CCF_DAILY,
        "transition_entropy": ORACLE_TRANSITION_ENTROPY,
    }
)
