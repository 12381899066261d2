"""Forty-seventh wave of driver-contract queries: per-state next-event
top-k lookup (operators/transitions.py ``next_event_top`` — the
transition census ranked within from_type) and the per-type data
freshness audit (operators/profile.py ``freshness_report`` — staleness
vs. the global max day, trailing-window volume).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from grass_spark.operators.profile import freshness_report
from grass_spark.operators.transitions import next_event_top
from grass_spark.queries_ext import _t
from grass_spark.queries_ext10 import ORACLE_EVENT_TRANSITIONS

EXT47_QUERIES: dict = {}
EXT47_ORACLES: dict = {}


# ---------------------------------------------------------------------
# next-event top-3 per state
# ---------------------------------------------------------------------


def q_next_event_top(spark, sf_dir):
    return next_event_top(_t(spark, sf_dir, "events"), k=3)


ORACLE_NEXT_EVENT_TOP = f"""
WITH trans AS ({ORACLE_EVENT_TRANSITIONS}),
r AS (
  SELECT from_type, to_type, n, p,
         CAST(row_number() OVER (
           PARTITION BY from_type ORDER BY n DESC, to_type
         ) AS INTEGER) AS rank
  FROM trans
)
SELECT from_type, rank, to_type, n, p
FROM r WHERE rank <= 3
ORDER BY from_type, rank
"""


# ---------------------------------------------------------------------
# per-type freshness audit
# ---------------------------------------------------------------------

_FRESH_DAYS = 7


def q_freshness_report(spark, sf_dir):
    return freshness_report(
        _t(spark, sf_dir, "events"),
        group_col="event_type",
        recent_days=_FRESH_DAYS,
    )


ORACLE_FRESHNESS_REPORT = f"""
WITH base AS (
  SELECT event_type AS g, CAST(ts AS DATE) AS d FROM events
),
gm AS (SELECT max(d) AS gmax FROM base)
SELECT g AS "group",
       CAST(count(*) AS BIGINT) AS n_rows,
       max(d) AS last_day,
       CAST(min(gmax - d) AS INTEGER) AS days_behind,
       CAST(sum(CASE WHEN d > gmax - {_FRESH_DAYS} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_recent
FROM base CROSS JOIN gm
GROUP BY g
ORDER BY g
"""


EXT47_QUERIES.update(
    {
        "next_event_top": q_next_event_top,
        "freshness_report": q_freshness_report,
    }
)
EXT47_ORACLES.update(
    {
        "next_event_top": ORACLE_NEXT_EVENT_TOP,
        "freshness_report": ORACLE_FRESHNESS_REPORT,
    }
)
