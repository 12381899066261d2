"""Forty-fourth wave of driver-contract queries: per-type geometric
means (operators/stats.py ``geometric_means`` — round-before-ln-sum /
round-before-exp transcendental discipline) and the weekly two-step
funnel trend (operators/funnel.py ``funnel_weekly`` — first-step
min-struct cohorting, strict (ts, id) after-ordering, portable Monday
anchor).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from grass_spark.operators.funnel import funnel_weekly
from grass_spark.operators.stats import geometric_means
from grass_spark.queries_ext import _t

EXT44_QUERIES: dict = {}
EXT44_ORACLES: dict = {}


# ---------------------------------------------------------------------
# geometric vs arithmetic means of event value per type
# ---------------------------------------------------------------------


def q_geo_means(spark, sf_dir):
    return geometric_means(
        _t(spark, sf_dir, "events"), group_col="event_type"
    )


ORACLE_GEO_MEANS = """
WITH base AS (
  SELECT event_type AS grp,
         value IS NOT NULL AND value > CAST(0 AS DOUBLE) AS pos,
         CASE WHEN value IS NOT NULL AND value > CAST(0 AS DOUBLE)
              THEN round(ln(CAST(value AS DOUBLE)), 6) END AS lnr,
         CASE WHEN value IS NOT NULL AND value > CAST(0 AS DOUBLE)
              THEN CAST(round(CAST(value AS DOUBLE)
                              * CAST(100 AS DOUBLE)) AS HUGEINT)
         END AS c
  FROM events
),
agg AS (
  SELECT grp,
         CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT)
           AS n_excluded,
         sum(lnr) AS sln,
         sum(c) AS sc
  FROM base GROUP BY 1
)
SELECT grp AS "group", n_pos, n_excluded,
       CASE WHEN n_pos > 0 THEN
         round(exp(round(sln / CAST(n_pos AS DOUBLE), 6)), 6)
       END AS geo_mean,
       CASE WHEN n_pos > 0 THEN
         round(CAST(sc AS DOUBLE)
               / (CAST(n_pos AS DOUBLE) * CAST(100 AS DOUBLE)), 6)
       END AS arith_mean
FROM agg
ORDER BY "group"
"""


# ---------------------------------------------------------------------
# weekly click -> purchase funnel trend
# ---------------------------------------------------------------------


def q_funnel_weekly(spark, sf_dir):
    return funnel_weekly(
        _t(spark, sf_dir, "events"), step1="click", step2="purchase"
    )


ORACLE_FUNNEL_WEEKLY = """
WITH s1 AS (
  SELECT user_id, min(ts) AS fts FROM events
  WHERE event_type = 'click' GROUP BY 1
),
s1b AS (
  SELECT e.user_id, s1.fts, min(e.event_id) AS fid
  FROM events e JOIN s1
    ON e.user_id = s1.user_id AND e.ts = s1.fts
  WHERE e.event_type = 'click'
  GROUP BY 1, 2
),
c AS (
  SELECT s.user_id,
         max(CASE WHEN e.ts > s.fts
                    OR (e.ts = s.fts AND e.event_id > s.fid)
                  THEN 1 ELSE 0 END) AS conv
  FROM s1b s LEFT JOIN events e
    ON e.user_id = s.user_id AND e.event_type = 'purchase'
  GROUP BY 1
),
wk AS (
  SELECT CAST(s.fts AS DATE)
           - CAST(((CAST(s.fts AS DATE) - DATE '1970-01-05') % 7 + 7) % 7
                  AS INTEGER) AS week_start,
         c.conv
  FROM s1b s JOIN c USING (user_id)
)
SELECT week_start,
       CAST(count(*) AS BIGINT) AS n_cohort,
       CAST(sum(conv) AS BIGINT) AS n_converted,
       round(CAST(sum(conv) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS cvr
FROM wk GROUP BY 1
ORDER BY week_start
"""


EXT44_QUERIES.update(
    {
        "geo_means": q_geo_means,
        "funnel_weekly": q_funnel_weekly,
    }
)
EXT44_ORACLES.update(
    {
        "geo_means": ORACLE_GEO_MEANS,
        "funnel_weekly": ORACLE_FUNNEL_WEEKLY,
    }
)
