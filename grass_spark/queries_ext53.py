"""Fifty-third wave of driver-contract queries: Kish effective sample
size per group (operators/sampling.py ``ess_report`` — (sum w)^2 /
sum w^2 from DECIMAL(38) cent power sums) and the weight-clipping
diagnostic (``clip_report`` — ESS raw vs clipped at the exact p99
threshold).  Both over event values as the importance weights.

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from grass_spark.operators.sampling import clip_report, ess_report
from grass_spark.queries_ext import _t

EXT53_QUERIES: dict = {}
EXT53_ORACLES: dict = {}


# ---------------------------------------------------------------------
# per-type ESS
# ---------------------------------------------------------------------


def q_ess_weights(spark, sf_dir):
    return ess_report(
        _t(spark, sf_dir, "events"),
        group_col="event_type",
        weight_col="value",
    )


ORACLE_ESS_WEIGHTS = """
WITH base AS (
  SELECT event_type AS g,
         value IS NOT NULL AND value > CAST(0 AS DOUBLE) AS pos,
         CASE WHEN value IS NOT NULL AND value > CAST(0 AS DOUBLE)
              THEN CAST(round(CAST(value AS DOUBLE)
                              * CAST(100 AS DOUBLE)) AS HUGEINT)
         END AS c
  FROM events
),
agg AS (
  SELECT g,
         CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n,
         CAST(sum(CASE WHEN pos THEN 0 ELSE 1 END) AS BIGINT)
           AS n_excluded,
         sum(c) AS s1, sum(c * c) AS s2
  FROM base GROUP BY 1
)
SELECT g AS "group", n, n_excluded,
       CASE WHEN n > 0 THEN
         round(CAST(s1 * s1 AS DOUBLE) / CAST(s2 AS DOUBLE), 6)
       END AS ess,
       CASE WHEN n > 0 THEN
         round(CAST(s1 * s1 AS DOUBLE) / CAST(s2 AS DOUBLE)
               / CAST(n AS DOUBLE), 6)
       END AS ess_ratio
FROM agg
ORDER BY "group"
"""


# ---------------------------------------------------------------------
# clip diagnostic at p99
# ---------------------------------------------------------------------


def q_clip_report(spark, sf_dir):
    return clip_report(
        _t(spark, sf_dir, "events"), weight_col="value", clip_prob=0.99
    )


ORACLE_CLIP_REPORT = """
WITH base AS (
  SELECT CAST(round(CAST(value AS DOUBLE) * CAST(100 AS DOUBLE))
              AS BIGINT) AS c
  FROM events
  WHERE value IS NOT NULL AND value > CAST(0 AS DOUBLE)
),
thr AS (
  SELECT round(quantile_cont(CAST(c AS DOUBLE),
                             CAST(0.99 AS DOUBLE)), 6) AS t
  FROM base
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n, max(t) AS t,
         CAST(sum(CASE WHEN CAST(c AS DOUBLE) > t THEN 1 ELSE 0 END)
              AS BIGINT) AS ncl,
         sum(CAST(c AS HUGEINT)) AS s1,
         sum(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)) AS s2,
         sum(CAST(least(c, CAST(round(t) AS BIGINT)) AS HUGEINT)) AS c1,
         sum(CAST(least(c, CAST(round(t) AS BIGINT)) AS HUGEINT)
             * CAST(least(c, CAST(round(t) AS BIGINT)) AS HUGEINT)) AS c2
  FROM base CROSS JOIN thr
)
SELECT n,
       round(t / CAST(100 AS DOUBLE), 6) AS clip_threshold,
       CASE WHEN n > 0 THEN
         round(CAST(ncl AS DOUBLE) / CAST(n AS DOUBLE), 6)
       END AS frac_clipped,
       CASE WHEN n > 0 THEN
         round(CAST(s1 * s1 AS DOUBLE) / CAST(s2 AS DOUBLE), 6)
       END AS ess_raw,
       CASE WHEN n > 0 THEN
         round(CAST(c1 * c1 AS DOUBLE) / CAST(c2 AS DOUBLE), 6)
       END AS ess_clipped
FROM agg
"""


EXT53_QUERIES.update(
    {
        "ess_weights": q_ess_weights,
        "clip_report": q_clip_report,
    }
)
EXT53_ORACLES.update(
    {
        "ess_weights": ORACLE_ESS_WEIGHTS,
        "clip_report": ORACLE_CLIP_REPORT,
    }
)
