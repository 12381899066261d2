"""Nineteenth wave of driver-contract queries: rank correlation
(operators/stats.py), PSI distribution drift (operators/divergence.py),
gaps-and-islands activity streaks (operators/engagement.py), and the
Benford first-digit QC screen (operators/stats.py).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.divergence import psi_bins
from grass_spark.operators.engagement import user_streaks
from grass_spark.operators.stats import benford_digits, spearman_corr
from grass_spark.queries_ext import _t

EXT19_QUERIES: dict = {}
EXT19_ORACLES: dict = {}


# portable day-of-week (0 = Monday) — the CLAUDE.md pmod anchor
def _dow(col):
    return F.pmod(
        F.datediff(col.cast("date"), F.lit("1970-01-05").cast("date")),
        F.lit(7),
    )


# ---------------------------------------------------------------------
# Spearman rank correlation: hour-of-day vs event value (tie-stress —
# only 24 distinct x values)
# ---------------------------------------------------------------------


def q_spearman(spark, sf_dir):
    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("ts").isNotNull())
        .select(
            F.hour("ts").cast("long").alias("x"),
            F.col("value").alias("y"),
        )
    )
    return spearman_corr(ev, "x", "y")


ORACLE_SPEARMAN = """
WITH base AS (
  SELECT CAST(hour(ts) AS BIGINT) AS x, value AS y
  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
),
cx AS (SELECT x, count(*) AS c FROM base GROUP BY 1),
rx AS (
  SELECT x,
         2 * coalesce(sum(c) OVER (
           ORDER BY x ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) + c + 1 AS r2x
  FROM cx
),
cy AS (SELECT y, count(*) AS c FROM base GROUP BY 1),
ry AS (
  SELECT y,
         2 * coalesce(sum(c) OVER (
           ORDER BY y ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) + c + 1 AS r2y
  FROM cy
),
rk AS (
  SELECT CAST(r2x AS HUGEINT) AS r2x, CAST(r2y AS HUGEINT) AS r2y
  FROM base JOIN rx USING (x) JOIN ry USING (y)
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(r2x) AS DOUBLE) AS sx,
         CAST(sum(r2y) AS DOUBLE) AS sy,
         CAST(sum(r2x * r2x) AS DOUBLE) AS sxx,
         CAST(sum(r2y * r2y) AS DOUBLE) AS syy,
         CAST(sum(r2x * r2y) AS DOUBLE) AS sxy
  FROM rk
)
SELECT n,
       CASE WHEN CAST(n AS DOUBLE) * sxx - sx * sx > 0
             AND CAST(n AS DOUBLE) * syy - sy * sy > 0
       THEN round((CAST(n AS DOUBLE) * sxy - sx * sy)
                  / sqrt((CAST(n AS DOUBLE) * sxx - sx * sx)
                         * (CAST(n AS DOUBLE) * syy - sy * sy)), 6)
       END AS rho
FROM agg
"""

EXT19_QUERIES["spearman_corr"] = q_spearman
EXT19_ORACLES["spearman_corr"] = ORACLE_SPEARMAN


# ---------------------------------------------------------------------
# PSI drift: weekday vs weekend event-value distributions, 10
# reference-quantile buckets
# ---------------------------------------------------------------------


def q_psi_drift(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").where(
        F.col("value").isNotNull() & F.col("ts").isNotNull()
    )
    ref = ev.where(_dow(F.col("ts")) < 5).select("value")
    cur = ev.where(_dow(F.col("ts")) >= 5).select("value")
    return psi_bins(ref, cur, value_col="value", n_bins=10)


ORACLE_PSI_DRIFT = """
WITH ev AS (
  SELECT value AS v,
         ((CAST(ts AS DATE) - DATE '1970-01-05') % 7 + 7) % 7 AS dw
  FROM events WHERE value IS NOT NULL AND ts IS NOT NULL
),
cr AS (SELECT v, count(*) AS cr FROM ev WHERE dw < 5 GROUP BY 1),
cc AS (SELECT v, count(*) AS cc FROM ev WHERE dw >= 5 GROUP BY 1),
j AS (
  SELECT v, coalesce(cr, 0) AS cr, coalesce(cc, 0) AS cc
  FROM cr FULL OUTER JOIN cc USING (v)
),
st AS (
  SELECT cr, cc,
         coalesce(sum(cr) OVER (
           ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS prev,
         sum(cr) OVER () AS nref, sum(cc) OVER () AS ncur
  FROM j
),
bk AS (
  SELECT CAST(least(9, (10 * prev) // nref) AS INT) AS bucket,
         cr, cc, nref, ncur
  FROM st
),
bins AS (
  SELECT bucket, sum(cr) AS ref_n, sum(cc) AS cur_n,
         max(nref) AS nref, max(ncur) AS ncur
  FROM bk GROUP BY 1
),
tot AS (SELECT max(nref) AS nref, max(ncur) AS ncur FROM bins),
grid AS (
  SELECT CAST(unnest(generate_series(0, 9)) AS INT) AS bucket,
         nref, ncur
  FROM tot
),
dense AS (
  SELECT g.bucket, coalesce(b.ref_n, 0) AS ref_n,
         coalesce(b.cur_n, 0) AS cur_n, g.nref, g.ncur
  FROM grid g LEFT JOIN bins b USING (bucket)
)
SELECT bucket, CAST(ref_n AS BIGINT) AS ref_n,
       CAST(cur_n AS BIGINT) AS cur_n,
       round((CAST(ref_n AS DOUBLE) + 0.5)
             / (CAST(nref AS DOUBLE) + 5.0), 6) AS ref_frac,
       round((CAST(cur_n AS DOUBLE) + 0.5)
             / (CAST(ncur AS DOUBLE) + 5.0), 6) AS cur_frac,
       round(((CAST(cur_n AS DOUBLE) + 0.5)
                / (CAST(ncur AS DOUBLE) + 5.0)
              - (CAST(ref_n AS DOUBLE) + 0.5)
                / (CAST(nref AS DOUBLE) + 5.0))
             * ln(((CAST(cur_n AS DOUBLE) + 0.5)
                     / (CAST(ncur AS DOUBLE) + 5.0))
                  / ((CAST(ref_n AS DOUBLE) + 0.5)
                     / (CAST(nref AS DOUBLE) + 5.0))), 6) AS psi_term
FROM dense ORDER BY bucket
"""

EXT19_QUERIES["psi_drift"] = q_psi_drift
EXT19_ORACLES["psi_drift"] = ORACLE_PSI_DRIFT


# ---------------------------------------------------------------------
# gaps-and-islands: per-user consecutive-day activity streaks
# ---------------------------------------------------------------------


def q_user_streaks(spark, sf_dir):
    return user_streaks(_t(spark, sf_dir, "events"))


ORACLE_USER_STREAKS = """
WITH ud AS (
  SELECT DISTINCT user_id AS u, CAST(ts AS DATE) AS day FROM events
),
rn AS (
  SELECT u, day,
         CAST(row_number() OVER (PARTITION BY u ORDER BY day) AS INT)
           AS rn
  FROM ud
),
runs AS (
  SELECT u, day - rn AS anchor, count(*) AS len,
         min(day) AS s, max(day) AS e
  FROM rn GROUP BY 1, 2
),
agg AS (
  SELECT u, CAST(sum(len) AS BIGINT) AS n_active_days,
         CAST(count(*) AS BIGINT) AS n_streaks,
         max(len) AS lmax,
         CAST(arg_max(len, e) AS BIGINT) AS last_streak,
         max(e) AS last_day
  FROM runs GROUP BY 1
),
ls AS (
  SELECT r.u, min(r.s) AS longest_start
  FROM runs r JOIN agg a ON r.u = a.u AND r.len = a.lmax
  GROUP BY 1
)
SELECT a.u AS user_id, n_active_days, n_streaks,
       CAST(lmax AS BIGINT) AS longest_streak, longest_start,
       last_streak, last_day
FROM agg a JOIN ls ON a.u = ls.u
ORDER BY user_id
"""

EXT19_QUERIES["user_streaks"] = q_user_streaks
EXT19_ORACLES["user_streaks"] = ORACLE_USER_STREAKS


# ---------------------------------------------------------------------
# Benford first-digit screen over event values
# ---------------------------------------------------------------------


def q_benford(spark, sf_dir):
    return benford_digits(_t(spark, sf_dir, "events"), value_col="value")


ORACLE_BENFORD = """
WITH c AS (
  SELECT CAST(round(abs(value) * 100) AS BIGINT) AS cents
  FROM events WHERE value IS NOT NULL
),
d AS (
  SELECT CAST(substr(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit
  FROM c WHERE cents > 0
),
cen AS (SELECT digit, CAST(count(*) AS BIGINT) AS n FROM d GROUP BY 1),
t AS (SELECT digit, n, sum(n) OVER () AS tot FROM cen)
SELECT digit, n,
       round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6) AS p_obs,
       round(log10(CAST(1 AS DOUBLE)
                   + CAST(1 AS DOUBLE) / CAST(digit AS DOUBLE)), 6)
         AS p_benford,
       round(abs(round(CAST(n AS DOUBLE) / CAST(tot AS DOUBLE), 6)
                 - round(log10(CAST(1 AS DOUBLE)
                               + CAST(1 AS DOUBLE)
                                 / CAST(digit AS DOUBLE)), 6)), 6)
         AS abs_dev
FROM t ORDER BY digit
"""

EXT19_QUERIES["benford_digits"] = q_benford
EXT19_ORACLES["benford_digits"] = ORACLE_BENFORD
