"""Seventeenth wave of driver-contract queries: census-exact classical
tests (operators/stats.py) — chi-square independence of event_type ×
day-of-week, and a Mann-Whitney U location test between two event
halves.

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.stats import chi_square, mann_whitney
from grass_spark.queries_ext import _t

EXT17_QUERIES: dict = {}
EXT17_ORACLES: dict = {}


# ---------------------------------------------------------------------
# chi-square independence: event_type x portable day-of-week
# ---------------------------------------------------------------------


def q_chi_square(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.pmod(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-05").cast("date")),
            F.lit(7),
        ).alias("dow"),
    )
    return chi_square(ev, "event_type", "dow")


ORACLE_CHI_SQUARE = """
WITH base AS (
  SELECT event_type AS a,
         CAST(((CAST(ts AS DATE) - DATE '1970-01-05') % 7 + 7) % 7 AS INT)
           AS b
  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
),
cen AS (SELECT a, b, count(*) AS o FROM base GROUP BY 1, 2),
ma AS (SELECT a, sum(o) AS na FROM cen GROUP BY 1),
mb AS (SELECT b, sum(o) AS nb FROM cen GROUP BY 1),
tot AS (SELECT sum(o) AS n FROM cen),
grid AS (
  SELECT ma.a, mb.b, ma.na, mb.nb, coalesce(cen.o, 0) AS o, tot.n
  FROM ma CROSS JOIN mb
  LEFT JOIN cen ON cen.a = ma.a AND cen.b = mb.b
  CROSS JOIN tot
),
terms AS (
  SELECT n, a, b,
         round((CAST(o AS DOUBLE)
                - (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                  / CAST(n AS DOUBLE))
               * (CAST(o AS DOUBLE)
                  - (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                    / CAST(n AS DOUBLE))
               / ((CAST(na AS DOUBLE) * CAST(nb AS DOUBLE))
                  / CAST(n AS DOUBLE)), 6) AS term
  FROM grid
),
agg AS (
  SELECT CAST(max(n) AS BIGINT) AS n,
         CAST(count(DISTINCT a) AS BIGINT) AS card_a,
         CAST(count(DISTINCT b) AS BIGINT) AS card_b,
         round(sum(term), 6) AS chi2
  FROM terms
)
SELECT n, card_a, card_b,
       CAST((card_a - 1) * (card_b - 1) AS BIGINT) AS dof, chi2,
       CASE WHEN least(card_a, card_b) - 1 > 0 THEN
         round(sqrt(chi2 / (CAST(n AS DOUBLE)
                            * CAST(least(card_a, card_b) - 1 AS DOUBLE))),
               6)
       END AS cramers_v
FROM agg
"""

EXT17_QUERIES["chi_square"] = q_chi_square
EXT17_ORACLES["chi_square"] = ORACLE_CHI_SQUARE


# ---------------------------------------------------------------------
# Mann-Whitney U: event value, even vs odd event ids
# ---------------------------------------------------------------------


def q_mann_whitney(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("event_id", "value")
    a = ev.where(F.col("event_id") % 2 == 0).select("value")
    b = ev.where(F.col("event_id") % 2 == 1).select("value")
    return mann_whitney(a, b, value_col="value")


ORACLE_MANN_WHITNEY = """
WITH va AS (
  SELECT value AS v FROM events
  WHERE event_id % 2 = 0 AND value IS NOT NULL
),
vb AS (
  SELECT value AS v FROM events
  WHERE event_id % 2 = 1 AND value IS NOT NULL
),
ca AS (SELECT v, count(*) AS ca FROM va GROUP BY 1),
cb AS (SELECT v, count(*) AS cb FROM vb GROUP BY 1),
j AS (
  SELECT v, coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
  FROM ca FULL OUTER JOIN cb USING (v)
),
st AS (
  SELECT v, ca, cb, ca + cb AS t,
         coalesce(sum(ca + cb) OVER (
           ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS prev
  FROM j
),
agg AS (
  SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
         sum(CAST(ca AS HUGEINT)
             * CAST(2 * prev + t + 1 AS HUGEINT)) AS r2a,
         sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT) * CAST(t AS HUGEINT)
             - CAST(t AS HUGEINT)) AS ties
  FROM st
),
u AS (
  SELECT n_a, n_b, ties,
         r2a - CAST(n_a AS HUGEINT) * (CAST(n_a AS HUGEINT) + 1) AS u2a
  FROM agg
),
u2 AS (
  SELECT n_a, n_b, ties, u2a,
         2 * CAST(n_a AS HUGEINT) * CAST(n_b AS HUGEINT) - u2a AS u2b
  FROM u
)
SELECT n_a, n_b,
       CAST(u2a AS DOUBLE) / CAST(2 AS DOUBLE) AS u_a,
       CAST(u2b AS DOUBLE) / CAST(2 AS DOUBLE) AS u_b,
       CASE WHEN round((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                        / CAST(12 AS DOUBLE))
                       * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
                           + CAST(1 AS DOUBLE))
                          - CAST(ties AS DOUBLE)
                            / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                               * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
                                  - CAST(1 AS DOUBLE)))), 6) > 0
       THEN round((CAST(u2a AS DOUBLE)
                   - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                  / (CAST(2 AS DOUBLE)
                     * sqrt((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                             / CAST(12 AS DOUBLE))
                            * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
                                + CAST(1 AS DOUBLE))
                               - CAST(ties AS DOUBLE)
                                 / ((CAST(n_a AS DOUBLE)
                                     + CAST(n_b AS DOUBLE))
                                    * (CAST(n_a AS DOUBLE)
                                       + CAST(n_b AS DOUBLE)
                                       - CAST(1 AS DOUBLE)))))), 6)
       END AS z
FROM u2
"""

EXT17_QUERIES["mann_whitney"] = q_mann_whitney
EXT17_ORACLES["mann_whitney"] = ORACLE_MANN_WHITNEY
