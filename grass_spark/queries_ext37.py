"""Thirty-seventh wave of driver-contract queries: per-state occupancy
time (operators/occupancy.py — how long users collectively sit in each
event state, via the exact bucket-stitch global-order decomposition)
and Cohen's kappa inter-annotator agreement (operators/agreement.py —
chance-corrected agreement of the lang_guess heuristic vs. the lang
labels, reusing the lang_guess oracle CTE).

Both oracles follow the exact-integer discipline: micro-second sums and
marginal products stay in HUGEINT/DECIMAL(38) and every double is one
mirrored expression over exact integers, rounded to 6 dp.

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from grass_spark.operators.agreement import cohens_kappa
from grass_spark.operators.occupancy import state_occupancy
from grass_spark.queries_ext import _t
from grass_spark.queries_ext30 import _SQL_LABELED, _labeled

EXT37_QUERIES: dict = {}
EXT37_ORACLES: dict = {}


# ---------------------------------------------------------------------
# per-state occupancy time
# ---------------------------------------------------------------------


def q_state_occupancy(spark, sf_dir):
    return state_occupancy(_t(spark, sf_dir, "events"))


ORACLE_STATE_OCCUPANCY = """
WITH seq AS (
  SELECT event_type AS st,
         lead(epoch_us(ts)) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) - epoch_us(ts) AS g
  FROM events
),
cen AS (
  SELECT st, CAST(count(*) AS BIGINT) AS n_intervals,
         sum(CAST(g AS HUGEINT)) AS s
  FROM seq WHERE g IS NOT NULL
  GROUP BY 1
),
tot AS (SELECT sum(s) AS t FROM cen)
SELECT st AS state, n_intervals,
       round(CAST(s AS DOUBLE) / 1e6, 6) AS total_s,
       CASE WHEN CAST(t AS DOUBLE) > 0
            THEN round(CAST(s AS DOUBLE) / CAST(t AS DOUBLE), 6)
       END AS share
FROM cen CROSS JOIN tot
ORDER BY state
"""


# ---------------------------------------------------------------------
# Cohen's kappa: lang_guess vs. lang labels
# ---------------------------------------------------------------------


def q_kappa_lang(spark, sf_dir):
    return cohens_kappa(
        _labeled(spark, sf_dir), col_a="actual", col_b="predicted"
    )


ORACLE_KAPPA_LANG = f"""
WITH cen AS (
  SELECT actual AS a, predicted AS b, CAST(count(*) AS BIGINT) AS n
  FROM ({_SQL_LABELED})
  GROUP BY 1, 2
),
tot AS (
  SELECT CAST(sum(n) AS BIGINT) AS n_items,
         CAST(sum(CASE WHEN a = b THEN n ELSE 0 END) AS BIGINT) AS n_agree
  FROM cen
),
ra AS (SELECT a AS cls, CAST(sum(n) AS BIGINT) AS rn FROM cen GROUP BY 1),
cb AS (SELECT b AS cls, CAST(sum(n) AS BIGINT) AS cn FROM cen GROUP BY 1),
pe AS (
  SELECT sum(CAST(rn AS HUGEINT) * CAST(cn AS HUGEINT)) AS pes
  FROM ra JOIN cb USING (cls)
)
SELECT n_items, n_agree,
       round(CAST(n_agree AS DOUBLE) / CAST(n_items AS DOUBLE), 6) AS po,
       round(CAST(pes AS DOUBLE)
             / (CAST(n_items AS DOUBLE) * CAST(n_items AS DOUBLE)),
             6) AS pe,
       CASE WHEN CAST(n_items AS HUGEINT) * CAST(n_items AS HUGEINT)
                 - pes != 0
            THEN round(
              CAST(CAST(n_items AS HUGEINT) * CAST(n_agree AS HUGEINT)
                   - pes AS DOUBLE)
              / CAST(CAST(n_items AS HUGEINT) * CAST(n_items AS HUGEINT)
                     - pes AS DOUBLE), 6)
       END AS kappa
FROM tot CROSS JOIN pe
"""


EXT37_QUERIES.update(
    {
        "state_occupancy": q_state_occupancy,
        "kappa_lang": q_kappa_lang,
    }
)
EXT37_ORACLES.update(
    {
        "state_occupancy": ORACLE_STATE_OCCUPANCY,
        "kappa_lang": ORACLE_KAPPA_LANG,
    }
)
