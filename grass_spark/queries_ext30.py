"""Thirtieth wave of driver-contract queries: multiclass evaluation
(operators/mleval.py confusion_matrix / class_metrics — grading the
lang_guess heuristic against the lang labels, reusing the lang_guess
oracle verbatim as a CTE) and cohort lifetime-value curves
(operators/ltv.py).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.ltv import cohort_ltv
from grass_spark.operators.mleval import class_metrics, confusion_matrix
from grass_spark.queries import ORACLE_LANG_GUESS, q_lang_guess
from grass_spark.queries_ext import _t

EXT30_QUERIES: dict = {}
EXT30_ORACLES: dict = {}


def _labeled(spark, sf_dir):
    preds = q_lang_guess(spark, sf_dir).select("doc_id", "lang_guess")
    docs = _t(spark, sf_dir, "documents").select("doc_id", "lang")
    return preds.join(docs, "doc_id").select(
        F.col("lang").alias("actual"),
        F.col("lang_guess").alias("predicted"),
    )


_SQL_LABELED = f"""
  SELECT d.lang AS actual, g.lang_guess AS predicted
  FROM ({ORACLE_LANG_GUESS}) g
  JOIN documents d USING (doc_id)
  WHERE d.lang IS NOT NULL AND g.lang_guess IS NOT NULL
"""


# ---------------------------------------------------------------------
# confusion census
# ---------------------------------------------------------------------


def q_lang_confusion(spark, sf_dir):
    return confusion_matrix(_labeled(spark, sf_dir)).orderBy(
        "actual", "predicted"
    )


ORACLE_LANG_CONFUSION = f"""
SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n
FROM ({_SQL_LABELED})
GROUP BY actual, predicted
ORDER BY actual, predicted
"""


# ---------------------------------------------------------------------
# per-class one-vs-rest metrics
# ---------------------------------------------------------------------


def q_lang_class_metrics(spark, sf_dir):
    return class_metrics(_labeled(spark, sf_dir)).orderBy("class")


ORACLE_LANG_CLASS_METRICS = f"""
WITH cen AS (
  SELECT actual, predicted, CAST(count(*) AS BIGINT) AS n
  FROM ({_SQL_LABELED})
  GROUP BY actual, predicted
),
ba AS (
  SELECT actual AS class, CAST(sum(n) AS BIGINT) AS n_actual
  FROM cen GROUP BY 1
),
bp AS (
  SELECT predicted AS class, CAST(sum(n) AS BIGINT) AS n_predicted
  FROM cen GROUP BY 1
),
tps AS (SELECT actual AS class, n AS tp FROM cen WHERE actual = predicted),
base AS (
  SELECT class,
         CAST(coalesce(n_actual, 0) AS BIGINT) AS n_actual,
         CAST(coalesce(n_predicted, 0) AS BIGINT) AS n_predicted,
         CAST(coalesce(tp, 0) AS BIGINT) AS tp
  FROM ba FULL OUTER JOIN bp USING (class) LEFT JOIN tps USING (class)
),
pr AS (
  SELECT *,
         CASE WHEN n_predicted > 0 THEN
           round(CAST(tp AS DOUBLE) / CAST(n_predicted AS DOUBLE), 6)
         END AS precision,
         CASE WHEN n_actual > 0 THEN
           round(CAST(tp AS DOUBLE) / CAST(n_actual AS DOUBLE), 6)
         END AS recall
  FROM base
)
SELECT class, n_actual, n_predicted, tp, precision, recall,
       CASE WHEN precision IS NOT NULL AND recall IS NOT NULL
             AND precision + recall > 0 THEN
         round(CAST(2 AS DOUBLE) * precision * recall
               / (precision + recall), 6)
       END AS f1
FROM pr
ORDER BY class
"""


# ---------------------------------------------------------------------
# cohort LTV curves
# ---------------------------------------------------------------------


def q_cohort_ltv(spark, sf_dir):
    return cohort_ltv(_t(spark, sf_dir, "events")).orderBy(
        "cohort", "age"
    )


ORACLE_COHORT_LTV = """
WITH ev AS (
  SELECT user_id AS u, CAST(ts AS DATE) AS d,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events
),
fst AS (SELECT u, min(d) AS cohort FROM ev GROUP BY 1),
sizes AS (
  SELECT cohort, CAST(count(*) AS BIGINT) AS n_cohort_users
  FROM fst GROUP BY 1
),
pa AS (
  SELECT cohort, CAST(d - cohort AS INT) AS age,
         CAST(count(DISTINCT u) AS BIGINT) AS n_active_users,
         sum(CAST(c AS HUGEINT)) AS dc
  FROM ev JOIN fst USING (u) GROUP BY 1, 2
),
cum AS (
  SELECT *,
         sum(dc) OVER (PARTITION BY cohort ORDER BY age
                       ROWS BETWEEN UNBOUNDED PRECEDING
                       AND CURRENT ROW) AS cm
  FROM pa
)
SELECT cohort, age, n_cohort_users, n_active_users,
       round(CAST(dc AS DOUBLE) / CAST(100 AS DOUBLE), 6) AS day_value,
       round(CAST(cm AS DOUBLE) / CAST(100 AS DOUBLE), 6) AS cum_value,
       round(CAST(cm AS DOUBLE)
             / (CAST(n_cohort_users AS DOUBLE) * CAST(100 AS DOUBLE)),
             6) AS ltv_per_user
FROM cum JOIN sizes USING (cohort)
ORDER BY cohort, age
"""


EXT30_QUERIES.update(
    {
        "lang_confusion": q_lang_confusion,
        "lang_class_metrics": q_lang_class_metrics,
        "cohort_ltv": q_cohort_ltv,
    }
)
EXT30_ORACLES.update(
    {
        "lang_confusion": ORACLE_LANG_CONFUSION,
        "lang_class_metrics": ORACLE_LANG_CLASS_METRICS,
        "cohort_ltv": ORACLE_COHORT_LTV,
    }
)
