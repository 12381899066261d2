"""Forty-fifth wave of driver-contract queries: Hill power-law tail
index over order values (operators/stats.py ``hill_tail_index`` —
top-(k+1) order statistics via TakeOrderedAndProject, per-term rounded
log ratios) and the Brier probabilistic-forecast score
(operators/mleval.py ``brier_score`` — grading the hashed-linear
classifier's prob against the English label, classifier oracle reused
as a CTE).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.mleval import brier_score
from grass_spark.operators.stats import hill_tail_index
from grass_spark.queries_ext import _t
from grass_spark.queries_ext5 import ORACLE_CLASSIFIER, q_quality_classifier

EXT45_QUERIES: dict = {}
EXT45_ORACLES: dict = {}

_HILL_K = 100


# ---------------------------------------------------------------------
# Hill tail index of order values
# ---------------------------------------------------------------------


def q_hill_tail(spark, sf_dir):
    return hill_tail_index(
        _t(spark, sf_dir, "orders"),
        value_col="o_totalprice",
        id_col="o_orderkey",
        k=_HILL_K,
    )


ORACLE_HILL_TAIL = f"""
WITH ranked AS (
  SELECT CAST(o_totalprice AS DOUBLE) AS v, o_orderkey AS id,
         row_number() OVER (ORDER BY o_totalprice DESC, o_orderkey)
           AS rn
  FROM orders WHERE o_totalprice > 0
),
top AS (SELECT * FROM ranked WHERE rn <= {_HILL_K} + 1),
thr AS (SELECT v AS xk FROM top WHERE rn = {_HILL_K} + 1),
terms AS (
  SELECT round(ln(t.v / thr.xk), 6) AS tm, thr.xk
  FROM top t CROSS JOIN thr WHERE t.rn <= {_HILL_K}
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         round(sum(tm) / CAST({_HILL_K} AS DOUBLE), 6) AS hill,
         max(xk) AS xkv
  FROM terms
)
SELECT CASE WHEN n = {_HILL_K} THEN {_HILL_K} END AS k,
       CASE WHEN n = {_HILL_K} THEN round(xkv, 6) END AS x_threshold,
       CASE WHEN n = {_HILL_K} THEN hill END AS hill,
       CASE WHEN n = {_HILL_K} AND hill > CAST(0 AS DOUBLE) THEN
         round(CAST(1 AS DOUBLE) / hill, 6)
       END AS alpha
FROM agg
"""


# ---------------------------------------------------------------------
# Brier score of the quality classifier vs the English label
# ---------------------------------------------------------------------


def q_brier_score(spark, sf_dir):
    scored = q_quality_classifier(spark, sf_dir).select("doc_id", "prob")
    labels = _t(spark, sf_dir, "documents").select(
        "doc_id", (F.col("lang") == "en").cast("int").alias("label")
    )
    return brier_score(scored.join(labels, "doc_id"))


ORACLE_BRIER_SCORE = f"""
WITH clf AS ({ORACLE_CLASSIFIER}),
j AS (
  SELECT clf.prob AS p,
         CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS y
  FROM clf JOIN documents d USING (doc_id)
  WHERE clf.prob IS NOT NULL
),
agg AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         CAST(sum(y) AS BIGINT) AS n_pos,
         sum((p - CAST(y AS DOUBLE)) * (p - CAST(y AS DOUBLE))) AS se
  FROM j
),
e AS (
  SELECT n, n_pos,
         round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS base_rate,
         round(se / CAST(n AS DOUBLE), 6) AS brier,
         round(CAST(CAST(n_pos AS HUGEINT)
                    * (CAST(n AS HUGEINT) - CAST(n_pos AS HUGEINT))
                    AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6)
           AS brier_base
  FROM agg
)
SELECT n, n_pos, base_rate, brier, brier_base,
       CASE WHEN brier_base > CAST(0 AS DOUBLE) THEN
         round(CAST(1 AS DOUBLE) - brier / brier_base, 6)
       END AS skill
FROM e
"""


EXT45_QUERIES.update(
    {
        "hill_tail": q_hill_tail,
        "brier_score": q_brier_score,
    }
)
EXT45_ORACLES.update(
    {
        "hill_tail": ORACLE_HILL_TAIL,
        "brier_score": ORACLE_BRIER_SCORE,
    }
)
