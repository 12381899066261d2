"""Fifty-first wave of driver-contract queries: exact two-sample
Kolmogorov–Smirnov length-drift test (operators/divergence.py
``ks_test`` — implemented for the drift gate since the QC wave, now
driver-exposed: English vs non-English doc lengths) and the expected
calibration error summary (operators/mleval.py ``ece_score`` over the
same scored frame as calibration_bins).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.divergence import ks_test
from grass_spark.operators.mleval import ece_score
from grass_spark.queries_ext import _t
from grass_spark.queries_ext24 import _SQL_SCORED, _scored

EXT51_QUERIES: dict = {}
EXT51_ORACLES: dict = {}


# ---------------------------------------------------------------------
# KS length drift: en vs non-en
# ---------------------------------------------------------------------


def q_ks_lengths(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    return ks_test(
        d.where(F.col("lang") == "en"),
        d.where(F.col("lang").isNotNull() & (F.col("lang") != "en")),
        value_col="n_chars",
    )


ORACLE_KS_LENGTHS = """
WITH ca AS (
  SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS ca
  FROM documents WHERE lang = 'en' GROUP BY 1
),
cb AS (
  SELECT n_chars AS v, CAST(count(*) AS BIGINT) AS cb
  FROM documents WHERE lang IS NOT NULL AND lang <> 'en' GROUP BY 1
),
j AS (
  SELECT coalesce(ca.v, cb.v) AS v,
         coalesce(ca.ca, 0) AS ca, coalesce(cb.cb, 0) AS cb
  FROM ca FULL OUTER JOIN cb ON ca.v = cb.v
),
tot AS (
  SELECT CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
  FROM j
),
c AS (
  SELECT v,
         CAST(sum(ca) OVER (ORDER BY v) AS HUGEINT) AS cuma,
         CAST(sum(cb) OVER (ORDER BY v) AS HUGEINT) AS cumb
  FROM j
),
num AS (
  SELECT v, abs(cuma * CAST(nb AS HUGEINT) - cumb * CAST(na AS HUGEINT))
           AS nm
  FROM c CROSS JOIN tot
),
mx AS (SELECT max(nm) AS m FROM num)
SELECT na AS n_a, nb AS n_b,
       round(CAST(m AS DOUBLE)
             / (CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)), 6) AS ks_stat,
       (SELECT min(v) FROM num WHERE nm = m) AS ks_at
FROM tot CROSS JOIN mx
"""


# ---------------------------------------------------------------------
# expected calibration error
# ---------------------------------------------------------------------


def q_ece_score(spark, sf_dir):
    return ece_score(_scored(spark, sf_dir), n_bins=10)


ORACLE_ECE_SCORE = f"""
WITH scored AS ({_SQL_SCORED}),
bins AS (
  SELECT CAST(least(CAST(floor(score * 10) AS INT), 9) AS INT) AS bin,
         CAST(count(*) AS BIGINT) AS n,
         round(avg(score), 6) AS mean_score,
         round(CAST(sum(label) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
           AS frac_pos
  FROM scored WHERE score IS NOT NULL AND label IS NOT NULL
  GROUP BY 1
),
agg AS (
  SELECT CAST(sum(n) AS BIGINT) AS n,
         CAST(count(*) AS BIGINT) AS n_bins_used,
         sum(round(CAST(n AS DOUBLE)
                   * abs(frac_pos - mean_score), 6)) AS tsum,
         max(round(abs(frac_pos - mean_score), 6)) AS mce
  FROM bins
)
SELECT n, n_bins_used,
       round(tsum / CAST(n AS DOUBLE), 6) AS ece,
       mce
FROM agg
"""


EXT51_QUERIES.update(
    {
        "ks_lengths": q_ks_lengths,
        "ece_score": q_ece_score,
    }
)
EXT51_ORACLES.update(
    {
        "ks_lengths": ORACLE_KS_LENGTHS,
        "ece_score": ORACLE_ECE_SCORE,
    }
)
