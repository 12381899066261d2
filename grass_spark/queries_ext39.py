"""Thirty-ninth wave of driver-contract queries: cumulative-gains /
lift table (operators/mleval.py ``gains_table`` — decile bands from
exact type-7 quantile thresholds; here grading how well document
length predicts the English label) and per-variant Wilson conversion
intervals (operators/abtest.py ``conversion_ci`` — the binomial CI
that stays inside [0, 1]; z ships as a fixed 6-dp literal in plan and
oracle alike).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.abtest import conversion_ci
from grass_spark.operators.mleval import gains_table
from grass_spark.queries_ext import _t

EXT39_QUERIES: dict = {}
EXT39_ORACLES: dict = {}


# ---------------------------------------------------------------------
# gains/lift deciles: does length predict the 'en' label?
# ---------------------------------------------------------------------


def q_gains_table(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select(
        F.col("n_chars").cast("double").alias("score"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )
    return gains_table(d, n_buckets=10)


_FRACS = ", ".join(str(i / 10) for i in range(1, 10))

ORACLE_GAINS_TABLE = f"""
WITH base AS (
  SELECT round(CAST(n_chars AS DOUBLE), 6) AS sc,
         CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS pos
  FROM documents WHERE n_chars IS NOT NULL
),
thr AS (
  SELECT list_transform(quantile_cont(sc, [{_FRACS}]),
                        t -> round(t, 6)) AS th
  FROM base
),
banded AS (
  SELECT CAST(10 - len(list_filter(th, t -> sc > t)) AS INTEGER) AS band,
         pos
  FROM base CROSS JOIN thr
),
cen AS (
  SELECT band, CAST(count(*) AS BIGINT) AS n,
         CAST(sum(pos) AS BIGINT) AS n_pos
  FROM banded GROUP BY 1
),
cum AS (
  SELECT *,
         CAST(sum(n) OVER (ORDER BY band) AS BIGINT) AS cn,
         CAST(sum(n_pos) OVER (ORDER BY band) AS BIGINT) AS cp,
         CAST(sum(n) OVER () AS BIGINT) AS tn,
         CAST(sum(n_pos) OVER () AS BIGINT) AS tp
  FROM cen
)
SELECT band, n, n_pos,
       round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS pos_rate,
       CASE WHEN tp > 0 THEN
         round(CAST(cp AS DOUBLE) / CAST(tp AS DOUBLE), 6)
       END AS cum_capture,
       CASE WHEN tp > 0 AND cn > 0 THEN
         round(CAST(CAST(cp AS HUGEINT) * CAST(tn AS HUGEINT) AS DOUBLE)
               / CAST(CAST(cn AS HUGEINT) * CAST(tp AS HUGEINT) AS DOUBLE),
               6)
       END AS cum_lift
FROM cum
ORDER BY band
"""


# ---------------------------------------------------------------------
# Wilson conversion intervals per variant
# ---------------------------------------------------------------------


def q_conversion_ci(spark, sf_dir):
    return conversion_ci(_t(spark, sf_dir, "events"))


ORACLE_CONVERSION_CI = """
WITH pu AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1
),
v AS (
  SELECT conv,
         CASE WHEN CAST('0x' || substr(
                      md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8)
                    AS UBIGINT) / CAST(4294967296 AS DOUBLE)
                    < CAST('0.5' AS DOUBLE)
              THEN 'B' ELSE 'A' END AS variant
  FROM pu
),
cen AS (
  SELECT variant, CAST(count(*) AS BIGINT) AS n_users,
         CAST(sum(conv) AS BIGINT) AS n_conv
  FROM v GROUP BY 1
),
e AS (
  SELECT variant, n_users, n_conv,
         CAST(1.959964 AS DOUBLE) AS z,
         CAST(n_users AS DOUBLE) AS n,
         CAST(n_conv AS DOUBLE) / CAST(n_users AS DOUBLE) AS p
  FROM cen
),
f AS (
  SELECT *,
         CAST(1 AS DOUBLE) + z * z / n AS denom,
         (p + z * z / (CAST(2 AS DOUBLE) * n)) AS cnum,
         z * sqrt(p * (CAST(1 AS DOUBLE) - p) / n
                  + z * z / (CAST(4 AS DOUBLE) * n * n)) AS hnum
  FROM e
)
SELECT variant, n_users, n_conv,
       CASE WHEN n_users > 0 THEN round(p, 6) END AS rate,
       CASE WHEN n_users > 0 THEN
         round(cnum / denom - hnum / denom, 6)
       END AS ci_lo,
       CASE WHEN n_users > 0 THEN
         round(cnum / denom + hnum / denom, 6)
       END AS ci_hi
FROM f
ORDER BY variant
"""


EXT39_QUERIES.update(
    {
        "gains_table": q_gains_table,
        "conversion_ci": q_conversion_ci,
    }
)
EXT39_ORACLES.update(
    {
        "gains_table": ORACLE_GAINS_TABLE,
        "conversion_ci": ORACLE_CONVERSION_CI,
    }
)
