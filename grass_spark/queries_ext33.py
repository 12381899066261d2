"""Thirty-third wave of driver-contract queries: quasi-experimental
measurement (operators/abtest.py — difference-in-differences point
estimate and CUPED variance-reduced variant means over order revenue).

Both queries synthesise the experiment frame from ``orders``:
deterministic md5 hash-bucket assignment on ``o_custkey`` (the shared
portable-uniform recipe) and a calendar pre/post split at 1998-01-01 (testdata order
dates span 1995..2001, median ~1998-04 — both periods populated at
every SF).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.abtest import (
    assign_variant,
    cuped_means,
    did_estimate,
)
from grass_spark.queries_ext import _t

EXT33_QUERIES: dict = {}
EXT33_ORACLES: dict = {}

_SPLIT = "1998-01-01"

# Shared SQL fragment: assignment + period + exact cents, mirroring
# the Spark-side projection below (salt comes in via format).
_SQL_BASE = """
base AS (
  SELECT CASE WHEN CAST('0x' || substr(
                     md5('{salt}:' || CAST(o_custkey AS VARCHAR)), 1, 8)
                   AS UBIGINT) / CAST(4294967296 AS DOUBLE)
                   < CAST('0.5' AS DOUBLE)
              THEN 'B' ELSE 'A' END AS g,
         CASE WHEN o_orderdate < TIMESTAMP '{split}'
              THEN 1 ELSE 0 END AS ispre,
         o_custkey AS u,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders WHERE o_totalprice IS NOT NULL
)
"""


def _exp_frame(spark, sf_dir, salt):
    o = _t(spark, sf_dir, "orders")
    return o.select(
        F.col("o_custkey").alias("u"),
        assign_variant("o_custkey", salt=salt).alias("g"),
        F.when(
            F.col("o_orderdate") < F.expr(f"TIMESTAMP_NTZ '{_SPLIT}'"),
            F.lit("pre"),
        ).otherwise(F.lit("post")).alias("period"),
        F.col("o_totalprice").alias("value"),
    )


def q_did_orders(spark, sf_dir):
    return did_estimate(
        _exp_frame(spark, sf_dir, "did"),
        group_col="g",
        period_col="period",
        value_col="value",
        treat="B",
        pre="pre",
    )


ORACLE_DID_ORDERS = f"""
WITH {_SQL_BASE.format(salt="did", split=_SPLIT)},
a AS (
  SELECT
    CAST(sum(CASE WHEN g = 'B' AND ispre = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_tq,
    CAST(sum(CASE WHEN g = 'B' AND ispre = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_tp,
    CAST(sum(CASE WHEN g = 'A' AND ispre = 1 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_cq,
    CAST(sum(CASE WHEN g = 'A' AND ispre = 0 THEN 1 ELSE 0 END)
         AS BIGINT) AS n_cp,
    sum(CAST(CASE WHEN g = 'B' AND ispre = 1 THEN c ELSE 0 END
             AS HUGEINT)) AS s_tq,
    sum(CAST(CASE WHEN g = 'B' AND ispre = 0 THEN c ELSE 0 END
             AS HUGEINT)) AS s_tp,
    sum(CAST(CASE WHEN g = 'A' AND ispre = 1 THEN c ELSE 0 END
             AS HUGEINT)) AS s_cq,
    sum(CAST(CASE WHEN g = 'A' AND ispre = 0 THEN c ELSE 0 END
             AS HUGEINT)) AS s_cp
  FROM base
),
b AS (
  SELECT *,
    CASE WHEN n_tq > 0 THEN CAST(s_tq AS DOUBLE)
         / (CAST(n_tq AS DOUBLE) * CAST(100 AS DOUBLE)) END AS m_tq,
    CASE WHEN n_tp > 0 THEN CAST(s_tp AS DOUBLE)
         / (CAST(n_tp AS DOUBLE) * CAST(100 AS DOUBLE)) END AS m_tp,
    CASE WHEN n_cq > 0 THEN CAST(s_cq AS DOUBLE)
         / (CAST(n_cq AS DOUBLE) * CAST(100 AS DOUBLE)) END AS m_cq,
    CASE WHEN n_cp > 0 THEN CAST(s_cp AS DOUBLE)
         / (CAST(n_cp AS DOUBLE) * CAST(100 AS DOUBLE)) END AS m_cp
  FROM a
)
SELECT n_tq AS n_treat_pre, n_tp AS n_treat_post,
       n_cq AS n_ctrl_pre, n_cp AS n_ctrl_post,
       round(m_tq, 6) AS mean_treat_pre,
       round(m_tp, 6) AS mean_treat_post,
       round(m_cq, 6) AS mean_ctrl_pre,
       round(m_cp, 6) AS mean_ctrl_post,
       round((m_tp - m_tq) - (m_cp - m_cq), 6) AS did
FROM b
"""


def q_cuped_orders(spark, sf_dir):
    return cuped_means(
        _exp_frame(spark, sf_dir, "cuped"),
        user_col="u",
        group_col="g",
        period_col="period",
        value_col="value",
        pre="pre",
    )


ORACLE_CUPED_ORDERS = f"""
WITH {_SQL_BASE.format(salt="cuped", split=_SPLIT)},
pu AS (
  SELECT u, max(g) AS g,
         sum(CAST(CASE WHEN ispre = 1 THEN c ELSE 0 END
                  AS HUGEINT)) AS x,
         sum(CAST(CASE WHEN ispre = 0 THEN c ELSE 0 END
                  AS HUGEINT)) AS y
  FROM base GROUP BY 1
),
pw AS (
  SELECT CAST(count(*) AS BIGINT) AS n, sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx, sum(x * y) AS sxy
  FROM pu
),
par AS (
  SELECT CASE WHEN CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)
                   > CAST(0 AS DOUBLE)
              THEN round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                          - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                         / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                            - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)),
                         6) END AS theta,
         round(CAST(sx AS DOUBLE)
               / (CAST(n AS DOUBLE) * CAST(100 AS DOUBLE)), 6) AS mx
  FROM pw
),
gv AS (
  SELECT g AS variant, CAST(count(*) AS BIGINT) AS n_users,
         sum(x) AS gx, sum(y) AS gy
  FROM pu GROUP BY 1
),
st AS (
  SELECT variant, n_users, theta, mx,
         CAST(gy AS DOUBLE)
           / (CAST(n_users AS DOUBLE) * CAST(100 AS DOUBLE)) AS my,
         CAST(gx AS DOUBLE)
           / (CAST(n_users AS DOUBLE) * CAST(100 AS DOUBLE)) AS mxg
  FROM gv CROSS JOIN par
)
SELECT variant, n_users,
       round(my, 6) AS mean_post,
       round(CASE WHEN theta IS NOT NULL
                  THEN my - theta * (mxg - mx)
                  ELSE my END, 6) AS mean_post_adj,
       theta
FROM st
ORDER BY variant
"""


EXT33_QUERIES.update(
    {"did_orders": q_did_orders, "cuped_orders": q_cuped_orders}
)
EXT33_ORACLES.update(
    {
        "did_orders": ORACLE_DID_ORDERS,
        "cuped_orders": ORACLE_CUPED_ORDERS,
    }
)
