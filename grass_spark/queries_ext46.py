"""Forty-sixth wave of driver-contract queries: quantile treatment
effects over order revenue (operators/abtest.py ``quantile_effects``
— per-arm exact type-7 quantiles over rounded values, list-indexed in
both engines) and multiplicative day-of-week seasonal indices
(operators/seasonal.py ``dow_index`` — zero-densified daily census,
exact-cent cross-product index composition, portable Monday anchor).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.abtest import assign_variant, quantile_effects
from grass_spark.operators.seasonal import dow_index
from grass_spark.queries_ext import _t

EXT46_QUERIES: dict = {}
EXT46_ORACLES: dict = {}

_QTE_PROBS = (0.1, 0.25, 0.5, 0.75, 0.9)


# ---------------------------------------------------------------------
# quantile treatment effects
# ---------------------------------------------------------------------


def q_quantile_effects(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        assign_variant("o_custkey", salt="qte").alias("g"),
        F.col("o_totalprice").alias("value"),
    )
    return quantile_effects(
        o, group_col="g", value_col="value", treat="B", probs=_QTE_PROBS
    )


_QL = ", ".join(f"CAST({p} AS DOUBLE)" for p in _QTE_PROBS)
_SPINE = ", ".join(
    f"({i + 1}, CAST({p} AS DOUBLE))" for i, p in enumerate(_QTE_PROBS)
)

ORACLE_QUANTILE_EFFECTS = f"""
WITH base AS (
  SELECT CAST('0x' || substr(
               md5('qte:' || CAST(o_custkey AS VARCHAR)), 1, 8)
             AS UBIGINT) / CAST(4294967296 AS DOUBLE)
             < CAST('0.5' AS DOUBLE) AS t,
         round(CAST(o_totalprice AS DOUBLE), 6) AS v
  FROM orders WHERE o_totalprice IS NOT NULL
),
qs AS (
  SELECT t, quantile_cont(v, [{_QL}]) AS ql FROM base GROUP BY 1
),
spine AS (SELECT * FROM (VALUES {_SPINE}) s(i, p)),
x AS (
  SELECT p,
         max(CASE WHEN t THEN round(ql[i], 6) END) AS q_treat,
         max(CASE WHEN NOT t THEN round(ql[i], 6) END) AS q_ctrl
  FROM spine CROSS JOIN qs GROUP BY 1
)
SELECT p, q_treat, q_ctrl,
       round(q_treat - q_ctrl, 6) AS qte
FROM x ORDER BY p
"""


# ---------------------------------------------------------------------
# day-of-week revenue seasonality
# ---------------------------------------------------------------------


def q_dow_index(spark, sf_dir):
    return dow_index(
        _t(spark, sf_dir, "orders"),
        ts_col="o_orderdate",
        value_col="o_totalprice",
    )


ORACLE_DOW_INDEX = """
WITH cen AS (
  SELECT CAST(o_orderdate AS DATE) AS d,
         CAST(sum(CAST(round(o_totalprice * CAST(100 AS DOUBLE))
                       AS BIGINT)) AS BIGINT) AS s
  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1
),
b AS (SELECT min(d) AS lo, max(d) AS hi FROM cen),
grid AS (
  SELECT g.day, CAST(coalesce(cen.s, 0) AS BIGINT) AS s
  FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE
          AS day FROM b) g
  LEFT JOIN cen ON g.day = cen.d
),
pd AS (
  SELECT CAST(((day - DATE '1970-01-05') % 7 + 7) % 7 AS INTEGER) AS dow,
         CAST(count(*) AS BIGINT) AS n_days,
         CAST(sum(s) AS BIGINT) AS ds
  FROM grid GROUP BY 1
),
tot AS (
  SELECT CAST(sum(n_days) AS BIGINT) AS nd,
         CAST(sum(ds) AS BIGINT) AS ts
  FROM pd
)
SELECT dow, n_days,
       round(CAST(ds AS DOUBLE)
             / (CAST(n_days AS DOUBLE) * CAST(100 AS DOUBLE)), 6)
         AS day_value_mean,
       CASE WHEN ts > 0 THEN
         round(CAST(CAST(ds AS HUGEINT) * CAST(nd AS HUGEINT) AS DOUBLE)
               / CAST(CAST(n_days AS HUGEINT) * CAST(ts AS HUGEINT)
                      AS DOUBLE), 6)
       END AS index
FROM pd CROSS JOIN tot
ORDER BY dow
"""


EXT46_QUERIES.update(
    {
        "quantile_effects": q_quantile_effects,
        "dow_index": q_dow_index,
    }
)
EXT46_ORACLES.update(
    {
        "quantile_effects": ORACLE_QUANTILE_EFFECTS,
        "dow_index": ORACLE_DOW_INDEX,
    }
)
