"""Thirty-second wave of driver-contract queries: revenue
concentration (operators/pareto.py — ABC/Pareto classes and the Gini
coefficient over per-customer order totals, both on the bucketed
distributed prefix-sum machinery).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from grass_spark.operators.pareto import abc_analysis, gini_coefficient
from grass_spark.queries_ext import _t

EXT32_QUERIES: dict = {}
EXT32_ORACLES: dict = {}

_SQL_CENSUS = """
pk AS (
  SELECT o_custkey AS k,
         sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT))
           AS v
  FROM orders GROUP BY 1
),
vcen AS (
  SELECT v, CAST(count(*) AS BIGINT) AS n, v * count(*) AS s
  FROM pk GROUP BY 1
),
p AS (
  SELECT *,
         coalesce(sum(s) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED
                               PRECEDING AND 1 PRECEDING),
                  CAST(0 AS HUGEINT)) AS prev_s
  FROM vcen
),
tot AS (SELECT CAST(sum(n) AS BIGINT) AS tn, sum(s) AS ts FROM vcen)
"""


def q_abc_customers(spark, sf_dir):
    return abc_analysis(
        _t(spark, sf_dir, "orders"),
        key_col="o_custkey",
        value_col="o_totalprice",
    )


ORACLE_ABC_CUSTOMERS = f"""
WITH {_SQL_CENSUS},
classed AS (
  SELECT n, s, ts,
         CASE WHEN round(CAST(ts - prev_s AS DOUBLE)
                         / CAST(ts AS DOUBLE), 6)
                   <= CAST('0.8' AS DOUBLE) THEN 'A'
              WHEN round(CAST(ts - prev_s AS DOUBLE)
                         / CAST(ts AS DOUBLE), 6)
                   <= CAST('0.95' AS DOUBLE) THEN 'B'
              ELSE 'C' END AS abc_class
  FROM p CROSS JOIN tot
)
SELECT abc_class, CAST(sum(n) AS BIGINT) AS n_keys,
       round(CAST(sum(s) AS DOUBLE) / CAST(100 AS DOUBLE), 6)
         AS value_sum,
       round(CAST(sum(s) AS DOUBLE) / CAST(max(ts) AS DOUBLE), 6)
         AS value_share
FROM classed GROUP BY abc_class
ORDER BY abc_class
"""


def q_gini_customers(spark, sf_dir):
    return gini_coefficient(
        _t(spark, sf_dir, "orders"),
        key_col="o_custkey",
        value_col="o_totalprice",
    )


ORACLE_GINI_CUSTOMERS = f"""
WITH {_SQL_CENSUS},
agg AS (
  SELECT CAST(sum(n) AS BIGINT) AS tn, sum(s) AS ts,
         sum(CAST(n AS HUGEINT)
             * (CAST(2 AS HUGEINT) * prev_s + s)) AS trap
  FROM p
)
SELECT tn AS n_keys,
       round(CAST(ts AS DOUBLE) / CAST(100 AS DOUBLE), 6)
         AS total_value,
       CASE WHEN ts > 0 THEN
         round(CAST(1 AS DOUBLE)
               - CAST(trap AS DOUBLE)
                 / (CAST(tn AS DOUBLE) * CAST(ts AS DOUBLE)), 6)
       END AS gini
FROM agg
"""


EXT32_QUERIES.update(
    {"abc_customers": q_abc_customers, "gini_customers": q_gini_customers}
)
EXT32_ORACLES.update(
    {
        "abc_customers": ORACLE_ABC_CUSTOMERS,
        "gini_customers": ORACLE_GINI_CUSTOMERS,
    }
)
