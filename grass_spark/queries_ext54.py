"""Fifty-fourth wave of driver-contract queries: day-of-week x hour
usage heatmap with independence lift (operators/engagement.py
``heatmap_lift`` — exact cross-product lift over the <= 168-cell
census) and per-segment repeat-purchase behavior (operators/ltv.py
``repeat_orders`` — repeat rate + exact median inter-order gap).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from grass_spark.operators.engagement import heatmap_lift
from grass_spark.operators.ltv import repeat_orders
from grass_spark.queries_ext import _t

EXT54_QUERIES: dict = {}
EXT54_ORACLES: dict = {}


# ---------------------------------------------------------------------
# dow x hour heatmap lift
# ---------------------------------------------------------------------


def q_heatmap_lift(spark, sf_dir):
    return heatmap_lift(_t(spark, sf_dir, "events"))


ORACLE_HEATMAP_LIFT = """
WITH cen AS (
  SELECT CAST(((CAST(ts AS DATE) - DATE '1970-01-05') % 7 + 7) % 7
              AS INTEGER) AS dow,
         CAST(hour(ts) AS INTEGER) AS hour,
         CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
md AS (SELECT dow, CAST(sum(n) AS BIGINT) AS nd FROM cen GROUP BY 1),
mh AS (SELECT hour, CAST(sum(n) AS BIGINT) AS nh FROM cen GROUP BY 1),
tot AS (SELECT CAST(sum(nd) AS BIGINT) AS nn FROM md)
SELECT c.dow, c.hour, c.n,
       round(CAST(CAST(c.n AS HUGEINT) * CAST(nn AS HUGEINT) AS DOUBLE)
             / CAST(CAST(nd AS HUGEINT) * CAST(nh AS HUGEINT) AS DOUBLE),
             6) AS lift
FROM cen c JOIN md USING (dow) JOIN mh USING (hour) CROSS JOIN tot
ORDER BY c.dow, c.hour
"""


# ---------------------------------------------------------------------
# repeat-purchase behavior per segment
# ---------------------------------------------------------------------


def q_repeat_orders(spark, sf_dir):
    return repeat_orders(
        _t(spark, sf_dir, "orders"), _t(spark, sf_dir, "customer")
    )


ORACLE_REPEAT_ORDERS = """
WITH o AS (
  SELECT o_custkey AS c, CAST(o_orderdate AS DATE) AS d, o_orderkey AS k
  FROM orders
),
gaps AS (
  SELECT c,
         CAST(d - lag(d) OVER (PARTITION BY c ORDER BY d, k)
              AS INTEGER) AS gap
  FROM o
),
seg AS (SELECT c_custkey AS c, c_mktsegment AS segment FROM customer),
per_cust AS (
  SELECT c, CAST(count(*) AS BIGINT) AS n_orders FROM gaps GROUP BY 1
),
by_seg AS (
  SELECT segment,
         CAST(count(*) AS BIGINT) AS n_customers,
         CAST(sum(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_repeat
  FROM per_cust JOIN seg USING (c) GROUP BY 1
),
by_gaps AS (
  SELECT segment,
         round(quantile_cont(CAST(gap AS DOUBLE), CAST(0.5 AS DOUBLE)),
               6) AS median_gap_days
  FROM gaps JOIN seg USING (c) WHERE gap IS NOT NULL GROUP BY 1
)
SELECT b.segment, n_customers, n_repeat,
       round(CAST(n_repeat AS DOUBLE) / CAST(n_customers AS DOUBLE), 6)
         AS repeat_rate,
       g.median_gap_days
FROM by_seg b LEFT JOIN by_gaps g ON g.segment = b.segment
ORDER BY b.segment
"""


EXT54_QUERIES.update(
    {
        "heatmap_lift": q_heatmap_lift,
        "repeat_orders": q_repeat_orders,
    }
)
EXT54_ORACLES.update(
    {
        "heatmap_lift": ORACLE_HEATMAP_LIFT,
        "repeat_orders": ORACLE_REPEAT_ORDERS,
    }
)
