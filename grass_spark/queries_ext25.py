"""Twenty-fifth wave of driver-contract queries: classic star-schema
OLAP joins (operators/starjoin.py — TPC-H Q5/Q4/Q14/Q13/Q15 shapes)
over the TPC-H-ish tables, which earlier waves barely touched.

All revenue math runs in exact integer "scaled cents" (see the module
docstring) so the Spark and DuckDB sums are bit-identical regardless
of shuffle order.

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from grass_spark.operators.starjoin import (
    customer_order_dist,
    order_priority_counts,
    promo_share,
    revenue_by_nation,
    top_suppliers,
)
from grass_spark.queries_ext import _t

EXT25_QUERIES: dict = {}
EXT25_ORACLES: dict = {}

# exact scaled-cents revenue: round(price*100) * (100 - round(disc*100))
_SQL_RS = (
    "CAST(CAST(round(l_extendedprice * 100) AS BIGINT)"
    " * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS HUGEINT)"
)
_SQL_DOLLARS = (
    "round(CAST({s} AS DOUBLE) / CAST(10000 AS DOUBLE), 6)"
)


# ---------------------------------------------------------------------
# Q5 shape: revenue per nation (region + year + local-supplier filter)
# ---------------------------------------------------------------------


def q_star_revenue(spark, sf_dir):
    return revenue_by_nation(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "customer"),
        _t(spark, sf_dir, "supplier"),
        _t(spark, sf_dir, "nation"),
        _t(spark, sf_dir, "region"),
        region_name="ASIA",
        date_lo="1996-01-01",
        date_hi="1997-01-01",
    )


ORACLE_STAR_REVENUE = f"""
SELECT n_name,
       {_SQL_DOLLARS.format(s='sum(rs)')} AS revenue
FROM (
  SELECT n_name, {_SQL_RS} AS rs
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN supplier ON l_suppkey = s_suppkey AND s_nationkey = c_nationkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  WHERE r_name = 'ASIA'
    AND o_orderdate >= TIMESTAMP '1996-01-01'
    AND o_orderdate <  TIMESTAMP '1997-01-01'
)
GROUP BY n_name
ORDER BY revenue DESC, n_name
"""


# ---------------------------------------------------------------------
# Q4 shape: late-shipping EXISTS per order priority
# ---------------------------------------------------------------------


def q_order_priorities(spark, sf_dir):
    return order_priority_counts(
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
        date_lo="1996-01-01",
        date_hi="1996-04-01",
    )


ORACLE_ORDER_PRIORITIES = """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1996-04-01'
  AND EXISTS (
    SELECT 1 FROM lineitem
    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
  )
GROUP BY o_orderpriority
ORDER BY o_orderpriority
"""


# ---------------------------------------------------------------------
# Q14 shape: promo revenue share per ship month
# ---------------------------------------------------------------------


def q_promo_share(spark, sf_dir):
    return promo_share(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "part"),
        promo_type="PROMO",
    )


ORACLE_PROMO_SHARE = f"""
WITH j AS (
  SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
         {_SQL_RS} AS rs,
         p_type
  FROM lineitem JOIN part ON l_partkey = p_partkey
),
agg AS (
  SELECT month,
         sum(CASE WHEN p_type = 'PROMO' THEN rs
                  ELSE CAST(0 AS HUGEINT) END) AS pr,
         sum(rs) AS tr
  FROM j GROUP BY month
)
SELECT month,
       {_SQL_DOLLARS.format(s='pr')} AS promo_revenue,
       {_SQL_DOLLARS.format(s='tr')} AS total_revenue,
       round(CAST(100 AS DOUBLE) * CAST(pr AS DOUBLE)
             / CAST(tr AS DOUBLE), 6) AS promo_pct
FROM agg
ORDER BY month
"""


# ---------------------------------------------------------------------
# Q13 shape: orders-per-customer distribution (zero-order customers in)
# ---------------------------------------------------------------------


def q_customer_orders(spark, sf_dir):
    return customer_order_dist(
        _t(spark, sf_dir, "customer"), _t(spark, sf_dir, "orders")
    )


ORACLE_CUSTOMER_ORDERS = """
SELECT n_orders, count(*) AS n_customers
FROM (
  SELECT c_custkey, count(o_orderkey) AS n_orders
  FROM customer LEFT JOIN orders ON c_custkey = o_custkey
  GROUP BY c_custkey
)
GROUP BY n_orders
ORDER BY n_customers DESC, n_orders DESC
"""


# ---------------------------------------------------------------------
# Q15 shape: max-revenue supplier(s) for one ship quarter
# ---------------------------------------------------------------------


def q_top_suppliers(spark, sf_dir):
    return top_suppliers(
        _t(spark, sf_dir, "lineitem"),
        _t(spark, sf_dir, "supplier"),
        date_lo="1996-01-01",
        date_hi="1996-04-01",
    )


ORACLE_TOP_SUPPLIERS = f"""
WITH rev AS (
  SELECT l_suppkey, sum({_SQL_RS}) AS sr
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY l_suppkey
)
SELECT s_suppkey, s_name,
       {_SQL_DOLLARS.format(s='sr')} AS revenue
FROM rev JOIN supplier ON l_suppkey = s_suppkey
WHERE sr = (SELECT max(sr) FROM rev)
ORDER BY s_suppkey
"""


EXT25_QUERIES.update(
    {
        "star_revenue": q_star_revenue,
        "order_priorities": q_order_priorities,
        "promo_share": q_promo_share,
        "customer_orders": q_customer_orders,
        "top_suppliers": q_top_suppliers,
    }
)
EXT25_ORACLES.update(
    {
        "star_revenue": ORACLE_STAR_REVENUE,
        "order_priorities": ORACLE_ORDER_PRIORITIES,
        "promo_share": ORACLE_PROMO_SHARE,
        "customer_orders": ORACLE_CUSTOMER_ORDERS,
        "top_suppliers": ORACLE_TOP_SUPPLIERS,
    }
)
