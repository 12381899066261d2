"""Thirty-first wave of driver-contract queries: CDC merge
(operators/cdc.py — the lakehouse MERGE INTO primitive, applied to a
deterministic synthesized change log) and month-over-month share shift
(operators/olap.py share_shift).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.cdc import apply_cdc
from grass_spark.operators.olap import share_shift
from grass_spark.queries_ext import _t

EXT31_QUERIES: dict = {}
EXT31_ORACLES: dict = {}


# ---------------------------------------------------------------------
# CDC merge: synthesized change log over the orders snapshot
#   key % 7 == 0 -> delete (seq 1)
#   key % 7 == 1 -> two updates (seq 1: +1000, seq 2: +2000; latest wins)
#   inserts: keys shifted by 10^7, one per key % 7 == 2 (seq 1)
# ---------------------------------------------------------------------


def q_cdc_merge(spark, sf_dir):
    snap = _t(spark, sf_dir, "orders").select(
        "o_orderkey", F.round("o_totalprice", 6).alias("price")
    )
    k = F.col("o_orderkey")
    dels = snap.where(k % 7 == 0).select(
        "o_orderkey",
        F.lit(None).cast("double").alias("price"),
        F.lit("D").alias("op"),
        F.lit(1).alias("seq"),
    )
    up1 = snap.where(k % 7 == 1).select(
        "o_orderkey",
        F.round(F.col("price") + 1000.0, 6).alias("price"),
        F.lit("U").alias("op"),
        F.lit(1).alias("seq"),
    )
    up2 = snap.where(k % 7 == 1).select(
        "o_orderkey",
        F.round(F.col("price") + 2000.0, 6).alias("price"),
        F.lit("U").alias("op"),
        F.lit(2).alias("seq"),
    )
    ins = snap.where(k % 7 == 2).select(
        (k + 10_000_000).alias("o_orderkey"),
        F.round(F.col("price") / 2.0, 6).alias("price"),
        F.lit("I").alias("op"),
        F.lit(1).alias("seq"),
    )
    changes = dels.unionByName(up1).unionByName(up2).unionByName(ins)
    return apply_cdc(
        snap, changes, "o_orderkey", validate=True
    ).orderBy("o_orderkey")


ORACLE_CDC_MERGE = """
WITH snap AS (
  SELECT o_orderkey, round(o_totalprice, 6) AS price FROM orders
),
changes AS (
  SELECT o_orderkey, CAST(NULL AS DOUBLE) AS price, 'D' AS op, 1 AS seq
  FROM snap WHERE o_orderkey % 7 = 0
  UNION ALL
  SELECT o_orderkey, round(price + 1000.0, 6), 'U', 1
  FROM snap WHERE o_orderkey % 7 = 1
  UNION ALL
  SELECT o_orderkey, round(price + 2000.0, 6), 'U', 2
  FROM snap WHERE o_orderkey % 7 = 1
  UNION ALL
  SELECT o_orderkey + 10000000, round(price / 2.0, 6), 'I', 1
  FROM snap WHERE o_orderkey % 7 = 2
),
latest AS (
  SELECT o_orderkey,
         arg_max(op, seq) AS op,
         arg_max(price, seq) AS price
  FROM changes GROUP BY o_orderkey
)
SELECT o_orderkey, price FROM (
  SELECT s.o_orderkey, s.price
  FROM snap s ANTI JOIN latest l ON s.o_orderkey = l.o_orderkey
  UNION ALL
  SELECT o_orderkey, price FROM latest WHERE op <> 'D'
)
ORDER BY o_orderkey
"""


# ---------------------------------------------------------------------
# month-over-month order-priority share shift
# ---------------------------------------------------------------------


def q_share_shift(spark, sf_dir):
    return share_shift(
        _t(spark, sf_dir, "orders"),
        ts_col="o_orderdate",
        group_col="o_orderpriority",
        value_col="o_totalprice",
    ).orderBy("month", "o_orderpriority")


ORACLE_SHARE_SHIFT = """
WITH cen AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         o_orderpriority AS g,
         sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT))
           AS v
  FROM orders GROUP BY 1, 2
),
tot AS (SELECT month, sum(v) AS t FROM cen GROUP BY 1),
cur AS (
  SELECT cen.month, g,
         round(CAST(v AS DOUBLE) / CAST(100 AS DOUBLE), 6) AS value_sum,
         round(CAST(v AS DOUBLE) / CAST(t AS DOUBLE), 6) AS share
  FROM cen JOIN tot ON cen.month = tot.month
)
SELECT cur.month, cur.g AS o_orderpriority, cur.value_sum, cur.share,
       prev.share AS share_prev,
       round(cur.share - prev.share, 6) AS share_delta
FROM cur LEFT JOIN cur prev
  ON cur.month = CAST(prev.month + INTERVAL 1 MONTH AS DATE)
 AND cur.g = prev.g
ORDER BY cur.month, o_orderpriority
"""


EXT31_QUERIES.update(
    {"cdc_merge": q_cdc_merge, "share_shift": q_share_shift}
)
EXT31_ORACLES.update(
    {"cdc_merge": ORACLE_CDC_MERGE, "share_shift": ORACLE_SHARE_SHIFT}
)
