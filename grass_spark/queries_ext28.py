"""Twenty-eighth wave of driver-contract queries: robust trend +
forecast-baseline evaluation (operators/trend.py) and the SCD Type-2
effective-dated dimension join (operators/scd.py).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.scd import scd2_join
from grass_spark.operators.trend import seasonal_naive_eval, theil_sen_daily
from grass_spark.queries_ext import _t

EXT28_QUERIES: dict = {}
EXT28_ORACLES: dict = {}

_SQL_DAILY = """
  SELECT event_type AS k, CAST(ts AS DATE) AS d, count(*) AS x
  FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------
# Theil–Sen median slope of daily counts
# ---------------------------------------------------------------------


def q_theil_sen(spark, sf_dir):
    return theil_sen_daily(_t(spark, sf_dir, "events")).orderBy(
        "event_type"
    )


ORACLE_THEIL_SEN = f"""
WITH daily AS ({_SQL_DAILY}),
pairs AS (
  SELECT a.k,
         CAST(b.x - a.x AS DOUBLE) / CAST(b.d - a.d AS DOUBLE) AS s
  FROM daily a JOIN daily b ON a.k = b.k AND a.d < b.d
),
agg AS (
  SELECT k, CAST(count(*) AS BIGINT) AS n_pairs,
         round(CAST(quantile_cont(s, 0.5) AS DOUBLE), 6) AS slope
  FROM pairs GROUP BY 1
),
days AS (SELECT k, CAST(count(*) AS BIGINT) AS n_days FROM daily GROUP BY 1)
SELECT days.k AS event_type, n_days,
       coalesce(n_pairs, CAST(0 AS BIGINT)) AS n_pairs, slope
FROM days LEFT JOIN agg ON days.k = agg.k
ORDER BY event_type
"""


# ---------------------------------------------------------------------
# seasonal-naive (same-day-last-week) forecast error
# ---------------------------------------------------------------------


def q_seasonal_naive(spark, sf_dir):
    return seasonal_naive_eval(
        _t(spark, sf_dir, "events"), season_days=7
    ).orderBy("event_type")


ORACLE_SEASONAL_NAIVE = f"""
WITH daily AS ({_SQL_DAILY}),
j AS (
  SELECT a.k, a.x AS actual, b.x AS pred
  FROM daily a JOIN daily b ON a.k = b.k AND a.d = b.d + 7
)
SELECT k AS event_type,
       CAST(count(*) AS BIGINT) AS n_eval_days,
       round(avg(abs(CAST(actual - pred AS DOUBLE))), 6) AS mae,
       round(sqrt(avg(CAST(actual - pred AS DOUBLE)
                      * CAST(actual - pred AS DOUBLE))), 6) AS rmse,
       round(avg(abs(CAST(actual - pred AS DOUBLE))
                 / CAST(actual AS DOUBLE)), 6) AS mape
FROM j GROUP BY k
ORDER BY event_type
"""


# ---------------------------------------------------------------------
# SCD-2 effective-dated join: orders against a 2-version customer dim
# (split date derived deterministically from the key)
# ---------------------------------------------------------------------


def q_scd2_segments(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    split = F.date_add(
        F.lit("1995-01-01").cast("date"),
        (F.col("c_custkey") % 2000).cast("int"),
    )
    v1 = cust.select(
        F.col("c_custkey").alias("custkey"),
        F.col("c_mktsegment").alias("segment"),
        F.lit("1990-01-01").cast("date").alias("valid_from"),
        split.alias("valid_to"),
    )
    v2 = cust.select(
        F.col("c_custkey").alias("custkey"),
        F.concat(F.lit("POST-"), F.col("c_mktsegment")).alias("segment"),
        split.alias("valid_from"),
        F.lit("2999-01-01").cast("date").alias("valid_to"),
    )
    dim = v1.unionByName(v2)
    fact = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderdate").cast("date").alias("od"),
        F.round(F.col("o_totalprice") * 100).cast("long").alias("_cents"),
    )
    j = scd2_join(fact, dim, "custkey", ts_col="od", how="inner")
    return (
        j.groupBy("segment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(
                F.sum(F.col("_cents").cast("decimal(38,0)")).cast("double")
                / F.lit(100.0),
                6,
            ).alias("total_price"),
        )
        .orderBy("segment")
    )


ORACLE_SCD2_SEGMENTS = """
WITH dim AS (
  SELECT c_custkey AS custkey, c_mktsegment AS segment,
         DATE '1990-01-01' AS vf,
         DATE '1995-01-01' + CAST(c_custkey % 2000 AS INT) AS vt
  FROM customer
  UNION ALL
  SELECT c_custkey, 'POST-' || c_mktsegment,
         DATE '1995-01-01' + CAST(c_custkey % 2000 AS INT),
         DATE '2999-01-01'
  FROM customer
)
SELECT segment, CAST(count(*) AS BIGINT) AS n_orders,
       round(CAST(sum(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                           AS HUGEINT)) AS DOUBLE)
             / CAST(100 AS DOUBLE), 6) AS total_price
FROM orders JOIN dim
  ON o_custkey = custkey
 AND CAST(o_orderdate AS DATE) >= vf
 AND CAST(o_orderdate AS DATE) < vt
GROUP BY segment
ORDER BY segment
"""


EXT28_QUERIES.update(
    {
        "theil_sen": q_theil_sen,
        "seasonal_naive": q_seasonal_naive,
        "scd2_segments": q_scd2_segments,
    }
)
EXT28_ORACLES.update(
    {
        "theil_sen": ORACLE_THEIL_SEN,
        "seasonal_naive": ORACLE_SEASONAL_NAIVE,
        "scd2_segments": ORACLE_SCD2_SEGMENTS,
    }
)
