"""Twenty-seventh wave of driver-contract queries: distributed-plan
layout primitives — the generic skew-safe equi-join
(operators/skewjoin.py) and the Z-order multi-dimensional clustering
key (operators/zorder.py).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.skewjoin import skew_join
from grass_spark.operators.zorder import with_zorder
from grass_spark.queries_ext import _t

EXT27_QUERIES: dict = {}
EXT27_ORACLES: dict = {}


# ---------------------------------------------------------------------
# skew-safe fact ⋈ dim join (orders ⋈ customer, forced-low threshold so
# BOTH branches execute at sf0.01 — exactness vs the plain-join oracle)
# ---------------------------------------------------------------------


def q_skew_join(spark, sf_dir):
    fact = _t(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("custkey"),
        "o_orderkey",
        F.round("o_totalprice", 6).alias("totalprice"),
    )
    dim = _t(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("custkey"), "c_name", "c_mktsegment"
    )
    return skew_join(fact, dim, "custkey", how="inner", hot_threshold=15)


ORACLE_SKEW_JOIN = """
SELECT o_custkey AS custkey, o_orderkey,
       round(o_totalprice, 6) AS totalprice,
       c_name, c_mktsegment
FROM orders JOIN customer ON o_custkey = c_custkey
"""


# ---------------------------------------------------------------------
# z-order layout key over (day index, value bucket)
# ---------------------------------------------------------------------

_Z_BITS = 9


def q_zorder_layout(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.datediff(
            F.col("ts").cast("date"), F.lit("2024-01-01").cast("date")
        ).alias("day_idx"),
        F.least(F.floor("value").cast("long"), F.lit(255)).alias(
            "v_bucket"
        ),
    )
    return with_zorder(
        ev, ["day_idx", "v_bucket"], bits=_Z_BITS
    ).orderBy("z", "event_id")


def _z_sql(col: str, j: int, n: int, bits: int) -> str:
    return " | ".join(
        f"((({col} >> {i}) & 1) << {i * n + j})" for i in range(bits)
    )


ORACLE_ZORDER_LAYOUT = f"""
WITH base AS (
  SELECT event_id,
         CAST(CAST(ts AS DATE) - DATE '2024-01-01' AS BIGINT) AS day_idx,
         least(CAST(floor(value) AS BIGINT), 255) AS v_bucket
  FROM events
)
SELECT event_id, day_idx, v_bucket,
       ({_z_sql('day_idx', 0, 2, _Z_BITS)})
     | ({_z_sql('v_bucket', 1, 2, _Z_BITS)}) AS z
FROM base
ORDER BY z, event_id
"""


EXT27_QUERIES.update(
    {"hot_key_join": q_skew_join, "zorder_layout": q_zorder_layout}
)
EXT27_ORACLES.update(
    {
        "hot_key_join": ORACLE_SKEW_JOIN,
        "zorder_layout": ORACLE_ZORDER_LAYOUT,
    }
)
