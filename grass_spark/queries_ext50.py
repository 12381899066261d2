"""Fiftieth wave of driver-contract queries: pre-join cardinality
report (operators/profile.py ``join_cardinality`` — census-vs-census
exact join-row count and fanout audit over orders x lineitem) and
per-user behavioral concentration (operators/engagement.py
``user_hhi`` — Herfindahl index from exact DECIMAL power sums).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from grass_spark.operators.engagement import user_hhi
from grass_spark.operators.profile import join_cardinality
from grass_spark.queries_ext import _t

EXT50_QUERIES: dict = {}
EXT50_ORACLES: dict = {}


# ---------------------------------------------------------------------
# join cardinality: orders x lineitem
# ---------------------------------------------------------------------


def q_join_cardinality(spark, sf_dir):
    return join_cardinality(
        _t(spark, sf_dir, "orders"),
        _t(spark, sf_dir, "lineitem"),
        left_key="o_orderkey",
        right_key="l_orderkey",
    )


ORACLE_JOIN_CARDINALITY = """
WITH ca AS (
  SELECT o_orderkey AS k, CAST(count(*) AS BIGINT) AS na
  FROM orders WHERE o_orderkey IS NOT NULL GROUP BY 1
),
cb AS (
  SELECT l_orderkey AS k, CAST(count(*) AS BIGINT) AS nb
  FROM lineitem WHERE l_orderkey IS NOT NULL GROUP BY 1
),
la AS (
  SELECT CAST(sum(na) AS BIGINT) AS n_left_rows,
         CAST(count(*) AS BIGINT) AS n_left_keys,
         CAST(max(na) AS BIGINT) AS max_left_fanout
  FROM ca
),
lb AS (
  SELECT CAST(sum(nb) AS BIGINT) AS n_right_rows,
         CAST(count(*) AS BIGINT) AS n_right_keys,
         CAST(max(nb) AS BIGINT) AS max_right_fanout
  FROM cb
),
m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_matched_keys,
         CAST(coalesce(sum(CAST(na AS HUGEINT) * CAST(nb AS HUGEINT)),
                       0) AS BIGINT) AS exact_join_rows
  FROM ca JOIN cb USING (k)
)
SELECT n_left_rows, n_right_rows, n_left_keys, n_right_keys,
       n_matched_keys, max_left_fanout, max_right_fanout,
       exact_join_rows
FROM la CROSS JOIN lb CROSS JOIN m
"""


# ---------------------------------------------------------------------
# per-user Herfindahl concentration
# ---------------------------------------------------------------------


def q_user_hhi(spark, sf_dir):
    return user_hhi(_t(spark, sf_dir, "events"))


ORACLE_USER_HHI = """
WITH cen AS (
  SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
agg AS (
  SELECT user_id,
         CAST(sum(n) AS BIGINT) AS n_events,
         CAST(count(*) AS BIGINT) AS n_types,
         sum(CAST(n AS HUGEINT) * CAST(n AS HUGEINT)) AS s2
  FROM cen GROUP BY 1
)
SELECT user_id, n_events, n_types,
       round(CAST(s2 AS DOUBLE)
             / CAST(CAST(n_events AS HUGEINT)
                    * CAST(n_events AS HUGEINT) AS DOUBLE), 6) AS hhi
FROM agg
ORDER BY user_id
"""


EXT50_QUERIES.update(
    {
        "join_cardinality": q_join_cardinality,
        "user_hhi": q_user_hhi,
    }
)
EXT50_ORACLES.update(
    {
        "join_cardinality": ORACLE_JOIN_CARDINALITY,
        "user_hhi": ORACLE_USER_HHI,
    }
)
