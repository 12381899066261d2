"""Twenty-ninth wave of driver-contract queries: declarative data
expectations (operators/expectations.py) and bounded-iteration
PageRank (operators/pagerank.py) over the customer–supplier bipartite
graph.

The PageRank oracle unrolls the SAME fixed iterations as CTEs with the
SAME per-round 12-dp rounding, so both engines stay in lockstep
(compounding last-ulp drift across iterations is the failure mode the
per-round round prevents).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.expectations import expect, validate
from grass_spark.operators.pagerank import pagerank
from grass_spark.queries_ext import _t

EXT29_QUERIES: dict = {}
EXT29_ORACLES: dict = {}


# ---------------------------------------------------------------------
# expectations report over orders
# ---------------------------------------------------------------------

_RULES = [
    ("orderkey_not_null", "o_orderkey", "not_null", {}),
    ("orderkey_unique", "o_orderkey", "unique", {}),
    ("status_in_set", "o_orderstatus", "in_set",
     {"values": ["O", "F", "P"]}),
    ("price_in_range", "o_totalprice", "range",
     {"lo": 0.0, "hi": 1000000.0}),
    ("priority_format", "o_orderpriority", "regex",
     {"pattern": "^[1-5]-"}),
]


def q_expectations(spark, sf_dir):
    rules = [expect(n, c, k, **p) for n, c, k, p in _RULES]
    return validate(_t(spark, sf_dir, "orders"), rules).orderBy("rule")


ORACLE_EXPECTATIONS = """
WITH m AS (
  SELECT CAST(count(*) AS BIGINT) AS n_rows,
         CAST(sum(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END)
              AS BIGINT) AS v0,
         CAST(count(o_orderkey) - count(DISTINCT o_orderkey)
              AS BIGINT) AS v1,
         CAST(sum(CASE WHEN o_orderstatus IS NOT NULL
                        AND o_orderstatus NOT IN ('O', 'F', 'P')
                       THEN 1 ELSE 0 END) AS BIGINT) AS v2,
         CAST(sum(CASE WHEN o_totalprice IS NOT NULL
                        AND (o_totalprice < 0 OR o_totalprice > 1000000)
                       THEN 1 ELSE 0 END) AS BIGINT) AS v3,
         CAST(sum(CASE WHEN o_orderpriority IS NOT NULL
                        AND NOT regexp_matches(o_orderpriority, '^[1-5]-')
                       THEN 1 ELSE 0 END) AS BIGINT) AS v4
  FROM orders
)
SELECT * FROM (
  SELECT 'orderkey_not_null' AS rule, 'o_orderkey' AS "column",
         'not_null' AS kind, v0 AS n_violations, n_rows,
         v0 = 0 AS passed FROM m
  UNION ALL
  SELECT 'orderkey_unique', 'o_orderkey', 'unique', v1, n_rows,
         v1 = 0 FROM m
  UNION ALL
  SELECT 'status_in_set', 'o_orderstatus', 'in_set', v2, n_rows,
         v2 = 0 FROM m
  UNION ALL
  SELECT 'price_in_range', 'o_totalprice', 'range', v3, n_rows,
         v3 = 0 FROM m
  UNION ALL
  SELECT 'priority_format', 'o_orderpriority', 'regex', v4, n_rows,
         v4 = 0 FROM m
)
ORDER BY rule
"""


# ---------------------------------------------------------------------
# PageRank over the customer–supplier bipartite co-purchase graph
# ---------------------------------------------------------------------

_PR_ITERS = 6
_PR_D = 0.85


def q_pagerank(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem").select("l_orderkey", "l_suppkey")
    od = _t(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    pairs = (
        li.join(od, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.concat(F.lit("c"), F.col("o_custkey").cast("string")).alias(
                "a"
            ),
            F.concat(F.lit("s"), F.col("l_suppkey").cast("string")).alias(
                "b"
            ),
        )
        .distinct()
    )
    edges = pairs.select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    ).unionAll(
        pairs.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    return pagerank(
        edges, iterations=_PR_ITERS, damping=_PR_D
    ).orderBy("node")


def _pr_sql(iters: int, d: float) -> str:
    dd = f"CAST('{d!r}' AS DOUBLE)"
    parts = [
        """
WITH pairs AS (
  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS a,
                  's' || CAST(l_suppkey AS VARCHAR) AS b
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
edges AS (
  SELECT a AS src, b AS dst FROM pairs
  UNION ALL SELECT b, a FROM pairs
),
deg AS (SELECT src, count(*) AS deg FROM edges GROUP BY 1),
nodes AS (SELECT DISTINCT src AS node FROM edges),
nn AS (SELECT CAST(count(*) AS DOUBLE) AS n FROM nodes),
p0 AS (
  SELECT node, round(CAST(1 AS DOUBLE) / (SELECT n FROM nn), 12) AS p
  FROM nodes
)"""
    ]
    for k in range(1, iters + 1):
        parts.append(f""",
c{k} AS (
  SELECT e.dst AS node, sum(p.p / CAST(deg.deg AS DOUBLE)) AS s
  FROM edges e
  JOIN p{k - 1} p ON e.src = p.node
  JOIN deg ON e.src = deg.src
  GROUP BY 1
),
p{k} AS (
  SELECT nodes.node,
         round((CAST(1 AS DOUBLE) - {dd}) / (SELECT n FROM nn)
               + {dd} * coalesce(c{k}.s, CAST(0 AS DOUBLE)), 12) AS p
  FROM nodes LEFT JOIN c{k} ON nodes.node = c{k}.node
)""")
    parts.append(
        f"\nSELECT node, p AS rank FROM p{iters} ORDER BY node"
    )
    return "".join(parts)


ORACLE_PAGERANK = _pr_sql(_PR_ITERS, _PR_D)


EXT29_QUERIES.update(
    {"expectations_report": q_expectations, "pagerank_bipartite": q_pagerank}
)
EXT29_ORACLES.update(
    {
        "expectations_report": ORACLE_EXPECTATIONS,
        "pagerank_bipartite": ORACLE_PAGERANK,
    }
)
