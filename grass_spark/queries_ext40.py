"""Fortieth wave of driver-contract queries: referential-integrity
audit (operators/integrity.py ``fk_orphans`` — census-vs-census
anti-join orphan counts over four declared relationships, two of which
are TPC-H-consistent zeros and two genuinely orphaned, so the hash
gate sees non-trivial values) and the cumulative user-acquisition
curve (operators/engagement.py ``user_growth`` — zero-densified
calendar grid over the first-seen day census).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from grass_spark.operators.engagement import user_growth
from grass_spark.operators.integrity import fk_orphans
from grass_spark.queries_ext import _t

EXT40_QUERIES: dict = {}
EXT40_ORACLES: dict = {}


# ---------------------------------------------------------------------
# fk orphan audit
# ---------------------------------------------------------------------


def q_fk_orphans(spark, sf_dir):
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    li = _t(spark, sf_dir, "lineitem")
    ev = _t(spark, sf_dir, "events")
    emb = _t(spark, sf_dir, "embeddings")
    d = _t(spark, sf_dir, "documents")
    return fk_orphans(
        [
            ("orders.custkey->customer", o, "o_custkey", c, "c_custkey"),
            ("lineitem.orderkey->orders", li, "l_orderkey", o, "o_orderkey"),
            ("events.user_id->customer", ev, "user_id", c, "c_custkey"),
            ("embeddings.vec_id->documents", emb, "vec_id", d, "doc_id"),
        ]
    )


def _rel_sql(name, child, fk, parent, pk):
    return f"""
  SELECT '{name}' AS relationship,
         CAST((SELECT count(*) FROM {child} WHERE {fk} IS NOT NULL)
              AS BIGINT) AS n_rows,
         CAST((SELECT count(*) FROM {child} WHERE {fk} IS NULL)
              AS BIGINT) AS n_null,
         CAST((SELECT count(*) FROM (
                 SELECT {fk} FROM {child} WHERE {fk} IS NOT NULL
                 GROUP BY {fk}
               ) x WHERE NOT EXISTS (
                 SELECT 1 FROM {parent} p WHERE p.{pk} = x.{fk}))
              AS BIGINT) AS n_orphan_keys,
         CAST((SELECT count(*) FROM {child} ch
               WHERE ch.{fk} IS NOT NULL AND NOT EXISTS (
                 SELECT 1 FROM {parent} p WHERE p.{pk} = ch.{fk}))
              AS BIGINT) AS n_orphan_rows
"""


_RELS = [
    ("orders.custkey->customer", "orders", "o_custkey",
     "customer", "c_custkey"),
    ("lineitem.orderkey->orders", "lineitem", "l_orderkey",
     "orders", "o_orderkey"),
    ("events.user_id->customer", "events", "user_id",
     "customer", "c_custkey"),
    ("embeddings.vec_id->documents", "embeddings", "vec_id",
     "documents", "doc_id"),
]

ORACLE_FK_ORPHANS = (
    "WITH rels AS ("
    + " UNION ALL ".join(_rel_sql(*r) for r in _RELS)
    + """)
SELECT relationship, n_rows, n_null, n_orphan_keys, n_orphan_rows,
       CASE WHEN n_rows > 0 THEN
         round(CAST(n_orphan_rows AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
       END AS orphan_rate
FROM rels
ORDER BY relationship
"""
)


# ---------------------------------------------------------------------
# cumulative user growth
# ---------------------------------------------------------------------


def q_user_growth(spark, sf_dir):
    return user_growth(_t(spark, sf_dir, "events"))


ORACLE_USER_GROWTH = """
WITH fst AS (
  SELECT user_id, min(CAST(ts AS DATE)) AS d FROM events GROUP BY 1
),
cen AS (SELECT d, CAST(count(*) AS BIGINT) AS nn FROM fst GROUP BY 1),
b AS (SELECT min(d) AS lo, max(d) AS hi FROM cen),
grid AS (
  SELECT g.day, CAST(coalesce(cen.nn, 0) AS BIGINT) AS n_new_users
  FROM (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE
          AS day FROM b) g
  LEFT JOIN cen ON g.day = cen.d
)
SELECT day, n_new_users,
       CAST(sum(n_new_users) OVER (ORDER BY day) AS BIGINT) AS cum_users
FROM grid
ORDER BY day
"""


EXT40_QUERIES.update(
    {
        "fk_orphans": q_fk_orphans,
        "user_growth": q_user_growth,
    }
)
EXT40_ORACLES.update(
    {
        "fk_orphans": ORACLE_FK_ORPHANS,
        "user_growth": ORACLE_USER_GROWTH,
    }
)
