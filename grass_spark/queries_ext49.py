"""Forty-ninth wave of driver-contract queries: water-filling mixture
solver (operators/waterfill.py — the unique cap level with
``sum(min(S_i, L)) = budget`` over per-source token volumes; the
budget-GUARANTEEING counterpart of corpus_mixture) and the
exact-duplicate family-size histogram (operators/dedup.py
``dup_size_distribution``).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.dedup import dup_size_distribution
from grass_spark.operators.waterfill import waterfill_mixture
from grass_spark.queries_ext import _t

EXT49_QUERIES: dict = {}
EXT49_ORACLES: dict = {}

#: fixed absolute budget: constrains the sf0.01 corpus (~27k tokens
#: over 20 sources) at the top of the distribution and drives the
#: below-smallest-source fallback segment at sf0.1
_WF_BUDGET = 26_000


# ---------------------------------------------------------------------
# water-filling allocation
# ---------------------------------------------------------------------


def q_waterfill_mixture(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    toks = F.size(F.filter(F.split(F.col("text"), " "), lambda x: x != ""))
    return waterfill_mixture(
        d, _WF_BUDGET, source_col="source",
        weight_expr=toks.cast("long"),
    )


ORACLE_WATERFILL_MIXTURE = f"""
WITH cen AS (
  SELECT source,
         CAST(sum(len(list_filter(string_split(text, ' '),
                                  x -> x <> ''))) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
),
ranked AS (
  SELECT source, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (
                ORDER BY n_tokens, source
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
              AS BIGINT) AS cum,
         CAST(count(*) OVER ()
              - row_number() OVER (ORDER BY n_tokens, source) + 1
              AS BIGINT) AS nb
  FROM cen
),
tot AS (
  SELECT CAST(sum(n_tokens) AS BIGINT) AS t,
         CAST(count(*) AS BIGINT) AS ns
  FROM cen
),
seg AS (
  SELECT CAST({_WF_BUDGET} - cum AS DOUBLE) / CAST(nb AS DOUBLE)
           AS level, 1 AS pri
  FROM ranked WHERE cum + nb * n_tokens > {_WF_BUDGET}
  ORDER BY n_tokens, source LIMIT 1
),
fb AS (
  SELECT CAST(t AS DOUBLE) AS level, 0 AS pri FROM tot
),
lv AS (
  SELECT level FROM (SELECT * FROM seg UNION ALL SELECT * FROM fb)
  ORDER BY pri DESC LIMIT 1
)
SELECT r.source, r.n_tokens,
       CASE WHEN t <= {_WF_BUDGET}
                 OR CAST(r.n_tokens AS DOUBLE) <= level
            THEN CAST(1 AS DOUBLE)
            ELSE round(level / CAST(r.n_tokens AS DOUBLE), 6)
       END AS keep_rate,
       CASE WHEN t <= {_WF_BUDGET}
            THEN round(CAST(r.n_tokens AS DOUBLE), 6)
            ELSE round(least(CAST(r.n_tokens AS DOUBLE), level), 6)
       END AS alloc_tokens
FROM ranked r CROSS JOIN lv CROSS JOIN tot
ORDER BY r.source
"""


# ---------------------------------------------------------------------
# duplicate family-size histogram
# ---------------------------------------------------------------------


def q_dup_size_dist(spark, sf_dir):
    return dup_size_distribution(_t(spark, sf_dir, "documents"))


ORACLE_DUP_SIZE_DIST = """
WITH fam AS (
  SELECT md5(text) AS h, CAST(count(*) AS BIGINT) AS family_size
  FROM documents GROUP BY 1
),
hist AS (
  SELECT family_size, CAST(count(*) AS BIGINT) AS n_families,
         CAST(sum(family_size) AS BIGINT) AS n_docs
  FROM fam GROUP BY 1
),
tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS t FROM hist)
SELECT family_size, n_families, n_docs,
       round(CAST(n_docs AS DOUBLE) / CAST(t AS DOUBLE), 6) AS frac_docs
FROM hist CROSS JOIN tot
ORDER BY family_size
"""


EXT49_QUERIES.update(
    {
        "waterfill_mixture": q_waterfill_mixture,
        "dup_size_dist": q_dup_size_dist,
    }
)
EXT49_ORACLES.update(
    {
        "waterfill_mixture": ORACLE_WATERFILL_MIXTURE,
        "dup_size_dist": ORACLE_DUP_SIZE_DIST,
    }
)
