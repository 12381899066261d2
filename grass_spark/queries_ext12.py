"""Twelfth wave of driver-contract queries: pipeline-audit analytics —
market-basket association rules (operators/basket.py), cross-source
shingle overlap and key-skew diagnostics (operators/audit.py).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.audit import skew_report, source_overlap
from grass_spark.operators.basket import association_rules
from grass_spark.operators.dedup import normalize_text
from grass_spark.queries_ext import _t

EXT12_QUERIES: dict = {}
EXT12_ORACLES: dict = {}


# ---------------------------------------------------------------------
# association rules — user-day baskets of event types
# ---------------------------------------------------------------------


def q_association_rules(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return association_rules(ev)


ORACLE_ASSOCIATION_RULES = """
WITH items AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS day, event_type AS i
  FROM events
),
nb AS (
  SELECT CAST(count(*) AS BIGINT) AS n
  FROM (SELECT DISTINCT user_id, day FROM items)
),
ic AS (SELECT i, CAST(count(*) AS BIGINT) AS c FROM items GROUP BY i),
pc AS (
  SELECT a.i AS antecedent, b.i AS consequent,
         CAST(count(*) AS BIGINT) AS pair_count
  FROM items a
  JOIN items b ON a.user_id = b.user_id AND a.day = b.day AND a.i <> b.i
  GROUP BY 1, 2
)
SELECT p.antecedent, p.consequent, p.pair_count,
       round(CAST(p.pair_count AS DOUBLE) / CAST(nb.n AS DOUBLE), 6)
         AS support,
       round(CAST(p.pair_count AS DOUBLE) / CAST(ca.c AS DOUBLE), 6)
         AS confidence,
       round(CAST(p.pair_count AS DOUBLE) * CAST(nb.n AS DOUBLE)
             / (CAST(ca.c AS DOUBLE) * CAST(cb.c AS DOUBLE)), 6) AS lift
FROM pc p
JOIN ic ca ON p.antecedent = ca.i
JOIN ic cb ON p.consequent = cb.i
CROSS JOIN nb
ORDER BY p.antecedent, p.consequent
"""

EXT12_QUERIES["association_rules"] = q_association_rules
EXT12_ORACLES["association_rules"] = ORACLE_ASSOCIATION_RULES


# ---------------------------------------------------------------------
# source overlap — pairwise 5-gram Jaccard between document sources
# ---------------------------------------------------------------------

_OVERLAP_N = 5


def q_source_overlap(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return source_overlap(docs, n=_OVERLAP_N)


ORACLE_SOURCE_OVERLAP = f"""
WITH nrm AS (
  SELECT source,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
  FROM documents
),
w AS (SELECT source, string_split(t, ' ') AS ws FROM nrm),
sh AS (
  SELECT DISTINCT source,
         array_to_string(ws[g.i:g.i+{_OVERLAP_N - 1}], ' ') AS s
  FROM w, unnest(generate_series(1,
         greatest(len(ws) - {_OVERLAP_N - 1}, 1))) AS g(i)
),
sz AS (SELECT source, CAST(count(*) AS BIGINT) AS sz FROM sh GROUP BY source),
inter AS (
  SELECT a.source AS source_a, b.source AS source_b,
         CAST(count(*) AS BIGINT) AS common
  FROM sh a JOIN sh b ON a.s = b.s AND a.source < b.source
  GROUP BY 1, 2
)
SELECT i.source_a, i.source_b,
       sa.sz AS shingles_a, sb.sz AS shingles_b, i.common,
       round(CAST(i.common AS DOUBLE)
             / CAST(sa.sz + sb.sz - i.common AS DOUBLE), 6) AS jaccard
FROM inter i
JOIN sz sa ON i.source_a = sa.source
JOIN sz sb ON i.source_b = sb.source
ORDER BY i.source_a, i.source_b
"""

EXT12_QUERIES["source_overlap"] = q_source_overlap
EXT12_ORACLES["source_overlap"] = ORACLE_SOURCE_OVERLAP


# ---------------------------------------------------------------------
# skew report — word-frequency distribution of the document corpus
# ---------------------------------------------------------------------


def q_skew_report(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    words = docs.select(
        F.explode(
            F.split(normalize_text(F.col("text")), " ")
        ).alias("word")
    )
    return skew_report(words, "word")


ORACLE_SKEW_REPORT = """
WITH words AS (
  SELECT unnest(string_split(
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS word
  FROM documents
),
census AS (SELECT word, CAST(count(*) AS BIGINT) AS f FROM words GROUP BY word),
c2 AS (SELECT f, CAST(count(*) AS BIGINT) AS c FROM census GROUP BY f),
staged AS (
  SELECT f, c,
         sum(c) OVER (ORDER BY f
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
         sum(c) OVER () AS n
  FROM c2
),
st2 AS (
  SELECT *, cum - c AS r0,
         CASE WHEN c % 2 = 0 THEN CAST(c // 2 AS HUGEINT) * (c + 1)
              ELSE CAST(c AS HUGEINT) * ((c + 1) // 2) END AS tri
  FROM staged
),
st3 AS (
  SELECT *, CAST(f AS HUGEINT) * (CAST(c AS HUGEINT) * r0 + tri) AS rf
  FROM st2
),
agg AS (
  SELECT CAST(sum(CAST(f AS HUGEINT) * c) AS BIGINT) AS n_rows,
         CAST(sum(c) AS BIGINT) AS n_keys,
         max(f) AS max_freq,
         min(CASE WHEN cum >= (1 * n + 1) // 2 THEN f END) AS p50_freq,
         min(CASE WHEN cum >= (9 * n + 9) // 10 THEN f END) AS p90_freq,
         min(CASE WHEN cum >= (99 * n + 99) // 100 THEN f END) AS p99_freq,
         CAST(sum(rf) AS DOUBLE) AS srf
  FROM st3
)
SELECT n_rows, n_keys, max_freq, p50_freq, p90_freq, p99_freq,
       round(CAST(max_freq AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
         AS top_share,
       round(CAST(2 AS DOUBLE) * srf
             / (CAST(n_keys AS DOUBLE) * CAST(n_rows AS DOUBLE))
             - (CAST(n_keys AS DOUBLE) + CAST(1 AS DOUBLE))
               / CAST(n_keys AS DOUBLE), 6) AS gini
FROM agg
"""

EXT12_QUERIES["skew_report"] = q_skew_report
EXT12_ORACLES["skew_report"] = ORACLE_SKEW_REPORT
