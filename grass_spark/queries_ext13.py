"""Thirteenth wave of driver-contract queries: text metrics & drift —
Flesch readability, per-source lexical diversity
(operators/textstats.py) and the exact two-sample KS drift gate
(operators/divergence.py) over the ``documents`` table.

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.divergence import ks_test
from grass_spark.operators.textstats import lexical_diversity, readability
from grass_spark.queries_ext import _t

EXT13_QUERIES: dict = {}
EXT13_ORACLES: dict = {}


# ---------------------------------------------------------------------
# readability — Flesch reading ease / FK grade per document
# ---------------------------------------------------------------------


def q_readability(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return readability(docs).orderBy("doc_id")


ORACLE_READABILITY = """
WITH nrm AS (
  SELECT doc_id, text,
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
  FROM documents
),
w AS (SELECT doc_id, text, string_split(t, ' ') AS ws FROM nrm),
c AS (
  SELECT doc_id,
         CAST(len(ws) AS BIGINT) AS n_words,
         CAST(greatest(len(regexp_extract_all(text, '[.!?]+')), 1)
              AS BIGINT) AS n_sentences,
         CAST(list_sum(list_transform(ws, w ->
              greatest(len(regexp_extract_all(w, '[aeiouy]+')), 1)))
              AS BIGINT) AS n_syllables
  FROM w
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       round(CAST(206.835 AS DOUBLE)
             - CAST(1.015 AS DOUBLE)
               * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             - CAST(84.6 AS DOUBLE)
               * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)),
             6) AS flesch,
       round(CAST(0.39 AS DOUBLE)
             * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
             + CAST(11.8 AS DOUBLE)
               * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE))
             - CAST(15.59 AS DOUBLE), 6) AS fk_grade
FROM c ORDER BY doc_id
"""

EXT13_QUERIES["readability"] = q_readability
EXT13_ORACLES["readability"] = ORACLE_READABILITY


# ---------------------------------------------------------------------
# lexical diversity — TTR / hapax share per source
# ---------------------------------------------------------------------


def q_lexical_diversity(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return lexical_diversity(docs)


ORACLE_LEXICAL_DIVERSITY = """
WITH words AS (
  SELECT source, unnest(string_split(
         regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'), ' ')) AS w
  FROM documents
),
census AS (
  SELECT source, w, CAST(count(*) AS BIGINT) AS f FROM words GROUP BY 1, 2
)
SELECT source,
       CAST(sum(f) AS BIGINT) AS n_tokens,
       CAST(count(*) AS BIGINT) AS n_types,
       round(CAST(count(*) AS DOUBLE) / CAST(sum(f) AS DOUBLE), 6) AS ttr,
       round(CAST(sum(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(count(*) AS DOUBLE), 6) AS hapax_share
FROM census GROUP BY source ORDER BY source
"""

EXT13_QUERIES["lexical_diversity"] = q_lexical_diversity
EXT13_ORACLES["lexical_diversity"] = ORACLE_LEXICAL_DIVERSITY


# ---------------------------------------------------------------------
# length drift — exact two-sample KS over n_chars (even vs odd docs)
# ---------------------------------------------------------------------


def q_length_drift(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    a = docs.where(F.col("doc_id") % 2 == 0).select("n_chars")
    b = docs.where(F.col("doc_id") % 2 == 1).select("n_chars")
    return ks_test(a, b, value_col="n_chars")


ORACLE_LENGTH_DRIFT = """
WITH ha AS (SELECT n_chars AS v FROM documents WHERE doc_id % 2 = 0),
hb AS (SELECT n_chars AS v FROM documents WHERE doc_id % 2 = 1),
ca AS (SELECT v, CAST(count(*) AS BIGINT) AS ca FROM ha GROUP BY v),
cb AS (SELECT v, CAST(count(*) AS BIGINT) AS cb FROM hb GROUP BY v),
j AS (
  SELECT v, coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
  FROM ca FULL OUTER JOIN cb USING (v)
),
staged AS (
  SELECT v,
         sum(ca) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cuma,
         sum(cb) OVER (ORDER BY v
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumb,
         sum(ca) OVER () AS na,
         sum(cb) OVER () AS nb
  FROM j
),
nums AS (
  SELECT v, abs(CAST(cuma AS HUGEINT) * nb
                - CAST(cumb AS HUGEINT) * na) AS num, na, nb
  FROM staged
),
agg AS (
  SELECT CAST(max(na) AS BIGINT) AS n_a, CAST(max(nb) AS BIGINT) AS n_b,
         max(num) AS mx
  FROM nums
)
SELECT a.n_a, a.n_b,
       round(CAST(a.mx AS DOUBLE)
             / (CAST(a.n_a AS DOUBLE) * CAST(a.n_b AS DOUBLE)), 6)
         AS ks_stat,
       (SELECT min(v) FROM nums, agg WHERE nums.num = agg.mx) AS ks_at
FROM agg a
"""

EXT13_QUERIES["length_drift"] = q_length_drift
EXT13_ORACLES["length_drift"] = ORACLE_LENGTH_DRIFT
