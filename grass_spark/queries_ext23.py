"""Twenty-third wave of driver-contract queries: Efraimidis–Spirakis
weighted sampling (operators/sampling.py), rank-biased overlap
(operators/fusion.py), positional phrase search (operators/search.py),
and the k-anonymity privacy audit (operators/audit.py).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.audit import k_anonymity
from grass_spark.operators.fusion import rbo_overlap, rbo_tail_weights
from grass_spark.operators.sampling import weighted_sample
from grass_spark.operators.search import bm25_search, phrase_search
from grass_spark.queries_ext import _t
from grass_spark.queries_ext14 import _BM25_QUERIES
from grass_spark.queries_ext22 import _dense_ranking

EXT23_QUERIES: dict = {}
EXT23_ORACLES: dict = {}


# ---------------------------------------------------------------------
# weighted sampling without replacement (exponential race, per source)
# ---------------------------------------------------------------------


def q_weighted_sample(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return weighted_sample(
        docs, 10, weight_col="n_chars", group_col="source", salt="ws"
    ).orderBy("source", "doc_id")


ORACLE_WEIGHTED_SAMPLE = """
WITH keyed AS (
  SELECT doc_id, source, n_chars,
         round(
           -ln(CAST(CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)
                                        || ':ws'), 1, 8) AS UBIGINT)
                    AS DOUBLE) / 4294967296.0
               + 0.5 / 4294967296.0)
           / CAST(n_chars AS DOUBLE), 9) AS ekey
  FROM documents
  WHERE n_chars IS NOT NULL AND n_chars > 0
),
r AS (
  SELECT doc_id, source, n_chars,
         row_number() OVER (PARTITION BY source
                            ORDER BY ekey ASC, doc_id ASC) AS rn
  FROM keyed
)
SELECT doc_id, source, n_chars FROM r WHERE rn <= 10
ORDER BY source, doc_id
"""

EXT23_QUERIES["weighted_sample"] = q_weighted_sample
EXT23_ORACLES["weighted_sample"] = ORACLE_WEIGHTED_SAMPLE


# ---------------------------------------------------------------------
# rank-biased overlap between the lexical and dense rankers
# ---------------------------------------------------------------------


def q_rbo_overlap(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    q = spark.createDataFrame(_BM25_QUERIES, "query_id int, q_text string")
    lex = bm25_search(docs, q, top_k=10).select("query_id", "doc_id", "rank")
    dense = _dense_ranking(spark, sf_dir, 10)
    return rbo_overlap(lex, dense, k=10, p=0.9).orderBy("query_id")


def _tw_values() -> str:
    tw = rbo_tail_weights(10, 0.9)
    return ", ".join(
        f"({m}, CAST({x!r} AS DOUBLE))" for m, x in enumerate(tw, 1)
    )


ORACLE_RBO_OVERLAP = f"""
WITH q(query_id, q_text) AS (
  VALUES (1, 'hash join table'),
         (2, 'window agg batch'),
         (3, 'slow query scan')
),
qt AS (
  SELECT DISTINCT query_id,
         unnest(regexp_extract_all(lower(q_text), '[a-z0-9]+')) AS word
  FROM q
),
w AS (
  SELECT doc_id,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
  FROM documents
),
tf AS (SELECT doc_id, word, count(*) AS tf FROM w GROUP BY 1, 2),
dl AS (SELECT doc_id, sum(tf) AS dl FROM tf GROUP BY 1),
dfreq AS (SELECT word, count(*) AS df FROM tf GROUP BY 1),
sc AS (
  SELECT (SELECT count(*) FROM documents) AS n_docs,
         (SELECT sum(tf) FROM tf) AS total_tokens
),
contrib AS (
  SELECT qt.query_id, tf.doc_id,
         ln(CAST(1 AS DOUBLE)
            + (CAST(sc.n_docs AS DOUBLE) - CAST(dfreq.df AS DOUBLE)
               + CAST(0.5 AS DOUBLE))
              / (CAST(dfreq.df AS DOUBLE) + CAST(0.5 AS DOUBLE)))
         * ((CAST(tf.tf AS DOUBLE) * CAST(2.2 AS DOUBLE))
            / (CAST(tf.tf AS DOUBLE)
               + CAST(1.2 AS DOUBLE)
                 * (CAST(0.25 AS DOUBLE)
                    + CAST(0.75 AS DOUBLE)
                      * (CAST(dl.dl AS DOUBLE)
                         / (CAST(sc.total_tokens AS DOUBLE)
                            / CAST(sc.n_docs AS DOUBLE)))))) AS c
  FROM tf
  JOIN qt USING (word)
  JOIN dfreq USING (word)
  JOIN dl USING (doc_id)
  CROSS JOIN sc
),
lex_scored AS (
  SELECT query_id, doc_id, round(sum(c), 6) AS score
  FROM contrib GROUP BY 1, 2
),
lex AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id ASC) AS ra
  FROM lex_scored
),
e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
dq AS (
  SELECT CAST(vec_id - 100 AS INT) AS query_id, vec_id AS seed_id, e AS qe
  FROM e WHERE vec_id IN (101, 102, 103)
),
dpairs AS (
  SELECT dq.query_id, e.vec_id AS doc_id,
         round(list_inner_product(dq.qe, e.e)
               / (sqrt(list_inner_product(dq.qe, dq.qe))
                  * sqrt(list_inner_product(e.e, e.e))), 6) AS c
  FROM dq CROSS JOIN e WHERE e.vec_id <> dq.seed_id
),
dense AS (
  SELECT query_id, doc_id,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY c DESC, doc_id ASC) AS rb
  FROM dpairs
),
tw(m, t) AS (VALUES {_tw_values()}),
common AS (
  SELECT lex.query_id,
         tw.t
  FROM lex
  JOIN dense ON lex.query_id = dense.query_id
            AND lex.doc_id = dense.doc_id
  JOIN tw ON tw.m = greatest(lex.ra, dense.rb)
  WHERE lex.ra <= 10 AND dense.rb <= 10
),
per_q AS (
  SELECT query_id,
         CAST(count(*) AS BIGINT) AS overlap_at_k,
         round(CAST(0.09999999999999998 AS DOUBLE) * sum(t), 6) AS rbo
  FROM common GROUP BY 1
),
qs AS (
  SELECT DISTINCT query_id FROM (
    SELECT query_id FROM lex WHERE ra <= 10
    UNION ALL SELECT query_id FROM dense WHERE rb <= 10
  )
)
SELECT qs.query_id,
       coalesce(per_q.overlap_at_k, 0) AS overlap_at_k,
       coalesce(per_q.rbo, CAST(0 AS DOUBLE)) AS rbo
FROM qs LEFT JOIN per_q USING (query_id)
ORDER BY query_id
"""

EXT23_QUERIES["rbo_overlap"] = q_rbo_overlap
EXT23_ORACLES["rbo_overlap"] = ORACLE_RBO_OVERLAP


# ---------------------------------------------------------------------
# positional phrase search ("table hash" must be consecutive)
# ---------------------------------------------------------------------


def q_phrase_search(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return phrase_search(docs, "table hash").orderBy("doc_id")


ORACLE_PHRASE_SEARCH = """
WITH w AS (
  SELECT doc_id,
         regexp_extract_all(lower(text), '[a-z0-9]+') AS ws
  FROM documents
),
pos AS (
  SELECT doc_id, ws,
         unnest(generate_series(1, len(ws))) AS p,
         unnest(ws) AS wd
  FROM w
),
hits AS (
  SELECT doc_id, p
  FROM pos
  WHERE wd = 'table' AND ws[p : p + 1] = ['table', 'hash']
)
SELECT doc_id,
       CAST(count(*) AS BIGINT) AS n_matches,
       CAST(min(p) AS BIGINT) AS first_pos
FROM hits GROUP BY 1
ORDER BY doc_id
"""

EXT23_QUERIES["phrase_search"] = q_phrase_search
EXT23_ORACLES["phrase_search"] = ORACLE_PHRASE_SEARCH


# ---------------------------------------------------------------------
# k-anonymity audit over (event_type, dow, floor(value)) quasi-ids
# ---------------------------------------------------------------------


def q_k_anonymity(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.pmod(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-05").cast("date")
            ),
            F.lit(7),
        ).alias("dow"),
        F.floor("value").cast("long").alias("vb"),
    )
    return k_anonymity(ev, ["event_type", "dow", "vb"], k=5)


ORACLE_K_ANONYMITY = """
WITH qi AS (
  SELECT event_type,
         CAST(((CAST(ts AS DATE) - DATE '1970-01-05') % 7 + 7) % 7 AS INT)
           AS dow,
         CAST(floor(value) AS BIGINT) AS vb
  FROM events
),
s AS (
  SELECT event_type, dow, vb, count(*) AS n
  FROM qi GROUP BY 1, 2, 3
)
SELECT CAST(5 AS INT) AS k,
       CAST(sum(n) AS BIGINT) AS n_rows,
       CAST(count(*) AS BIGINT) AS n_groups,
       CAST(sum(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_risky_groups,
       CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT)
         AS n_risky_rows,
       CAST(min(n) AS BIGINT) AS min_group_n,
       round(CAST(sum(CASE WHEN n < 5 THEN n ELSE 0 END) AS DOUBLE)
             / CAST(sum(n) AS DOUBLE), 6) AS risky_row_frac
FROM s
"""

EXT23_QUERIES["k_anonymity"] = q_k_anonymity
EXT23_ORACLES["k_anonymity"] = ORACLE_K_ANONYMITY
