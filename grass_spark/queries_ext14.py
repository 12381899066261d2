"""Fourteenth wave of driver-contract queries: retrieval & robust
analytics — BM25 search (operators/search.py), PMI collocations
(operators/collocations.py), median/MAD outliers
(operators/robust.py), Kaplan–Meier retention survival
(operators/survival.py) and daily-series autocorrelation
(operators/acf.py).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F  # noqa: F401  (parity with siblings)

from grass_spark.operators.acf import acf_daily
from grass_spark.operators.collocations import pmi_collocations
from grass_spark.operators.robust import mad_outliers
from grass_spark.operators.search import bm25_search
from grass_spark.operators.survival import km_survival
from grass_spark.queries_ext import _t

EXT14_QUERIES: dict = {}
EXT14_ORACLES: dict = {}


# ---------------------------------------------------------------------
# BM25 retrieval — 3 probe queries over the documents table, top-10
# docs each.  k1 = 1.2, b = 0.75; Spark literal k1+1.0 (Python sum)
# rounds to the same double as the SQL literal 2.2 (verified).
# ---------------------------------------------------------------------

_BM25_QUERIES = [
    (1, "hash join table"),
    (2, "window agg batch"),
    (3, "slow query scan"),
]


def q_bm25_search(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    q = spark.createDataFrame(
        _BM25_QUERIES, "query_id int, q_text string"
    )
    return bm25_search(docs, q, top_k=10).orderBy("query_id", "rank")


ORACLE_BM25 = """
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
scored AS (
  SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_terms,
         round(sum(c), 6) AS score
  FROM contrib GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY score DESC, doc_id ASC) AS rank
  FROM scored
)
SELECT query_id, doc_id, n_terms, score, CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
"""

EXT14_QUERIES["bm25_search"] = q_bm25_search
EXT14_ORACLES["bm25_search"] = ORACLE_BM25


# ---------------------------------------------------------------------
# PMI collocations — top-20 adjacent pairs seen >= 5 times
# ---------------------------------------------------------------------


def q_pmi_collocations(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("text")
    return pmi_collocations(docs, min_count=5, top_k=20)


ORACLE_PMI = """
WITH ws AS (
  SELECT regexp_extract_all(lower(text), '[a-z0-9]+') AS w
  FROM documents
),
uc AS (
  SELECT word, count(*) AS cw
  FROM (SELECT unnest(w) AS word FROM ws) GROUP BY 1
),
big AS (
  SELECT w[i] AS w1, w[i + 1] AS w2
  FROM ws, unnest(generate_series(1, len(w) - 1)) AS t(i)
  WHERE len(w) >= 2
),
bc AS (SELECT w1, w2, count(*) AS cxy FROM big GROUP BY 1, 2),
sc AS (
  SELECT (SELECT sum(cw) FROM uc) AS n1,
         (SELECT sum(cxy) FROM bc) AS nb
),
j AS (
  SELECT bc.w1, bc.w2, bc.cxy, u1.cw AS c1, u2.cw AS c2, sc.n1, sc.nb
  FROM bc
  JOIN uc u1 ON bc.w1 = u1.word
  JOIN uc u2 ON bc.w2 = u2.word
  CROSS JOIN sc
  WHERE bc.cxy >= 5
),
p AS (
  SELECT w1, w2, cxy, c1, c2,
         round(ln(((CAST(cxy AS DOUBLE) * CAST(n1 AS DOUBLE))
                   * CAST(n1 AS DOUBLE))
                  / ((CAST(nb AS DOUBLE) * CAST(c1 AS DOUBLE))
                     * CAST(c2 AS DOUBLE))), 6) AS pmi
  FROM j
),
r AS (
  SELECT *, row_number() OVER (ORDER BY pmi DESC, w1 ASC, w2 ASC) AS rank
  FROM p
)
SELECT w1, w2, CAST(cxy AS BIGINT) AS cxy, CAST(c1 AS BIGINT) AS c1,
       CAST(c2 AS BIGINT) AS c2, pmi, CAST(rank AS INT) AS rank
FROM r WHERE rank <= 20
ORDER BY rank
"""

EXT14_QUERIES["pmi_collocations"] = q_pmi_collocations
EXT14_ORACLES["pmi_collocations"] = ORACLE_PMI


# ---------------------------------------------------------------------
# median/MAD outliers — per-source robust length gate
# ---------------------------------------------------------------------


def q_mad_outliers(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("source", "n_chars")
    return mad_outliers(docs, value_col="n_chars", group_col="source", k=3.0)


ORACLE_MAD = """
WITH med AS (
  SELECT source, median(n_chars) AS med, count(*) AS n
  FROM documents GROUP BY 1
),
dev AS (
  SELECT d.source, abs(CAST(d.n_chars AS DOUBLE) - m.med) AS dv
  FROM documents d JOIN med m USING (source)
),
mad AS (SELECT source, median(dv) AS mad FROM dev GROUP BY 1),
fl AS (
  SELECT dev.source,
         round(CAST(3.0 AS DOUBLE) * CAST(1.4826 AS DOUBLE) * mad.mad, 6)
           AS cutoff,
         sum(CASE WHEN round(dv, 6) >
                  round(CAST(3.0 AS DOUBLE) * CAST(1.4826 AS DOUBLE)
                        * mad.mad, 6)
                  THEN 1 ELSE 0 END) AS n_outliers,
         count(*) AS n2
  FROM dev JOIN mad USING (source)
  GROUP BY 1, 2
)
SELECT med.source, CAST(med.n AS BIGINT) AS n,
       round(med.med, 6) AS med, round(mad.mad, 6) AS mad, fl.cutoff,
       CAST(fl.n_outliers AS BIGINT) AS n_outliers,
       round(CAST(fl.n_outliers AS DOUBLE) / CAST(fl.n2 AS DOUBLE), 6)
         AS outlier_frac
FROM med JOIN mad USING (source) JOIN fl USING (source)
ORDER BY med.source
"""

EXT14_QUERIES["mad_outliers"] = q_mad_outliers
EXT14_ORACLES["mad_outliers"] = ORACLE_MAD


# ---------------------------------------------------------------------
# Kaplan-Meier retention survival — 7-day churn gap
# ---------------------------------------------------------------------


def q_km_survival(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("user_id", "ts")
    return km_survival(ev, churn_gap_days=7)


ORACLE_KM = """
WITH pu AS (
  SELECT user_id, min(ts) AS f, max(ts) AS l FROM events GROUP BY 1
),
mx AS (SELECT max(ts) AS maxts FROM events),
lab AS (
  SELECT CAST(date_diff('day', CAST(f AS DATE), CAST(l AS DATE)) AS INT)
           AS lifetime_day,
         (l < maxts - INTERVAL 7 DAY) AS churned
  FROM pu CROSS JOIN mx
),
cen AS (
  SELECT lifetime_day,
         sum(CASE WHEN churned THEN 1 ELSE 0 END) AS n_churned,
         sum(CASE WHEN churned THEN 0 ELSE 1 END) AS n_censored
  FROM lab GROUP BY 1
),
st AS (
  SELECT lifetime_day, n_churned, n_censored,
         sum(n_churned + n_censored) OVER ()
         - coalesce(sum(n_churned + n_censored) OVER (
             ORDER BY lifetime_day
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS n_at_risk
  FROM cen
),
st2 AS (
  SELECT *,
         sum(CASE WHEN n_churned < n_at_risk THEN
               round(ln(CAST(1 AS DOUBLE)
                        - CAST(n_churned AS DOUBLE)
                          / CAST(n_at_risk AS DOUBLE)), 6)
             END) OVER (ORDER BY lifetime_day
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cumln,
         max(CASE WHEN n_churned >= n_at_risk THEN 1 ELSE 0 END)
           OVER (ORDER BY lifetime_day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
  FROM st
)
SELECT lifetime_day, CAST(n_at_risk AS BIGINT) AS n_at_risk,
       CAST(n_churned AS BIGINT) AS n_churned,
       CAST(n_censored AS BIGINT) AS n_censored,
       CASE WHEN dead = 1 THEN CAST(0 AS DOUBLE)
            ELSE round(exp(coalesce(cumln, CAST(0 AS DOUBLE))), 6)
       END AS survival
FROM st2 ORDER BY lifetime_day
"""

EXT14_QUERIES["km_survival"] = q_km_survival
EXT14_ORACLES["km_survival"] = ORACLE_KM


# ---------------------------------------------------------------------
# daily-count autocorrelation — lags 1..7 over the gap-filled series
# ---------------------------------------------------------------------


def q_acf_daily(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("ts")
    return acf_daily(ev, max_lag=7)


ORACLE_ACF = """
WITH cen AS (
  SELECT CAST(ts AS DATE) AS day, count(*) AS c FROM events GROUP BY 1
),
bounds AS (SELECT min(day) AS lo, max(day) AS hi FROM cen),
spine AS (
  SELECT CAST(unnest(generate_series(CAST(lo AS TIMESTAMP),
                                     CAST(hi AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
),
ser AS (
  SELECT spine.day, coalesce(c, 0) AS x
  FROM spine LEFT JOIN cen USING (day)
),
sc AS (
  SELECT count(*) AS n, sum(x) AS s1,
         sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS s2
  FROM ser
),
lg AS (
  SELECT a.day, a.x AS xa, CAST(t.lag AS INT) AS lag
  FROM ser a, unnest(generate_series(1, 7)) AS t(lag)
),
pr AS (
  SELECT lg.lag, lg.xa, b.x AS xb
  FROM lg JOIN ser b ON b.day = lg.day + lg.lag
),
ag AS (
  SELECT lag, count(*) AS n_pairs,
         sum(CAST(xa AS HUGEINT) * CAST(xb AS HUGEINT)) AS sxy,
         sum(xa) AS sxa, sum(xb) AS sxb
  FROM pr GROUP BY 1
)
SELECT CAST(ag.lag AS INT) AS lag, CAST(ag.n_pairs AS BIGINT) AS n_pairs,
       CASE WHEN (CAST(sc.s2 AS DOUBLE)
                  - CAST(sc.n AS DOUBLE)
                    * ((CAST(sc.s1 AS DOUBLE) / CAST(sc.n AS DOUBLE))
                       * (CAST(sc.s1 AS DOUBLE) / CAST(sc.n AS DOUBLE))))
                 <> CAST(0 AS DOUBLE)
       THEN round((CAST(ag.sxy AS DOUBLE)
                   - (CAST(sc.s1 AS DOUBLE) / CAST(sc.n AS DOUBLE))
                     * (CAST(ag.sxa AS DOUBLE) + CAST(ag.sxb AS DOUBLE))
                   + CAST(ag.n_pairs AS DOUBLE)
                     * ((CAST(sc.s1 AS DOUBLE) / CAST(sc.n AS DOUBLE))
                        * (CAST(sc.s1 AS DOUBLE) / CAST(sc.n AS DOUBLE))))
                  / (CAST(sc.s2 AS DOUBLE)
                     - CAST(sc.n AS DOUBLE)
                       * ((CAST(sc.s1 AS DOUBLE) / CAST(sc.n AS DOUBLE))
                          * (CAST(sc.s1 AS DOUBLE) / CAST(sc.n AS DOUBLE)))),
                  6)
       END AS acf
FROM ag CROSS JOIN sc ORDER BY lag
"""

EXT14_QUERIES["acf_daily"] = q_acf_daily
EXT14_ORACLES["acf_daily"] = ORACLE_ACF
