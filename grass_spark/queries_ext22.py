"""Twenty-second wave of driver-contract queries: hybrid-retrieval
rank fusion (operators/fusion.py), Matryoshka truncated-dim shortlist
with exact full-dim re-rank (operators/similarity.py), NDCG retrieval
evaluation (operators/fusion.py), and the CUBE grouping-sets report
(operators/olap.py).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from grass_spark.operators.fusion import ndcg_at_k, rrf_fuse
from grass_spark.operators.olap import cube_report
from grass_spark.operators.search import bm25_search
from grass_spark.operators.similarity import dot, l2norm, mrl_rerank
from grass_spark.queries_ext import _t
from grass_spark.queries_ext14 import _BM25_QUERIES

EXT22_QUERIES: dict = {}
EXT22_ORACLES: dict = {}


# ---------------------------------------------------------------------
# reciprocal-rank fusion: BM25 lexical + dense cosine hybrid
# ---------------------------------------------------------------------
#
# The testdata convention doc_id == vec_id (operators/corpus.py's
# semantic stage) makes the hybrid real: each query carries BOTH a
# text (BM25 over documents) and a seed vector (cosine over
# embeddings, seed vec_id = 100 + query_id, seed excluded from its
# own candidates); RRF fuses the two top-20 lists.


def _dense_ranking(spark, sf_dir, top: int):
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    q = emb.filter(F.col("vec_id").isin(101, 102, 103)).select(
        (F.col("vec_id") - 100).cast("int").alias("query_id"),
        F.col("vec_id").alias("seed_id"),
        F.col("e").alias("qe"),
    )
    sim = F.round(
        dot("qe", "e") / (l2norm("qe") * l2norm("e")), 6
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("seed_id"))
        .select("query_id", F.col("vec_id").alias("doc_id"), sim.alias("c"))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("c"), F.asc("doc_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= top)
        .select("query_id", "doc_id", "rank")
    )


def q_rrf_fusion(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    q = spark.createDataFrame(_BM25_QUERIES, "query_id int, q_text string")
    lex = bm25_search(docs, q, top_k=20).select("query_id", "doc_id", "rank")
    dense = _dense_ranking(spark, sf_dir, 20)
    return rrf_fuse([lex, dense], k_rrf=60, top_k=10).orderBy(
        "query_id", "rank"
    )


ORACLE_RRF_FUSION = """
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
                            ORDER BY score DESC, doc_id ASC) AS rank
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
                            ORDER BY c DESC, doc_id ASC) AS rank
  FROM dpairs
),
u AS (
  SELECT query_id, doc_id, rank FROM lex WHERE rank <= 20
  UNION ALL
  SELECT query_id, doc_id, rank FROM dense WHERE rank <= 20
),
fused AS (
  SELECT query_id, doc_id,
         CAST(count(*) AS BIGINT) AS n_lists,
         CAST(min(rank) AS BIGINT) AS best_rank,
         round(sum(CAST(1 AS DOUBLE)
                   / (CAST(60 AS DOUBLE) + CAST(rank AS DOUBLE))), 6)
           AS rrf_score
  FROM u GROUP BY 1, 2
),
ranked AS (
  SELECT *, row_number() OVER (PARTITION BY query_id
                               ORDER BY rrf_score DESC, doc_id ASC) AS rank
  FROM fused
)
SELECT query_id, doc_id, n_lists, best_rank, rrf_score,
       CAST(rank AS INT) AS rank
FROM ranked WHERE rank <= 10
ORDER BY query_id, rank
"""

EXT22_QUERIES["rrf_fusion"] = q_rrf_fusion
EXT22_ORACLES["rrf_fusion"] = ORACLE_RRF_FUSION


# ---------------------------------------------------------------------
# Matryoshka shortlist + exact re-rank (16 of 64 dims -> top-5)
# ---------------------------------------------------------------------


def q_mrl_shortlist(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    return mrl_rerank(
        emb, q, trunc_dims=16, shortlist=20, k=5
    ).orderBy("q_id", "rank")


ORACLE_MRL_SHORTLIST = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT vec_id AS q_id, e AS qe FROM e WHERE vec_id < 3),
tp AS (
  SELECT q.q_id, e.vec_id AS neighbor_id, e.e AS fe, q.qe AS fq,
         round(list_inner_product(q.qe[1:16], e.e[1:16])
               / (sqrt(list_inner_product(q.qe[1:16], q.qe[1:16]))
                  * sqrt(list_inner_product(e.e[1:16], e.e[1:16]))), 6)
           AS cosine_trunc
  FROM q CROSS JOIN e WHERE e.vec_id <> q.q_id
),
short AS (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cosine_trunc DESC,
                                        neighbor_id ASC) AS srank
  FROM tp
),
rer AS (
  SELECT q_id, neighbor_id, cosine_trunc,
         round(list_inner_product(fq, fe)
               / (sqrt(list_inner_product(fq, fq))
                  * sqrt(list_inner_product(fe, fe))), 6) AS cosine
  FROM short WHERE srank <= 20
),
ranked AS (
  SELECT q_id, neighbor_id, cosine, cosine_trunc,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, neighbor_id ASC) AS rank
  FROM rer
)
SELECT q_id, CAST(rank AS INT) AS rank, neighbor_id, cosine, cosine_trunc
FROM ranked WHERE rank <= 5
ORDER BY q_id, rank
"""

EXT22_QUERIES["mrl_shortlist"] = q_mrl_shortlist
EXT22_ORACLES["mrl_shortlist"] = ORACLE_MRL_SHORTLIST


# ---------------------------------------------------------------------
# NDCG@10 of label-relevant retrieval (binary gain = label match)
# ---------------------------------------------------------------------


def q_ndcg_eval(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id",
        "label",
        F.transform("embedding", lambda x: x.cast("double")).alias("e"),
    )
    q = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("q_id"),
        F.col("label").alias("ql"),
        F.col("e").alias("qe"),
    )
    sim = F.round(dot("qe", "e") / (l2norm("qe") * l2norm("e")), 6)
    pairs = (
        F.broadcast(q)
        .crossJoin(emb)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id",
            "ql",
            F.col("vec_id").alias("neighbor_id"),
            "label",
            sim.alias("c"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("c"), F.asc("neighbor_id"))
    ranked = (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .select(
            "q_id",
            "rank",
            F.when(F.col("label") == F.col("ql"), 1)
            .otherwise(0)
            .alias("rel"),
        )
    )
    lab = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n_lab"))
    totals = (
        q.join(F.broadcast(lab), q["ql"] == lab["label"])
        .select("q_id", (F.col("n_lab") - 1).alias("n_rel"))
    )
    return ndcg_at_k(ranked, totals, k=10).orderBy("q_id")


ORACLE_NDCG_EVAL = """
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
),
q AS (
  SELECT vec_id AS q_id, label AS ql, e AS qe FROM e WHERE vec_id < 8
),
pairs AS (
  SELECT q.q_id, q.ql, e.vec_id AS neighbor_id, e.label,
         round(list_inner_product(q.qe, e.e)
               / (sqrt(list_inner_product(q.qe, q.qe))
                  * sqrt(list_inner_product(e.e, e.e))), 6) AS c
  FROM q CROSS JOIN e WHERE e.vec_id <> q.q_id
),
ranked AS (
  SELECT q_id, ql, label,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY c DESC, neighbor_id ASC) AS rank
  FROM pairs
),
topk AS (
  SELECT q_id,
         CASE WHEN label = ql THEN 1 ELSE 0 END AS rel,
         rank
  FROM ranked WHERE rank <= 10
),
per_q AS (
  SELECT q_id,
         CAST(sum(rel) AS BIGINT) AS rel_at_k,
         round(sum(CAST(rel AS DOUBLE)
                   / log2(CAST(rank AS DOUBLE) + CAST(1 AS DOUBLE))), 6)
           AS dcg
  FROM topk GROUP BY 1
),
totals AS (
  SELECT q.q_id,
         CAST((SELECT count(*) FROM e WHERE e.label = q.ql) - 1 AS BIGINT)
           AS n_rel
  FROM q
),
steps AS (SELECT unnest(generate_series(1, 10)) AS i),
itab AS (
  SELECT i AS m,
         round(sum(CAST(1 AS DOUBLE)
                   / log2(CAST(i AS DOUBLE) + CAST(1 AS DOUBLE)))
               OVER (ORDER BY i), 6) AS idcg
  FROM steps
),
idcg AS (
  SELECT t.q_id, t.n_rel, itab.idcg
  FROM totals t
  LEFT JOIN itab ON itab.m = least(CAST(10 AS BIGINT), t.n_rel)
)
SELECT i.q_id, i.n_rel,
       coalesce(p.rel_at_k, 0) AS rel_at_k,
       coalesce(p.dcg, CAST(0 AS DOUBLE)) AS dcg,
       i.idcg,
       CASE WHEN i.idcg IS NOT NULL THEN
         round(coalesce(p.dcg, CAST(0 AS DOUBLE)) / i.idcg, 6)
       END AS ndcg
FROM idcg i LEFT JOIN per_q p USING (q_id)
ORDER BY q_id
"""

EXT22_QUERIES["ndcg_eval"] = q_ndcg_eval
EXT22_ORACLES["ndcg_eval"] = ORACLE_NDCG_EVAL


# ---------------------------------------------------------------------
# CUBE grouping-sets report (event_type x portable dow)
# ---------------------------------------------------------------------


def q_cube_report(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.pmod(
            F.datediff(
                F.col("ts").cast("date"), F.lit("1970-01-05").cast("date")
            ),
            F.lit(7),
        ).alias("dow"),
        "value",
    )
    return cube_report(ev, ["event_type", "dow"], value_col="value")


ORACLE_CUBE_REPORT = """
WITH base AS (
  SELECT event_type,
         CAST(((CAST(ts AS DATE) - DATE '1970-01-05') % 7 + 7) % 7 AS INT)
           AS dow,
         value
  FROM events
)
SELECT event_type, dow,
       CAST(grouping_id(event_type, dow) AS BIGINT) AS level,
       CAST(count(*) AS BIGINT) AS n,
       round(CAST(sum(coalesce(CAST(round(value * 100) AS BIGINT), 0))
                  AS DOUBLE) / CAST(100 AS DOUBLE), 2) AS value_sum
FROM base
GROUP BY CUBE(event_type, dow)
ORDER BY level, event_type ASC NULLS FIRST, dow ASC NULLS FIRST
"""

EXT22_QUERIES["cube_report"] = q_cube_report
EXT22_ORACLES["cube_report"] = ORACLE_CUBE_REPORT
