"""Thirty-eighth wave of driver-contract queries: MRR / MAP retrieval
evaluation (operators/fusion.py ``mrr_ap_at_k`` — grading the same
label-relevant cosine retrieval the NDCG query scores, so the two
metrics are directly comparable) and post-stratified ATE
(operators/abtest.py ``stratified_ate`` — stratum-weighted
treated-vs-control difference over order revenue, strata =
``o_orderpriority``, deterministic md5 assignment).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from grass_spark.operators.abtest import assign_variant, stratified_ate
from grass_spark.operators.fusion import mrr_ap_at_k
from grass_spark.operators.similarity import dot, l2norm
from grass_spark.queries_ext import _t

EXT38_QUERIES: dict = {}
EXT38_ORACLES: dict = {}


# ---------------------------------------------------------------------
# MRR / AP@10 of label-relevant retrieval (same ranking as ndcg_eval)
# ---------------------------------------------------------------------


def q_mrr_eval(spark, sf_dir):
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
    return mrr_ap_at_k(ranked, totals, k=10).orderBy("q_id")


ORACLE_MRR_EVAL = """
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
cum AS (
  SELECT q_id, rank, rel,
         CAST(sum(rel) OVER (PARTITION BY q_id ORDER BY rank)
              AS BIGINT) AS cr
  FROM topk
),
per_q AS (
  SELECT q_id,
         CAST(sum(rel) AS BIGINT) AS rel_at_k,
         min(CASE WHEN rel = 1 THEN rank END) AS fr,
         round(sum(CASE WHEN rel = 1 THEN
                     CAST(cr AS DOUBLE) / CAST(rank AS DOUBLE)
                   END), 6) AS apnum
  FROM cum GROUP BY 1
),
totals AS (
  SELECT q.q_id,
         CAST((SELECT count(*) FROM e WHERE e.label = q.ql) - 1 AS BIGINT)
           AS n_rel
  FROM q
)
SELECT t.q_id, t.n_rel,
       coalesce(p.rel_at_k, 0) AS rel_at_k,
       CASE WHEN t.n_rel > 0 THEN
         coalesce(round(CAST(1 AS DOUBLE) / CAST(p.fr AS DOUBLE), 6),
                  CAST(0 AS DOUBLE))
       END AS rr,
       CASE WHEN t.n_rel > 0 THEN
         round(coalesce(p.apnum, CAST(0 AS DOUBLE))
               / CAST(least(CAST(10 AS BIGINT), t.n_rel) AS DOUBLE), 6)
       END AS ap
FROM totals t LEFT JOIN per_q p USING (q_id)
ORDER BY t.q_id
"""


# ---------------------------------------------------------------------
# post-stratified ATE over order revenue (strata = o_orderpriority)
# ---------------------------------------------------------------------


def q_stratified_ate(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderpriority").alias("st"),
        assign_variant("o_custkey", salt="strat").alias("g"),
        F.col("o_totalprice").alias("value"),
    )
    return stratified_ate(
        o, stratum_col="st", group_col="g", value_col="value", treat="B"
    )


ORACLE_STRATIFIED_ATE = """
WITH base AS (
  SELECT CASE WHEN CAST('0x' || substr(
                     md5('strat:' || CAST(o_custkey AS VARCHAR)), 1, 8)
                   AS UBIGINT) / CAST(4294967296 AS DOUBLE)
                   < CAST('0.5' AS DOUBLE)
              THEN 'B' ELSE 'A' END AS g,
         o_orderpriority AS st,
         CAST(round(o_totalprice * 100) AS BIGINT) AS c
  FROM orders WHERE o_totalprice IS NOT NULL
),
cen AS (
  SELECT st,
         CAST(sum(CASE WHEN g = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS nt,
         sum(CAST(CASE WHEN g = 'B' THEN c ELSE 0 END AS HUGEINT)) AS vt,
         CAST(sum(CASE WHEN g = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS nc,
         sum(CAST(CASE WHEN g = 'A' THEN c ELSE 0 END AS HUGEINT)) AS vc
  FROM base GROUP BY 1
),
terms AS (
  SELECT nt, nc,
         round(CAST(nt + nc AS DOUBLE)
               * round(CAST(vt AS DOUBLE)
                       / (CAST(nt AS DOUBLE) * CAST(100 AS DOUBLE))
                       - CAST(vc AS DOUBLE)
                       / (CAST(nc AS DOUBLE) * CAST(100 AS DOUBLE)), 6),
               6) AS term
  FROM cen WHERE nt > 0 AND nc > 0
),
used AS (
  SELECT CAST(count(*) AS BIGINT) AS n_strata_used,
         CAST(coalesce(sum(nt), 0) AS BIGINT) AS n_treat,
         CAST(coalesce(sum(nc), 0) AS BIGINT) AS n_ctrl,
         sum(term) AS tsum
  FROM terms
),
unadj AS (
  SELECT CAST(sum(nt) AS BIGINT) AS ant, sum(vt) AS avt,
         CAST(sum(nc) AS BIGINT) AS anc, sum(vc) AS avc
  FROM cen
)
SELECT n_strata_used, n_treat, n_ctrl,
       CASE WHEN n_strata_used > 0 THEN
         round(tsum / CAST(n_treat + n_ctrl AS DOUBLE), 6)
       END AS ate,
       CASE WHEN ant > 0 AND anc > 0 THEN
         round(CAST(avt AS DOUBLE)
               / (CAST(ant AS DOUBLE) * CAST(100 AS DOUBLE))
               - CAST(avc AS DOUBLE)
               / (CAST(anc AS DOUBLE) * CAST(100 AS DOUBLE)), 6)
       END AS diff_unadj
FROM used CROSS JOIN unadj
"""


EXT38_QUERIES.update(
    {
        "mrr_eval": q_mrr_eval,
        "stratified_ate": q_stratified_ate,
    }
)
EXT38_ORACLES.update(
    {
        "mrr_eval": ORACLE_MRR_EVAL,
        "stratified_ate": ORACLE_STRATIFIED_ATE,
    }
)
