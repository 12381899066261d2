"""Twenty-fourth wave of driver-contract queries: classifier
evaluation (operators/mleval.py — exact AUC, calibration bins,
PR-threshold sweep) and corpus snapshot diffing
(operators/corpusstats.py).

The eval queries grade a deterministic "length-quality" score
(6-dp-rounded sigmoid of n_chars) against the ``lang == 'en'`` label —
the score is a stand-in for any classifier output; exactness of the
metrics, not the score, is what the oracles gate.

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.corpusstats import corpus_diff
from grass_spark.operators.mleval import (
    auc_eval,
    calibration_bins,
    pr_thresholds,
)
from grass_spark.queries_ext import _t

EXT24_QUERIES: dict = {}
EXT24_ORACLES: dict = {}


def _scored(spark, sf_dir):
    """(doc_id, score in [0,1], label 0/1) — sigmoid of n_chars,
    rounded BEFORE use (the classify.py lesson: JVM vs libm exp can
    differ in the last ulp; comparisons run on the rounded value)."""
    docs = _t(spark, sf_dir, "documents")
    s = F.round(
        F.lit(1.0)
        / (
            F.lit(1.0)
            + F.exp(
                -(F.col("n_chars").cast("double") - F.lit(500.0))
                / F.lit(200.0)
            )
        ),
        6,
    )
    return docs.select(
        "doc_id",
        s.alias("score"),
        (F.col("lang") == "en").cast("int").alias("label"),
    )


_SQL_SCORED = """
  SELECT doc_id,
         round(CAST(1 AS DOUBLE)
               / (CAST(1 AS DOUBLE)
                  + exp(-(CAST(n_chars AS DOUBLE) - CAST(500 AS DOUBLE))
                        / CAST(200 AS DOUBLE))), 6) AS score,
         CAST(lang = 'en' AS INT) AS label
  FROM documents
"""


# ---------------------------------------------------------------------
# exact ROC-AUC via tie-averaged rank sums
# ---------------------------------------------------------------------


def q_auc_eval(spark, sf_dir):
    return auc_eval(_scored(spark, sf_dir))


ORACLE_AUC_EVAL = f"""
WITH scored AS ({_SQL_SCORED}),
va AS (SELECT score AS v FROM scored WHERE label = 1),
vb AS (SELECT score AS v FROM scored WHERE label = 0),
ca AS (SELECT v, count(*) AS ca FROM va GROUP BY 1),
cb AS (SELECT v, count(*) AS cb FROM vb GROUP BY 1),
j AS (
  SELECT v, coalesce(ca, 0) AS ca, coalesce(cb, 0) AS cb
  FROM ca FULL OUTER JOIN cb USING (v)
),
st AS (
  SELECT v, ca, cb, ca + cb AS t,
         coalesce(sum(ca + cb) OVER (
           ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS prev
  FROM j
),
agg AS (
  SELECT CAST(sum(ca) AS BIGINT) AS n_a, CAST(sum(cb) AS BIGINT) AS n_b,
         sum(CAST(ca AS HUGEINT)
             * CAST(2 * prev + t + 1 AS HUGEINT)) AS r2a,
         sum(CAST(t AS HUGEINT) * CAST(t AS HUGEINT) * CAST(t AS HUGEINT)
             - CAST(t AS HUGEINT)) AS ties
  FROM st
),
u AS (
  SELECT n_a, n_b, ties,
         r2a - CAST(n_a AS HUGEINT) * (CAST(n_a AS HUGEINT) + 1) AS u2a
  FROM agg
)
SELECT n_a AS n_pos, n_b AS n_neg,
       CASE WHEN n_a > 0 AND n_b > 0 THEN
         round((CAST(u2a AS DOUBLE) / CAST(2 AS DOUBLE))
               / (CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)), 6)
       END AS auc,
       CASE WHEN round((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                        / CAST(12 AS DOUBLE))
                       * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
                           + CAST(1 AS DOUBLE))
                          - CAST(ties AS DOUBLE)
                            / ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE))
                               * (CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
                                  - CAST(1 AS DOUBLE)))), 6) > 0
       THEN round((CAST(u2a AS DOUBLE)
                   - CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE))
                  / (CAST(2 AS DOUBLE)
                     * sqrt((CAST(n_a AS DOUBLE) * CAST(n_b AS DOUBLE)
                             / CAST(12 AS DOUBLE))
                            * ((CAST(n_a AS DOUBLE) + CAST(n_b AS DOUBLE)
                                + CAST(1 AS DOUBLE))
                               - CAST(ties AS DOUBLE)
                                 / ((CAST(n_a AS DOUBLE)
                                     + CAST(n_b AS DOUBLE))
                                    * (CAST(n_a AS DOUBLE)
                                       + CAST(n_b AS DOUBLE)
                                       - CAST(1 AS DOUBLE)))))), 6)
       END AS z
FROM u
"""

EXT24_QUERIES["auc_eval"] = q_auc_eval
EXT24_ORACLES["auc_eval"] = ORACLE_AUC_EVAL


# ---------------------------------------------------------------------
# calibration bins (reliability diagram)
# ---------------------------------------------------------------------


def q_calibration_bins(spark, sf_dir):
    return calibration_bins(_scored(spark, sf_dir), n_bins=10).orderBy(
        "bin"
    )


ORACLE_CALIBRATION_BINS = f"""
WITH scored AS ({_SQL_SCORED})
SELECT CAST(least(CAST(floor(score * 10) AS INT), 9) AS INT) AS bin,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(label) AS BIGINT) AS n_pos,
       round(avg(score), 6) AS mean_score,
       round(CAST(sum(label) AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
         AS frac_pos
FROM scored
GROUP BY 1
ORDER BY bin
"""

EXT24_QUERIES["calibration_bins"] = q_calibration_bins
EXT24_ORACLES["calibration_bins"] = ORACLE_CALIBRATION_BINS


# ---------------------------------------------------------------------
# precision / recall / F1 threshold sweep
# ---------------------------------------------------------------------

_PR_THRESHOLDS = [0.1, 0.3, 0.5, 0.7, 0.9]


def q_pr_thresholds(spark, sf_dir):
    return pr_thresholds(
        _scored(spark, sf_dir), _PR_THRESHOLDS
    ).orderBy("threshold")


def _pr_values() -> str:
    return ", ".join(f"(CAST({t!r} AS DOUBLE))" for t in _PR_THRESHOLDS)


ORACLE_PR_THRESHOLDS = f"""
WITH scored AS ({_SQL_SCORED}),
th(threshold) AS (VALUES {_pr_values()}),
c AS (
  SELECT th.threshold,
         CAST(sum(CASE WHEN scored.score >= th.threshold
                       THEN scored.label ELSE 0 END) AS BIGINT) AS tp,
         CAST(sum(CASE WHEN scored.score >= th.threshold
                       THEN 1 - scored.label ELSE 0 END) AS BIGINT) AS fp,
         CAST(sum(scored.label) AS BIGINT)
           - CAST(sum(CASE WHEN scored.score >= th.threshold
                           THEN scored.label ELSE 0 END) AS BIGINT) AS fn
  FROM th CROSS JOIN scored
  GROUP BY 1
),
m AS (
  SELECT threshold, tp, fp, fn,
         CASE WHEN tp + fp > 0 THEN
           round(CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE)
                                       + CAST(fp AS DOUBLE)), 6)
         END AS precision,
         CASE WHEN tp + fn > 0 THEN
           round(CAST(tp AS DOUBLE) / (CAST(tp AS DOUBLE)
                                       + CAST(fn AS DOUBLE)), 6)
         END AS recall
  FROM c
)
SELECT threshold, tp, fp, fn, precision, recall,
       CASE WHEN precision IS NOT NULL AND recall IS NOT NULL
                 AND precision + recall > 0 THEN
         round(CAST(2 AS DOUBLE) * precision * recall
               / (precision + recall), 6)
       END AS f1
FROM m
ORDER BY threshold
"""

EXT24_QUERIES["pr_thresholds"] = q_pr_thresholds
EXT24_ORACLES["pr_thresholds"] = ORACLE_PR_THRESHOLDS


# ---------------------------------------------------------------------
# corpus snapshot diff (old vs deterministically-mutated new)
# ---------------------------------------------------------------------


def q_corpus_diff(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    kept = docs.where(F.col("doc_id") % 17 != 0)
    new = kept.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" v2"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    ).unionAll(
        docs.where(F.col("doc_id") < 5).select(
            (F.col("doc_id") + 100000).alias("doc_id"),
            F.concat(F.lit("new doc "), F.col("doc_id").cast("string"))
            .alias("text"),
        )
    )
    return corpus_diff(docs, new).orderBy("status")


ORACLE_CORPUS_DIFF = """
WITH old AS (SELECT doc_id, md5(text) AS h FROM documents),
new AS (
  SELECT doc_id,
         md5(CASE WHEN doc_id % 13 = 0 THEN text || ' v2' ELSE text END)
           AS h
  FROM documents WHERE doc_id % 17 <> 0
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         md5('new doc ' || CAST(doc_id AS VARCHAR)) AS h
  FROM documents WHERE doc_id < 5
),
j AS (
  SELECT CASE WHEN old.h IS NULL THEN 'added'
              WHEN new.h IS NULL THEN 'removed'
              WHEN old.h = new.h THEN 'unchanged'
              ELSE 'changed' END AS status
  FROM old FULL OUTER JOIN new USING (doc_id)
),
c AS (SELECT status, count(*) AS n_docs FROM j GROUP BY 1),
spine(status) AS (
  VALUES ('added'), ('removed'), ('changed'), ('unchanged')
)
SELECT spine.status,
       CAST(coalesce(c.n_docs, 0) AS BIGINT) AS n_docs
FROM spine LEFT JOIN c USING (status)
ORDER BY status
"""

EXT24_QUERIES["corpus_diff"] = q_corpus_diff
EXT24_ORACLES["corpus_diff"] = ORACLE_CORPUS_DIFF
