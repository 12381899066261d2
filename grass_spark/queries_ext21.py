"""Twenty-first wave of driver-contract queries: census-exact trimmed
and winsorized means (operators/robust.py), directed shingle
containment over LSH candidates (operators/dedup.py), and the
single-pass ROLLUP subtotal report (operators/olap.py).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.dedup import ngram_containment_pairs, with_shingles
from grass_spark.operators.olap import rollup_report
from grass_spark.operators.robust import trimmed_stats
from grass_spark.queries_ext import _t
from grass_spark.queries_ext3 import _md5_cands, _SQL_CANDS, _SQL_SHINGLES

EXT21_QUERIES: dict = {}
EXT21_ORACLES: dict = {}


# ---------------------------------------------------------------------
# trimmed / winsorized per-source length means (10% per tail)
# ---------------------------------------------------------------------


def q_trimmed_means(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    return trimmed_stats(
        docs, value_col="n_chars", group_col="source", trim_frac=0.1
    )


ORACLE_TRIMMED_MEANS = """
WITH base AS (
  SELECT source, CAST(n_chars AS DOUBLE) AS v
  FROM documents WHERE n_chars IS NOT NULL
),
cen AS (SELECT source, v, count(*) AS c FROM base GROUP BY 1, 2),
st AS (
  SELECT source, v, c,
         sum(c) OVER (PARTITION BY source ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(c) OVER (PARTITION BY source) AS n
  FROM cen
),
kk AS (
  SELECT *, CAST(floor(0.1 * CAST(n AS DOUBLE)) AS BIGINT) AS k FROM st
),
agg AS (
  SELECT source, CAST(max(n) AS BIGINT) AS n, max(k) AS k,
         sum(CAST(greatest(0, least(cum, n - k) - greatest(cum - c, k))
                  AS DOUBLE) * v) AS tsum,
         min(CASE WHEN cum >= k + 1 THEN v END) AS lo_cut,
         min(CASE WHEN cum >= n - k THEN v END) AS hi_cut
  FROM kk GROUP BY 1
)
SELECT source, n, k, n - 2 * k AS n_kept, lo_cut, hi_cut,
       CASE WHEN n - 2 * k > 0 THEN
         round(tsum / CAST(n - 2 * k AS DOUBLE), 6)
       END AS trimmed_mean,
       CASE WHEN n - 2 * k > 0 THEN
         round((tsum + CAST(k AS DOUBLE) * (lo_cut + hi_cut))
               / CAST(n AS DOUBLE), 6)
       END AS winsor_mean
FROM agg ORDER BY source
"""

EXT21_QUERIES["trimmed_means"] = q_trimmed_means
EXT21_ORACLES["trimmed_means"] = ORACLE_TRIMMED_MEANS


# ---------------------------------------------------------------------
# directed containment over the banded-LSH candidate pairs
# ---------------------------------------------------------------------


def q_containment_pairs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    sh = (
        with_shingles(d, "text", 3)
        .select("doc_id", "sh_arr")
        .localCheckpoint()
    )
    return ngram_containment_pairs(d, _md5_cands(sh), shingles=sh).orderBy(
        "id_a", "id_b"
    )


ORACLE_CONTAINMENT_PAIRS = f"""
WITH {_SQL_SHINGLES},
{_SQL_CANDS}
SELECT c.id_a, c.id_b,
       CAST(len(sa.ls) AS INT) AS n_a,
       CAST(len(sb.ls) AS INT) AS n_b,
       CASE WHEN len(sa.ls) > 0 THEN
         round(CAST(len(list_intersect(sa.ls, sb.ls)) AS DOUBLE)
               / CAST(len(sa.ls) AS DOUBLE), 6)
       END AS containment_a,
       CASE WHEN len(sb.ls) > 0 THEN
         round(CAST(len(list_intersect(sa.ls, sb.ls)) AS DOUBLE)
               / CAST(len(sb.ls) AS DOUBLE), 6)
       END AS containment_b,
       CASE WHEN len(sa.ls) + len(sb.ls)
                 - len(list_intersect(sa.ls, sb.ls)) > 0 THEN
         round(CAST(len(list_intersect(sa.ls, sb.ls)) AS DOUBLE)
               / CAST(len(sa.ls) + len(sb.ls)
                      - len(list_intersect(sa.ls, sb.ls)) AS DOUBLE), 6)
       END AS jaccard
FROM cands c
JOIN sets sa ON sa.doc_id = c.id_a
JOIN sets sb ON sb.doc_id = c.id_b
ORDER BY c.id_a, c.id_b
"""

EXT21_QUERIES["containment_pairs"] = q_containment_pairs
EXT21_ORACLES["containment_pairs"] = ORACLE_CONTAINMENT_PAIRS


# ---------------------------------------------------------------------
# single-pass ROLLUP: events by (event_type, portable dow)
# ---------------------------------------------------------------------


def q_rollup_report(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select(
        "event_type",
        F.pmod(
            F.datediff(F.col("ts").cast("date"), F.lit("1970-01-05").cast("date")),
            F.lit(7),
        ).alias("dow"),
        "value",
    )
    return rollup_report(ev, ["event_type", "dow"], value_col="value")


ORACLE_ROLLUP_REPORT = """
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
GROUP BY ROLLUP(event_type, dow)
ORDER BY level, event_type ASC NULLS FIRST, dow ASC NULLS FIRST
"""

EXT21_QUERIES["rollup_report"] = q_rollup_report
EXT21_ORACLES["rollup_report"] = ORACLE_ROLLUP_REPORT
