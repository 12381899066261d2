"""Eighteenth wave of driver-contract queries: the general
interval-overlap equi-join (operators/interval.py) over per-user event
windows, and census-ECDF quantile ranks (operators/robust.py).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.interval import interval_overlap_join
from grass_spark.operators.robust import quantile_rank
from grass_spark.queries_ext import _t

EXT18_QUERIES: dict = {}
EXT18_ORACLES: dict = {}


# ---------------------------------------------------------------------
# interval overlap join: even-event windows vs odd-event windows per
# user (1..120 / 1..90 minute durations derived from the event id)
# ---------------------------------------------------------------------


def q_interval_join(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("event_id", "user_id", "ts")
    a = ev.where(F.col("event_id") % 2 == 0).select(
        "user_id",
        F.col("event_id").alias("a_id"),
        F.col("ts").alias("a_start"),
        F.expr("timestampadd(MINUTE, 1 + event_id % 120, ts)").alias(
            "a_end"
        ),
    )
    b = ev.where(F.col("event_id") % 2 == 1).select(
        "user_id",
        F.col("event_id").alias("b_id"),
        F.col("ts").alias("b_start"),
        F.expr("timestampadd(MINUTE, 1 + event_id % 90, ts)").alias(
            "b_end"
        ),
    )
    out = interval_overlap_join(a, b, on=["user_id"], bucket="1 hour")
    return out.select(
        "user_id", "a_id", "b_id",
        "overlap_start", "overlap_end", "overlap_us",
    ).orderBy("user_id", "a_id", "b_id")


ORACLE_INTERVAL_JOIN = """
WITH a AS (
  SELECT user_id, event_id AS a_id, ts AS a_start,
         ts + (1 + event_id % 120) * INTERVAL 1 MINUTE AS a_end
  FROM events WHERE event_id % 2 = 0
),
b AS (
  SELECT user_id, event_id AS b_id, ts AS b_start,
         ts + (1 + event_id % 90) * INTERVAL 1 MINUTE AS b_end
  FROM events WHERE event_id % 2 = 1
)
SELECT a.user_id, a_id, b_id,
       greatest(a_start, b_start) AS overlap_start,
       least(a_end, b_end) AS overlap_end,
       CAST(epoch_us(least(a_end, b_end))
            - epoch_us(greatest(a_start, b_start)) AS BIGINT)
         AS overlap_us
FROM a JOIN b
  ON a.user_id = b.user_id AND a_start < b_end AND b_start < a_end
ORDER BY a.user_id, a_id, b_id
"""

EXT18_QUERIES["interval_join"] = q_interval_join
EXT18_ORACLES["interval_join"] = ORACLE_INTERVAL_JOIN


# ---------------------------------------------------------------------
# quantile rank — per-source length ECDF on every document
# ---------------------------------------------------------------------


def q_quantile_rank(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select(
        "doc_id", "source", "n_chars"
    )
    return quantile_rank(docs).select(
        "doc_id", "source", "n_chars", "ecdf"
    ).orderBy("doc_id")


ORACLE_QUANTILE_RANK = """
WITH cen AS (
  SELECT source, n_chars, count(*) AS c FROM documents GROUP BY 1, 2
),
st AS (
  SELECT source, n_chars,
         sum(c) OVER (PARTITION BY source ORDER BY n_chars
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum,
         sum(c) OVER (PARTITION BY source) AS tot
  FROM cen
)
SELECT d.doc_id, d.source, d.n_chars,
       round(CAST(st.cum AS DOUBLE) / CAST(st.tot AS DOUBLE), 6) AS ecdf
FROM documents d JOIN st USING (source, n_chars)
ORDER BY d.doc_id
"""

EXT18_QUERIES["quantile_rank"] = q_quantile_rank
EXT18_ORACLES["quantile_rank"] = ORACLE_QUANTILE_RANK
