"""Sixteenth wave of driver-contract queries: data-QC & leakage-safety
— the generic table profiler (operators/profile.py), exact-dup-safe
content splits (operators/export.py) and reference-corpus n-gram
novelty (operators/decontaminate.py).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.export import content_splits
from grass_spark.operators.profile import profile_table
from grass_spark.queries_ext import _t

EXT16_QUERIES: dict = {}
EXT16_ORACLES: dict = {}


# ---------------------------------------------------------------------
# table profiler over events (value double excluded: Java vs C
# shortest-repr float rendering diverges — documented contract)
# ---------------------------------------------------------------------

_PROFILE_COLS = ["event_id", "event_type", "props", "ts", "user_id"]


def q_profile_events(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return profile_table(ev, columns=_PROFILE_COLS)


ORACLE_PROFILE = """
WITH stacked AS (
  SELECT 'event_id' AS "column", CAST(event_id AS VARCHAR) AS val
  FROM events
  UNION ALL SELECT 'event_type', event_type FROM events
  UNION ALL SELECT 'props', props FROM events
  UNION ALL SELECT 'ts', CAST(ts AS VARCHAR) FROM events
  UNION ALL SELECT 'user_id', CAST(user_id AS VARCHAR) FROM events
),
census AS (
  SELECT "column", val, count(*) AS c FROM stacked GROUP BY 1, 2
)
SELECT "column",
       CAST(sum(c) AS BIGINT) AS n_rows,
       CAST(coalesce(sum(CASE WHEN val IS NULL THEN c END), 0) AS BIGINT)
         AS n_nulls,
       CAST(count(CASE WHEN val IS NOT NULL THEN 1 END) AS BIGINT)
         AS n_distinct,
       min(val) AS min_val,
       max(val) AS max_val
FROM census GROUP BY 1 ORDER BY 1
"""

EXT16_QUERIES["profile_events"] = q_profile_events
EXT16_ORACLES["profile_events"] = ORACLE_PROFILE


# ---------------------------------------------------------------------
# exact-dup-safe content splits — 80/10/10 keyed on the content hash
# ---------------------------------------------------------------------


def q_content_splits(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = content_splits(
        docs, {"train": 0.8, "val": 0.1, "test": 0.1}, salt="split"
    )
    return out.select("doc_id", "content_key", "split").orderBy("doc_id")


ORACLE_CONTENT_SPLITS = """
WITH keyed AS (
  SELECT doc_id,
         md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))
           AS content_key
  FROM documents
),
u AS (
  SELECT doc_id, content_key,
         CAST('0x' || substr(md5(content_key || ':' || 'split'), 1, 8)
              AS UBIGINT) / 4294967296.0 AS uu
  FROM keyed
)
SELECT doc_id, content_key,
       CASE WHEN uu < CAST(0.8 AS DOUBLE) THEN 'train'
            WHEN uu < CAST(0.8 AS DOUBLE) + CAST(0.1 AS DOUBLE)
              THEN 'val'
            ELSE 'test' END AS split
FROM u ORDER BY doc_id
"""

EXT16_QUERIES["content_splits"] = q_content_splits
EXT16_ORACLES["content_splits"] = ORACLE_CONTENT_SPLITS


# ---------------------------------------------------------------------
# reference-corpus 3-gram novelty — reference = every 10th doc (the
# contamination wave's deterministic split), corpus = the rest
# ---------------------------------------------------------------------


def q_novelty(spark, sf_dir):
    from grass_spark.operators.decontaminate import novelty_report

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = d.filter(F.col("doc_id") % 10 != 0)
    ref = d.filter(F.col("doc_id") % 10 == 0)
    return novelty_report(corpus, ref, n=3).orderBy("doc_id")


ORACLE_NOVELTY = """
WITH nrm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
  FROM documents
), w3 AS (
  SELECT doc_id, string_split(t, ' ') AS ws FROM nrm
), sh3 AS (
  SELECT doc_id,
         CAST(greatest(len(ws) - 2, 1) AS BIGINT) AS n_shingles,
         CAST(g.i - 1 AS BIGINT) AS idx,
         array_to_string(ws[g.i:g.i+2], ' ') AS s
  FROM w3, unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS g(i)
),
ref AS (SELECT DISTINCT s FROM sh3 WHERE doc_id % 10 = 0),
cor AS (SELECT doc_id, n_shingles, idx, s FROM sh3 WHERE doc_id % 10 <> 0),
hits AS (
  SELECT c.doc_id, c.n_shingles,
         sum(CASE WHEN r.s IS NOT NULL THEN 1 ELSE 0 END) AS n_seen
  FROM cor c LEFT JOIN ref r USING (s)
  GROUP BY 1, 2
)
SELECT doc_id, n_shingles, CAST(n_seen AS BIGINT) AS n_seen,
       round(CAST(1 AS DOUBLE)
             - CAST(n_seen AS DOUBLE) / CAST(n_shingles AS DOUBLE), 6)
         AS novelty
FROM hits ORDER BY doc_id
"""

EXT16_QUERIES["novelty"] = q_novelty
EXT16_ORACLES["novelty"] = ORACLE_NOVELTY
