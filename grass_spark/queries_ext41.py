"""Forty-first wave of driver-contract queries: week-over-week
trending ranks (operators/trending.py — portable Monday anchor, census
self-join for the previous-week lookup) and the Heaps-law vocabulary
growth curve (operators/corpusstats.py ``vocab_growth`` —
first-occurrence min-bucket election, census-bounded cumulative
windows).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from grass_spark.operators.corpusstats import vocab_growth
from grass_spark.operators.trending import trending_ranks
from grass_spark.queries_ext import _t

EXT41_QUERIES: dict = {}
EXT41_ORACLES: dict = {}


# ---------------------------------------------------------------------
# trending event types, week over week
# ---------------------------------------------------------------------


def q_trending_ranks(spark, sf_dir):
    return trending_ranks(_t(spark, sf_dir, "events"))


ORACLE_TRENDING_RANKS = """
WITH cen AS (
  SELECT CAST(ts AS DATE)
           - CAST(((CAST(ts AS DATE) - DATE '1970-01-05') % 7 + 7) % 7
                  AS INTEGER) AS wk,
         event_type, CAST(count(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
r AS (
  SELECT wk, event_type, n,
         CAST(row_number() OVER (
           PARTITION BY wk ORDER BY n DESC, event_type
         ) AS INTEGER) AS rnk
  FROM cen
)
SELECT a.wk AS week_start, a.event_type, a.n, a.rnk,
       b.rnk AS prev_rnk,
       CAST(b.rnk - a.rnk AS INTEGER) AS rank_delta
FROM r a LEFT JOIN r b
  ON b.event_type = a.event_type AND b.wk = a.wk - 7
ORDER BY week_start, a.rnk
"""


# ---------------------------------------------------------------------
# Heaps vocabulary growth over doc-id buckets
# ---------------------------------------------------------------------

_VG_BUCKET = 200


def q_vocab_growth(spark, sf_dir):
    return vocab_growth(
        _t(spark, sf_dir, "documents"), bucket_size=_VG_BUCKET
    )


ORACLE_VOCAB_GROWTH = f"""
WITH w AS (
  SELECT doc_id // {_VG_BUCKET} AS bucket,
         list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
),
toks AS (
  SELECT bucket, CAST(count(*) AS BIGINT) AS n_docs,
         CAST(sum(len(ws)) AS BIGINT) AS bucket_tokens
  FROM w GROUP BY 1
),
fo AS (
  SELECT word, min(bucket) AS fb
  FROM (SELECT bucket, unnest(list_distinct(ws)) AS word FROM w)
  GROUP BY 1
),
wc AS (
  SELECT fb AS bucket, CAST(count(*) AS BIGINT) AS new_words
  FROM fo GROUP BY 1
),
g AS (
  SELECT t.bucket, t.n_docs, t.bucket_tokens,
         CAST(coalesce(wc.new_words, 0) AS BIGINT) AS new_words
  FROM toks t LEFT JOIN wc ON wc.bucket = t.bucket
)
SELECT bucket, n_docs, bucket_tokens, new_words,
       CAST(sum(new_words) OVER (ORDER BY bucket) AS BIGINT)
         AS cum_vocab,
       CAST(sum(bucket_tokens) OVER (ORDER BY bucket) AS BIGINT)
         AS cum_tokens
FROM g
ORDER BY bucket
"""


EXT41_QUERIES.update(
    {
        "trending_ranks": q_trending_ranks,
        "vocab_growth": q_vocab_growth,
    }
)
EXT41_ORACLES.update(
    {
        "trending_ranks": ORACLE_TRENDING_RANKS,
        "vocab_growth": ORACLE_VOCAB_GROWTH,
    }
)
