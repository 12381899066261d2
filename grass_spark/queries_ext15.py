"""Fifteenth wave of driver-contract queries: seasonal hour-of-week
anomalies (operators/seasonal.py) over ``events`` and per-source
corpus statistics — unigram entropy and Zipf slope
(operators/corpusstats.py) — over ``documents``.

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from grass_spark.operators.corpusstats import source_entropy, zipf_slope
from grass_spark.operators.seasonal import seasonal_anomalies
from grass_spark.queries_ext import _t

EXT15_QUERIES: dict = {}
EXT15_ORACLES: dict = {}


# ---------------------------------------------------------------------
# seasonal anomalies — z > 2 against the (type, dow, hour) baseline
# (z = 2 rather than 3 so the 30-day synthetic table yields rows)
# ---------------------------------------------------------------------


def q_seasonal_anomalies(spark, sf_dir):
    ev = _t(spark, sf_dir, "events").select("ts", "event_type")
    return seasonal_anomalies(ev, z=2.0)


ORACLE_SEASONAL = """
WITH cen AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(hour(ts) AS INT) AS hour, count(*) AS c
  FROM events GROUP BY 1, 2, 3
),
days AS (SELECT DISTINCT day FROM cen),
types AS (SELECT DISTINCT event_type FROM cen),
hours AS (SELECT CAST(unnest(generate_series(0, 23)) AS INT) AS hour),
cells AS (
  SELECT t.event_type, d.day, h.hour,
         CAST(((d.day - DATE '1970-01-05') % 7 + 7) % 7 AS INT) AS dow,
         coalesce(c.c, 0) AS x
  FROM days d CROSS JOIN types t CROSS JOIN hours h
  LEFT JOIN cen c
    ON c.event_type = t.event_type AND c.day = d.day AND c.hour = h.hour
),
base AS (
  SELECT event_type, dow, hour, count(*) AS n, sum(x) AS s1,
         sum(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS s2
  FROM cells GROUP BY 1, 2, 3
),
sc AS (
  SELECT c.event_type, c.day, c.hour, c.dow, c.x,
         CAST(b.s1 AS DOUBLE) / CAST(b.n AS DOUBLE) AS mu,
         sqrt(greatest(round(
             CAST(b.s2 AS DOUBLE) / CAST(b.n AS DOUBLE)
             - (CAST(b.s1 AS DOUBLE) / CAST(b.n AS DOUBLE))
               * (CAST(b.s1 AS DOUBLE) / CAST(b.n AS DOUBLE)), 6),
           CAST(0 AS DOUBLE))) AS sigma
  FROM cells c JOIN base b USING (event_type, dow, hour)
)
SELECT event_type, day, hour, dow, x,
       round(mu, 6) AS mu, round(sigma, 6) AS sigma
FROM sc
WHERE sigma > 0
  AND round(abs(CAST(x AS DOUBLE) - mu), 6)
      > round(CAST(2.0 AS DOUBLE) * sigma, 6)
ORDER BY event_type, day, hour
"""

EXT15_QUERIES["seasonal_anomalies"] = q_seasonal_anomalies
EXT15_ORACLES["seasonal_anomalies"] = ORACLE_SEASONAL


# ---------------------------------------------------------------------
# per-source unigram entropy
# ---------------------------------------------------------------------


def q_source_entropy(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("source", "text")
    return source_entropy(docs)


ORACLE_ENTROPY = """
WITH w AS (
  SELECT source,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
  FROM documents
),
cen AS (SELECT source, word, count(*) AS c FROM w GROUP BY 1, 2),
agg AS (
  SELECT source, sum(c) AS n_tokens, count(*) AS vocab,
         sum(round(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)), 6)) AS sclnc
  FROM cen GROUP BY 1
)
SELECT source, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(vocab AS BIGINT) AS vocab,
       round(ln(CAST(n_tokens AS DOUBLE))
             - sclnc / CAST(n_tokens AS DOUBLE), 6) AS entropy,
       CASE WHEN vocab > 1 THEN
         round(round(ln(CAST(n_tokens AS DOUBLE))
                     - sclnc / CAST(n_tokens AS DOUBLE), 6)
               / ln(CAST(vocab AS DOUBLE)), 6)
       END AS entropy_norm,
       round(exp(round(ln(CAST(n_tokens AS DOUBLE))
                       - sclnc / CAST(n_tokens AS DOUBLE), 6)), 6)
         AS perplexity
FROM agg ORDER BY source
"""

EXT15_QUERIES["source_entropy"] = q_source_entropy
EXT15_ORACLES["source_entropy"] = ORACLE_ENTROPY


# ---------------------------------------------------------------------
# per-source Zipf slope over the top-100 words
# ---------------------------------------------------------------------


def q_zipf_slope(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents").select("source", "text")
    return zipf_slope(docs, n_top=100)


ORACLE_ZIPF = """
WITH w AS (
  SELECT source,
         unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS word
  FROM documents
),
cen AS (SELECT source, word, count(*) AS c FROM w GROUP BY 1, 2),
ranked AS (
  SELECT source, c,
         row_number() OVER (PARTITION BY source
                            ORDER BY c DESC, word ASC) AS rank
  FROM cen
),
pts AS (
  SELECT source,
         round(ln(CAST(rank AS DOUBLE)), 6) AS x,
         round(ln(CAST(c AS DOUBLE)), 6) AS y
  FROM ranked WHERE rank <= 100
),
agg AS (
  SELECT source, count(*) AS n_top,
         sum(x) AS sx, sum(y) AS sy,
         sum(x * x) AS sxx_, sum(y * y) AS syy_, sum(x * y) AS sxy_
  FROM pts GROUP BY 1
)
SELECT source, CAST(n_top AS BIGINT) AS n_top,
       CASE WHEN round(CAST(n_top AS DOUBLE) * sxx_ - sx * sx, 6)
                 <> CAST(0 AS DOUBLE) THEN
         round((CAST(n_top AS DOUBLE) * sxy_ - sx * sy)
               / (CAST(n_top AS DOUBLE) * sxx_ - sx * sx), 6)
       END AS slope,
       CASE WHEN round(CAST(n_top AS DOUBLE) * sxx_ - sx * sx, 6)
                 <> CAST(0 AS DOUBLE) THEN
         round((sy - ((CAST(n_top AS DOUBLE) * sxy_ - sx * sy)
                      / (CAST(n_top AS DOUBLE) * sxx_ - sx * sx)) * sx)
               / CAST(n_top AS DOUBLE), 6)
       END AS intercept,
       CASE WHEN round(CAST(n_top AS DOUBLE) * sxx_ - sx * sx, 6)
                 <> CAST(0 AS DOUBLE)
             AND round(CAST(n_top AS DOUBLE) * syy_ - sy * sy, 6)
                 <> CAST(0 AS DOUBLE) THEN
         round(((CAST(n_top AS DOUBLE) * sxy_ - sx * sy)
                * (CAST(n_top AS DOUBLE) * sxy_ - sx * sy))
               / ((CAST(n_top AS DOUBLE) * sxx_ - sx * sx)
                  * (CAST(n_top AS DOUBLE) * syy_ - sy * sy)), 6)
       END AS r2
FROM agg ORDER BY source
"""

EXT15_QUERIES["zipf_slope"] = q_zipf_slope
EXT15_ORACLES["zipf_slope"] = ORACLE_ZIPF
