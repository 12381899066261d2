"""Driver-contract query library: engine queries + DuckDB oracle twins.

Each entry in :data:`QUERIES` is a callable ``(spark, sf_dir) -> DataFrame``
exercising one operator family from SURVEY.md §2 over the driver's
parquet tables; :data:`ORACLES` holds the equivalent ANSI SQL DuckDB
runs on the same tables.  Column names and types are aligned on both
sides (the driver hashes values after sorting columns by name).

Parity rules applied throughout (found by probing duckdb 1.0):

* every floating aggregate is ``round(x, 6)`` on BOTH sides — Spark's
  partial aggregation sums in a different order than DuckDB's serial
  sum, so raw doubles can differ in the last ulp;
* DuckDB ``sum(BIGINT)`` returns HUGEINT → explicit CASTs keep schemas
  aligned;
* DuckDB ``skewness``/``kurtosis`` are *sample*-normalized, GRASS's are
  population (``lib/stats/c_skew.c:43-45``) → the oracle composes the
  population formula from power sums instead;
* mode tie-breaks to the smallest value (``lib/stats/c_mode.c:5-37``):
  Spark ``mode(x, true)``; DuckDB via ordered-list-first trick;
* quantiles are Hyndman-Fan type 7 (``lib/stats/c_percentile.c:21-27``):
  Spark exact ``percentile`` == DuckDB ``quantile_cont``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from grass_spark.functions import relations as rel
from grass_spark.operators.aggregate import aggregate, series
from grass_spark.operators.gapfill import gapfill


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _r6(*names: str) -> list:
    return [F.round(F.col(n), 6).alias(n) for n in names]


# =====================================================================
# Temporal core — events(event_id, ts, user_id, event_type, value, props)
# =====================================================================


def q_agg_hourly(spark, sf_dir):
    """t.rast.aggregate methods=count,sum,average,min,max gran='1 hour'."""
    ev = _t(spark, sf_dir, "events")
    out = aggregate(
        ev, "1 hour", ["count", "sum", "average", "minimum", "maximum"],
        keys=["user_id"], ts_col="ts", value_col="value",
    )
    return out.select(
        "user_id",
        F.col("bucket_start").alias("bucket"),
        F.col("count").alias("cnt"),
        *_r6("sum", "average", "minimum", "maximum"),
    )


ORACLE_AGG_HOURLY = """
SELECT user_id,
       date_trunc('hour', ts)                   AS bucket,
       CAST(count(value) AS BIGINT)             AS cnt,
       round(sum(value), 6)                     AS sum,
       round(avg(value), 6)                     AS average,
       round(min(value), 6)                     AS minimum,
       round(max(value), 6)                     AS maximum
FROM events
GROUP BY 1, 2
"""


def q_agg_daily_holistic(spark, sf_dir):
    """Holistic kernels per event_type per day: stddev/variance (population),
    median (mean-of-middle-two), type-7 quartiles, population skew/kurtosis.

    The three quantiles are computed with ONE array-argument exact
    ``percentile`` call (single sort buffer) instead of three separate
    sort-based aggregates — the reference's multi-output single scan
    (r.series/main.c:402-474), applied to the quantile family.
    """
    from grass_spark.functions.kernels import agg_exprs

    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("bucket")
    qs = F.expr("percentile(value, array(0.25D, 0.75D, 0.90D))")
    out = ev.groupBy("event_type", day).agg(
        *agg_exprs(["stddev", "variance", "median", "skewness", "kurtosis"],
                   "value"),
        qs.alias("_q"),
    )
    return out.select(
        "event_type", "bucket",
        *_r6("stddev", "variance", "median"),
        F.round(F.col("_q")[0], 6).alias("quart1"),
        F.round(F.col("_q")[1], 6).alias("quart3"),
        F.round(F.col("_q")[2], 6).alias("perc90"),
        *_r6("skewness", "kurtosis"),
    )


ORACLE_AGG_DAILY_HOLISTIC = """
WITH base AS (
  SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, value AS v
  FROM events
), m AS (
  SELECT event_type, bucket, avg(v) AS mu, count(v) AS n
  FROM base GROUP BY 1, 2
)
SELECT b.event_type,
       b.bucket,
       round(stddev_pop(b.v), 6)                        AS stddev,
       round(var_pop(b.v), 6)                           AS variance,
       round(CAST(median(b.v) AS DOUBLE), 6)            AS median,
       round(CAST(quantile_cont(b.v, 0.25) AS DOUBLE), 6) AS quart1,
       round(CAST(quantile_cont(b.v, 0.75) AS DOUBLE), 6) AS quart3,
       round(CAST(quantile_cont(b.v, 0.90) AS DOUBLE), 6) AS perc90,
       round((sum(pow(b.v - m.mu, 3)) / m.n)
             / pow(sqrt(sum(pow(b.v - m.mu, 2)) / m.n), 3), 6) AS skewness,
       round((sum(pow(b.v - m.mu, 4)) / m.n)
             / pow(sum(pow(b.v - m.mu, 2)) / m.n, 2) - 3, 6)   AS kurtosis
FROM base b JOIN m ON b.event_type = m.event_type AND b.bucket = m.bucket
GROUP BY b.event_type, b.bucket, m.n
"""


def q_agg_weekly_mode_div(spark, sf_dir):
    """mode (smallest-value tie-break) + diversity per event_type per week
    (week granule aligned to Monday like datetime_math.py:355-487)."""
    ev = _t(spark, sf_dir, "events").withColumn(
        "iv", F.round("value", 0).cast("long")
    )
    out = aggregate(
        ev, "1 week", ["mode", "diversity"],
        keys=["event_type"], ts_col="ts", value_col="iv",
    )
    return out.select(
        "event_type",
        F.col("bucket_start").alias("bucket"),
        F.col("mode").cast("long").alias("mode"),
        F.col("diversity").cast("long").alias("diversity"),
    )


ORACLE_AGG_WEEKLY_MODE_DIV = """
WITH base AS (
  SELECT event_type, CAST(date_trunc('week', ts) AS TIMESTAMP) AS bucket,
         CAST(round(value, 0) AS BIGINT) AS iv
  FROM events
), freq AS (
  SELECT event_type, bucket, iv, count(*) AS c
  FROM base GROUP BY 1, 2, 3
)
SELECT event_type, bucket,
       (list(iv ORDER BY c DESC, iv ASC))[1]          AS mode,
       CAST(count(DISTINCT iv) AS BIGINT)             AS diversity
FROM freq
GROUP BY event_type, bucket
"""


def q_series_overall(spark, sf_dir):
    """t.rast.series over the whole series per user, with overall extent."""
    ev = _t(spark, sf_dir, "events")
    out = series(
        ev, ["average", "minimum", "maximum", "count"],
        keys=["user_id"], ts_col="ts", value_col="value",
    )
    return out.select(
        "user_id",
        *_r6("average", "minimum", "maximum"),
        F.col("count").alias("cnt"),
        "series_start", "series_end",
    )


ORACLE_SERIES_OVERALL = """
SELECT user_id,
       round(avg(value), 6)          AS average,
       round(min(value), 6)          AS minimum,
       round(max(value), 6)          AS maximum,
       CAST(count(value) AS BIGINT)  AS cnt,
       min(ts)                       AS series_start,
       max(ts)                       AS series_end
FROM events GROUP BY user_id
"""


def q_series_where(spark, sf_dir):
    """the reference's raw-SQL ``where=`` surface
    (abstract_space_time_dataset.py:1919-1932)."""
    ev = _t(spark, sf_dir, "events")
    out = series(
        ev, ["minimum", "count"], keys=["user_id"],
        ts_col="ts", value_col="value",
        where="value > 250 AND event_type <> 'view'",
    )
    return out.select(
        "user_id", *_r6("minimum"), F.col("count").alias("cnt"),
    )


ORACLE_SERIES_WHERE = """
SELECT user_id,
       round(min(value), 6)         AS minimum,
       CAST(count(value) AS BIGINT) AS cnt
FROM events
WHERE value > 250 AND event_type <> 'view'
GROUP BY user_id
"""


def _with_idx(ev: DataFrame) -> DataFrame:
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.withColumn("idx", F.row_number().over(w) - 1)


def q_argminmax(spark, sf_dir):
    """min_raster / max_raster: 0-based time index of the extreme value,
    ties -> earliest (lib/stats/c_minx.c / c_maxx.c)."""
    ev = _with_idx(_t(spark, sf_dir, "events"))
    out = series(
        ev, ["min_raster", "max_raster"], keys=["user_id"],
        ts_col="ts", value_col="value", idx_col="idx",
    )
    return out.select(
        "user_id",
        F.col("min_raster").cast("long").alias("min_raster"),
        F.col("max_raster").cast("long").alias("max_raster"),
    )


ORACLE_ARGMINMAX = """
WITH base AS (
  SELECT user_id, value AS v,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS idx
  FROM events
)
SELECT user_id,
       CAST((list(idx ORDER BY v ASC,  idx ASC))[1] AS BIGINT) AS min_raster,
       CAST((list(idx ORDER BY v DESC, idx ASC))[1] AS BIGINT) AS max_raster
FROM base GROUP BY user_id
"""


def q_regression(spark, sf_dir):
    """OLS kernels slope/offset/detcoeff of value against the time index
    (lib/stats/c_reg.c:16-104; x = original input position)."""
    ev = _with_idx(_t(spark, sf_dir, "events"))
    out = series(
        ev, ["slope", "offset", "detcoeff", "tvalue"], keys=["user_id"],
        ts_col="ts", value_col="value", idx_col="idx",
    )
    return out.select("user_id", *_r6("slope", "offset", "detcoeff", "tvalue"))


ORACLE_REGRESSION = """
WITH base AS (
  SELECT user_id, value AS v,
         row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) - 1 AS idx
  FROM events
)
SELECT user_id,
       CASE WHEN count(v) < 2 THEN NULL
            ELSE round(regr_slope(v, idx), 6) END     AS slope,
       CASE WHEN count(v) < 2 THEN NULL
            ELSE round(regr_intercept(v, idx), 6) END AS offset,
       CASE WHEN count(v) < 2 THEN NULL
            WHEN var_pop(v) = 0 THEN NULL
            ELSE round(regr_r2(v, idx), 6) END        AS detcoeff,
       CASE WHEN count(v) < 2 THEN NULL
            WHEN var_pop(v) = 0 THEN NULL
            WHEN regr_r2(v, idx) >= 1.0 THEN NULL
            ELSE round(sqrt(regr_r2(v, idx) * (count(v) - 2)
                            / (1.0 - regr_r2(v, idx))), 6) END AS tvalue
FROM base GROUP BY user_id
"""


def q_univar_daily(spark, sf_dir):
    """t.rast.univar column set per day bucket
    (univar_statistics.py:38-124; golden columns
    t.rast.univar/testsuite/test_t_rast_univar.py:167)."""
    ev = _t(spark, sf_dir, "events")
    v = F.col("value")
    day = F.date_trunc("day", F.col("ts")).alias("bucket")
    out = ev.groupBy(day).agg(
        F.count(v).alias("non_null_cells"),
        (F.count(F.lit(1)) - F.count(v)).alias("null_cells"),
        F.round(F.min(v), 6).alias("min"),
        F.round(F.max(v), 6).alias("max"),
        F.round(F.max(v) - F.min(v), 6).alias("range"),
        F.round(F.avg(v), 6).alias("mean"),
        F.round(F.avg(F.abs(v)), 6).alias("mean_of_abs"),
        F.round(F.stddev_pop(v), 6).alias("stddev"),
        F.round(F.var_pop(v), 6).alias("variance"),
        F.round(F.stddev_pop(v) / F.avg(v) * 100, 6).alias("coeff_var"),
        F.round(F.sum(v), 6).alias("sum"),
        F.round(F.sum(F.abs(v)), 6).alias("sum_abs"),
        F.round(F.expr("percentile(value, 0.25D)"), 6).alias("first_quartile"),
        F.round(F.expr("median(value)"), 6).alias("median"),
        F.round(F.expr("percentile(value, 0.75D)"), 6).alias("third_quartile"),
        F.round(F.expr("percentile(value, 0.90D)"), 6).alias("percentile_90"),
    )
    return out


ORACLE_UNIVAR_DAILY = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP)    AS bucket,
       CAST(count(value) AS BIGINT)                AS non_null_cells,
       CAST(count(*) - count(value) AS BIGINT)     AS null_cells,
       round(min(value), 6)                        AS min,
       round(max(value), 6)                        AS max,
       round(max(value) - min(value), 6)           AS range,
       round(avg(value), 6)                        AS mean,
       round(avg(abs(value)), 6)                   AS mean_of_abs,
       round(stddev_pop(value), 6)                 AS stddev,
       round(var_pop(value), 6)                    AS variance,
       round(stddev_pop(value) / avg(value) * 100, 6) AS coeff_var,
       round(sum(value), 6)                        AS sum,
       round(sum(abs(value)), 6)                   AS sum_abs,
       round(CAST(quantile_cont(value, 0.25) AS DOUBLE), 6) AS first_quartile,
       round(CAST(median(value) AS DOUBLE), 6)     AS median,
       round(CAST(quantile_cont(value, 0.75) AS DOUBLE), 6) AS third_quartile,
       round(CAST(quantile_cont(value, 0.90) AS DOUBLE), 6) AS percentile_90
FROM events GROUP BY 1
"""


def q_accumulate(spark, sf_dir):
    """t.rast.accumulate: running accumulation along the series
    (raster/r.series.accumulate/main.c) = window cumulative sum."""
    ev = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return ev.select(
        "user_id", "event_id",
        F.round(F.sum("value").over(w), 6).alias("acc"),
    )


ORACLE_ACCUMULATE = """
SELECT user_id, event_id,
       round(sum(value) OVER (
         PARTITION BY user_id ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS acc
FROM events
"""


def q_snap(spark, sf_dir):
    """t.snap: each extent's end becomes the next start
    (abstract_space_time_dataset.py:2099-2274; lead window)."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "user_id", "event_id",
        F.col("ts").alias("start_time"),
        F.lead("ts").over(w).alias("end_time"),
    )


ORACLE_SNAP = """
SELECT user_id, event_id,
       ts                                                        AS start_time,
       lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS end_time
FROM events
"""


def q_allen_relations(spark, sf_dir):
    """Temporal topology census (t.topology): classify each event's
    1-hour extent against its day granule with the 13 Allen relations in
    dispatcher priority order (temporal_extent.py:903-968)."""
    ev = _t(spark, sf_dir, "events").select(
        F.col("ts").alias("a_s"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("a_e"),
        F.date_trunc("day", F.col("ts")).alias("b_s"),
        (F.date_trunc("day", F.col("ts")) + F.expr("INTERVAL 1 DAY")).alias("b_e"),
    )
    out = ev.select(
        rel.relation_name("a_s", "a_e", "b_s", "b_e").alias("relation")
    )
    return out.groupBy("relation").agg(F.count(F.lit(1)).alias("cnt"))


ORACLE_ALLEN_RELATIONS = """
WITH iv AS (
  SELECT ts                                   AS a_s,
         ts + INTERVAL 1 HOUR                 AS a_e,
         date_trunc('day', ts)                AS b_s,
         date_trunc('day', ts) + INTERVAL 1 DAY AS b_e
  FROM events
)
SELECT CASE
    WHEN a_s = b_s AND a_e = b_e THEN 'equal'
    WHEN a_s > b_s AND a_e < b_e THEN 'during'
    WHEN a_s < b_s AND a_e > b_e THEN 'contains'
    WHEN a_s < b_s AND a_e < b_e AND a_e > b_s THEN 'overlaps'
    WHEN a_s > b_s AND a_e > b_e AND a_s < b_e THEN 'overlapped'
    WHEN a_s > b_e THEN 'after'
    WHEN a_e < b_s THEN 'before'
    WHEN a_s = b_s AND a_e < b_e THEN 'starts'
    WHEN a_e = b_e AND a_s > b_s THEN 'finishes'
    WHEN a_s = b_s AND a_e > b_e THEN 'started'
    WHEN a_e = b_e AND a_s < b_s THEN 'finished'
    WHEN a_s = b_e THEN 'follows'
    WHEN a_e = b_s THEN 'precedes'
    END AS relation,
    CAST(count(*) AS BIGINT) AS cnt
FROM iv GROUP BY 1
"""


def q_gapfill_daily(spark, sf_dir):
    """t.rast.gapfill: daily per-user averages, missing days filled by
    linear interpolation at positions i/(k+1)
    (r.series.interp/main.c:412-445)."""
    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", F.col("ts")).alias("bucket_start")
    ).agg(F.avg("value").alias("v"))
    out = gapfill(daily, "1 day", keys=["user_id"], value_cols=["v"])
    return out.select(
        "user_id",
        F.col("bucket_start").alias("bucket"),
        F.round("v", 6).alias("v"),
        "filled",
    )


ORACLE_GAPFILL_DAILY = """
WITH daily AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, avg(value) AS v
  FROM events GROUP BY 1, 2
), org AS (SELECT min(bucket) AS o FROM daily),
idx AS (
  SELECT user_id, bucket, v,
         datediff('day', (SELECT o FROM org), bucket) AS gidx
  FROM daily
), nxt AS (
  SELECT *,
         lead(gidx) OVER (PARTITION BY user_id ORDER BY gidx) AS ngidx,
         lead(v)    OVER (PARTITION BY user_id ORDER BY gidx) AS nv
  FROM idx
), fills AS (
  SELECT user_id,
         gidx + unnest(generate_series(1, CAST(ngidx - gidx - 1 AS BIGINT))) AS fidx,
         gidx, ngidx, v, nv
  FROM nxt WHERE ngidx > gidx + 1
)
SELECT user_id, bucket, round(v, 6) AS v, false AS filled FROM daily
UNION ALL
SELECT user_id,
       (SELECT o FROM org) + INTERVAL (fidx) DAY AS bucket,
       round((1.0 - (fidx - gidx) / (ngidx - gidx)) * v
             + ((fidx - gidx) / (ngidx - gidx)) * nv, 6) AS v,
       true AS filled
FROM fills
"""


def q_tier_cascade_day(spark, sf_dir):
    """Continuous-aggregate cascade: hour tier -> day tier re-aggregated
    algebraically (count/sum/min/max); the oracle computes the day tier
    directly from raw — exactness of the cascade is the assertion."""
    ev = _t(spark, sf_dir, "events")
    hour = aggregate(
        ev, "1 hour", ["count", "sum", "minimum", "maximum"],
        keys=["user_id"], ts_col="ts", value_col="value",
    )
    day = hour.groupBy(
        "user_id", F.date_trunc("day", F.col("bucket_start")).alias("bucket")
    ).agg(
        F.sum("count").alias("cnt"),
        F.round(F.sum("sum"), 6).alias("sum"),
        F.round(F.min("minimum"), 6).alias("minimum"),
        F.round(F.max("maximum"), 6).alias("maximum"),
    )
    return day


ORACLE_TIER_CASCADE_DAY = """
SELECT user_id,
       CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
       CAST(count(value) AS BIGINT) AS cnt,
       round(sum(value), 6)         AS sum,
       round(min(value), 6)         AS minimum,
       round(max(value), 6)         AS maximum
FROM events GROUP BY 1, 2
"""


def q_extract_expr(spark, sf_dir):
    """t.rast.extract: where-subset + per-map r.mapcalc expression
    (python/grass/temporal/extract.py:115-416) — filter + computed column."""
    li = _t(spark, sf_dir, "lineitem")
    out = (
        li.filter(F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"),
            F.round(F.sum("l_quantity"), 6).alias("sum_qty"),
            F.count(F.lit(1)).alias("cnt"),
        )
    )
    return out


ORACLE_EXTRACT_EXPR = """
SELECT l_returnflag, l_linestatus,
       round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue,
       round(sum(l_quantity), 6)                         AS sum_qty,
       CAST(count(*) AS BIGINT)                          AS cnt
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
GROUP BY 1, 2
"""


# =====================================================================
# Training-data ops — documents / embeddings
# =====================================================================


def q_dedup_exact(spark, sf_dir):
    """Exact dedup: group by content hash, keep the smallest doc_id."""
    d = _t(spark, sf_dir, "documents")
    return d.groupBy(F.md5("text").alias("content_hash")).agg(
        F.min("doc_id").alias("keep_id"),
        F.count(F.lit(1)).alias("n_copies"),
    )


ORACLE_DEDUP_EXACT = """
SELECT md5(text)                      AS content_hash,
       CAST(min(doc_id) AS BIGINT)    AS keep_id,
       CAST(count(*) AS BIGINT)       AS n_copies
FROM documents GROUP BY 1
"""


def q_text_stats(spark, sf_dir):
    """Text quality metrics: token count, avg token length, alpha ratio."""
    d = _t(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    n_tokens = F.size(toks)
    n_alpha = F.length(F.regexp_replace(F.col("text"), "[^a-zA-Z]", ""))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.cast("long").alias("n_tokens"),
        F.round(
            F.length(F.regexp_replace(F.col("text"), r"\s", ""))
            / n_tokens.cast("double"), 6
        ).alias("avg_token_len"),
        F.round(n_alpha / F.length("text").cast("double"), 6).alias("alpha_ratio"),
    )


ORACLE_TEXT_STATS = """
SELECT doc_id,
       CAST(length(text) AS BIGINT) AS n_chars,
       CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS n_tokens,
       round(length(regexp_replace(text, '\\s', '', 'g'))
             / CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS DOUBLE), 6)
         AS avg_token_len,
       round(length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
             / CAST(length(text) AS DOUBLE), 6) AS alpha_ratio
FROM documents
"""


def q_doc_fingerprint(spark, sf_dir):
    """Document fingerprint: hash of casefolded, whitespace-normalized text."""
    d = _t(spark, sf_dir, "documents")
    norm = F.regexp_replace(F.lower(F.trim(F.col("text"))), r"\s+", " ")
    return d.select("doc_id", F.md5(norm).alias("fingerprint"))


ORACLE_DOC_FINGERPRINT = """
SELECT doc_id,
       md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fingerprint
FROM documents
"""


def q_token_count(spark, sf_dir):
    """BPE-ish tokenization census: words / numbers / other-symbol runs."""
    d = _t(spark, sf_dir, "documents")
    pat = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]"
    return d.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)))
        .cast("long").alias("n_bpe_tokens"),
    )


ORACLE_TOKEN_COUNT = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9 ]')) AS BIGINT)
         AS n_bpe_tokens
FROM documents
"""


def q_lang_guess(spark, sf_dir):
    """Language-ID heuristic: padded stopword-hit counting (deterministic
    replace-count trick so the oracle is exactly the same algorithm)."""
    d = _t(spark, sf_dir, "documents")
    padded = F.concat(F.lit(" "), F.lower(F.col("text")), F.lit(" "))

    def hits(word: str):
        needle = f" {word} "
        return (
            (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
            / len(needle)
        ).cast("long")

    en = hits("the") + hits("and") + hits("of")
    fr = hits("le") + hits("la") + hits("et")
    de = hits("der") + hits("und") + hits("die")
    return d.select(
        "doc_id",
        en.alias("en_hits"), fr.alias("fr_hits"), de.alias("de_hits"),
        F.when((en >= fr) & (en >= de) & (en > 0), "en")
        .when((fr >= de) & (fr > 0), "fr")
        .when(de > 0, "de")
        .otherwise("unknown")
        .alias("lang_guess"),
    )


def _dd_hits(word: str) -> str:
    needle = f" {word} "
    return (
        f"CAST((length(p) - length(replace(p, '{needle}', ''))) / {len(needle)} AS BIGINT)"
    )


ORACLE_LANG_GUESS = f"""
WITH p AS (SELECT doc_id, ' ' || lower(text) || ' ' AS p FROM documents),
h AS (
  SELECT doc_id,
         {_dd_hits("the")} + {_dd_hits("and")} + {_dd_hits("of")}  AS en_hits,
         {_dd_hits("le")} + {_dd_hits("la")} + {_dd_hits("et")}    AS fr_hits,
         {_dd_hits("der")} + {_dd_hits("und")} + {_dd_hits("die")} AS de_hits
  FROM p
)
SELECT doc_id, en_hits, fr_hits, de_hits,
       CASE WHEN en_hits >= fr_hits AND en_hits >= de_hits AND en_hits > 0 THEN 'en'
            WHEN fr_hits >= de_hits AND fr_hits > 0 THEN 'fr'
            WHEN de_hits > 0 THEN 'de'
            ELSE 'unknown' END AS lang_guess
FROM h
"""


def q_knn_cosine(spark, sf_dir):
    """Brute-force cosine top-5 neighbors for the 3 smallest vec_ids —
    the ANN baseline.  Dot product via zip_with/aggregate (JVM-side
    higher-order functions, no UDF); ordering on the rounded similarity
    with vec_id tie-break for cross-engine determinism."""
    emb = _t(spark, sf_dir, "embeddings").select(
        "vec_id", F.transform("embedding", lambda x: x.cast("double")).alias("e")
    )
    q = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("q_id"), F.col("e").alias("qe")
    )
    dot = F.aggregate(
        F.zip_with("qe", "e", lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    norm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    ))
    pairs = (
        F.broadcast(q).crossJoin(emb)
        .filter(F.col("vec_id") != F.col("q_id"))
        .select(
            "q_id", "vec_id",
            F.round(dot / (norm(F.col("qe")) * norm(F.col("e"))), 6).alias("cosine"),
        )
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("q_id", "rank", F.col("vec_id").alias("neighbor_id"), "cosine")
    )


ORACLE_KNN_COSINE = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT vec_id AS q_id, e AS qe FROM e WHERE vec_id < 3),
pairs AS (
  SELECT q.q_id, e.vec_id,
         round(list_inner_product(q.qe, e.e)
               / (sqrt(list_inner_product(q.qe, q.qe))
                  * sqrt(list_inner_product(e.e, e.e))), 6) AS cosine
  FROM q CROSS JOIN e WHERE e.vec_id <> q.q_id
), ranked AS (
  SELECT q_id, vec_id,
         cosine,
         row_number() OVER (PARTITION BY q_id ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM pairs
)
SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id, cosine
FROM ranked WHERE rank <= 5
"""


def q_embed_norms(spark, sf_dir):
    """Per-label embedding stats: count + mean L2 norm (vector math via
    higher-order functions, aggregated JVM-side)."""
    emb = _t(spark, sf_dir, "embeddings")
    e = F.transform("embedding", lambda x: x.cast("double"))
    norm = F.sqrt(F.aggregate(
        F.transform(e, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    ))
    return (
        emb.select("label", norm.alias("n"))
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.round(F.avg("n"), 6).alias("mean_norm"),
        )
    )


ORACLE_EMBED_NORMS = """
SELECT label,
       CAST(count(*) AS BIGINT) AS cnt,
       round(avg(sqrt(list_inner_product(CAST(embedding AS DOUBLE[]),
                                         CAST(embedding AS DOUBLE[])))), 6) AS mean_norm
FROM embeddings GROUP BY label
"""


# =====================================================================
# registry
# =====================================================================

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {
    "agg_hourly": q_agg_hourly,
    "agg_daily_holistic": q_agg_daily_holistic,
    "agg_weekly_mode_div": q_agg_weekly_mode_div,
    "series_overall": q_series_overall,
    "series_where": q_series_where,
    "argminmax": q_argminmax,
    "regression": q_regression,
    "univar_daily": q_univar_daily,
    "accumulate": q_accumulate,
    "snap": q_snap,
    "allen_relations": q_allen_relations,
    "gapfill_daily": q_gapfill_daily,
    "tier_cascade_day": q_tier_cascade_day,
    "extract_expr": q_extract_expr,
    "dedup_exact": q_dedup_exact,
    "text_stats": q_text_stats,
    "doc_fingerprint": q_doc_fingerprint,
    "token_count": q_token_count,
    "lang_guess": q_lang_guess,
    "knn_cosine": q_knn_cosine,
    "embed_norms": q_embed_norms,
}

ORACLES: dict[str, str] = {
    "agg_hourly": ORACLE_AGG_HOURLY,
    "agg_daily_holistic": ORACLE_AGG_DAILY_HOLISTIC,
    "agg_weekly_mode_div": ORACLE_AGG_WEEKLY_MODE_DIV,
    "series_overall": ORACLE_SERIES_OVERALL,
    "series_where": ORACLE_SERIES_WHERE,
    "argminmax": ORACLE_ARGMINMAX,
    "regression": ORACLE_REGRESSION,
    "univar_daily": ORACLE_UNIVAR_DAILY,
    "accumulate": ORACLE_ACCUMULATE,
    "snap": ORACLE_SNAP,
    "allen_relations": ORACLE_ALLEN_RELATIONS,
    "gapfill_daily": ORACLE_GAPFILL_DAILY,
    "tier_cascade_day": ORACLE_TIER_CASCADE_DAY,
    "extract_expr": ORACLE_EXTRACT_EXPR,
    "dedup_exact": ORACLE_DEDUP_EXACT,
    "text_stats": ORACLE_TEXT_STATS,
    "doc_fingerprint": ORACLE_DOC_FINGERPRINT,
    "token_count": ORACLE_TOKEN_COUNT,
    "lang_guess": ORACLE_LANG_GUESS,
    "knn_cosine": ORACLE_KNN_COSINE,
    "embed_norms": ORACLE_EMBED_NORMS,
}

# second wave (weighted kernels, cyclic accumulate, resample priority,
# gap listing, pivots, portable MinHash-LSH) — grass_spark.queries_ext
from grass_spark.queries_ext import EXT_ORACLES, EXT_QUERIES  # noqa: E402

QUERIES.update(EXT_QUERIES)
ORACLES.update(EXT_ORACLES)

# third wave (t.shift, relative aggregation, t.sample, topology census,
# Jaccard verify, portable SimHash, group=, algebra select/merge) —
# grass_spark.queries_ext3
from grass_spark.queries_ext3 import EXT3_ORACLES, EXT3_QUERIES  # noqa: E402

QUERIES.update(EXT3_QUERIES)
ORACLES.update(EXT3_ORACLES)

# fourth wave (semantic dedup, training-export sharding) —
# grass_spark.queries_ext4
from grass_spark.queries_ext4 import EXT4_ORACLES, EXT4_QUERIES  # noqa: E402

QUERIES.update(EXT4_QUERIES)
ORACLES.update(EXT4_ORACLES)

# fifth wave (subword token counts, incremental dedup store) —
# grass_spark.queries_ext5
from grass_spark.queries_ext5 import EXT5_ORACLES, EXT5_QUERIES  # noqa: E402

QUERIES.update(EXT5_QUERIES)
ORACLES.update(EXT5_ORACLES)

# sixth wave (line-level C4/RefinedWeb cleaning) —
# grass_spark.queries_ext6
from grass_spark.queries_ext6 import EXT6_ORACLES, EXT6_QUERIES  # noqa: E402

QUERIES.update(EXT6_QUERIES)
ORACLES.update(EXT6_ORACLES)

# seventh wave (SFT example assembly over transcript turns, trigram
# stupid backoff) — grass_spark.queries_ext7
from grass_spark.queries_ext7 import EXT7_ORACLES, EXT7_QUERIES  # noqa: E402

QUERIES.update(EXT7_QUERIES)
ORACLES.update(EXT7_ORACLES)

# eighth wave (preference pairs, epoch upsampling) —
# grass_spark.queries_ext8
from grass_spark.queries_ext8 import EXT8_ORACLES, EXT8_QUERIES  # noqa: E402

QUERIES.update(EXT8_QUERIES)
ORACLES.update(EXT8_ORACLES)

# Ninth wave (rejection sampling top-k, word-boundary blocklist) —
# grass_spark.queries_ext9
from grass_spark.queries_ext9 import EXT9_ORACLES, EXT9_QUERIES  # noqa: E402

QUERIES.update(EXT9_QUERIES)
ORACLES.update(EXT9_ORACLES)

# Tenth wave (event funnels, retention cohorts, JSON-props rollups) —
# grass_spark.queries_ext10
from grass_spark.queries_ext10 import EXT10_ORACLES, EXT10_QUERIES  # noqa: E402

QUERIES.update(EXT10_QUERIES)
ORACLES.update(EXT10_ORACLES)

# Eleventh wave (engagement & monitoring analytics) —
# grass_spark.queries_ext11
from grass_spark.queries_ext11 import EXT11_ORACLES, EXT11_QUERIES  # noqa: E402

QUERIES.update(EXT11_QUERIES)
ORACLES.update(EXT11_ORACLES)

# Twelfth wave (pipeline-audit analytics) — grass_spark.queries_ext12
from grass_spark.queries_ext12 import EXT12_ORACLES, EXT12_QUERIES  # noqa: E402

QUERIES.update(EXT12_QUERIES)
ORACLES.update(EXT12_ORACLES)

# Thirteenth wave (text metrics & drift) — grass_spark.queries_ext13
from grass_spark.queries_ext13 import EXT13_ORACLES, EXT13_QUERIES  # noqa: E402

QUERIES.update(EXT13_QUERIES)
ORACLES.update(EXT13_ORACLES)

# Fourteenth wave (retrieval & robust analytics) — queries_ext14
from grass_spark.queries_ext14 import EXT14_ORACLES, EXT14_QUERIES  # noqa: E402

QUERIES.update(EXT14_QUERIES)
ORACLES.update(EXT14_ORACLES)

# Fifteenth wave (seasonal & corpus statistics) — queries_ext15
from grass_spark.queries_ext15 import EXT15_ORACLES, EXT15_QUERIES  # noqa: E402

QUERIES.update(EXT15_QUERIES)
ORACLES.update(EXT15_ORACLES)

# Sixteenth wave (data-QC & leakage safety) — queries_ext16
from grass_spark.queries_ext16 import EXT16_ORACLES, EXT16_QUERIES  # noqa: E402

QUERIES.update(EXT16_QUERIES)
ORACLES.update(EXT16_ORACLES)

# Seventeenth wave (classical tests) — queries_ext17
from grass_spark.queries_ext17 import EXT17_ORACLES, EXT17_QUERIES  # noqa: E402

QUERIES.update(EXT17_QUERIES)
ORACLES.update(EXT17_ORACLES)

# Eighteenth wave (interval join & quantile ranks) — queries_ext18
from grass_spark.queries_ext18 import EXT18_ORACLES, EXT18_QUERIES  # noqa: E402

QUERIES.update(EXT18_QUERIES)
ORACLES.update(EXT18_ORACLES)

# Nineteenth wave (rank corr, PSI drift, streaks, Benford) — queries_ext19
from grass_spark.queries_ext19 import EXT19_ORACLES, EXT19_QUERIES  # noqa: E402

QUERIES.update(EXT19_QUERIES)
ORACLES.update(EXT19_ORACLES)

# Twentieth wave (co-occurrence graph, edit verify) — queries_ext20
from grass_spark.queries_ext20 import EXT20_ORACLES, EXT20_QUERIES  # noqa: E402

QUERIES.update(EXT20_QUERIES)
ORACLES.update(EXT20_ORACLES)

# Twenty-first wave (trimmed means, containment, rollup) — queries_ext21
from grass_spark.queries_ext21 import EXT21_ORACLES, EXT21_QUERIES  # noqa: E402

QUERIES.update(EXT21_QUERIES)
ORACLES.update(EXT21_ORACLES)

# Twenty-second wave (rank fusion, MRL re-rank, NDCG, CUBE) — queries_ext22
from grass_spark.queries_ext22 import EXT22_ORACLES, EXT22_QUERIES  # noqa: E402

QUERIES.update(EXT22_QUERIES)
ORACLES.update(EXT22_ORACLES)

# Twenty-third wave (weighted sample, RBO, phrase search, k-anon) — queries_ext23
from grass_spark.queries_ext23 import EXT23_ORACLES, EXT23_QUERIES  # noqa: E402

QUERIES.update(EXT23_QUERIES)
ORACLES.update(EXT23_ORACLES)

# Twenty-fourth wave (AUC, calibration, PR sweep, corpus diff) — queries_ext24
from grass_spark.queries_ext24 import EXT24_ORACLES, EXT24_QUERIES  # noqa: E402

QUERIES.update(EXT24_QUERIES)
ORACLES.update(EXT24_ORACLES)

# Twenty-fifth wave (star-schema OLAP joins) — queries_ext25
from grass_spark.queries_ext25 import EXT25_ORACLES, EXT25_QUERIES  # noqa: E402

QUERIES.update(EXT25_QUERIES)
ORACLES.update(EXT25_ORACLES)

# Twenty-sixth wave (Welch t, Poisson bootstrap, EWMA) — queries_ext26
from grass_spark.queries_ext26 import EXT26_ORACLES, EXT26_QUERIES  # noqa: E402

QUERIES.update(EXT26_QUERIES)
ORACLES.update(EXT26_ORACLES)

# Twenty-seventh wave (skew-safe join, z-order key) — queries_ext27
from grass_spark.queries_ext27 import EXT27_ORACLES, EXT27_QUERIES  # noqa: E402

QUERIES.update(EXT27_QUERIES)
ORACLES.update(EXT27_ORACLES)

# Twenty-eighth wave (Theil–Sen, seasonal-naive eval, SCD-2 join)
from grass_spark.queries_ext28 import EXT28_ORACLES, EXT28_QUERIES  # noqa: E402

QUERIES.update(EXT28_QUERIES)
ORACLES.update(EXT28_ORACLES)

# Twenty-ninth wave (expectations validator, PageRank) — queries_ext29
from grass_spark.queries_ext29 import EXT29_ORACLES, EXT29_QUERIES  # noqa: E402

QUERIES.update(EXT29_QUERIES)
ORACLES.update(EXT29_ORACLES)

# Thirtieth wave (multiclass eval, cohort LTV) — queries_ext30
# (imports back from this module: ORACLE_LANG_GUESS is defined above,
# so the circular import is safe at this point)
from grass_spark.queries_ext30 import EXT30_ORACLES, EXT30_QUERIES  # noqa: E402

QUERIES.update(EXT30_QUERIES)
ORACLES.update(EXT30_ORACLES)

# Thirty-first wave (CDC merge, share shift) — queries_ext31
from grass_spark.queries_ext31 import EXT31_ORACLES, EXT31_QUERIES  # noqa: E402

QUERIES.update(EXT31_QUERIES)
ORACLES.update(EXT31_ORACLES)

# Thirty-second wave (ABC/Pareto, Gini) — queries_ext32
from grass_spark.queries_ext32 import EXT32_ORACLES, EXT32_QUERIES  # noqa: E402

QUERIES.update(EXT32_QUERIES)
ORACLES.update(EXT32_ORACLES)

# Thirty-third wave (diff-in-diff, CUPED) — queries_ext33
from grass_spark.queries_ext33 import EXT33_ORACLES, EXT33_QUERIES  # noqa: E402

QUERIES.update(EXT33_QUERIES)
ORACLES.update(EXT33_ORACLES)

# Thirty-fourth wave (fuzzy linkage, set-similarity join) — queries_ext34
from grass_spark.queries_ext34 import EXT34_ORACLES, EXT34_QUERIES  # noqa: E402

QUERIES.update(EXT34_QUERIES)
ORACLES.update(EXT34_ORACLES)

# Thirty-fifth wave (concurrency sweep, compaction plan) — queries_ext35
from grass_spark.queries_ext35 import EXT35_ORACLES, EXT35_QUERIES  # noqa: E402

QUERIES.update(EXT35_QUERIES)
ORACLES.update(EXT35_ORACLES)

# Thirty-sixth wave (daily CCF, transition entropy) — queries_ext36
from grass_spark.queries_ext36 import EXT36_ORACLES, EXT36_QUERIES  # noqa: E402

QUERIES.update(EXT36_QUERIES)
ORACLES.update(EXT36_ORACLES)

# Thirty-seventh wave (state occupancy, Cohen's kappa) — queries_ext37
from grass_spark.queries_ext37 import EXT37_ORACLES, EXT37_QUERIES  # noqa: E402

QUERIES.update(EXT37_QUERIES)
ORACLES.update(EXT37_ORACLES)

# Thirty-eighth wave (MRR/MAP eval, post-stratified ATE) — queries_ext38
from grass_spark.queries_ext38 import EXT38_ORACLES, EXT38_QUERIES  # noqa: E402

QUERIES.update(EXT38_QUERIES)
ORACLES.update(EXT38_ORACLES)

# Thirty-ninth wave (gains/lift table, Wilson conversion CI) — queries_ext39
from grass_spark.queries_ext39 import EXT39_ORACLES, EXT39_QUERIES  # noqa: E402

QUERIES.update(EXT39_QUERIES)
ORACLES.update(EXT39_ORACLES)

# Fortieth wave (fk-orphan audit, user growth) — queries_ext40
from grass_spark.queries_ext40 import EXT40_ORACLES, EXT40_QUERIES  # noqa: E402

QUERIES.update(EXT40_QUERIES)
ORACLES.update(EXT40_ORACLES)

# Forty-first wave (trending ranks, vocab growth) — queries_ext41
from grass_spark.queries_ext41 import EXT41_ORACLES, EXT41_QUERIES  # noqa: E402

QUERIES.update(EXT41_QUERIES)
ORACLES.update(EXT41_ORACLES)

# Forty-second wave (order reconciliation, session summary) — queries_ext42
from grass_spark.queries_ext42 import EXT42_ORACLES, EXT42_QUERIES  # noqa: E402

QUERIES.update(EXT42_QUERIES)
ORACLES.update(EXT42_ORACLES)

# Forty-third wave (churn labels, value histogram) — queries_ext43
from grass_spark.queries_ext43 import EXT43_ORACLES, EXT43_QUERIES  # noqa: E402

QUERIES.update(EXT43_QUERIES)
ORACLES.update(EXT43_ORACLES)

# Forty-fourth wave (geometric means, weekly funnel trend) — queries_ext44
from grass_spark.queries_ext44 import EXT44_ORACLES, EXT44_QUERIES  # noqa: E402

QUERIES.update(EXT44_QUERIES)
ORACLES.update(EXT44_ORACLES)

# Forty-fifth wave (Hill tail index, Brier score) — queries_ext45
from grass_spark.queries_ext45 import EXT45_ORACLES, EXT45_QUERIES  # noqa: E402

QUERIES.update(EXT45_QUERIES)
ORACLES.update(EXT45_ORACLES)

# Forty-sixth wave (quantile effects, dow seasonality) — queries_ext46
from grass_spark.queries_ext46 import EXT46_ORACLES, EXT46_QUERIES  # noqa: E402

QUERIES.update(EXT46_QUERIES)
ORACLES.update(EXT46_ORACLES)

# Forty-seventh wave (next-event top-k, freshness audit) — queries_ext47
from grass_spark.queries_ext47 import EXT47_ORACLES, EXT47_QUERIES  # noqa: E402

QUERIES.update(EXT47_QUERIES)
ORACLES.update(EXT47_ORACLES)

# Forty-eighth wave (cluster quality, centroid shift) — queries_ext48
from grass_spark.queries_ext48 import EXT48_ORACLES, EXT48_QUERIES  # noqa: E402

QUERIES.update(EXT48_QUERIES)
ORACLES.update(EXT48_ORACLES)

# Forty-ninth wave (water-filling mixture, dup-size histogram) — queries_ext49
from grass_spark.queries_ext49 import EXT49_ORACLES, EXT49_QUERIES  # noqa: E402

QUERIES.update(EXT49_QUERIES)
ORACLES.update(EXT49_ORACLES)

# Fiftieth wave (join cardinality, user HHI) — queries_ext50
from grass_spark.queries_ext50 import EXT50_ORACLES, EXT50_QUERIES  # noqa: E402

QUERIES.update(EXT50_QUERIES)
ORACLES.update(EXT50_ORACLES)

# Fifty-first wave (KS length drift, ECE) — queries_ext51
from grass_spark.queries_ext51 import EXT51_ORACLES, EXT51_QUERIES  # noqa: E402

QUERIES.update(EXT51_QUERIES)
ORACLES.update(EXT51_ORACLES)

# Fifty-second wave (type-mix drift, weekly quantiles) — queries_ext52
from grass_spark.queries_ext52 import EXT52_ORACLES, EXT52_QUERIES  # noqa: E402

QUERIES.update(EXT52_QUERIES)
ORACLES.update(EXT52_ORACLES)

# Fifty-third wave (ESS, clip diagnostic) — queries_ext53
from grass_spark.queries_ext53 import EXT53_ORACLES, EXT53_QUERIES  # noqa: E402

QUERIES.update(EXT53_QUERIES)
ORACLES.update(EXT53_ORACLES)

# Fifty-fourth wave (heatmap lift, repeat orders) — queries_ext54
from grass_spark.queries_ext54 import EXT54_ORACLES, EXT54_QUERIES  # noqa: E402

QUERIES.update(EXT54_QUERIES)
ORACLES.update(EXT54_ORACLES)
