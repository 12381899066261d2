"""Second wave of driver-contract queries: weighted kernels, cyclic
accumulation, resample priority, gap listing, pivots, and a fully
portable MinHash-LSH pipeline (md5-based so the DuckDB oracle runs the
*identical* algorithm).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from grass_spark.functions.granularity import granule_series
from grass_spark.functions.kernels import weighted_kernel_expr
from grass_spark.functions.weighted import weighted_median, weighted_mode
from grass_spark.operators.accumulate import accumulate
from grass_spark.operators.dedup import with_shingles
from grass_spark.operators.gapfill import gaps_report
from grass_spark.operators.sample import resample_by_granularity


def _t(spark, sf_dir, name):
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def _with_w(ev):
    """weight = the integer `k` field of the props JSON column."""
    return ev.withColumn(
        "w", F.get_json_object("props", "$.k").cast("double")
    )


# ---------------------------------------------------------------------
# weighted kernels (r.series input=...|weight — SURVEY §2.2)
# ---------------------------------------------------------------------


def q_weighted_avg_daily(spark, sf_dir):
    ev = _with_w(_t(spark, sf_dir, "events"))
    day = F.date_trunc("day", F.col("ts")).alias("bucket")
    return ev.groupBy(day).agg(
        F.round(weighted_kernel_expr("w_ave", "value", "w"), 6).alias("w_ave"),
        F.round(weighted_kernel_expr("w_var", "value", "w"), 6).alias("w_var"),
    )


ORACLE_WEIGHTED_AVG_DAILY = """
WITH e AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, value AS v,
         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS w
  FROM events
)
SELECT bucket,
       round(sum(v * w) / sum(w), 6) AS w_ave,
       round(sum(w * v * v) / sum(w) - pow(sum(w * v) / sum(w), 2), 6) AS w_var
FROM e GROUP BY bucket
"""


def q_weighted_median_mode(spark, sf_dir):
    """GRASS lower weighted median (c_median.c:16-41) + weighted mode
    per event_type; values discretized so mode is meaningful."""
    ev = _with_w(_t(spark, sf_dir, "events")).withColumn(
        "iv", F.round("value", 0).cast("long")
    )
    med = weighted_median(
        ev, keys=["event_type"], value_col="value", weight_col="w",
        tiebreak=["event_id"],
    )
    mode = weighted_mode(
        ev, keys=["event_type"], value_col="iv", weight_col="w",
    )
    return med.join(mode, "event_type").select(
        "event_type", F.round("w_median", 6).alias("w_median"),
        F.col("w_mode").cast("long").alias("w_mode"),
    )


ORACLE_WEIGHTED_MEDIAN_MODE = """
WITH e AS (
  SELECT event_type, event_id, value AS v,
         CAST(round(value, 0) AS BIGINT) AS iv,
         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS w
  FROM events
), c AS (
  SELECT event_type, v, event_id,
         sum(w) OVER (PARTITION BY event_type ORDER BY v, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
         sum(w) OVER (PARTITION BY event_type) AS tot
  FROM e
), med AS (
  SELECT event_type, round(min(v), 6) AS w_median
  FROM c WHERE cumw >= tot * 0.5 GROUP BY event_type
), ws AS (
  SELECT event_type, iv, sum(w) AS wsum FROM e GROUP BY 1, 2
), mode AS (
  SELECT event_type, (list(iv ORDER BY wsum DESC, iv ASC))[1] AS w_mode
  FROM ws GROUP BY event_type
)
SELECT med.event_type, med.w_median, mode.w_mode
FROM med JOIN mode USING (event_type)
"""


# ---------------------------------------------------------------------
# cyclic accumulation (t.rast.accumulate — SURVEY §2.3)
# ---------------------------------------------------------------------

_ACC_ORIGIN = datetime(2024, 1, 1)


def q_accumulate_cycle(spark, sf_dir):
    """GDD accumulation (lower threshold 50) with weekly cycle reset."""
    ev = _t(spark, sf_dir, "events")
    out = accumulate(
        ev, keys=["user_id"], ts_col="ts", value_col="value",
        order_cols=["event_id"], lower=50.0, method="gdd",
        cycle="1 week", origin=_ACC_ORIGIN,
    )
    return out.select(
        "user_id", "event_id", "cycle_idx", F.round("acc", 6).alias("acc")
    )


ORACLE_ACCUMULATE_CYCLE = """
WITH e AS (
  SELECT user_id, event_id, ts,
         CAST(floor(datediff('day', TIMESTAMP '2024-01-01', CAST(ts AS DATE)) / 7)
              AS BIGINT) AS cycle_idx,
         greatest(value - 50.0, 0.0) AS contrib
  FROM events
)
SELECT user_id, event_id, cycle_idx,
       round(sum(contrib) OVER (
         PARTITION BY user_id, cycle_idx ORDER BY ts, event_id
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 6) AS acc
FROM e
"""


# ---------------------------------------------------------------------
# resample by granularity with relation priority (SURVEY §2.5)
# ---------------------------------------------------------------------


def q_resample_priority(spark, sf_dir):
    """Per day granule, EVERY map of the first non-empty relation class
    in priority EQUAL>DURING>OVERLAPS>OVERLAPPED>CONTAINS — classes are
    the granule's topology-builder lists (granule-relative, widened:
    starts/finishes fold into during, started/finished into contains);
    gap granules keep a NULL map (resample_maplist_by_granularity,
    abstract_space_time_dataset.py:1195-1420)."""
    ev = _t(spark, sf_dir, "events").filter("user_id = 3").select(
        F.col("event_id").alias("map_id"),
        F.col("ts"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("te"),
    )
    rows = granule_series(datetime(2024, 1, 1), datetime(2024, 2, 1), "1 day")
    granules = spark.createDataFrame(rows, ["bucket_start", "bucket_end"])
    out = resample_by_granularity(ev, granules, map_start="ts", map_end="te")
    return out.withColumn("rank", F.col("rank").cast("bigint"))


# priority CASE: the granule's widened builder-list classes —
# g equal m; g during m (incl. g starts/finishes m); g overlaps m;
# g overlapped m; g contains m (incl. g started/finished m)
_RESAMPLE_PRIO_SQL = """
         CASE WHEN granule_start = ms AND granule_end = me THEN 0
              WHEN (granule_start > ms AND granule_end < me)
                OR (granule_start = ms AND granule_end < me)
                OR (granule_start > ms AND granule_end = me) THEN 1
              WHEN granule_start < ms AND granule_end < me
               AND granule_end > ms THEN 2
              WHEN granule_start > ms AND granule_start < me
               AND granule_end > me THEN 3
              WHEN (granule_start < ms AND granule_end > me)
                OR (granule_start = ms AND me < granule_end)
                OR (granule_end = me AND ms > granule_start) THEN 4
         END
"""

ORACLE_RESAMPLE_PRIORITY = f"""
WITH g AS (
  SELECT CAST(d AS TIMESTAMP) AS granule_start,
         CAST(d AS TIMESTAMP) + INTERVAL 1 DAY AS granule_end
  FROM (SELECT unnest(generate_series(TIMESTAMP '2024-01-01',
                                      TIMESTAMP '2024-01-31',
                                      INTERVAL 1 DAY)) AS d)
), m AS (
  SELECT event_id AS map_id, ts AS ms, ts + INTERVAL 30 MINUTE AS me
  FROM events WHERE user_id = 3
), j AS (
  SELECT granule_start, granule_end, map_id, ms,
         {_RESAMPLE_PRIO_SQL} AS prio
  FROM g LEFT JOIN m ON ({_RESAMPLE_PRIO_SQL}) IS NOT NULL
), w AS (
  SELECT *, min(prio) OVER (PARTITION BY granule_start) AS best FROM j
)
SELECT granule_start, granule_end, map_id, ms AS map_start,
       CAST(row_number() OVER (
              PARTITION BY granule_start
              ORDER BY ms NULLS LAST, map_id NULLS LAST) - 1
            AS BIGINT) AS rank
FROM w WHERE prio IS NOT DISTINCT FROM best
"""


# ---------------------------------------------------------------------
# gap listing (t.rast.list method=deltagaps — SURVEY §2.1)
# ---------------------------------------------------------------------


def q_gaps_daily(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    daily = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("bucket_start")
    ).distinct()
    return gaps_report(daily, "1 day", keys=["user_id"])


ORACLE_GAPS_DAILY = """
WITH daily AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS d
  FROM events
), x AS (
  SELECT user_id, d,
         lead(d) OVER (PARTITION BY user_id ORDER BY d) AS nd
  FROM daily
)
SELECT user_id,
       d + INTERVAL 1 DAY AS gap_start,
       nd                 AS gap_end,
       CAST(datediff('day', d, nd) - 1 AS BIGINT) AS gap_len
FROM x WHERE datediff('day', d, nd) > 1
"""


# ---------------------------------------------------------------------
# per-type activity pivot (per-role/per-tool activity analog)
# ---------------------------------------------------------------------

EVENT_TYPES = ("click", "error", "purchase", "signup", "view")


def q_pivot_daily(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("bucket")
    aggs = [
        F.sum(F.when(F.col("event_type") == t, 1).otherwise(0)).alias(f"n_{t}")
        for t in EVENT_TYPES
    ]
    return ev.groupBy("user_id", day).agg(
        F.count(F.lit(1)).alias("cnt"), *aggs
    )


ORACLE_PIVOT_DAILY = f"""
SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
       CAST(count(*) AS BIGINT) AS cnt,
       {', '.join(
           f"CAST(sum(CASE WHEN event_type = '{t}' THEN 1 ELSE 0 END) AS BIGINT) AS n_{t}"
           for t in EVENT_TYPES
       )}
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------
# portable MinHash-LSH (md5-based so DuckDB runs the same algorithm)
# ---------------------------------------------------------------------

N_SIG = 8
N_BANDS = 4  # 2 slots per band

_SQL_SHINGLES = """
  nrm AS (
    SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
    FROM documents
  ), w AS (
    SELECT doc_id, t, regexp_split_to_array(t, ' ') AS ws FROM nrm
  ), sh AS (
    SELECT doc_id, unnest(
      CASE WHEN len(ws) >= 3
           THEN list_distinct(list_transform(
                  generate_series(1, len(ws) - 2),
                  i -> array_to_string(ws[i:i+2], ' ')))
           ELSE [t] END) AS s
    FROM w
  )
"""

_SQL_SIG = (
    "sig AS (SELECT doc_id, "
    + ", ".join(f"min(md5(s || '#{i}')) AS h{i}" for i in range(N_SIG))
    + " FROM sh GROUP BY doc_id)"
)


def _sig_df(spark, sf_dir):
    # per-row fold, no explode/groupBy: h_i = array_min(md5(s + "#i"))
    # over the shingle array — identical values to the old shuffled
    # min() aggregate (lexicographic md5 min either way), zero Exchange.
    # sh_arr appears only as a top-level HOF argument (inlining-proof
    # per PLANS.md).
    d = _t(spark, sf_dir, "documents")
    # shingle-less docs had no exploded rows in the old form (and have
    # none in the DuckDB oracle) — keep them absent here too
    sh = with_shingles(d, "text", 3).where(F.size("sh_arr") > 0)
    def _slot(i: int):
        # NB: a 2-arg lambda would make F.transform pass the ARRAY INDEX
        # as the second argument — bind the slot number via closure
        suffix = F.lit(f"#{i}")
        return F.array_min(
            F.transform(F.col("sh_arr"), lambda s: F.md5(F.concat(s, suffix)))
        ).alias(f"h{i}")

    return sh.select("doc_id", *[_slot(i) for i in range(N_SIG)])


def q_minhash_sig(spark, sf_dir):
    """Word-3-gram MinHash signatures (8 md5-min slots per doc)."""
    return _sig_df(spark, sf_dir)


ORACLE_MINHASH_SIG = f"WITH {_SQL_SHINGLES}, {_SQL_SIG} SELECT * FROM sig"


def q_minhash_pairs(spark, sf_dir):
    """Banded-LSH candidate pairs + MinHash Jaccard estimate (4 bands
    of 2 slots) — the scale path of near-dup detection."""
    # localCheckpoint: the band self-join would otherwise recompute the
    # whole shingle+minhash subtree twice (Spark does not dedup subplans)
    sig = _sig_df(spark, sf_dir).withColumn(
        "sig", F.array(*[F.col(f"h{i}") for i in range(N_SIG)])
    ).localCheckpoint()
    bands = F.array(*[
        F.md5(F.concat(F.col(f"h{2*b}"), F.col(f"h{2*b+1}")))
        for b in range(N_BANDS)
    ])
    banded = sig.select(
        "doc_id", "sig", F.posexplode(bands).alias("band_idx", "bh")
    )
    a = banded.select(
        F.col("doc_id").alias("id_a"), F.col("sig").alias("sig_a"),
        "band_idx", "bh",
    )
    b = banded.select(
        F.col("doc_id").alias("id_b"), F.col("sig").alias("sig_b"),
        "band_idx", "bh",
    )
    pairs = (
        a.join(b, on=["band_idx", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "sig_a", "sig_b")
        .distinct()
    )
    eq = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: (x == y).cast("int")),
            lambda v: v == 1,
        )
    )
    return pairs.select(
        "id_a", "id_b", F.round(eq / N_SIG, 6).alias("est_jaccard")
    )


ORACLE_MINHASH_PAIRS = f"""
WITH {_SQL_SHINGLES}, {_SQL_SIG},
sig2 AS (
  SELECT doc_id, [{', '.join(f'h{i}' for i in range(N_SIG))}] AS sig
  FROM sig
), band AS (
  SELECT doc_id, sig,
         unnest(generate_series(0, {N_BANDS - 1})) AS band_idx,
         unnest(list_transform(generate_series(0, {N_BANDS - 1}),
                b -> md5(sig[2*b + 1] || sig[2*b + 2]))) AS bh
  FROM sig2
), pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.sig AS sig_a, b.sig AS sig_b
  FROM band a JOIN band b USING (band_idx, bh)
  WHERE a.doc_id < b.doc_id
)
SELECT id_a, id_b,
       round(len(list_filter(generate_series(1, {N_SIG}),
                             i -> sig_a[i] = sig_b[i])) / {N_SIG}.0, 6)
         AS est_jaccard
FROM pairs
"""


EXT_QUERIES = {
    "weighted_avg_daily": q_weighted_avg_daily,
    "weighted_median_mode": q_weighted_median_mode,
    "accumulate_cycle": q_accumulate_cycle,
    "resample_priority": q_resample_priority,
    "gaps_daily": q_gaps_daily,
    "pivot_daily": q_pivot_daily,
    "minhash_sig": q_minhash_sig,
    "minhash_pairs": q_minhash_pairs,
}

EXT_ORACLES = {
    "weighted_avg_daily": ORACLE_WEIGHTED_AVG_DAILY,
    "weighted_median_mode": ORACLE_WEIGHTED_MEDIAN_MODE,
    "accumulate_cycle": ORACLE_ACCUMULATE_CYCLE,
    "resample_priority": ORACLE_RESAMPLE_PRIORITY,
    "gaps_daily": ORACLE_GAPS_DAILY,
    "pivot_daily": ORACLE_PIVOT_DAILY,
    "minhash_sig": ORACLE_MINHASH_SIG,
    "minhash_pairs": ORACLE_MINHASH_PAIRS,
}


# ---------------------------------------------------------------------
# t.rast.what — point sampling across time, wide format (SURVEY §2.1)
# ---------------------------------------------------------------------

WHAT_USERS = (1, 5, 9)


def q_what_wide(spark, sf_dir):
    """Sample 3 users' hourly averages as wide columns across time
    (t.rast.what wide output, temporal/t.rast.what/t.rast.what.py)."""
    ev = _t(spark, sf_dir, "events").filter(F.col("user_id").isin(*WHAT_USERS))
    hour = F.date_trunc("hour", F.col("ts")).alias("bucket")
    aggs = [
        F.round(
            F.avg(F.when(F.col("user_id") == u, F.col("value"))), 6
        ).alias(f"u{u}")
        for u in WHAT_USERS
    ]
    return ev.groupBy(hour).agg(*aggs)


ORACLE_WHAT_WIDE = f"""
SELECT date_trunc('hour', ts) AS bucket,
       {', '.join(
           f"round(avg(CASE WHEN user_id = {u} THEN value END), 6) AS u{u}"
           for u in WHAT_USERS
       )}
FROM events WHERE user_id IN {WHAT_USERS}
GROUP BY 1
"""


def q_infer_granularity(spark, sf_dir):
    """Granularity inference (GCD of deltas/gaps) over each user's daily
    buckets — returns the inferred granularity string per user.  The
    consecutive-delta decomposition runs JVM-side (one lag window
    partitioned by user); only (user, distinct delta struct) rows reach
    the driver — O(users × distinct deltas), not O(distinct ts).  No SQL
    oracle (GCD aggregation is not portably expressible): rows-only check."""
    from grass_spark.functions.granularity import infer_granularity_grouped

    ev = _t(spark, sf_dir, "events")
    daily = ev.select("user_id", F.date_trunc("day", F.col("ts")).alias("d"))
    rows = infer_granularity_grouped(daily, keys=["user_id"], ts_col="d")
    return spark.createDataFrame(rows, "user_id bigint, granularity string")


EXT_QUERIES.update({
    "what_wide": q_what_wide,
    "infer_granularity": q_infer_granularity,
})
EXT_ORACLES.update({
    "what_wide": ORACLE_WHAT_WIDE,
})


def q_accdetect(spark, sf_dir):
    """t.rast.accdetect: in-band indicator (1 first, 2 middle, 3 last)
    + first-occurrence timestamp over the weekly GDD accumulation."""
    from grass_spark.operators.accumulate import accdetect

    ev = _t(spark, sf_dir, "events")
    acc = accumulate(
        ev, keys=["user_id"], ts_col="ts", value_col="value",
        order_cols=["event_id"], lower=50.0, method="gdd",
        cycle="1 week", origin=_ACC_ORIGIN,
    )
    out = accdetect(acc, 500.0, 2000.0, keys=["user_id"],
                    order_cols=["event_id"])
    return out.select(
        "user_id", "event_id", "cycle_idx", "in_range",
        "indicator", "occurrence",
    )


ORACLE_ACCDETECT = """
WITH e AS (
  SELECT user_id, event_id, ts,
         CAST(floor(datediff('day', TIMESTAMP '2024-01-01', CAST(ts AS DATE)) / 7)
              AS BIGINT) AS cycle_idx,
         greatest(value - 50.0, 0.0) AS contrib
  FROM events
), a AS (
  SELECT user_id, event_id, ts, cycle_idx,
         sum(contrib) OVER (
           PARTITION BY user_id, cycle_idx ORDER BY ts, event_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS acc
  FROM e
), f AS (
  SELECT *, acc BETWEEN 500.0 AND 2000.0 AS in_range FROM a
), m AS (
  SELECT *,
         min(CASE WHEN in_range THEN ts END)
           OVER (PARTITION BY user_id, cycle_idx) AS occurrence,
         max(CASE WHEN in_range THEN ts END)
           OVER (PARTITION BY user_id, cycle_idx) AS last_ts
  FROM f
)
SELECT user_id, event_id, cycle_idx, in_range,
       CASE WHEN NOT in_range THEN NULL
            WHEN ts = occurrence THEN 1
            WHEN ts = last_ts THEN 3
            ELSE 2 END AS indicator,
       occurrence
FROM m
"""

EXT_QUERIES["accdetect"] = q_accdetect
EXT_ORACLES["accdetect"] = ORACLE_ACCDETECT


def q_algebra_expr(spark, sf_dir):
    """t.rast.algebra through the expression front-end: per user per day,
    D = if(S / C > 100, S / C, 0) over sum (S) and count (C) datasets —
    parsed and compiled to a DataFrame plan by TemporalAlgebra."""
    from grass_spark.algebra import TemporalAlgebra

    ev = _t(spark, sf_dir, "events")
    day = F.date_trunc("day", F.col("ts")).alias("bucket_start")
    s = ev.groupBy("user_id", day).agg(F.sum("value").alias("value"))
    c = ev.groupBy("user_id", day).agg(
        F.count("value").cast("double").alias("value")
    )
    alg = TemporalAlgebra(keys=["user_id"], time_col="bucket_start",
                          end_col=None, value_col="value")
    out = alg.eval("if(S / C > 100, S / C, 0)", {"S": s, "C": c})
    return out.select(
        "user_id",
        F.col("bucket_start").alias("bucket"),
        F.round("value", 6).alias("value"),
    )


ORACLE_ALGEBRA_EXPR = """
WITH d AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         sum(value) AS s, CAST(count(value) AS DOUBLE) AS c
  FROM events GROUP BY 1, 2
)
SELECT user_id, bucket,
       round(CASE WHEN s / c > 100 THEN s / c ELSE 0 END, 6) AS value
FROM d
"""

EXT_QUERIES["algebra_expr"] = q_algebra_expr
EXT_ORACLES["algebra_expr"] = ORACLE_ALGEBRA_EXPR


def q_masked_agg(spark, sf_dir):
    """r.series range=lo,hi masking (values outside [50,300] -> NULL,
    main.c:199-203) + the -n propagate-null flag variant: cnt_masked
    skips NULLs, sum_propagate is NULL when any input in the bucket was
    masked (main.c:208-210)."""
    from grass_spark.functions.kernels import masked

    ev = _t(spark, sf_dir, "events").withColumn("mv", masked("value", 50.0, 300.0))
    day = F.date_trunc("day", F.col("ts")).alias("bucket")
    return ev.groupBy("user_id", day).agg(
        F.count("mv").alias("cnt_masked"),
        F.round(F.sum("mv"), 6).alias("sum_masked"),
        F.round(
            F.when(F.count(F.lit(1)) == F.count("mv"), F.sum("mv")), 6
        ).alias("sum_propagate"),
    )


ORACLE_MASKED_AGG = """
WITH e AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         CASE WHEN value BETWEEN 50.0 AND 300.0 THEN value END AS mv
  FROM events
)
SELECT user_id, bucket,
       CAST(count(mv) AS BIGINT) AS cnt_masked,
       round(sum(mv), 6)         AS sum_masked,
       round(CASE WHEN count(*) = count(mv) THEN sum(mv) END, 6)
         AS sum_propagate
FROM e GROUP BY 1, 2
"""


def q_weighted_quantile(spark, sf_dir):
    """GRASS w_quant (c_percentile.c:49-75): lower weighted quantile at
    q=0.75 per event_type (cumulative weight >= total * q)."""
    from grass_spark.functions.weighted import weighted_quantile

    ev = _with_w(_t(spark, sf_dir, "events"))
    out = weighted_quantile(
        ev, 0.75, keys=["event_type"], value_col="value", weight_col="w",
        tiebreak=["event_id"], alias="w_q75",
    )
    return out.select("event_type", F.round("w_q75", 6).alias("w_q75"))


ORACLE_WEIGHTED_QUANTILE = """
WITH e AS (
  SELECT event_type, event_id, value AS v,
         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS w
  FROM events
), c AS (
  SELECT event_type, v,
         sum(w) OVER (PARTITION BY event_type ORDER BY v, event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumw,
         sum(w) OVER (PARTITION BY event_type) AS tot
  FROM e
)
SELECT event_type, round(min(v), 6) AS w_q75
FROM c WHERE cumw >= tot * 0.75 GROUP BY event_type
"""

EXT_QUERIES["masked_agg"] = q_masked_agg
EXT_ORACLES["masked_agg"] = ORACLE_MASKED_AGG
EXT_QUERIES["weighted_quantile"] = q_weighted_quantile
EXT_ORACLES["weighted_quantile"] = ORACLE_WEIGHTED_QUANTILE


def q_sessionize(spark, sf_dir):
    """Sessionization: split each user's event stream at >30-minute
    inactivity gaps; per-session bounds + counts."""
    from grass_spark.operators.sessionize import session_stats, sessionize

    ev = _t(spark, sf_dir, "events")
    sess = sessionize(
        ev, 30 * 60, keys=["user_id"], ts_col="ts", order_cols=["event_id"]
    )
    return session_stats(sess, keys=["user_id"], ts_col="ts").select(
        "user_id", "session_idx", "session_start", "session_end",
        F.round("duration_s", 6).alias("duration_s"),
        F.col("n_events"),
    )


ORACLE_SESSIONIZE = """
WITH l AS (
  SELECT user_id, event_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
), b AS (
  SELECT user_id, event_id, ts,
         CASE WHEN prev IS NULL
                OR date_diff('microsecond', prev, ts) > 30*60*1000000
              THEN 1 ELSE 0 END AS boundary
  FROM l
), s AS (
  SELECT user_id, ts,
         sum(boundary) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           - 1 AS session_idx
  FROM b
)
SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       min(ts) AS session_start, max(ts) AS session_end,
       round(date_diff('microsecond', min(ts), max(ts)) / 1e6, 6) AS duration_s,
       CAST(count(*) AS BIGINT) AS n_events
FROM s GROUP BY 1, 2
"""

EXT_QUERIES["sessionize"] = q_sessionize
EXT_ORACLES["sessionize"] = ORACLE_SESSIONIZE


def q_weighted_regression(spark, sf_dir):
    """w_reg_* kernels (c_reg.c regression_w): weighted OLS of value
    against the time index per event_type, weights from props.k."""
    from pyspark.sql import Window as W

    from grass_spark.functions.kernels import weighted_regression_expr

    ev = _with_w(_t(spark, sf_dir, "events"))
    idx = F.row_number().over(
        W.partitionBy("event_type").orderBy("ts", "event_id")
    ) - 1
    base = ev.withColumn("idx", idx)
    return base.groupBy("event_type").agg(
        F.round(weighted_regression_expr("w_slope", "value", "idx", "w"), 6).alias("w_slope"),
        F.round(weighted_regression_expr("w_offset", "value", "idx", "w"), 6).alias("w_offset"),
        F.round(weighted_regression_expr("w_detcoeff", "value", "idx", "w"), 6).alias("w_detcoeff"),
    )


ORACLE_WEIGHTED_REGRESSION = """
WITH e AS (
  SELECT event_type, value AS v,
         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS w,
         row_number() OVER (PARTITION BY event_type ORDER BY ts, event_id) - 1 AS i
  FROM events
), a AS (
  SELECT event_type,
         sum(w) AS cnt,
         sum(i * w) / sum(w) AS xbar,
         sum(v * w) / sum(w) AS ybar,
         sum(i * v * w) AS sxy,
         sum(i * i * w) AS sxx,
         sum(v * v * w) AS syy
  FROM e GROUP BY event_type
), b AS (
  SELECT event_type, cnt, xbar, ybar,
         sxy - cnt * xbar * ybar AS numer,
         sxx - cnt * xbar * xbar AS denom,
         syy - cnt * ybar * ybar AS denom2
  FROM a
)
SELECT event_type,
       CASE WHEN cnt < 2 THEN NULL ELSE round(numer / denom, 6) END AS w_slope,
       CASE WHEN cnt < 2 THEN NULL
            ELSE round(ybar - xbar * numer / denom, 6) END AS w_offset,
       CASE WHEN cnt < 2 THEN NULL
            ELSE round(numer * numer / (denom * denom2), 6) END AS w_detcoeff
FROM b
"""

EXT_QUERIES["weighted_regression"] = q_weighted_regression
EXT_ORACLES["weighted_regression"] = ORACLE_WEIGHTED_REGRESSION


def q_what_long(spark, sf_dir):
    """t.rast.what long/text output: sampled users' raw values across
    time in long format (t.rast.what.py layout=row)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.filter(F.col("user_id").isin(*WHAT_USERS))
        .select(
            "user_id",
            F.col("ts").alias("sample_time"),
            F.round("value", 6).alias("value"),
            "event_type",
        )
    )


ORACLE_WHAT_LONG = f"""
SELECT user_id, ts AS sample_time, round(value, 6) AS value, event_type
FROM events WHERE user_id IN {WHAT_USERS}
"""

EXT_QUERIES["what_long"] = q_what_long
EXT_ORACLES["what_long"] = ORACLE_WHAT_LONG


def q_algebra_hash(spark, sf_dir):
    """t.rast.algebra round-2 grammar: the hash operator
    ``D {#,contains} H`` (count of hourly granules inside each day
    granule — builder-widened contains, so the boundary hours that
    merely ``started``/``finished`` the day count too;
    temporal_algebra.py:2726-2747, count_map branch at :1609-1620)
    composed with an if/else conditional on a temporal accessor
    (``p_expr_condition_elif``, :3130-3169): weekday days keep the
    count, weekend days map to -1."""
    from grass_spark.algebra import TemporalAlgebra

    ev = _t(spark, sf_dir, "events")
    usec = lambda c, s: F.timestamp_micros(F.unix_micros(c) + s * 1_000_000)  # noqa: E731
    d = (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("bucket_start"))
        .agg(F.avg("value").alias("value"))
        .withColumn("bucket_end", usec(F.col("bucket_start"), 86400))
    )
    h = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("bucket_start"))
        .agg(F.count(F.lit(1)).cast("double").alias("value"))
        .withColumn("bucket_end", usec(F.col("bucket_start"), 3600))
    )
    alg = TemporalAlgebra(keys=["user_id"])
    out = alg.eval(
        "if(start_dow() <= 5, D {#,contains} H, (D {#,contains} H) * 0 - 1)",
        {"D": d, "H": h},
    )
    return out.select(
        "user_id",
        F.col("bucket_start").alias("bucket"),
        F.col("value").cast("bigint").alias("hash_cnt"),
    )


ORACLE_ALGEBRA_HASH = """
WITH h AS (
  SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h0
  FROM events GROUP BY 1, 2
), d AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket
  FROM events GROUP BY 1, 2
), c AS (
  SELECT d.user_id, d.bucket, count(*) AS cnt
  FROM d JOIN h ON d.user_id = h.user_id
   AND h.h0 >= d.bucket
   AND h.h0 + INTERVAL 1 HOUR <= d.bucket + INTERVAL 1 DAY
  GROUP BY 1, 2
)
SELECT user_id, bucket,
       CAST(CASE WHEN isodow(bucket) <= 5 THEN cnt ELSE -1 END AS BIGINT)
         AS hash_cnt
FROM c
"""

EXT_QUERIES["algebra_hash"] = q_algebra_hash
EXT_ORACLES["algebra_hash"] = ORACLE_ALGEBRA_HASH


def q_weighted_skew_kurt(spark, sf_dir):
    """r.series w_skew / w_kurt weighted kernels (lib/stats/c_skew.c:
    49-105, c_kurt.c:47-101 — incl. the reference's d³ accumulation in
    w_kurt) per day."""
    ev = _with_w(_t(spark, sf_dir, "events"))
    day = F.date_trunc("day", F.col("ts")).alias("bucket")
    return ev.groupBy(day).agg(
        F.round(weighted_kernel_expr("w_skew", "value", "w"), 6).alias("w_skew"),
        F.round(weighted_kernel_expr("w_kurt", "value", "w"), 6).alias("w_kurt"),
    )


ORACLE_WEIGHTED_SKEW_KURT = """
WITH e AS (
  SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket, value AS v,
         CAST(json_extract_string(props, '$.k') AS DOUBLE) AS w
  FROM events
), s AS (
  SELECT bucket, sum(w) AS W, sum(w * v) AS s1,
         sum(w * v * v) AS s2, sum(w * v * v * v) AS s3
  FROM e GROUP BY bucket
), c AS (
  SELECT bucket, W,
         s2 - W * pow(s1 / W, 2) AS cs2,
         s3 - 3 * (s1 / W) * s2 + 2 * W * pow(s1 / W, 3) AS cs3
  FROM s
)
SELECT bucket,
       round(cs3 / (W * pow(sqrt(cs2 / W), 3)), 6) AS w_skew,
       round(cs3 / (W * pow(cs2 / W, 2)) - 3, 6) AS w_kurt
FROM c
"""

EXT_QUERIES["weighted_skew_kurt"] = q_weighted_skew_kurt
EXT_ORACLES["weighted_skew_kurt"] = ORACLE_WEIGHTED_SKEW_KURT


def q_neighbors_rolling(spark, sf_dir):
    """t.rast.neighbors temporal analog: rolling ±1-granule kernels
    (average/median/sum/minimum/count) over each user's daily series
    (temporal/t.rast.neighbors/t.rast.neighbors.py:57-71, size=3)."""
    from grass_spark.operators.neighbors import neighbors

    ev = _t(spark, sf_dir, "events")
    daily = ev.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("bucket")
    ).agg(F.avg("value").alias("value"))
    out = neighbors(
        daily, keys=["user_id"], time_col="bucket", value_col="value",
        size=3, methods=("average", "median", "sum", "minimum", "count"),
    )
    return out.select(
        "user_id", "bucket",
        F.round("average", 6).alias("n_avg"),
        F.round("median", 6).alias("n_med"),
        F.round("sum", 6).alias("n_sum"),
        F.round("minimum", 6).alias("n_min"),
        F.col("count").alias("n_cnt"),
    )


ORACLE_NEIGHBORS_ROLLING = """
WITH d AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
         avg(value) AS v
  FROM events GROUP BY 1, 2
)
SELECT user_id, bucket,
       round(avg(v) OVER w, 6)    AS n_avg,
       round(median(v) OVER w, 6) AS n_med,
       round(sum(v) OVER w, 6)    AS n_sum,
       round(min(v) OVER w, 6)    AS n_min,
       count(v) OVER w            AS n_cnt
FROM d
WINDOW w AS (PARTITION BY user_id ORDER BY bucket
             ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING)
"""

EXT_QUERIES["neighbors_rolling"] = q_neighbors_rolling
EXT_ORACLES["neighbors_rolling"] = ORACLE_NEIGHBORS_ROLLING
