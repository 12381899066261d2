"""Tenth wave of driver-contract queries: event-stream analytics —
windowed funnels, retention cohorts, typed JSON-props rollups
(operators/funnel.py) over the ``events`` table.

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.funnel import (
    event_funnel,
    extract_props,
    retention_cohorts,
)
from grass_spark.operators.abtest import ab_test
from grass_spark.operators.asof import asof_join
from grass_spark.operators.m4 import m4_downsample
from grass_spark.operators.transitions import (
    event_ngrams,
    event_transitions,
    rate_anomalies,
    sessionize_events,
)
from grass_spark.queries_ext import _t

EXT10_QUERIES: dict = {}
EXT10_ORACLES: dict = {}


# ---------------------------------------------------------------------
# windowed funnel — view -> click -> purchase within 7 days of entry
# ---------------------------------------------------------------------

_FUNNEL_STEPS = ("view", "click", "purchase")
_FUNNEL_WINDOW = 7 * 86400


def q_event_funnel(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = event_funnel(ev, _FUNNEL_STEPS, _FUNNEL_WINDOW)
    return out.orderBy("user_id")


ORACLE_EVENT_FUNNEL = f"""
WITH s1 AS (
  SELECT user_id, min(ts) AS t1
  FROM events WHERE event_type = '{_FUNNEL_STEPS[0]}'
  GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = '{_FUNNEL_STEPS[1]}'
    AND e.ts > s1.t1
    AND e.ts <= s1.t1 + INTERVAL {_FUNNEL_WINDOW} SECOND
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
  WHERE e.event_type = '{_FUNNEL_STEPS[2]}'
    AND e.ts > s2.t2
    AND e.ts <= s1.t1 + INTERVAL {_FUNNEL_WINDOW} SECOND
  GROUP BY e.user_id
)
SELECT s1.user_id,
       s1.t1 AS entered_at,
       CAST(1 + CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END
              + CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END
            AS INT) AS steps_completed
FROM s1
LEFT JOIN s2 USING (user_id)
LEFT JOIN s3 USING (user_id)
ORDER BY s1.user_id
"""

EXT10_QUERIES["event_funnel"] = q_event_funnel
EXT10_ORACLES["event_funnel"] = ORACLE_EVENT_FUNNEL


# ---------------------------------------------------------------------
# retention cohorts — first-active-day cohort x day-offset user counts
# ---------------------------------------------------------------------

def q_retention_cohorts(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = retention_cohorts(ev)
    return out.orderBy("cohort", "offset_days")


ORACLE_RETENTION_COHORTS = """
WITH act AS (
  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS DATE) AS d
  FROM events
),
coh AS (
  SELECT user_id, min(d) AS cohort FROM act GROUP BY user_id
)
SELECT coh.cohort,
       CAST(date_diff('day', coh.cohort, act.d) AS INT) AS offset_days,
       count(*) AS n_users
FROM act JOIN coh USING (user_id)
GROUP BY 1, 2
ORDER BY 1, 2
"""

EXT10_QUERIES["retention_cohorts"] = q_retention_cohorts
EXT10_ORACLES["retention_cohorts"] = ORACLE_RETENTION_COHORTS


# ---------------------------------------------------------------------
# JSON-props rollup — typed $.k extraction, daily per-type aggregates
# ---------------------------------------------------------------------

def q_event_props(spark, sf_dir):
    ev = extract_props(
        _t(spark, sf_dir, "events"), {"k": ("$.k", "bigint")}
    )
    day = F.to_date(F.date_trunc("day", F.col("ts"))).alias("day")
    return (
        ev.groupBy("event_type", day)
        .agg(
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.sum("k").alias("sum_k"),
            F.count("k").alias("n"),
        )
        .orderBy("event_type", "day")
    )


ORACLE_EVENT_PROPS = """
WITH e AS (
  SELECT event_type,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
  FROM events
)
SELECT event_type, day,
       round(avg(k), 6) AS avg_k,
       CAST(sum(k) AS BIGINT) AS sum_k,
       count(k) AS n
FROM e
GROUP BY 1, 2
ORDER BY 1, 2
"""

EXT10_QUERIES["event_props"] = q_event_props
EXT10_ORACLES["event_props"] = ORACLE_EVENT_PROPS


# ---------------------------------------------------------------------
# Markov transition matrix — consecutive event-type pairs per user
# ---------------------------------------------------------------------

def q_event_transitions(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return event_transitions(ev).orderBy("from_type", "to_type")


ORACLE_EVENT_TRANSITIONS = """
WITH seq AS (
  SELECT user_id, event_type,
         lead(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) AS nxt
  FROM events
),
m AS (
  SELECT event_type AS from_type, nxt AS to_type, count(*) AS n
  FROM seq WHERE nxt IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       round(CAST(n AS DOUBLE)
             / CAST(sum(n) OVER (PARTITION BY from_type) AS DOUBLE),
             6) AS p
FROM m
ORDER BY 1, 2
"""

EXT10_QUERIES["event_transitions"] = q_event_transitions
EXT10_ORACLES["event_transitions"] = ORACLE_EVENT_TRANSITIONS


# ---------------------------------------------------------------------
# rate anomalies — per-(user, day) z-score vs the trailing 7-day window
# ---------------------------------------------------------------------

def q_rate_anomalies(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return rate_anomalies(ev).orderBy("user_id", "day")


# z composes from EXACT integer power sums in both engines (see
# operators/transitions.py) — built-in stddev differs in the last ulp.
ORACLE_RATE_ANOMALIES = """
WITH daily AS (
  SELECT user_id,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         count(*) AS n_events
  FROM events GROUP BY 1, 2
),
win AS (
  SELECT user_id, day, n_events,
         sum(n_events)            OVER w AS s1,
         sum(n_events * n_events) OVER w AS s2,
         count(n_events)          OVER w AS m
  FROM daily
  WINDOW w AS (
    PARTITION BY user_id
    ORDER BY date_diff('day', DATE '1970-01-01', day)
    RANGE BETWEEN 7 PRECEDING AND 1 PRECEDING
  )
)
SELECT user_id, day, n_events,
       CAST(coalesce(m, 0) AS INT) AS n_prev,
       CASE WHEN m >= 3
             AND (CAST(s2 AS DOUBLE) / m
                  - (CAST(s1 AS DOUBLE) / m) * (CAST(s1 AS DOUBLE) / m)) > 0
            THEN round(
              (n_events - CAST(s1 AS DOUBLE) / m)
              / sqrt(CAST(s2 AS DOUBLE) / m
                     - (CAST(s1 AS DOUBLE) / m) * (CAST(s1 AS DOUBLE) / m)),
              6)
       END AS z
FROM win
ORDER BY user_id, day
"""

EXT10_QUERIES["rate_anomalies"] = q_rate_anomalies
EXT10_ORACLES["rate_anomalies"] = ORACLE_RATE_ANOMALIES


# ---------------------------------------------------------------------
# as-of attribution — each purchase's most recent preceding view within
# 3 days, cross-checked against DuckDB's NATIVE ASOF JOIN
# ---------------------------------------------------------------------

_ATTR_TOL = 3 * 86400


def q_asof_attribution(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    purchases = ev.where(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = ev.where(F.col("event_type") == "view").select(
        F.col("event_id").alias("view_id"), "user_id", "ts"
    )
    out = asof_join(
        purchases, views, on="user_id",
        tie_col="view_id", tolerance_seconds=_ATTR_TOL,
    )
    return out.select(
        "event_id", "user_id", "ts", "ts_r", "view_id_r"
    ).orderBy("event_id")


# The oracle pre-dedups the right side to one row per (user, ts) with
# max(event_id) — DuckDB's ASOF JOIN is nondeterministic among tied
# timestamps; the dedup makes it equal to asof_join's greatest-tie rule.
ORACLE_ASOF_ATTRIBUTION = f"""
WITH p AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
v AS (
  SELECT user_id, ts, max(event_id) AS view_id
  FROM events WHERE event_type = 'view'
  GROUP BY 1, 2
),
m AS (
  SELECT p.event_id, p.user_id, p.ts,
         v.ts AS mts, v.view_id AS mview
  FROM p ASOF LEFT JOIN v
    ON p.user_id = v.user_id AND p.ts >= v.ts
)
SELECT event_id, user_id, ts,
       CASE WHEN mts >= ts - INTERVAL {_ATTR_TOL} SECOND THEN mts END
         AS ts_r,
       CASE WHEN mts >= ts - INTERVAL {_ATTR_TOL} SECOND THEN mview END
         AS view_id_r
FROM m
ORDER BY event_id
"""

EXT10_QUERIES["asof_attribution"] = q_asof_attribution
EXT10_ORACLES["asof_attribution"] = ORACLE_ASOF_ATTRIBUTION


# ---------------------------------------------------------------------
# event paths — consecutive event-type trigram counts per user
# ---------------------------------------------------------------------

def q_event_paths(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return event_ngrams(ev, 3).orderBy("g1", "g2", "g3")


ORACLE_EVENT_PATHS = """
WITH seq AS (
  SELECT event_type AS g1,
         lead(event_type, 1) OVER w AS g2,
         lead(event_type, 2) OVER w AS g3
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT g1, g2, g3, count(*) AS n_paths
FROM seq WHERE g3 IS NOT NULL
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
"""

EXT10_QUERIES["event_paths"] = q_event_paths
EXT10_ORACLES["event_paths"] = ORACLE_EVENT_PATHS


# ---------------------------------------------------------------------
# user-stream sessionization — 6h inactivity gap, bucket-decomposed
# ---------------------------------------------------------------------

_SESSION_GAP = 6 * 3600


def q_sessionize_events(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    out = sessionize_events(ev, _SESSION_GAP)
    return out.select(
        "event_id", "user_id", "ts", "session_idx", "session_id"
    ).orderBy("event_id")


ORACLE_SESSIONIZE_EVENTS = f"""
WITH s AS (
  SELECT event_id, user_id, ts,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
f AS (
  SELECT *, CASE WHEN prev IS NULL
                   OR ts > prev + INTERVAL {_SESSION_GAP} SECOND
                 THEN 1 ELSE 0 END AS flag
  FROM s
),
x AS (
  SELECT event_id, user_id, ts,
         CAST(sum(flag) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) - 1 AS BIGINT) AS session_idx
  FROM f
)
SELECT event_id, user_id, ts, session_idx,
       CAST(user_id AS VARCHAR) || '#' || CAST(session_idx AS VARCHAR)
         AS session_id
FROM x ORDER BY event_id
"""

EXT10_QUERIES["sessionize_events"] = q_sessionize_events
EXT10_ORACLES["sessionize_events"] = ORACLE_SESSIONIZE_EVENTS


# ---------------------------------------------------------------------
# A/B test — sticky hash assignment, purchase conversion, pooled z
# ---------------------------------------------------------------------

def q_ab_test(spark, sf_dir):
    return ab_test(_t(spark, sf_dir, "events"))


# The z composes from exact integer counts in a fixed float order; the
# portable uniform is the shared first-8-md5-hex-digits recipe.  CAST
# every literal to DOUBLE — DuckDB's 1.0 is DECIMAL and diverges.
ORACLE_AB_TEST = """
WITH pu AS (
  SELECT user_id,
         max(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
  FROM events GROUP BY 1
),
v AS (
  SELECT conv,
         CASE WHEN CAST('0x' || substr(
                      md5('ab:' || CAST(user_id AS VARCHAR)), 1, 8)
                    AS UBIGINT) / CAST(4294967296 AS DOUBLE) < 0.5
              THEN 'B' ELSE 'A' END AS variant
  FROM pu
),
a AS (
  SELECT
    CAST(sum(CASE WHEN variant = 'A' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
    CAST(sum(CASE WHEN variant = 'B' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
    CAST(sum(CASE WHEN variant = 'A' THEN conv ELSE 0 END) AS BIGINT)
      AS conv_a,
    CAST(sum(CASE WHEN variant = 'B' THEN conv ELSE 0 END) AS BIGINT)
      AS conv_b
  FROM v
),
b AS (
  SELECT *,
         CAST(conv_a AS DOUBLE) / n_a AS p_a,
         CAST(conv_b AS DOUBLE) / n_b AS p_b,
         CAST(conv_a + conv_b AS DOUBLE) / (n_a + n_b) AS pool
  FROM a
),
c AS (
  SELECT *,
         pool * (CAST(1 AS DOUBLE) - pool)
              * (CAST(1 AS DOUBLE) / n_a + CAST(1 AS DOUBLE) / n_b) AS se2
  FROM b
)
SELECT n_a, n_b, conv_a, conv_b,
       CASE WHEN n_a > 0 THEN round(p_a, 6) END AS rate_a,
       CASE WHEN n_b > 0 THEN round(p_b, 6) END AS rate_b,
       CASE WHEN n_a > 0 AND n_b > 0 THEN round(p_b - p_a, 6) END AS lift,
       CASE WHEN n_a > 0 AND n_b > 0 AND se2 > 0
            THEN round((p_b - p_a) / sqrt(se2), 6) END AS z
FROM c
"""

EXT10_QUERIES["ab_test"] = q_ab_test
EXT10_ORACLES["ab_test"] = ORACLE_AB_TEST


# ---------------------------------------------------------------------
# M4 downsampling — 100 pixel-buckets per series (Jugel et al. 2014)
# ---------------------------------------------------------------------

_M4_BUCKETS = 100


def q_m4_downsample(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return m4_downsample(ev, _M4_BUCKETS).orderBy("series", "bucket")


# Elections mirror the struct orderings via deterministic row_number
# windows; bucket ids use exact integer floor division (// == div).
ORACLE_M4 = f"""
WITH b AS (
  SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events
),
e AS (
  SELECT event_type AS series,
         CAST(((epoch_us(ts) - b.lo) * {_M4_BUCKETS})
              // (b.hi - b.lo + 1) AS INT) AS bucket,
         ts, value, event_id, epoch_us(ts) AS t
  FROM events, b
),
fi AS (
  SELECT series, bucket, ts, value FROM (
    SELECT *, row_number() OVER (
      PARTITION BY series, bucket ORDER BY t, event_id, value) AS rn
    FROM e) WHERE rn = 1
),
la AS (
  SELECT series, bucket, ts, value FROM (
    SELECT *, row_number() OVER (
      PARTITION BY series, bucket
      ORDER BY t DESC, event_id DESC, value DESC) AS rn
    FROM e) WHERE rn = 1
),
mn AS (
  SELECT series, bucket, ts, value FROM (
    SELECT *, row_number() OVER (
      PARTITION BY series, bucket ORDER BY value, t, event_id) AS rn
    FROM e) WHERE rn = 1
),
mx AS (
  SELECT series, bucket, ts, value FROM (
    SELECT *, row_number() OVER (
      PARTITION BY series, bucket
      ORDER BY value DESC, t DESC, event_id DESC) AS rn
    FROM e) WHERE rn = 1
),
cn AS (
  SELECT series, bucket, count(*) AS n FROM e GROUP BY 1, 2
)
SELECT cn.series, cn.bucket,
       fi.ts AS t_first, round(fi.value, 6) AS v_first,
       la.ts AS t_last,  round(la.value, 6) AS v_last,
       mn.ts AS t_min,   round(mn.value, 6) AS v_min,
       mx.ts AS t_max,   round(mx.value, 6) AS v_max,
       cn.n
FROM cn
JOIN fi USING (series, bucket)
JOIN la USING (series, bucket)
JOIN mn USING (series, bucket)
JOIN mx USING (series, bucket)
ORDER BY 1, 2
"""

EXT10_QUERIES["m4_downsample"] = q_m4_downsample
EXT10_ORACLES["m4_downsample"] = ORACLE_M4


# ---------------------------------------------------------------------
# LOCF grid resample — 6-hour grid, 12-hour staleness bound
# ---------------------------------------------------------------------

_RS_STEP = 6 * 3600
_RS_STALE = 12 * 3600
_RS_STEP_US = _RS_STEP * 1_000_000


def q_resample_locf(spark, sf_dir):
    from grass_spark.operators.asof import resample_locf

    ev = _t(spark, sf_dir, "events")
    out = resample_locf(
        ev, step_seconds=_RS_STEP, on="user_id", ts_col="ts",
        value_col="value", tie_col="event_id",
        max_staleness_seconds=_RS_STALE,
    )
    return out.select(
        "user_id", "gts",
        F.col("ts_r").alias("obs_ts"),
        F.round("value_r", 6).alias("value_locf"),
    ).orderBy("user_id", "gts")


ORACLE_RESAMPLE_LOCF = f"""
WITH obs AS (
  SELECT user_id, ts, arg_max(value, event_id) AS value
  FROM events GROUP BY user_id, ts
),
span AS (
  SELECT user_id,
         (epoch_us(min(ts)) + {_RS_STEP_US - 1}) // {_RS_STEP_US} AS klo,
         epoch_us(max(ts)) // {_RS_STEP_US} AS khi
  FROM events GROUP BY user_id
),
grid AS (
  SELECT user_id, make_timestamp(k * {_RS_STEP_US}) AS gts
  FROM (
    SELECT user_id, unnest(generate_series(klo, khi)) AS k
    FROM span WHERE klo <= khi
  )
)
SELECT g.user_id, g.gts,
       CASE WHEN o.ts >= g.gts - INTERVAL {_RS_STALE} SECOND
            THEN o.ts END AS obs_ts,
       CASE WHEN o.ts >= g.gts - INTERVAL {_RS_STALE} SECOND
            THEN round(o.value, 6) END AS value_locf
FROM grid g
ASOF LEFT JOIN obs o
  ON g.user_id = o.user_id AND g.gts >= o.ts
ORDER BY g.user_id, g.gts
"""

EXT10_QUERIES["resample_locf"] = q_resample_locf
EXT10_ORACLES["resample_locf"] = ORACLE_RESAMPLE_LOCF


# ---------------------------------------------------------------------
# inter-event gap statistics (burstiness) per user
# ---------------------------------------------------------------------


def q_interevent_stats(spark, sf_dir):
    from grass_spark.operators.transitions import interevent_stats

    ev = _t(spark, sf_dir, "events")
    return interevent_stats(ev).orderBy("user_id")


ORACLE_INTEREVENT = """
WITH e AS (
  SELECT user_id, epoch_us(ts) AS us, event_id FROM events
),
g0 AS (
  SELECT user_id,
         us - lag(us) OVER (
           PARTITION BY user_id ORDER BY us, event_id
         ) AS g
  FROM e
),
g AS (SELECT user_id, g FROM g0 WHERE g IS NOT NULL),
st AS (
  SELECT user_id,
         count(*) AS n,
         CAST(sum(g) AS BIGINT) AS s1,
         sum(CAST(g AS HUGEINT) * g) AS s2,
         min(g) AS gmin,
         max(g) AS gmax
  FROM g GROUP BY user_id
),
c AS (SELECT user_id, count(*) AS n_events FROM e GROUP BY user_id),
j AS (
  SELECT c.user_id, c.n_events,
         coalesce(st.n, 0) AS n_gaps,
         CAST(st.s1 AS DOUBLE) / (st.n * 1000000.0) AS mean,
         CAST(st.s2 AS DOUBLE) / (st.n * 1000000000000.0) AS ms2,
         st.gmin, st.gmax
  FROM c LEFT JOIN st USING (user_id)
)
SELECT user_id, n_events, n_gaps,
       round(mean, 6) AS mean_gap_s,
       CASE WHEN ms2 IS NOT NULL THEN
         round(sqrt(greatest(round(ms2 - mean * mean, 6),
                             CAST(0 AS DOUBLE))), 6)
       END AS std_gap_s,
       CASE WHEN round(mean, 6) > 0 THEN
         round(sqrt(greatest(round(ms2 - mean * mean, 6),
                             CAST(0 AS DOUBLE))) / round(mean, 6), 6)
       END AS cv_gap,
       round(gmin / 1000000.0, 6) AS min_gap_s,
       round(gmax / 1000000.0, 6) AS max_gap_s
FROM j
ORDER BY user_id
"""

EXT10_QUERIES["interevent_stats"] = q_interevent_stats
EXT10_ORACLES["interevent_stats"] = ORACLE_INTEREVENT


# ---------------------------------------------------------------------
# multi-touch attribution — 3-day lookback, 1-day half-life decay
# ---------------------------------------------------------------------

_MTA_LOOK = 3 * 86400
_MTA_HALF = 86400


def q_multi_touch(spark, sf_dir):
    from grass_spark.operators.funnel import multi_touch_attribution

    ev = _t(spark, sf_dir, "events")
    return multi_touch_attribution(
        ev, conversion_type="purchase", touch_types=("view", "click"),
        lookback_seconds=_MTA_LOOK, half_life_seconds=_MTA_HALF,
    ).orderBy("conv_id", "touch_id")


ORACLE_MULTI_TOUCH = f"""
WITH conv AS (
  SELECT user_id, event_id AS conv_id, ts AS conv_ts, epoch_us(ts) AS cus
  FROM events WHERE event_type = 'purchase'
),
t AS (
  SELECT user_id, event_id AS touch_id, ts AS touch_ts,
         event_type AS touch_type, epoch_us(ts) AS tus
  FROM events WHERE event_type IN ('view', 'click')
),
cand AS (
  SELECT c.user_id, c.conv_id, c.conv_ts, t.touch_id, t.touch_ts,
         t.touch_type,
         round(pow(0.5, (c.cus - t.tus) / {float(_MTA_HALF) * 1e6}), 6)
           AS w
  FROM conv c JOIN t USING (user_id)
  WHERE t.tus <= c.cus AND c.cus - t.tus <= {_MTA_LOOK * 1_000_000}
),
tot AS (
  SELECT conv_id, count(*) AS n_touches, round(sum(w), 6) AS s
  FROM cand GROUP BY conv_id
)
SELECT cand.user_id, cand.conv_id, cand.conv_ts, cand.touch_id,
       cand.touch_ts, cand.touch_type,
       CAST(tot.n_touches AS BIGINT) AS n_touches,
       round(CAST(1 AS DOUBLE) / tot.n_touches, 6) AS w_linear,
       round(cand.w / tot.s, 6) AS w_decay
FROM cand JOIN tot USING (conv_id)
ORDER BY cand.conv_id, cand.touch_id
"""

EXT10_QUERIES["multi_touch"] = q_multi_touch
EXT10_ORACLES["multi_touch"] = ORACLE_MULTI_TOUCH


# ---------------------------------------------------------------------
# session-scoped funnel — composite-key funnel over sessionized events
# ---------------------------------------------------------------------

_SFUN_GAP = 6 * 3600


def q_session_funnel(spark, sf_dir):
    from grass_spark.operators.transitions import sessionize_events

    ev = _t(spark, sf_dir, "events")
    sess = sessionize_events(ev, _SFUN_GAP)
    return event_funnel(
        sess, ("view", "click"), _SFUN_GAP,
        user_col=["user_id", "session_idx"],
    ).orderBy("user_id", "session_idx")


ORACLE_SESSION_FUNNEL = f"""
WITH s AS (
  SELECT event_id, user_id, ts, event_type,
         lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
f AS (
  SELECT *, CASE WHEN prev IS NULL
                   OR ts > prev + INTERVAL {_SFUN_GAP} SECOND
                 THEN 1 ELSE 0 END AS flag
  FROM s
),
x AS (
  SELECT user_id, ts, event_type,
         CAST(sum(flag) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
         ) - 1 AS BIGINT) AS session_idx
  FROM f
),
s1 AS (
  SELECT user_id, session_idx, min(ts) AS t1
  FROM x WHERE event_type = 'view' GROUP BY 1, 2
),
s2 AS (
  SELECT e.user_id, e.session_idx, min(e.ts) AS t2
  FROM x e JOIN s1 USING (user_id, session_idx)
  WHERE e.event_type = 'click'
    AND e.ts > s1.t1
    AND e.ts <= s1.t1 + INTERVAL {_SFUN_GAP} SECOND
  GROUP BY 1, 2
)
SELECT s1.user_id, s1.session_idx, s1.t1 AS entered_at,
       CAST(1 + CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END AS INT)
         AS steps_completed
FROM s1 LEFT JOIN s2 USING (user_id, session_idx)
ORDER BY s1.user_id, s1.session_idx
"""

EXT10_QUERIES["session_funnel"] = q_session_funnel
EXT10_ORACLES["session_funnel"] = ORACLE_SESSION_FUNNEL


# ---------------------------------------------------------------------
# funnel latency — time-to-convert summary per completion depth
# ---------------------------------------------------------------------


def q_funnel_latency(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    fun = event_funnel(
        ev, _FUNNEL_STEPS, _FUNNEL_WINDOW, return_times=True
    )
    # exact integer micros from entry to the deepest completed step
    lat = F.expr(
        "timestampdiff(MICROSECOND, entered_at, "
        "coalesce(step_ts_3, step_ts_2, entered_at))"
    )
    g = fun.select("steps_completed", lat.alias("_lat")).groupBy(
        "steps_completed"
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_lat").alias("_s"),
        F.max("_lat").alias("_m"),
    )
    return g.select(
        "steps_completed",
        "n",
        F.round(
            F.col("_s").cast("double") / (F.col("n") * F.lit(1000000.0)), 6
        ).alias("mean_latency_s"),
        F.round(F.col("_m") / F.lit(1000000.0), 6).alias("max_latency_s"),
    ).orderBy("steps_completed")


ORACLE_FUNNEL_LATENCY = f"""
WITH s1 AS (
  SELECT user_id, min(ts) AS t1
  FROM events WHERE event_type = '{_FUNNEL_STEPS[0]}'
  GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t2
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = '{_FUNNEL_STEPS[1]}'
    AND e.ts > s1.t1
    AND e.ts <= s1.t1 + INTERVAL {_FUNNEL_WINDOW} SECOND
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t3
  FROM events e JOIN s1 USING (user_id) JOIN s2 USING (user_id)
  WHERE e.event_type = '{_FUNNEL_STEPS[2]}'
    AND e.ts > s2.t2
    AND e.ts <= s1.t1 + INTERVAL {_FUNNEL_WINDOW} SECOND
  GROUP BY e.user_id
),
j AS (
  SELECT s1.user_id,
         CAST(1 + CASE WHEN s2.user_id IS NULL THEN 0 ELSE 1 END
                + CASE WHEN s3.user_id IS NULL THEN 0 ELSE 1 END
              AS INT) AS steps_completed,
         epoch_us(coalesce(s3.t3, s2.t2, s1.t1)) - epoch_us(s1.t1) AS lat
  FROM s1
  LEFT JOIN s2 USING (user_id)
  LEFT JOIN s3 USING (user_id)
)
SELECT steps_completed,
       count(*) AS n,
       round(CAST(sum(lat) AS DOUBLE) / (count(*) * 1000000.0), 6)
         AS mean_latency_s,
       round(max(lat) / 1000000.0, 6) AS max_latency_s
FROM j GROUP BY steps_completed
ORDER BY steps_completed
"""

EXT10_QUERIES["funnel_latency"] = q_funnel_latency
EXT10_ORACLES["funnel_latency"] = ORACLE_FUNNEL_LATENCY
