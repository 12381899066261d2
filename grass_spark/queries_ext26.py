"""Twenty-sixth wave of driver-contract queries: two-sample inference
and resampling (operators/inference.py — Welch t-test, distributed
Poisson bootstrap) and gap-aware exponential smoothing
(operators/smoothing.py).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.inference import (
    poisson_bootstrap,
    poisson_cdf_thresholds,
    welch_ttest,
)
from grass_spark.operators.smoothing import ewma_daily, ewma_weights
from grass_spark.queries_ext import _t

EXT26_QUERIES: dict = {}
EXT26_ORACLES: dict = {}


# ---------------------------------------------------------------------
# Welch two-sample t-test: purchase vs click event values
# ---------------------------------------------------------------------


def q_welch_ttest(spark, sf_dir):
    ev = _t(spark, sf_dir, "events")
    return welch_ttest(
        ev.where(F.col("event_type") == "purchase"),
        ev.where(F.col("event_type") == "click"),
        value_col="value",
    )


_SQL_SIDE = """
  SELECT count(*) AS n_{t},
         sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)) AS s1{t},
         sum(CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)
             * CAST(CAST(round(value * 100) AS BIGINT) AS HUGEINT)) AS s2{t}
  FROM events WHERE event_type = '{et}' AND value IS NOT NULL
"""

# mirrored double expressions (exact integers cast ONCE)
_M = "(CAST(s1{t} AS DOUBLE) / (CAST(n_{t} AS DOUBLE) * CAST(100 AS DOUBLE)))"
_V = (
    "(CAST(CAST(n_{t} AS HUGEINT) * s2{t} - s1{t} * s1{t} AS DOUBLE)"
    " / (CAST(n_{t} AS DOUBLE) * (CAST(n_{t} AS DOUBLE) - CAST(1 AS DOUBLE))"
    " * CAST(10000 AS DOUBLE)))"
)
_VA = _V.format(t="a")
_VB = _V.format(t="b")
_SE2 = (
    f"({_VA} / CAST(n_a AS DOUBLE) + {_VB} / CAST(n_b AS DOUBLE))"
)
_DFDEN = (
    f"(({_VA} / CAST(n_a AS DOUBLE)) * ({_VA} / CAST(n_a AS DOUBLE))"
    f" / (CAST(n_a AS DOUBLE) - CAST(1 AS DOUBLE))"
    f" + ({_VB} / CAST(n_b AS DOUBLE)) * ({_VB} / CAST(n_b AS DOUBLE))"
    f" / (CAST(n_b AS DOUBLE) - CAST(1 AS DOUBLE)))"
)

ORACLE_WELCH_TTEST = f"""
WITH sa AS ({_SQL_SIDE.format(t='a', et='purchase')}),
sb AS ({_SQL_SIDE.format(t='b', et='click')})
SELECT n_a, n_b,
       round({_M.format(t='a')}, 6) AS mean_a,
       round({_M.format(t='b')}, 6) AS mean_b,
       CASE WHEN {_SE2} > 0 THEN
         round(({_M.format(t='a')} - {_M.format(t='b')})
               / sqrt({_SE2}), 6) END AS t,
       CASE WHEN {_SE2} > 0 AND {_DFDEN} > 0 THEN
         round({_SE2} * {_SE2} / {_DFDEN}, 6) END AS df
FROM sa CROSS JOIN sb
"""


# ---------------------------------------------------------------------
# Poisson-bootstrap CI for the mean event value
# ---------------------------------------------------------------------


def q_poisson_bootstrap(spark, sf_dir):
    return poisson_bootstrap(
        _t(spark, sf_dir, "events"),
        value_col="value",
        id_col="event_id",
        n_reps=64,
    )


def _poisson_case() -> str:
    cdf = poisson_cdf_thresholds()
    whens = " ".join(
        f"WHEN u < CAST('{c!r}' AS DOUBLE) THEN {k}"
        for k, c in enumerate(cdf)
    )
    return f"CASE {whens} ELSE {len(cdf)} END"


ORACLE_POISSON_BOOTSTRAP = f"""
WITH base AS (
  SELECT CAST(event_id AS VARCHAR) AS id,
         CAST(round(value * 100) AS BIGINT) AS c
  FROM events WHERE value IS NOT NULL
),
reps AS (
  SELECT id, c, rep
  FROM base, (SELECT unnest(generate_series(1, 64)) AS rep) r
),
uw AS (
  SELECT c, rep,
         CAST(('0x' || substr(md5(id || ':' || CAST(rep AS VARCHAR)
                                  || ':boot'), 1, 8)) AS UBIGINT)
           / CAST(4294967296 AS DOUBLE) AS u
  FROM reps
),
kk AS (SELECT rep, c, {_poisson_case()} AS k FROM uw),
per AS (
  SELECT rep,
         sum(CAST(k AS HUGEINT) * CAST(c AS HUGEINT)) AS skc,
         sum(k) AS sk
  FROM kk GROUP BY rep
),
rm AS (
  SELECT round(CAST(skc AS DOUBLE)
               / (CAST(sk AS DOUBLE) * CAST(100 AS DOUBLE)), 6) AS m
  FROM per WHERE sk > 0
),
ci AS (
  SELECT CAST(count(*) AS BIGINT) AS n_reps,
         round(CAST(quantile_cont(m, 0.025) AS DOUBLE), 6) AS ci_lo,
         round(CAST(quantile_cont(m, 0.975) AS DOUBLE), 6) AS ci_hi
  FROM rm
),
fl AS (
  SELECT CAST(count(*) AS BIGINT) AS n,
         round(CAST(sum(CAST(c AS HUGEINT)) AS DOUBLE)
               / (CAST(count(*) AS DOUBLE) * CAST(100 AS DOUBLE)), 6)
           AS mean
  FROM base
)
SELECT n, n_reps, mean, ci_lo, ci_hi FROM fl CROSS JOIN ci
"""


# ---------------------------------------------------------------------
# gap-aware EWMA over daily event counts
# ---------------------------------------------------------------------


def q_ewma_daily(spark, sf_dir):
    return ewma_daily(
        _t(spark, sf_dir, "events"),
        ts_col="ts",
        key_col="event_type",
        alpha=0.3,
        horizon=14,
    ).orderBy("event_type", "day")


def _ewma_values() -> str:
    return ", ".join(
        f"({o}, CAST('{w!r}' AS DOUBLE))"
        for o, w in enumerate(ewma_weights(0.3, 14))
    )


ORACLE_EWMA_DAILY = f"""
WITH w(o, wt) AS (VALUES {_ewma_values()}),
daily AS (
  SELECT event_type AS k, CAST(ts AS DATE) AS d, count(*) AS x
  FROM events GROUP BY 1, 2
),
contrib AS (
  SELECT daily.k, daily.d + w.o AS td, w.wt, daily.x
  FROM daily CROSS JOIN w
),
agg AS (
  SELECT k, td,
         CAST(count(*) AS BIGINT) AS n_window_days,
         round(sum(wt * CAST(x AS DOUBLE)) / sum(wt), 6) AS ewma
  FROM contrib GROUP BY 1, 2
)
SELECT agg.k AS event_type, agg.td AS day, daily.x AS x,
       n_window_days, ewma
FROM agg JOIN daily ON agg.k = daily.k AND agg.td = daily.d
ORDER BY event_type, day
"""


EXT26_QUERIES.update(
    {
        "welch_ttest": q_welch_ttest,
        "poisson_bootstrap": q_poisson_bootstrap,
        "ewma_daily": q_ewma_daily,
    }
)
EXT26_ORACLES.update(
    {
        "welch_ttest": ORACLE_WELCH_TTEST,
        "poisson_bootstrap": ORACLE_POISSON_BOOTSTRAP,
        "ewma_daily": ORACLE_EWMA_DAILY,
    }
)
