"""Fifty-second wave of driver-contract queries: weekly type-mix
drift (operators/trending.py ``type_mix_drift`` — per-week total
variation vs the overall distribution, exact integer cross products)
and weekly order-value quantile bands (operators/seasonal.py
``weekly_quantiles`` — exact type-7 p50/p95 per week).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from grass_spark.operators.seasonal import weekly_quantiles
from grass_spark.operators.trending import type_mix_drift
from grass_spark.queries_ext import _t

EXT52_QUERIES: dict = {}
EXT52_ORACLES: dict = {}

_WK = (
    "CAST({c} AS DATE) - CAST(((CAST({c} AS DATE) - DATE '1970-01-05')"
    " % 7 + 7) % 7 AS INTEGER)"
)


# ---------------------------------------------------------------------
# weekly type-mix drift
# ---------------------------------------------------------------------


def q_type_mix_drift(spark, sf_dir):
    return type_mix_drift(_t(spark, sf_dir, "events"))


ORACLE_TYPE_MIX_DRIFT = f"""
WITH cen AS (
  SELECT {_WK.format(c='ts')} AS wk,
         event_type AS t, CAST(count(*) AS BIGINT) AS nwt
  FROM events GROUP BY 1, 2
),
wtot AS (SELECT wk, CAST(sum(nwt) AS BIGINT) AS nw FROM cen GROUP BY 1),
ttot AS (SELECT t, CAST(sum(nwt) AS BIGINT) AS nt FROM cen GROUP BY 1),
gtot AS (SELECT CAST(sum(nw) AS BIGINT) AS n FROM wtot),
grid AS (
  SELECT w.wk, w.nw, tt.nt, CAST(coalesce(c.nwt, 0) AS BIGINT) AS nwt
  FROM wtot w CROSS JOIN ttot tt
  LEFT JOIN cen c ON c.wk = w.wk AND c.t = tt.t
),
s AS (
  SELECT wk, nw,
         sum(abs(CAST(nwt AS HUGEINT) * CAST(n AS HUGEINT)
                 - CAST(nt AS HUGEINT) * CAST(nw AS HUGEINT))) AS sm,
         max(n) AS n
  FROM grid CROSS JOIN gtot GROUP BY 1, 2
)
SELECT wk AS week_start, nw AS n_events,
       round(CAST(0.5 AS DOUBLE) * CAST(sm AS DOUBLE)
             / (CAST(nw AS DOUBLE) * CAST(n AS DOUBLE)), 6) AS tv_dist
FROM s ORDER BY week_start
"""


# ---------------------------------------------------------------------
# weekly order-value quantile bands
# ---------------------------------------------------------------------


def q_weekly_quantiles(spark, sf_dir):
    return weekly_quantiles(
        _t(spark, sf_dir, "orders"),
        ts_col="o_orderdate",
        value_col="o_totalprice",
        probs=(0.5, 0.95),
    )


ORACLE_WEEKLY_QUANTILES = f"""
WITH base AS (
  SELECT {_WK.format(c='o_orderdate')} AS week_start,
         round(CAST(o_totalprice AS DOUBLE), 6) AS v
  FROM orders WHERE o_totalprice IS NOT NULL
)
SELECT week_start, CAST(count(*) AS BIGINT) AS n,
       round(quantile_cont(v, CAST(0.5 AS DOUBLE)), 6) AS q_0_5,
       round(quantile_cont(v, CAST(0.95 AS DOUBLE)), 6) AS q_0_95
FROM base GROUP BY 1
ORDER BY week_start
"""


EXT52_QUERIES.update(
    {
        "type_mix_drift": q_type_mix_drift,
        "weekly_quantiles": q_weekly_quantiles,
    }
)
EXT52_ORACLES.update(
    {
        "type_mix_drift": ORACLE_TYPE_MIX_DRIFT,
        "weekly_quantiles": ORACLE_WEEKLY_QUANTILES,
    }
)
