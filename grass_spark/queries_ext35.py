"""Thirty-fifth wave of driver-contract queries: sweep-line interval
concurrency (operators/sweep.py — peak simultaneously-open orders per
day over deterministic ``[orderdate, orderdate + (key % 28 + 1) days)``
intervals) and small-file compaction planning (operators/compaction.py
— prefix-sum bin packing of per-ship-day lineitem "files" into 64 KiB
merge groups per calendar month).

Both are all-integer pipelines whose only corpus-sized stage is a
map-side-combinable census groupBy; the sweeps/windows run over
calendar-bounded censuses.  Oracles replay the identical arithmetic
with DuckDB window functions (sums CAST to BIGINT — the HUGEINT trap;
group ids via ``//`` == Spark ``div``).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.compaction import compaction_plan
from grass_spark.operators.sweep import concurrency_sweep
from grass_spark.queries_ext import _t

EXT35_QUERIES: dict = {}
EXT35_ORACLES: dict = {}


# ---------------------------------------------------------------------
# per-day order concurrency: intervals [o_orderdate, +1..28 days)
# ---------------------------------------------------------------------


def q_concurrency_days(spark, sf_dir):
    o = _t(spark, sf_dir, "orders").select(
        F.col("o_orderdate").cast("date").alias("s"),
        F.date_add(
            F.col("o_orderdate").cast("date"),
            (F.col("o_orderkey") % 28 + 1).cast("int"),
        ).alias("e"),
    )
    return concurrency_sweep(o, start_col="s", end_col="e")


ORACLE_CONCURRENCY_DAYS = """
WITH iv AS (
  SELECT CAST(o_orderdate AS DATE) AS s,
         CAST(o_orderdate AS DATE)
           + CAST(o_orderkey % 28 + 1 AS INTEGER) AS e
  FROM orders
),
ev AS (
  SELECT s AS day, 1 AS d FROM iv
  UNION ALL
  SELECT e AS day, -1 AS d FROM iv
),
cen AS (
  SELECT day,
         CAST(sum(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT)
           AS n_start,
         CAST(sum(CASE WHEN d < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_end,
         CAST(sum(d) AS BIGINT) AS net
  FROM ev WHERE day IS NOT NULL GROUP BY day
),
cum AS (
  SELECT day, n_start, n_end, net,
         CAST(sum(net) OVER (
           ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
         ) AS BIGINT) AS active_end
  FROM cen
)
SELECT day, n_start, n_end,
       active_end - net AS carry_in,
       active_end,
       greatest(active_end - net, active_end) AS peak
FROM cum
ORDER BY day
"""


# ---------------------------------------------------------------------
# compaction plan: per-ship-day lineitem files, 64 KiB target, monthly
# partitions
# ---------------------------------------------------------------------

_TARGET = 65536


def q_compaction_plan(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    files = (
        li.groupBy(F.col("l_shipdate").cast("date").alias("file_day"))
        .agg((F.count(F.lit(1)) * 64).alias("bytes"))
        .withColumn("part_month", F.trunc("file_day", "month"))
    )
    return compaction_plan(
        files,
        partition_col="part_month",
        file_col="file_day",
        size_col="bytes",
        target_bytes=_TARGET,
    )


ORACLE_COMPACTION_PLAN = f"""
WITH f AS (
  SELECT CAST(l_shipdate AS DATE) AS fd,
         CAST(count(*) * 64 AS BIGINT) AS b
  FROM lineitem GROUP BY 1
),
st AS (
  SELECT CAST(date_trunc('month', fd) AS DATE) AS partition,
         fd, b,
         CAST(coalesce(sum(b) OVER (
           PARTITION BY date_trunc('month', fd) ORDER BY fd
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
         ), 0) AS BIGINT) // CAST({_TARGET} AS BIGINT) AS grp
  FROM f
)
SELECT partition, grp,
       CAST(count(*) AS BIGINT) AS n_files,
       CAST(sum(b) AS BIGINT) AS grp_bytes,
       min(fd) AS first_file, max(fd) AS last_file
FROM st GROUP BY 1, 2
ORDER BY partition, grp
"""


EXT35_QUERIES.update(
    {
        "concurrency_days": q_concurrency_days,
        "compaction_plan": q_compaction_plan,
    }
)
EXT35_ORACLES.update(
    {
        "concurrency_days": ORACLE_CONCURRENCY_DAYS,
        "compaction_plan": ORACLE_COMPACTION_PLAN,
    }
)
