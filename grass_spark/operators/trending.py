"""Week-over-week trending ranks: per ISO week, rank event types by
volume and report each type's rank movement vs. the previous week —
the "what's rising" leaderboard.

Reference analog: ``t.rast.list`` ordered listings + the per-granule
census family (``python/grass/temporal/list_stds.py``), extended with
the previous-granule self-join a movement column needs.

Scale shape: ONE corpus-sized stage — the map-side-combinable
``groupBy(week, type)`` census.  Ranking windows partition by week
over type-cardinality-sized frames; the previous-week lookup is a
census-vs-census self-join.  Week starts use the portable Monday
anchor (``day - ((day - 1970-01-05) mod 7)`` — exact integer date
arithmetic in both engines; never engine ``dayofweek``/``weekofyear``,
whose anchors differ).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def trending_ranks(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """``(week_start, event_type, n, rnk, prev_rnk, rank_delta)`` —
    ``rnk`` orders by (count DESC, type ASC) within the week;
    ``rank_delta = prev_rnk - rnk`` (positive = rising), NULL for a
    type absent the previous week."""
    day = F.to_date(F.date_trunc("day", F.col(ts_col)))
    wk = F.date_sub(
        day, F.pmod(F.datediff(day, F.lit("1970-01-05").cast("date")), 7)
    )
    cen = (
        df.select(wk.alias("wk"), F.col(type_col).alias("_t"))
        .groupBy("wk", "_t")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("wk").orderBy(F.desc("n"), F.asc("_t"))
    r = cen.withColumn("rnk", F.row_number().over(w)).localCheckpoint(
        eager=False  # both sides of the prev-week self-join
    )
    prev = r.select(
        F.col("_t").alias("_pt"),
        F.expr("date_add(wk, 7)").alias("_pwk"),
        F.col("rnk").alias("prev_rnk"),
    )
    return (
        r.join(
            prev,
            (r["_t"] == prev["_pt"]) & (r["wk"] == prev["_pwk"]),
            "left",
        )
        .select(
            F.col("wk").alias("week_start"),
            F.col("_t").alias("event_type"),
            "n",
            "rnk",
            "prev_rnk",
            (F.col("prev_rnk") - F.col("rnk")).alias("rank_delta"),
        )
        .orderBy("week_start", "rnk")
    )
