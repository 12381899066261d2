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


def type_mix_drift(
    df: DataFrame,
    *,
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Weekly composition drift: per ISO week, the total-variation
    distance between that week's event-type distribution and the
    overall one — ``tv = 0.5 * sum_t |p_wt - p_t|``.  The
    one-number-per-week alarm for "the mix changed", feeding the same
    dashboards as :func:`trending_ranks`.

    Exactness: the TV sum composes from exact integer cross products,
    ``|n_wt * N - n_t * N_w|`` in DECIMAL(38,0), summed exactly per
    week and cast to double ONCE into ``0.5 * sum / (N_w * N)`` —
    no per-type float terms to order.  Scale shape: one map-side
    ``groupBy(week, type)`` census; marginals and the join are
    census-sized.
    """
    day = F.to_date(F.date_trunc("day", F.col(ts_col)))
    wk = F.date_sub(
        day, F.pmod(F.datediff(day, F.lit("1970-01-05").cast("date")), 7)
    )
    cen = (
        df.select(wk.alias("wk"), F.col(type_col).alias("_t"))
        .groupBy("wk", "_t")
        .agg(F.count(F.lit(1)).alias("_nwt"))
        .localCheckpoint(eager=False)  # 3 census consumers
    )
    wtot = cen.groupBy("wk").agg(F.sum("_nwt").alias("_nw"))
    ttot = cen.groupBy("_t").agg(F.sum("_nwt").alias("_nt"))
    gtot = wtot.agg(F.sum("_nw").alias("_n"))

    # densify: a type ABSENT from a week still contributes |0 - p_t|
    # — build the full week x type grid from the marginals
    grid = (
        wtot.crossJoin(F.broadcast(ttot))
        .join(cen, ["wk", "_t"], "left")
        .select(
            "wk",
            "_nw",
            "_nt",
            F.coalesce("_nwt", F.lit(0).cast("long")).alias("_nwt"),
        )
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    term = F.abs(dec("_nwt") * dec("_n") - dec("_nt") * dec("_nw"))
    return (
        grid.crossJoin(F.broadcast(gtot))
        .groupBy("wk", "_nw", "_n")
        .agg(F.sum(term).alias("_s"))
        .select(
            F.col("wk").alias("week_start"),
            F.col("_nw").alias("n_events"),
            F.round(
                F.lit(0.5)
                * F.col("_s").cast("double")
                / (F.col("_nw").cast("double") * F.col("_n").cast("double")),
                6,
            ).alias("tv_dist"),
        )
        .orderBy("week_start")
    )
