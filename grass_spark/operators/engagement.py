"""Engagement & monitoring analytics over the ``events`` table:
rolling active users (DAU/WAU/stickiness), days-active histograms,
RFM segmentation, CUSUM changepoint alarms, and event-type
daily-count correlations.

Reference analog: the reference's t.rast.series/t.rast.univar family
asks "aggregate this per-cell series over a window" and t.rast.accdetect
asks "when does the accumulated series cross a threshold"
(``temporal/t.rast.accdetect``, ``raster/r.series/main.c``); rolling
actives, CUSUM and correlations are the same windowed-series questions
asked over per-user activity series.

Scale notes (the whole point of the shapes here):

* :func:`rolling_active_users` NEVER runs the textbook banded join
  (calendar x user-days on ``day BETWEEN d-w+1 AND d`` — that is
  O(users x days x w) rows through a shuffle).  A user active on day d
  contributes coverage [d, d+w-1]; per user, consecutive active days
  with gap <= w merge into one coverage interval (ends are monotone, so
  the consecutive-gap test is exact).  WAU(d) is then a +1/-1 boundary
  sweep: interval starts add 1, interval ends subtract 1, and a single
  running sum over *calendar days* replays the count.  Event volume is
  absorbed by the first (user, day) distinct (map-side partial); every
  later frame is bounded by per-user active days or by calendar span —
  the one unpartitioned window runs over <= span+w rows (the same
  calendar-bounded justification as retention_cohorts' collect_set).
* :func:`rfm_segments` computes EXACT quintiles without ever ranking
  users through a global single-task window.  Each metric goes through
  a distinct-value census (``groupBy(value).count`` — map-side
  combinable, a hot value is absorbed in the partials), an exclusive
  running sum over the census (bounded by #distinct metric values:
  recency <= calendar span, frequency <= #distinct per-user counts,
  monetary is rounded to integer cents to bound the census), and a
  broadcast join back.  ``score = ceil(5 * count_worse_or_equal /
  n_users)`` — pure integer math, tie rows share a score, portable
  across engines.
* :func:`cusum_alarms` avoids the sequential CUSUM recurrence
  ``S_i = max(0, S_{i-1} + x_i - k)`` entirely: with prefix sums
  ``P_i = sum(x_j - k)``, the identity ``S_i = P_i - least(0, min_{j<=i}
  P_j)`` turns it into two windows (cumsum + running min) over the
  per-user dense day series — span-bounded partitions, exact integers.
* :func:`type_correlations` reduces event volume FIRST (one map-side
  combinable groupBy on (day, type)); everything downstream is
  calendar x vocabulary sized.  Power sums accumulate in DECIMAL(38,0)
  (daily counts at petabyte scale overflow int64 products) and cast to
  double once, so the derived correlation is bit-identical across
  engines and shuffle orders.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

__all__ = [
    "rolling_active_users",
    "activity_histogram",
    "rfm_segments",
    "cusum_alarms",
    "type_correlations",
    "user_streaks",
]


def _user_days(df: DataFrame, user_col: str, ts_col: str) -> DataFrame:
    """Distinct (user, active calendar day) pairs — the map-side
    combinable volume reducer every operator here starts from."""
    return (
        df.select(
            F.col(user_col).alias("_u"),
            F.to_date(F.date_trunc("day", F.col(ts_col))).alias("day"),
        )
        .groupBy("_u", "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
    )


def rolling_active_users(
    df: DataFrame,
    *,
    window_days: int = 7,
    user_col: str = "user_id",
    ts_col: str = "ts",
    checkpoint: bool = True,
) -> DataFrame:
    """Per-day DAU, rolling ``window_days``-day active users, and the
    DAU/WAU stickiness ratio.

    Returns ``(day, dau, wau, stickiness)`` for every calendar day
    between the first and last event; ``stickiness = round(dau/wau, 6)``
    and NULL on zero-coverage days.  See the module docstring for the
    interval-sweep decomposition (never a banded calendar join).
    """
    if window_days < 1:
        raise ValueError("rolling_active_users: window_days must be >= 1")
    w = int(window_days)

    ud = _user_days(df, user_col, ts_col).select("_u", "day")
    if checkpoint:  # ud is consumed 3x (sweep, dau, calendar agg)
        ud = ud.localCheckpoint(eager=False)

    # per-user coverage intervals: day covers [day, day+w-1]; merge
    # consecutive active days with gap <= w (interval ends are monotone
    # within a user, so the consecutive test is exact).
    uw = Window.partitionBy("_u").orderBy("day")
    flagged = ud.withColumn(
        "_new",
        F.when(
            F.datediff(F.col("day"), F.lag("day").over(uw)) <= w, F.lit(0)
        ).otherwise(F.lit(1)),
    ).withColumn(
        "_iid",
        F.sum("_new").over(uw.rowsBetween(Window.unboundedPreceding, 0)),
    )
    intervals = flagged.groupBy("_u", "_iid").agg(
        F.min("day").alias("_start"), F.max("day").alias("_last")
    )

    # +1 at interval start, -1 the day after coverage ends
    bounds = intervals.select(
        F.col("_start").alias("_bday"), F.lit(1).alias("_d")
    ).unionAll(
        intervals.select(
            F.date_add("_last", w).alias("_bday"),
            F.lit(-1).alias("_d"),
        )
    )
    deltas = bounds.groupBy("_bday").agg(F.sum("_d").alias("_delta"))

    # calendar from one 1-row aggregate (no driver collect)
    cal = ud.agg(
        F.min("day").alias("_lo"), F.max("day").alias("_hi")
    ).select(
        F.explode(
            F.sequence("_lo", "_hi", F.expr("interval 1 day"))
        ).alias("day")
    )

    dau = ud.groupBy("day").agg(F.count(F.lit(1)).alias("dau"))

    # running sum over the boundary-augmented calendar: <= span + w
    # rows total — calendar-bounded, the one safe unpartitioned window.
    sweep = (
        cal.join(deltas, cal["day"] == deltas["_bday"], "left")
        .select("day", F.coalesce("_delta", F.lit(0)).alias("_delta"))
        .withColumn(
            "wau",
            F.sum("_delta").over(
                Window.orderBy("day").rowsBetween(
                    Window.unboundedPreceding, 0
                )
            ),
        )
    )

    return (
        sweep.join(dau, "day", "left")
        .select(
            "day",
            F.coalesce("dau", F.lit(0).cast("long")).alias("dau"),
            F.col("wau").cast("long").alias("wau"),
            F.when(
                F.col("wau") > 0,
                F.round(
                    F.coalesce("dau", F.lit(0)).cast("double")
                    / F.col("wau"),
                    6,
                ),
            ).alias("stickiness"),
        )
        .orderBy("day")
    )


def activity_histogram(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Power-user curve: how many users were active on exactly N
    distinct days.  Two map-side-combinable groupBys; returns
    ``(n_days_active, n_users)``."""
    ud = _user_days(df, user_col, ts_col)
    per_user = ud.groupBy("_u").agg(
        F.count(F.lit(1)).alias("n_days_active")
    )
    return (
        per_user.groupBy("n_days_active")
        .agg(F.count(F.lit(1)).alias("n_users"))
        .orderBy("n_days_active")
    )


def _census_scores(
    per_user: DataFrame, metric: str, *, lower_is_better: bool
) -> DataFrame:
    """Exact quantile-bucket scores via a distinct-value census.

    Returns ``(metric_value, score)`` with ``score =
    ceil(5 * n_worse_or_equal / n_users)`` — integer math
    (``(5*cum + n - 1) div n``), portable; tie values share a score and
    a tie span at the best value scores 5 (the "bought today -> R=5"
    convention).  The running sum is over the census (one row per
    DISTINCT metric value), never over users.
    """
    census = per_user.groupBy(metric).agg(F.count(F.lit(1)).alias("_c"))
    # worst value first, so the INCLUSIVE cumulative count is
    # "users with a value as bad as mine or worse"
    order = F.col(metric).desc() if lower_is_better else F.col(metric).asc()
    incl = Window.orderBy(order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    total = Window.partitionBy()
    return census.select(
        metric,
        F.sum("_c").over(incl).alias("_cum"),
        F.sum("_c").over(total).alias("_n"),
    ).select(
        metric,
        F.expr("(5 * _cum + _n - 1) div _n").cast("int").alias(
            f"{metric}_score"
        ),
    )


def rfm_segments(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    value_col: str = "value",
    monetary_type: str = "purchase",
    checkpoint: bool = True,
) -> DataFrame:
    """Per-user RFM (recency / frequency / monetary) quintile scores.

    ``recency_days`` = days from the user's last event to the corpus
    max day (lower is better); ``frequency`` = total events; monetary
    sums ``value_col`` over ``monetary_type`` events in EXACT integer
    cents (``round(value*100)`` per event — order-independent, and it
    bounds the monetary census).  Scores are exact quintile buckets
    from distinct-value censuses (module docstring), 5 = best.
    Returns ``(user_col, recency_days, frequency, monetary, r_score,
    f_score, m_score, segment)``.
    """
    base = (
        df.select(
            F.col(user_col).alias("_u"),
            F.to_date(F.date_trunc("day", F.col(ts_col))).alias("_day"),
            F.when(
                F.col(type_col) == monetary_type,
                F.round(F.col(value_col) * 100).cast("long"),
            )
            .otherwise(F.lit(0).cast("long"))
            .alias("_cents"),
        )
        .groupBy("_u")
        .agg(
            F.max("_day").alias("_umax"),
            F.count(F.lit(1)).alias("frequency"),
            F.sum("_cents").alias("_cents"),
        )
    )
    if checkpoint:  # base feeds gmax + per_user (4 downstream scans)
        base = base.localCheckpoint(eager=False)
    gmax = base.agg(F.max("_umax").alias("_gmax"))
    per_user = base.join(F.broadcast(gmax)).select(
        "_u",
        F.datediff("_gmax", "_umax").alias("recency_days"),
        "frequency",
        "_cents",
    )

    r = _census_scores(
        per_user.select("recency_days"), "recency_days",
        lower_is_better=True,
    )
    f_ = _census_scores(
        per_user.select("frequency"), "frequency", lower_is_better=False
    )
    m = _census_scores(
        per_user.select("_cents"), "_cents", lower_is_better=False
    )

    out = (
        per_user.join(F.broadcast(r), "recency_days")
        .join(F.broadcast(f_), "frequency")
        .join(F.broadcast(m), "_cents")
    )
    return out.select(
        F.col("_u").alias(user_col),
        "recency_days",
        "frequency",
        F.round(F.col("_cents") / 100.0, 2).alias("monetary"),
        F.col("recency_days_score").alias("r_score"),
        F.col("frequency_score").alias("f_score"),
        F.col("_cents_score").alias("m_score"),
        F.concat(
            F.col("recency_days_score").cast("string"),
            F.col("frequency_score").cast("string"),
            F.col("_cents_score").cast("string"),
        ).alias("segment"),
    ).orderBy(user_col)


def user_streaks(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Per-user consecutive-day activity streaks (gaps-and-islands):
    ``(user_col, n_active_days, n_streaks, longest_streak,
    longest_start, last_streak, last_day)``.

    ``longest_streak`` ties break to the EARLIEST start;
    ``last_streak`` is the run containing the user's final active day.
    Event volume collapses in the (user, day) distinct first; the
    per-user ``row_number`` window and the island groupBy run over
    active DAYS — bounded by calendar span per user, never by event
    volume (the retention_cohorts argument).  Island anchor =
    ``day - row_number`` days, exact for distinct days.  Elections are
    map-side min/max(struct) — no second window.
    """
    ud = _user_days(df, user_col, ts_col).select("_u", "day")
    uw = Window.partitionBy("_u").orderBy("day")
    anchored = ud.withColumn(
        "_anchor", F.date_sub(F.col("day"), F.row_number().over(uw))
    )
    runs = anchored.groupBy("_u", "_anchor").agg(
        F.count(F.lit(1)).alias("_len"),
        F.min("day").alias("_start"),
        F.max("day").alias("_end"),
    )
    per_user = runs.groupBy("_u").agg(
        F.sum("_len").alias("n_active_days"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.min(
            F.struct((-F.col("_len")).alias("a"), F.col("_start").alias("s"))
        ).alias("_lg"),
        F.max(
            F.struct(F.col("_end").alias("e"), F.col("_len").alias("l"))
        ).alias("_cur"),
    )
    return per_user.select(
        F.col("_u").alias(user_col),
        "n_active_days",
        "n_streaks",
        (-F.col("_lg.a")).alias("longest_streak"),
        F.col("_lg.s").alias("longest_start"),
        F.col("_cur.l").alias("last_streak"),
        F.col("_cur.e").alias("last_day"),
    ).orderBy(user_col)


def cusum_alarms(
    df: DataFrame,
    *,
    drift: int,
    threshold: int,
    user_col: str = "user_id",
    ts_col: str = "ts",
    checkpoint: bool = True,
) -> DataFrame:
    """One-sided CUSUM changepoint detection on per-user daily event
    counts: ``S_i = max(0, S_{i-1} + x_i - drift)``, alarm when
    ``S > threshold``.

    The recurrence is computed WITHOUT sequential state via the exact
    identity ``S_i = P_i - least(0, min_{j<=i} P_j)`` with
    ``P = cumsum(x - drift)`` — two windows over the user's dense day
    series (inactive days inside the user's own [first, last] span
    count as x=0, so quiet stretches bleed the statistic down like the
    textbook CUSUM).  All integer arithmetic.  Returns ``(user_col,
    alarm_day, max_s)`` — ``alarm_day`` is the FIRST day the statistic
    exceeds ``threshold`` (NULL if never).
    """
    if drift < 0 or threshold < 0:
        raise ValueError("cusum_alarms: drift/threshold must be >= 0")

    ud = _user_days(df, user_col, ts_col)
    if checkpoint:  # ud is consumed 2x (span census + dense join)
        ud = ud.localCheckpoint(eager=False)
    # densify each user over their own active span (span-bounded
    # explode; a multi-year span is ~1e3 elements per array row)
    span = ud.groupBy("_u").agg(
        F.min("day").alias("_lo"), F.max("day").alias("_hi")
    )
    cal = span.select(
        "_u",
        F.explode(
            F.sequence("_lo", "_hi", F.expr("interval 1 day"))
        ).alias("day"),
    )
    dense = cal.join(ud, ["_u", "day"], "left").select(
        "_u",
        "day",
        F.coalesce("n_events", F.lit(0).cast("long")).alias("_x"),
    )

    uw = (
        Window.partitionBy("_u")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    p = dense.withColumn(
        "_p", F.sum(F.col("_x") - F.lit(int(drift))).over(uw)
    )
    s = p.withColumn(
        "_s", F.col("_p") - F.least(F.lit(0).cast("long"), F.min("_p").over(uw))
    )
    return (
        s.groupBy("_u")
        .agg(
            F.min(
                F.when(F.col("_s") > int(threshold), F.col("day"))
            ).alias("alarm_day"),
            F.max("_s").alias("max_s"),
        )
        .select(F.col("_u").alias(user_col), "alarm_day", "max_s")
        .orderBy(user_col)
    )


def type_correlations(
    df: DataFrame,
    *,
    type_col: str = "event_type",
    ts_col: str = "ts",
    checkpoint: bool = True,
) -> DataFrame:
    """Pearson correlation between every pair of event types' daily
    count series (zero-filled over the full calendar span).

    Volume reduces in ONE map-side-combinable groupBy on (day, type);
    the pair frame is calendar x vocabulary sized.  Power sums
    accumulate exactly in DECIMAL(38,0) and cast to double once, so
    ``corr`` is bit-identical across engines (module docstring).
    Returns ``(type_a, type_b, n_days, corr)`` with corr rounded to
    6 dp (NULL when either series has zero variance).
    """
    daily = (
        df.select(
            F.to_date(F.date_trunc("day", F.col(ts_col))).alias("day"),
            F.col(type_col).alias("_t"),
        )
        .groupBy("day", "_t")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    if checkpoint:  # daily feeds calendar agg, type census, dense join
        daily = daily.localCheckpoint(eager=False)
    cal = daily.agg(
        F.min("day").alias("_lo"), F.max("day").alias("_hi")
    ).select(
        F.explode(
            F.sequence("_lo", "_hi", F.expr("interval 1 day"))
        ).alias("day")
    )
    types = daily.select("_t").distinct()
    grid = cal.crossJoin(F.broadcast(types))
    dense = grid.join(daily, ["day", "_t"], "left").select(
        "day", "_t", F.coalesce("_n", F.lit(0).cast("long")).alias("_n")
    )

    a = dense.select(
        "day", F.col("_t").alias("type_a"), F.col("_n").alias("_xa")
    )
    b = dense.select(
        "day", F.col("_t").alias("type_b"), F.col("_n").alias("_xb")
    )
    pairs = a.join(b, "day").where(F.col("type_a") < F.col("type_b"))

    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    sums = pairs.groupBy("type_a", "type_b").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.sum(dec("_xa")).alias("_sx"),
        F.sum(dec("_xb")).alias("_sy"),
        F.sum(dec("_xa") * dec("_xa")).alias("_sxx"),
        F.sum(dec("_xb") * dec("_xb")).alias("_syy"),
        F.sum(dec("_xa") * dec("_xb")).alias("_sxy"),
    )
    n = F.col("n_days").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    cov = n * F.col("_sxy").cast("double") - sx * sy
    vx = n * F.col("_sxx").cast("double") - sx * sx
    vy = n * F.col("_syy").cast("double") - sy * sy
    return sums.select(
        "type_a",
        "type_b",
        "n_days",
        F.when(
            (vx > 0) & (vy > 0), F.round(cov / F.sqrt(vx * vy), 6)
        ).alias("corr"),
    ).orderBy("type_a", "type_b")


def user_growth(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cumulative user-acquisition curve: per calendar day the number
    of first-ever-seen users and the running total, zero-densified
    over the full calendar span (a day with no signups is an explicit
    ``n_new_users = 0`` row, so the curve plots without gaps).

    Scale shape: first-seen election is one map-side-combinable
    ``groupBy(user).min(day)``; everything after runs on the
    calendar-bounded day census (the ccf/sweep discipline) — the
    cumulative window orders <= span-days rows, never corpus rows.
    All columns are exact integers.
    """
    fst = (
        df.select(
            F.col(user_col).alias("_u"),
            F.to_date(F.date_trunc("day", F.col(ts_col))).alias("_d"),
        )
        .groupBy("_u")
        .agg(F.min("_d").alias("_d"))
    )
    cen = fst.groupBy("_d").agg(F.count(F.lit(1)).alias("_new"))
    bounds = cen.agg(F.min("_d").alias("lo"), F.max("_d").alias("hi"))
    days = bounds.select(F.explode(F.sequence("lo", "hi")).alias("day"))
    grid = days.join(cen, days["day"] == cen["_d"], "left").select(
        "day", F.coalesce("_new", F.lit(0)).cast("long").alias("n_new_users")
    )
    w = Window.orderBy("day").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return grid.select(
        "day",
        "n_new_users",
        F.sum("n_new_users").over(w).alias("cum_users"),
    ).orderBy("day")


def user_hhi(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user behavioral concentration: the Herfindahl index of the
    user's event-type mix — ``hhi = sum((n_t / n)^2)``, 1/k for a
    perfectly even k-type user, 1.0 for a one-trick user.  Returns
    ``(user, n_events, n_types, hhi)``.

    Scale shape: one map-side-combinable ``groupBy(user, type)``
    census, one ``groupBy(user)`` over it.  ``hhi`` composes as
    ``sum(n_t^2) / n^2`` from exact DECIMAL(38) integer sums — one
    double cast, no per-type float terms to order.
    """
    cen = df.groupBy(
        F.col(user_col).alias("_u"), F.col(type_col).alias("_t")
    ).agg(F.count(F.lit(1)).alias("_n"))
    dec = F.col("_n").cast("decimal(19,0)")
    agg = cen.groupBy("_u").agg(
        F.sum("_n").alias("n_events"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(dec * dec).alias("_s2"),
    )
    nd = F.col("n_events").cast("decimal(19,0)")
    return agg.select(
        F.col("_u").alias(user_col),
        "n_events",
        "n_types",
        F.round(
            F.col("_s2").cast("double") / (nd * nd).cast("double"), 6
        ).alias("hhi"),
    ).orderBy(user_col)


def heatmap_lift(
    df: DataFrame,
    *,
    ts_col: str = "ts",
) -> DataFrame:
    """Day-of-week x hour usage heatmap with independence lift: per
    cell, ``lift = n_dh * N / (n_d * n_h)`` — > 1 where activity
    concentrates beyond what the two marginals alone explain (the
    "Monday 9am spike" detector).  ``dow 0 = Monday`` (portable
    integer anchor), hour from the naive clock (identical extraction
    in both engines).

    Returns one row per OBSERVED cell ``(dow, hour, n, lift)``.
    Exactness: lift composes from exact integer cross products in
    DECIMAL(38,0) with one double cast (the type_mix_drift shape);
    the only corpus-sized stage is the (dow, hour) census groupBy —
    <= 168 cells, marginals and the join are cell-sized.
    """
    day = F.to_date(F.date_trunc("day", F.col(ts_col)))
    dow = F.pmod(
        F.datediff(day, F.lit("1970-01-05").cast("date")), 7
    ).cast("int")
    cen = (
        df.select(dow.alias("dow"), F.hour(F.col(ts_col)).alias("hour"))
        .groupBy("dow", "hour")
        .agg(F.count(F.lit(1)).alias("n"))
        .localCheckpoint(eager=False)  # 3 consumers of the cell census
    )
    md = cen.groupBy("dow").agg(F.sum("n").alias("_nd"))
    mh = cen.groupBy("hour").agg(F.sum("n").alias("_nh"))
    tot = md.agg(F.sum("_nd").alias("_n"))
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    return (
        cen.join(md, "dow")
        .join(mh, "hour")
        .crossJoin(F.broadcast(tot))
        .select(
            "dow",
            "hour",
            "n",
            F.round(
                (dec("n") * dec("_n")).cast("double")
                / (dec("_nd") * dec("_nh")).cast("double"),
                6,
            ).alias("lift"),
        )
        .orderBy("dow", "hour")
    )
