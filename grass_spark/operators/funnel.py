"""Event-stream analytics over the ``events`` table: windowed funnels,
retention cohorts, and typed JSON-props extraction.

These are the classic time-series-engine companions to the temporal
rollup core (reference analog: the t.rast.accumulate/accdetect family
computes per-series threshold progressions, ``temporal/t.rast.accdetect``
— a funnel is the cross-type version of the same "ordered milestones
within a window" question, asked per user instead of per cell).

Scale notes (the whole point of the shapes chosen here):

* :func:`event_funnel` is a JOIN CHAIN, never a per-user
  ``collect_list``: step *k* is ``min(ts)`` over the type-*k* events
  strictly after the user's step *k-1* timestamp and within the window
  anchored at step 1.  Each per-step frame is a map-side-combinable
  ``groupBy(user).min`` — a bot user with 10^8 events never
  materializes as one array in one task (the hot key is absorbed by
  partial aggregation).  Each step scans the events source with the
  ``event_type = <step>`` filter PUSHED DOWN, so a funnel over 3 of 50
  event types reads ~6 % of the table per step, not all of it.
* :func:`retention_cohorts` does ONE exchange on the user key; the
  per-user day set is ``collect_set(day)``, bounded by the calendar
  span of the data (365 entries/user/year regardless of event volume),
  so the "array per group" here is genuinely bounded at any scale.
* :func:`extract_props` is a pure scan-stage projection
  (``get_json_object`` is JVM-side, whole-stage codegen) — 0 Exchange,
  0 Python.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def extract_props(
    df: DataFrame,
    fields: dict[str, tuple[str, str]],
    *,
    props_col: str = "props",
) -> DataFrame:
    """Project typed fields out of a JSON-string column.

    ``fields`` maps output column name -> (JSONPath, Spark cast type),
    e.g. ``{"k": ("$.k", "bigint")}``.  Unparseable / absent paths
    yield NULL (``get_json_object`` semantics), so a malformed props
    row never fails the scan.
    """
    if not fields:
        raise ValueError("extract_props: fields must be non-empty")
    cols = [
        F.get_json_object(F.col(props_col), path).cast(dtype).alias(name)
        for name, (path, dtype) in fields.items()
    ]
    return df.select("*", *cols)


def _day(ts_col: str) -> Column:
    return F.to_date(F.date_trunc("day", F.col(ts_col)))


def event_funnel(
    df: DataFrame,
    steps: list[str] | tuple[str, ...],
    window_seconds: int,
    *,
    user_col: str | list[str] | tuple[str, ...] = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    checkpoint: bool = True,
    return_times: bool = False,
) -> DataFrame:
    """Windowed ordered funnel (ClickHouse ``windowFunnel`` semantics).

    ``return_times=True`` appends ``step_ts_2 .. step_ts_n`` columns
    (the completing event's timestamp per step, NULL where the step
    was not reached) — feeds time-to-convert analyses.

    ``user_col`` may be a list of columns — the funnel is then scoped
    to the composite key (e.g. ``["user_id", "session_idx"]`` after
    :func:`grass_spark.operators.transitions.sessionize_events` gives a
    per-session funnel); keys pack into one struct internally, exactly
    the multi-key treatment in :func:`grass_spark.operators.asof
    .asof_join`.

    A user *enters* the funnel at ``t1 = min(ts)`` of their
    ``steps[0]`` events.  Step *k* completes at the earliest type-*k*
    event STRICTLY after step *k-1*'s timestamp and at most
    ``window_seconds`` after ``t1`` (boundary inclusive).  Repeated
    types in ``steps`` are allowed — each occurrence needs a strictly
    later event of that type.

    Returns one row per funnel entrant: ``(user_col, entered_at,
    steps_completed)`` — users with no ``steps[0]`` event at all are
    absent (implicitly 0 steps).

    Plan shape: per step, a pushed-down ``event_type`` scan joined to
    the (per-user, shrinking) previous-step frame on ``user_col``,
    then a map-side-combinable ``min`` — no window function, no
    per-user array, no single-task hot key.

    Every step frame is consumed TWICE (by the next step's join and by
    the final depth stitch); the two consumers project different
    columns, so ReuseExchange cannot dedup them and Catalyst would
    re-execute each step subtree (measured: 6 parquet scans for a
    3-step funnel instead of 3).  ``checkpoint=True`` (default) cuts
    each per-user step frame with a lazy ``localCheckpoint`` — the
    established multi-consumer pattern here (see prepare_corpus /
    dedup_clusters) — so each step scans its events exactly once.
    Pass ``checkpoint=False`` for plan inspection of the raw lineage.
    """
    steps = list(steps)
    if len(steps) < 2:
        raise ValueError("event_funnel: need at least 2 steps")
    if int(window_seconds) <= 0:
        raise ValueError("event_funnel: window_seconds must be positive")

    keys = [user_col] if isinstance(user_col, str) else list(user_col)
    base = df.select(
        F.struct(*[F.col(k) for k in keys]).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(type_col).alias("_et"),
    )
    win = F.expr(f"INTERVAL {int(window_seconds)} SECOND")

    s1 = (
        base.where(F.col("_et") == steps[0])
        .groupBy("_u")
        .agg(F.min("_ts").alias("_t1"))
    )
    if checkpoint:
        s1 = s1.localCheckpoint(eager=False)
    prev = s1.select(
        "_u",
        "_t1",
        F.col("_t1").alias("_tprev"),
        (F.col("_t1") + win).alias("_deadline"),
    )
    step_frames: list[DataFrame] = []
    for i, st in enumerate(steps[1:], start=2):
        nxt = (
            base.where(F.col("_et") == st)
            .join(prev.select("_u", "_t1", "_tprev", "_deadline"), "_u")
            .where(
                (F.col("_ts") > F.col("_tprev"))
                & (F.col("_ts") <= F.col("_deadline"))
            )
            .groupBy("_u")
            .agg(
                F.min("_ts").alias("_tk"),
                F.min("_t1").alias("_t1"),
                F.min("_deadline").alias("_deadline"),
            )
        )
        if checkpoint:
            nxt = nxt.localCheckpoint(eager=False)
        prev = nxt.select(
            "_u", "_t1", F.col("_tk").alias("_tprev"), "_deadline"
        )
        step_frames.append(nxt.select("_u", F.col("_tk").alias(f"_s{i}")))

    out = s1.select("_u", "_t1")
    for i, frame in enumerate(step_frames, start=2):
        out = out.join(frame, "_u", "left")
    completed = F.lit(1)
    for i in range(2, len(steps) + 1):
        completed = completed + F.when(
            F.col(f"_s{i}").isNotNull(), 1
        ).otherwise(0)
    time_cols = (
        [F.col(f"_s{i}").alias(f"step_ts_{i}")
         for i in range(2, len(steps) + 1)]
        if return_times
        else []
    )
    return out.select(
        *[F.col(f"_u.`{k}`").alias(k) for k in keys],
        F.col("_t1").alias("entered_at"),
        completed.cast("int").alias("steps_completed"),
        *time_cols,
    )


def retention_cohorts(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
) -> DataFrame:
    """Cohort retention matrix: ``(cohort, offset_days, n_users)``.

    A user's cohort is their first active day; the user contributes
    one row per distinct later active day at ``offset_days =
    datediff(day, cohort)`` (offset 0 = the cohort day itself, so
    ``n_users`` at offset 0 is the cohort size).

    ONE exchange on the user key; the per-user distinct-day set is
    bounded by the calendar span of the data, not by event volume.
    """
    per_user = (
        df.select(F.col(user_col).alias("_u"), _day(ts_col).alias("_d"))
        .groupBy("_u")
        .agg(
            F.min("_d").alias("cohort"),
            F.collect_set("_d").alias("_days"),
        )
    )
    return (
        per_user.select("cohort", F.explode("_days").alias("_d"))
        .select(
            "cohort", F.datediff("_d", "cohort").alias("offset_days")
        )
        .groupBy("cohort", "offset_days")
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


def _naive_us(ts_col: str) -> Column:
    """Exact integer micros in NAIVE timestamp space (tz-free for
    TIMESTAMP_NTZ inputs; matches DuckDB ``epoch_us``)."""
    return F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"CAST(`{ts_col}` AS TIMESTAMP_NTZ))"
    )


def multi_touch_attribution(
    df: DataFrame,
    *,
    conversion_type: str = "purchase",
    touch_types: tuple[str, ...] = ("view", "click"),
    lookback_seconds: int = 7 * 86400,
    half_life_seconds: int = 86400,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    type_col: str = "event_type",
) -> DataFrame:
    """Multi-touch attribution: one row per (conversion, touch) pair
    for every touch at-or-before the conversion within the lookback
    window, with linear (``1/n``) and exponential time-decay weights
    (half-life ``half_life_seconds``, each conversion's weights
    normalized to sum to 1).

    Complements :func:`grass_spark.operators.asof.asof_join`'s
    last-touch attribution.  Conversions with no in-window touch emit
    nothing (no touch, no credit).

    Scale shape: never a per-user window or collect_list — conversions
    explode into their <= ``lookback_days + 1`` candidate DAY buckets
    (calendar-bounded fan-out) and equi-join touches on ``(user, day
    bucket)``, so a hot user spreads across days and the join output is
    exactly the (conversion, touch) pairs the operator must emit
    (output-proportional).  Per-conversion totals are one combinable
    groupBy on the conversion id.  Weights round to 6 dp BEFORE the
    normalizing sum (JVM vs libm ``pow`` differs in the last ulp) and
    the sum rounds again before the divide, so shares are bit-identical
    across engines.
    """
    if lookback_seconds <= 0 or half_life_seconds <= 0:
        raise ValueError(
            "multi_touch_attribution: lookback/half-life must be positive"
        )
    day_us = 86400 * 1_000_000
    look_us = int(lookback_seconds) * 1_000_000
    half_us_f = float(half_life_seconds) * 1e6

    conv = df.where(F.col(type_col) == conversion_type).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("conv_id"),
        F.col(ts_col).alias("conv_ts"),
        _naive_us(ts_col).alias("_cus"),
    )
    touch = df.where(F.col(type_col).isin(*touch_types)).select(
        F.col(user_col).alias("_u"),
        F.col(id_col).alias("touch_id"),
        F.col(ts_col).alias("touch_ts"),
        F.col(type_col).alias("touch_type"),
        _naive_us(ts_col).alias("_tus"),
    ).withColumn("_b", F.expr(f"_tus div {day_us}"))

    # each (conversion, touch) pair matches exactly ONE exploded bucket
    # (the touch's own day), so the banded join never duplicates
    conv_b = conv.withColumn(
        "_b",
        F.explode(
            F.sequence(
                F.expr(f"(_cus - {look_us}) div {day_us}"),
                F.expr(f"_cus div {day_us}"),
            )
        ),
    )
    w = F.round(
        F.pow(F.lit(0.5), (F.col("_cus") - F.col("_tus")) / F.lit(half_us_f)),
        6,
    )
    cand = (
        conv_b.join(touch, ["_u", "_b"])
        .where(
            (F.col("_tus") <= F.col("_cus"))
            & (F.col("_cus") - F.col("_tus") <= look_us)
        )
        .select(
            F.col("_u").alias(user_col),
            "conv_id", "conv_ts", "touch_id", "touch_ts", "touch_type",
            w.alias("_w"),
        )
    )
    tot = cand.groupBy("conv_id").agg(
        F.count(F.lit(1)).alias("n_touches"),
        F.round(F.sum("_w"), 6).alias("_s"),
    )
    return cand.join(tot, "conv_id").select(
        user_col, "conv_id", "conv_ts", "touch_id", "touch_ts",
        "touch_type", "n_touches",
        F.round(F.lit(1.0) / F.col("n_touches"), 6).alias("w_linear"),
        F.round(F.col("_w") / F.col("_s"), 6).alias("w_decay"),
    )


def funnel_weekly(
    df: DataFrame,
    *,
    step1: str,
    step2: str,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    checkpoint: bool = True,
) -> DataFrame:
    """Two-step funnel conversion as a weekly trend: users are
    cohorted by the week of their FIRST ``step1`` event; a cohort
    member converts if any ``step2`` event follows that first step
    strictly in ``(ts, id)`` order (the ties-by-id contract shared
    with event_funnel).  Returns ``(week_start, n_cohort,
    n_converted, cvr)`` — the portable Monday anchor, round-6 cvr.

    Scale shape: first-step election is a map-side-combinable
    ``min(struct(ts, id))`` census (checkpointed — the cohort census
    feeds BOTH the conversion join and the week rollup); the
    conversion check is one equi-join on user against the
    step2-filtered scan folded by a combinable ``max`` flag.  No
    window ever sees the corpus.
    """
    s1 = (
        df.where(F.col(type_col) == step1)
        .groupBy(F.col(user_col).alias("_u"))
        .agg(
            F.min(
                F.struct(F.col(ts_col).alias("_ts"),
                         F.col(id_col).alias("_id"))
            ).alias("_f")
        )
        .select("_u", F.col("_f._ts").alias("_fts"),
                F.col("_f._id").alias("_fid"))
    )
    if checkpoint:
        s1 = s1.localCheckpoint(eager=False)  # conversion join + rollup

    s2 = df.where(F.col(type_col) == step2).select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts2"),
        F.col(id_col).alias("_id2"),
    )
    after = (F.col("_ts2") > F.col("_fts")) | (
        (F.col("_ts2") == F.col("_fts")) & (F.col("_id2") > F.col("_fid"))
    )
    conv = (
        s1.join(s2, "_u", "left")
        .groupBy("_u")
        .agg(F.max(F.when(after, 1).otherwise(0)).alias("_conv"))
    )
    day = F.to_date(F.date_trunc("day", F.col("_fts")))
    wk = F.date_sub(
        day, F.pmod(F.datediff(day, F.lit("1970-01-05").cast("date")), 7)
    )
    return (
        s1.join(conv, "_u")
        .groupBy(wk.alias("week_start"))
        .agg(
            F.count(F.lit(1)).alias("n_cohort"),
            F.sum("_conv").alias("n_converted"),
        )
        .select(
            "week_start",
            "n_cohort",
            "n_converted",
            F.round(
                F.col("n_converted").cast("double")
                / F.col("n_cohort").cast("double"),
                6,
            ).alias("cvr"),
        )
        .orderBy("week_start")
    )
