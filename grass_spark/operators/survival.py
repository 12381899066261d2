"""Kaplan–Meier user-retention survival curve — the product-limit
estimator (Kaplan & Meier 1958) over per-user activity lifetimes with
right-censoring: a user whose last event falls inside the trailing
``churn_gap_days`` observation margin is *censored* (still alive as
far as the data can tell), not churned.

Engagement pipelines read this as "what fraction of users are still
active after d days" with the censoring handled honestly — a plain
retention ratio over all users understates survival because recently
arrived users haven't had time to churn.

Scale shape: ONE map-side-combinable ``groupBy(user)`` collapses the
event stream to (first_ts, last_ts) per user; everything after runs on
a distinct-LIFETIME census (bounded by the calendar span in days, the
ks_test / retention_cohorts argument) — the cumulative windows are
single-partition by construction but calendar-bounded, never
event-volume-bounded.  The observation horizon is a 1-row broadcast.

Cross-engine parity: at-risk counts and event counts are exact
integers; each hazard factor ln(1 − d/n) rounds to 6 dp BEFORE the
cumulative sum (JVM vs libm ln last-ulp), the window accumulates in
deterministic lifetime order, and exp rounds again on output.  The
d = n boundary (everyone remaining churns) is handled by an explicit
flag — DuckDB raises on ln(0) where the JVM returns -Infinity, so the
factor is never evaluated there (CLAUDE.md round-5 lesson).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def km_survival(
    events: DataFrame,
    *,
    ts_col: str = "ts",
    user_col: str = "user_id",
    churn_gap_days: int = 7,
) -> DataFrame:
    """(lifetime_day, n_at_risk, n_churned, n_censored, survival).

    ``lifetime_day`` = whole days between a user's first and last
    event dates (datediff on dates — integer).  A user *churned* iff
    their last event precedes the global max timestamp by MORE than
    ``churn_gap_days`` (interval arithmetic, exact micros); otherwise
    censored at their observed lifetime.  ``survival`` is the KM
    product over event days ≤ t, 6-dp rounded; censored-only days
    carry the running product unchanged (factor 1).
    """
    if churn_gap_days < 0:
        raise ValueError(
            f"churn_gap_days must be >= 0, got {churn_gap_days}"
        )
    per_user = events.groupBy(user_col).agg(
        F.min(ts_col).alias("_first"),
        F.max(ts_col).alias("_last"),
    )
    horizon = events.agg(F.max(ts_col).alias("_maxts"))
    lab = per_user.crossJoin(F.broadcast(horizon)).select(
        F.datediff(
            F.col("_last").cast("date"), F.col("_first").cast("date")
        ).alias("lifetime_day"),
        (
            F.col("_last")
            < F.col("_maxts") - F.expr(f"INTERVAL {int(churn_gap_days)} DAYS")
        ).alias("_churned"),
    )
    census = lab.groupBy("lifetime_day").agg(
        F.sum(F.col("_churned").cast("long")).alias("n_churned"),
        F.sum((~F.col("_churned")).cast("long")).alias("n_censored"),
    )
    cum_w = Window.orderBy("lifetime_day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    prev_w = Window.orderBy("lifetime_day").rowsBetween(
        Window.unboundedPreceding, -1
    )
    tot_w = Window.partitionBy()
    staged = census.select(
        "lifetime_day",
        "n_churned",
        "n_censored",
        (
            F.sum(F.col("n_churned") + F.col("n_censored")).over(tot_w)
            - F.coalesce(
                F.sum(F.col("n_churned") + F.col("n_censored")).over(prev_w),
                F.lit(0),
            )
        ).alias("n_at_risk"),
    )
    d_d = F.col("n_churned").cast("double")
    n_d = F.col("n_at_risk").cast("double")
    term = F.when(
        F.col("n_churned") < F.col("n_at_risk"),
        F.round(F.log(F.lit(1.0) - d_d / n_d), 6),
    )  # NULL when d = n — the flag below owns that branch
    staged = staged.select(
        "lifetime_day",
        "n_at_risk",
        "n_churned",
        "n_censored",
        F.sum(term).over(cum_w).alias("_cumln"),
        F.max(
            (F.col("n_churned") >= F.col("n_at_risk")).cast("int")
        )
        .over(cum_w)
        .alias("_dead"),
    )
    return staged.select(
        "lifetime_day",
        "n_at_risk",
        "n_churned",
        "n_censored",
        F.when(F.col("_dead") == 1, F.lit(0.0))
        .otherwise(
            F.round(F.exp(F.coalesce(F.col("_cumln"), F.lit(0.0))), 6)
        )
        .alias("survival"),
    ).orderBy("lifetime_day")
