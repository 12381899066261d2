"""Generic table profiler — the per-column data-QC summary (row count,
null count, exact distinct count, lexicographic min/max) every ingest
job runs before trusting a new drop: schema drift, null explosions and
cardinality collapses all show up here first.

Scale shape: ONE scan stacks the requested columns into long
``(column, value)`` rows (a scan-stage ``stack``, no shuffle), then a
single map-side-combinable ``groupBy(column, value)`` census carries
everything: row counts, null counts, exact distinct counts and
min/max all reduce FROM THE CENSUS, so a column's raw rows are never
buffered anywhere.  The census for a unique-key column is
row-count-sized — that is one well-spread shuffle on (column, value),
the honest cost of exact distinct counts (the sketch tier
(operators/sketches.py) is the approximate alternative).

Cross-engine parity: values are compared and displayed as strings.
Integer, string, date and timestamp renderings are identical across
Spark and DuckDB; FLOAT/DOUBLE renderings are NOT (Java vs C
shortest-repr) — profile those via an explicit cast/round upstream,
or accept engine-local display.  String ordering is binary in both
engines' defaults.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(
    df: DataFrame, *, columns: list[str] | None = None
) -> DataFrame:
    """(column, n_rows, n_nulls, n_distinct, min_val, max_val) per
    profiled column, ordered by column name.

    ``n_distinct`` counts distinct NON-null values; ``min_val`` /
    ``max_val`` are lexicographic over the string rendering (nulls
    excluded; NULL for an all-null column).
    """
    cols = list(columns) if columns is not None else list(df.columns)
    if not cols:
        raise ValueError("profile_table needs at least one column")
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ValueError(f"unknown columns: {missing}")
    parts = ", ".join(f"'{c}', cast(`{c}` as string)" for c in cols)
    stacked = df.select(
        F.expr(f"stack({len(cols)}, {parts}) as (column, val)")
    )
    census = stacked.groupBy("column", "val").agg(
        F.count(F.lit(1)).alias("_c")
    )
    return (
        census.groupBy("column")
        .agg(
            F.sum("_c").alias("n_rows"),
            F.coalesce(
                F.sum(F.when(F.col("val").isNull(), F.col("_c"))),
                F.lit(0),
            ).alias("n_nulls"),
            F.count(F.when(F.col("val").isNotNull(), F.lit(1))).alias(
                "n_distinct"
            ),
            F.min("val").alias("min_val"),
            F.max("val").alias("max_val"),
        )
        .orderBy("column")
    )


def value_histogram(
    df: DataFrame,
    *,
    value_col: str,
    n_bins: int = 20,
) -> DataFrame:
    """Equal-width histogram over a currency/measure column in EXACT
    integer cents: ``(bin, lo_value, hi_value, n)`` with empty bins
    densified to explicit zeros — the numeric-shape companion to
    ``profile_table``.

    Bin width is the integer ``ceil(span / n_bins)`` over the observed
    cent range (>= 1), so at most ``n_bins`` bins exist and the max
    value lands in the last bin; ``lo_value``/``hi_value`` are the
    bin's inclusive cent bounds rendered as currency (6 dp).

    Scale shape: one global min/max aggregate + one map-side
    combinable ``groupBy(bin)`` over the scan-stage cent projection
    (two consumers of a plain scan — cheaper to re-scan than to
    checkpoint, the vocab_growth note); the densifying ``sequence``
    explodes <= n_bins rows from the 1-row bounds frame.  All bin
    arithmetic is integer floor division (Spark ``div`` == DuckDB
    ``//`` — the m4 bucket-id discipline).
    """
    if n_bins < 1:
        raise ValueError("value_histogram: n_bins must be >= 1")
    cents = F.round(F.col(value_col).cast("double") * F.lit(100.0)).cast(
        "long"
    )
    vals = df.where(F.col(value_col).isNotNull()).select(cents.alias("_c"))
    bw = vals.agg(
        F.min("_c").alias("_lo"), F.max("_c").alias("_hi")
    ).select(
        "_lo",
        "_hi",
        F.greatest(
            F.lit(1).cast("long"),
            F.expr(f"(_hi - _lo + {int(n_bins)}) div {int(n_bins)}"),
        ).alias("_w"),
    )
    cen = (
        vals.crossJoin(F.broadcast(bw))
        .select(F.expr("(_c - _lo) div _w").alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    grid = bw.select(
        "_lo",
        "_w",
        F.explode(
            F.sequence(
                F.lit(0).cast("long"), F.expr("(_hi - _lo) div _w")
            )
        ).alias("bin"),
    )
    lo_v = (F.col("_lo") + F.col("bin") * F.col("_w")).cast("double")
    hi_v = (
        F.col("_lo") + (F.col("bin") + 1) * F.col("_w") - 1
    ).cast("double")
    return (
        grid.join(cen, "bin", "left")
        .select(
            "bin",
            F.round(lo_v / F.lit(100.0), 6).alias("lo_value"),
            F.round(hi_v / F.lit(100.0), 6).alias("hi_value"),
            F.coalesce("n", F.lit(0).cast("long")).alias("n"),
        )
        .orderBy("bin")
    )


def freshness_report(
    df: DataFrame,
    *,
    group_col: str,
    ts_col: str = "ts",
    recent_days: int = 7,
) -> DataFrame:
    """Per-group data-freshness audit: ``(group, n_rows, last_day,
    days_behind, n_recent)`` — how stale each source/type is relative
    to the newest data anywhere, and how much of it arrived in the
    trailing ``recent_days`` window ending at the global max day.

    Scale shape: the global max day is a 1-row aggregate broadcast
    onto the scan (BroadcastNestedLoopJoin of one row — the bounds
    pattern), so recency flags resolve in the scan stage and ONE
    map-side-combinable ``groupBy(group)`` does everything; exact
    integer day arithmetic throughout.
    """
    if recent_days < 1:
        raise ValueError("freshness_report: recent_days must be >= 1")
    day = F.to_date(F.date_trunc("day", F.col(ts_col)))
    base = df.select(F.col(group_col).alias("_g"), day.alias("_d"))
    gmax = base.agg(F.max("_d").alias("_gm"))
    return (
        base.crossJoin(F.broadcast(gmax))
        .groupBy(F.col("_g").alias("group"))
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.max("_d").alias("last_day"),
            F.min(F.datediff(F.col("_gm"), F.col("_d")))
            .alias("days_behind"),
            F.sum(
                F.when(
                    F.col("_d") > F.date_sub(F.col("_gm"), int(recent_days)),
                    1,
                ).otherwise(0)
            ).alias("n_recent"),
        )
        .select("group", "n_rows", "last_day", "days_behind", "n_recent")
        .orderBy("group")
    )


def join_cardinality(
    left: DataFrame,
    right: DataFrame,
    *,
    left_key: str,
    right_key: str,
) -> DataFrame:
    """Pre-join cardinality report: ``(n_left_rows, n_right_rows,
    n_left_keys, n_right_keys, n_matched_keys, max_left_fanout,
    max_right_fanout, exact_join_rows)`` — what an equi-join WOULD
    produce, without producing it.  ``exact_join_rows = sum over
    matched keys of n_a * n_b`` is the number the optimizer estimates
    and a skew audit needs exactly (one hot key's ``n_a * n_b`` term
    IS the straggler).

    Scale shape: two map-side-combinable key censuses, one
    census-vs-census equi-join, one global aggregate.  Products run in
    DECIMAL(38) (two 10^9-row fanouts multiply past BIGINT).  NULL
    keys are excluded (SQL equi-joins never match them).
    """
    ca = (
        left.where(F.col(left_key).isNotNull())
        .groupBy(F.col(left_key).alias("_k"))
        .agg(F.count(F.lit(1)).alias("_na"))
    )
    cb = (
        right.where(F.col(right_key).isNotNull())
        .groupBy(F.col(right_key).alias("_k"))
        .agg(F.count(F.lit(1)).alias("_nb"))
    )
    la = ca.agg(
        F.sum("_na").alias("n_left_rows"),
        F.count(F.lit(1)).alias("n_left_keys"),
        F.max("_na").alias("max_left_fanout"),
    )
    lb = cb.agg(
        F.sum("_nb").alias("n_right_rows"),
        F.count(F.lit(1)).alias("n_right_keys"),
        F.max("_nb").alias("max_right_fanout"),
    )
    m = ca.join(cb, "_k").agg(
        F.count(F.lit(1)).alias("n_matched_keys"),
        F.coalesce(
            F.sum(
                F.col("_na").cast("decimal(19,0)")
                * F.col("_nb").cast("decimal(19,0)")
            ),
            F.lit(0).cast("decimal(38,0)"),
        ).alias("_jr"),
    )
    return (
        la.crossJoin(F.broadcast(lb))
        .crossJoin(F.broadcast(m))
        .select(
            "n_left_rows",
            "n_right_rows",
            "n_left_keys",
            "n_right_keys",
            "n_matched_keys",
            "max_left_fanout",
            "max_right_fanout",
            F.col("_jr").cast("long").alias("exact_join_rows"),
        )
    )
