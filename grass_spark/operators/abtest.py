"""A/B experiment analysis over the events stream: deterministic
hash-bucket assignment, per-user conversion, and a pooled
two-proportion z statistic.

Reference analog: the reference's univariate statistics kernels
(``lib/stats``, t-value in the regression kernel family,
``r.series`` method tables) — this is the experimentation-flavoured
version of the same "compare two populations" question.

Scale shape: everything is partial-aggregatable.  Assignment is a
scan-stage md5 projection (the portable-uniform-hash recipe shared
with mixture sampling); per-user conversion is one
``groupBy(user).max`` (map-side combinable — a bot user's 10^8 events
reduce inside their input partitions); the experiment summary is a
single global aggregate of conditional integer sums.  Two exchanges
total, both post-partial; no window, no array, no Python.

The z statistic composes from EXACT integer counts in a fixed
floating-point order, so Spark and DuckDB produce bit-identical
doubles (the established integer-power-sum discipline — never use
built-in variance/stddev across engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def assign_variant(
    user: Column | str,
    *,
    salt: str = "ab",
    treat_frac: float = 0.5,
) -> Column:
    """Deterministic sticky assignment: 'B' (treatment) for the
    ``treat_frac`` of users whose portable md5-uniform falls below the
    threshold, else 'A'.  Same recipe as mixture sampling: first 8 md5
    hex digits as uint32 / 2^32 — exact in a double, identical in
    DuckDB via ``CAST('0x' || substr(md5(..), 1, 8) AS UBIGINT)``.
    """
    if not 0.0 < treat_frac < 1.0:
        raise ValueError("assign_variant: treat_frac must be in (0, 1)")
    u = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt),
                                      F.col(user) if isinstance(user, str)
                                      else user)), 1, 8),
        16, 10,
    ).cast("double") / F.lit(float(2 ** 32))
    return F.when(u < F.lit(float(treat_frac)), F.lit("B")).otherwise(
        F.lit("A")
    )


def ab_test(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    convert_type: str = "purchase",
    salt: str = "ab",
    treat_frac: float = 0.5,
) -> DataFrame:
    """One-row experiment summary: per-variant user/conversion counts,
    conversion rates, absolute lift (B - A), and the pooled
    two-proportion z statistic (NULL when either arm is empty or the
    pooled variance is zero).  Doubles rounded to 6 dp.
    """
    per_user = (
        df.select(
            F.col(user_col).alias("_u"),
            (F.col(type_col) == convert_type).cast("int").alias("_c"),
        )
        .groupBy("_u")
        .agg(F.max("_c").alias("_conv"))
        .withColumn(
            "_v", assign_variant("_u", salt=salt, treat_frac=treat_frac)
        )
    )
    agg = per_user.agg(
        F.sum(F.when(F.col("_v") == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("_v") == "B", 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("_v") == "A", F.col("_conv")).otherwise(0))
        .alias("conv_a"),
        F.sum(F.when(F.col("_v") == "B", F.col("_conv")).otherwise(0))
        .alias("conv_b"),
    )
    # fixed-order float composition from exact integer counts
    p_a = F.col("conv_a").cast("double") / F.col("n_a")
    p_b = F.col("conv_b").cast("double") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    se2 = pool * (F.lit(1.0) - pool) * (
        F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b")
    )
    z = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0) & (se2 > 0),
        F.round((p_b - p_a) / F.sqrt(se2), 6),
    )
    return agg.select(
        "n_a", "n_b", "conv_a", "conv_b",
        F.when(F.col("n_a") > 0, F.round(p_a, 6)).alias("rate_a"),
        F.when(F.col("n_b") > 0, F.round(p_b, 6)).alias("rate_b"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0), F.round(p_b - p_a, 6)
        ).alias("lift"),
        z.alias("z"),
    )
