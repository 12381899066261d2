"""Revenue-concentration analytics: ABC (Pareto) classification and
the Gini coefficient — "how top-heavy is this corpus/customer base",
the concentration companions to source_entropy and zipf_slope.

Both reduce the corpus to a per-key value census (map-side), then to a
DISTINCT-VALUE census, and run the engine's bucketed distributed
prefix sums (operators/prefix.py) over the value order — a continuous
value column makes the census corpus-sized, so a bare ``ORDER BY``
cumulative window would single-task it (the census-rank lesson).
Keys tied on the same value classify together (deterministic; the
standard grouped-data convention).

Cross-engine parity: values reduce in exact integer cents; prefix
sums stay exact DECIMAL(38,0)/HUGEINT; every share/coefficient is ONE
mirrored double expression over exact integers, round 6.  The Gini
uses the grouped-data trapezoid identity
``G = 1 - sum_i n_i * (2*Y_prev + s_i) / (N * S)`` (values ascending,
``Y_prev`` the exact revenue prefix) — all-integer until the final
division.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grass_spark.operators.prefix import exclusive_prefix_sums

__all__ = ["abc_analysis", "gini_coefficient"]


def _value_census(
    df: DataFrame, key_col: str, value_col: str
) -> DataFrame:
    """Distinct per-key-total census: one row per distinct key total
    ``_v`` (cents) with ``_n`` keys and ``_s = _v * _n`` total cents,
    plus exact exclusive prefixes ``_prev__n`` / ``_prev__s`` over
    ascending value."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    per_key = (
        df.groupBy(F.col(key_col).alias("_k"))
        .agg(F.sum(cents.cast("decimal(38,0)")).alias("_v"))
    )
    vcen = per_key.groupBy("_v").agg(
        F.count(F.lit(1)).alias("_n"),
    ).withColumn(
        "_s", F.col("_v") * F.col("_n").cast("decimal(38,0)")
    )
    return exclusive_prefix_sums(vcen, "_v", ["_n", "_s"])


def abc_analysis(
    df: DataFrame,
    *,
    key_col: str,
    value_col: str,
    thresholds: tuple[float, float] = (0.8, 0.95),
) -> DataFrame:
    """Classify keys by cumulative-from-the-top revenue share:
    class A while the cumulative share (INCLUDING the key's own value
    group) is <= thresholds[0], B while <= thresholds[1], else C.
    Returns ``(abc_class, n_keys, value_sum, value_share)`` (3 rows).
    """
    t1, t2 = thresholds
    if not (0.0 < t1 < t2 < 1.0):
        raise ValueError("abc_analysis: need 0 < t1 < t2 < 1")
    p = _value_census(df, key_col, value_col).localCheckpoint(
        eager=False
    )  # totals + class rows
    tot = p.agg(
        F.sum("_n").alias("_tn"), F.sum("_s").alias("_ts")
    )
    staged = p.crossJoin(F.broadcast(tot))
    # share of revenue from keys with value >= mine (exact from the
    # ascending prefix: S - prev_s), rounded BEFORE the class compare
    cum_top = F.round(
        (F.col("_ts") - F.col("_prev__s")).cast("double")
        / F.col("_ts").cast("double"),
        6,
    )
    cls = (
        F.when(cum_top <= F.lit(t1), "A")
        .when(cum_top <= F.lit(t2), "B")
        .otherwise("C")
    )
    return (
        staged.select(
            cls.alias("abc_class"), "_n", "_s", "_ts"
        )
        .groupBy("abc_class")
        .agg(
            F.sum("_n").alias("n_keys"),
            F.round(
                F.sum("_s").cast("double") / F.lit(100.0), 6
            ).alias("value_sum"),
            F.round(
                F.sum("_s").cast("double")
                / F.max("_ts").cast("double"),
                6,
            ).alias("value_share"),
        )
        .orderBy("abc_class")
    )


def gini_coefficient(
    df: DataFrame, *, key_col: str, value_col: str
) -> DataFrame:
    """One row: ``(n_keys, total_value, gini)`` — Gini of the per-key
    value totals (0 = perfectly equal, -> 1 = one key holds all).
    NULL gini when the total is 0."""
    p = _value_census(df, key_col, value_col)
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    agg = p.agg(
        F.sum("_n").alias("_tn"),
        F.sum("_s").alias("_ts"),
        F.sum(
            dec("_n") * (F.lit(2).cast("decimal(38,0)") * dec("_prev__s")
                         + dec("_s"))
        ).alias("_trap"),
    )
    return agg.select(
        F.col("_tn").alias("n_keys"),
        F.round(
            F.col("_ts").cast("double") / F.lit(100.0), 6
        ).alias("total_value"),
        F.when(
            F.col("_ts") > 0,
            F.round(
                F.lit(1.0)
                - F.col("_trap").cast("double")
                / (
                    F.col("_tn").cast("double")
                    * F.col("_ts").cast("double")
                ),
                6,
            ),
        ).alias("gini"),
    )
