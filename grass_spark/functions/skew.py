"""Skew-handling utilities — salted partitioning for hot conversations.

The north rule requires hash partitioning by conv_id *salted against
hot-conversation skew* plus range clustering by ts.  Three layers:

1. groupBy keys that include the bucket (the tier rollups) spread hot
   conversations automatically — a 10^9-turn conversation covers ~10^6
   minute buckets, so no salting is needed there;
2. keyed operations WITHOUT a bucket (whole-series kernels, per-conv
   windows) can hot-spot; :func:`salted_two_phase_agg` splits such an
   aggregation into (key, salt) partials then a final merge — classic
   two-phase salting, exact for algebraic kernels;
3. AQE's skewJoin/coalesce (enabled in ``session.get_spark``) handles
   residual join skew at runtime.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salt_col(keys: list[str], buckets: int) -> Column:
    """Deterministic salt in [0, buckets) derived from the row hash —
    spreads a hot key without an RNG (replayable, resume-safe)."""
    return F.pmod(F.xxhash64(*keys, F.lit(0x5A17)), F.lit(buckets)).cast("int")


def salted_repartition(
    df: DataFrame, keys: list[str], salt_buckets: int = 8,
    sort_cols: list[str] | None = None,
) -> DataFrame:
    """Repartition by (keys..., salt) and range-cluster within
    partitions — the write layout the north rule names."""
    out = df.repartition(*[F.col(k) for k in keys], salt_col(keys + (sort_cols or []), salt_buckets))
    if sort_cols:
        out = out.sortWithinPartitions(*keys, *sort_cols)
    return out


#: partial -> merge expressions for the algebraic kernels
_MERGEABLE = {
    "count": (F.count, F.sum),
    "sum": (F.sum, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_two_phase_agg(
    df: DataFrame,
    keys: list[str],
    value_col: str,
    methods: list[str],
    salt_buckets: int = 16,
) -> DataFrame:
    """Exact two-phase aggregation through a salt: phase 1 aggregates
    (keys..., salt) partials (hot key spread over ``salt_buckets``
    reducers), phase 2 merges partials per key.  avg is derived from
    sum/count; only algebraic methods are legal here — holistic kernels
    (median/quantile/mode) cannot be salted exactly and must go through
    the bucket-keyed path instead.
    """
    bad = [m for m in methods if m not in _MERGEABLE and m != "average"]
    if bad:
        raise ValueError(f"non-algebraic methods cannot be salted: {bad}")
    need = set(methods)
    if "average" in need:
        need |= {"sum", "count"}
        need.discard("average")

    salted = df.withColumn("_salt", salt_col([*keys, value_col], salt_buckets))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[_MERGEABLE[m][0](value_col).alias(f"_p_{m}") for m in sorted(need)]
    )
    merged = partial.groupBy(*keys).agg(
        *[_MERGEABLE[m][1](f"_p_{m}").alias(m) for m in sorted(need)]
    )
    if "average" in methods:
        merged = merged.withColumn("average", F.col("sum") / F.col("count"))
    return merged.select(*keys, *methods)
