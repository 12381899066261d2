"""M4 time-series downsampling: per (series, pixel-bucket) the four
extreme points (first, last, min-value, max-value) — the
visualization-oriented aggregation of Jugel et al. (VLDB 2014), the
standard lossless-for-line-rendering reduction dashboard engines use.

Reference analog: ``t.rast.aggregate``'s granule reduction
(``temporal/t.rast.aggregate``, kernels in ``raster/r.series``) — M4
is the same bucketed reduction specialized to the four points a line
plot actually needs.  (LTTB, the other popular downsampler, is
inherently SEQUENTIAL per series — each bucket's pick depends on the
previous pick — so it cannot partial-aggregate; M4 is the
scale-correct choice and is what the paper recommends for exact line
rendering.)

Scale shape: ONE groupBy on (series, bucket); every election is a
map-side-combinable min/max(struct(...)) — a hot series reduces inside
its input partitions.  Bucket ids come from exact integer micros
arithmetic (portable to DuckDB's epoch_us), computed against the
frame's global [min, max] timestamp bounds (one scalar aggregate,
the bounded-collect pattern).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def m4_downsample(
    df: DataFrame,
    n_buckets: int,
    *,
    series_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    id_col: str = "event_id",
) -> DataFrame:
    """Reduce each series to at most ``n_buckets`` M4 rows:
    ``(series, bucket, t_first, v_first, t_last, v_last, t_min, v_min,
    t_max, v_max, n)``; doubles rounded to 6 dp, ties broken by
    ``(ts, id)`` / ``(value, ts, id)`` struct order.

    Bucket ``i`` covers ``[lo + i*span/n, lo + (i+1)*span/n)`` with the
    global max clamped into the last bucket (exact integer micros:
    ``idx = (t - lo) * n / (hi - lo + 1)``, floor division — identical
    arithmetic in DuckDB).  Empty buckets are absent (a renderer
    connects across them, matching the paper's semantics).

    ``value_col`` must be non-null (NULL ordering inside the
    min-by-value election differs across engines); filter first.
    """
    if n_buckets < 1:
        raise ValueError("m4_downsample: n_buckets must be >= 1")

    bounds = df.agg(
        F.min(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("lo"),
        F.max(F.unix_micros(F.col(ts_col).cast("timestamp"))).alias("hi"),
    ).collect()[0]  # bounded: one row
    if bounds["lo"] is None:
        raise ValueError("m4_downsample: empty input")
    lo, hi = int(bounds["lo"]), int(bounds["hi"])

    t = F.unix_micros(F.col(ts_col).cast("timestamp"))
    # exact integer floor division (Spark `div` == DuckDB `//`): a
    # double quotient can round up across an integer boundary
    idx = F.expr(
        f"CAST(((unix_micros(CAST(`{ts_col}` AS TIMESTAMP)) - {lo}) "
        f"* {int(n_buckets)}) div {hi - lo + 1} AS INT)"
    )
    by_t = F.struct(
        t.alias("_t"), F.col(id_col).alias("_id"),
        F.col(value_col).alias("_v"), F.col(ts_col).alias("_ts"),
    )
    by_v = F.struct(
        F.col(value_col).alias("_v"), t.alias("_t"),
        F.col(id_col).alias("_id"), F.col(ts_col).alias("_ts"),
    )
    agg = (
        df.select(
            F.col(series_col).alias("series"),
            idx.alias("bucket"),
            by_t.alias("_bt"),
            by_v.alias("_bv"),
        )
        .groupBy("series", "bucket")
        .agg(
            F.min("_bt").alias("_first"),
            F.max("_bt").alias("_last"),
            F.min("_bv").alias("_vmin"),
            F.max("_bv").alias("_vmax"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return agg.select(
        "series", "bucket",
        F.col("_first._ts").alias("t_first"),
        F.round(F.col("_first._v"), 6).alias("v_first"),
        F.col("_last._ts").alias("t_last"),
        F.round(F.col("_last._v"), 6).alias("v_last"),
        F.col("_vmin._ts").alias("t_min"),
        F.round(F.col("_vmin._v"), 6).alias("v_min"),
        F.col("_vmax._ts").alias("t_max"),
        F.round(F.col("_vmax._v"), 6).alias("v_max"),
        "n",
    )
