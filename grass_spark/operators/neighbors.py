"""``t.rast.neighbors`` temporal analog — rolling kernels over ±k
adjacent granules per key.

The reference module runs spatial ``r.neighbors`` per map over a STRDS
(``temporal/t.rast.neighbors/t.rast.neighbors.py:57-71``: size=3
neighborhood, method menu average/median/mode/minimum/maximum/range/
stddev/sum/count/variance/diversity/quart1/quart3/perc90/quantile).
The transcript analog slides the same kernel menu across the *time*
axis: for each granule, aggregate the values of the ``size`` granules
centered on it (±size//2) within the key's series.

Spark shape: one ``Window.partitionBy(keys).orderBy(time)`` with
``rowsBetween(-k, k)`` — a single shuffle on the keys, then a streaming
window pass; no self-join, no explode.  All kernels are built-in JVM
aggregates used as window functions (exact ``percentile`` for the
quantile family — Hyndman-Fan type 7, same as the bucket kernels;
``mode(x, true)`` smallest-tie; population ``stddev_pop/var_pop``;
diversity via ``array_size(collect_set())``).  Identical plan at any
scale: the frame never exceeds ``size`` rows per output row.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _kernels(v: str, quantile: float | None) -> dict[str, object]:
    """method -> fn(window) -> Column.  Composite kernels (range,
    diversity) apply ``.over`` per aggregate — Spark only windows plain
    aggregate expressions."""
    def perc(q: float):
        return lambda w: F.expr(f"percentile({v}, {q!r})").over(w)

    def plain(agg: Column):
        return lambda w: agg.over(w)

    ks = {
        "average": plain(F.avg(v)),
        "median": perc(0.5),
        "mode": plain(F.expr(f"mode({v}, true)")),
        "minimum": plain(F.min(v)),
        "maximum": plain(F.max(v)),
        "range": lambda w: F.max(v).over(w) - F.min(v).over(w),
        "stddev": plain(F.stddev_pop(v)),
        "sum": plain(F.sum(v)),
        "count": plain(F.count(v)),
        "variance": plain(F.var_pop(v)),
        "diversity": lambda w: F.array_size(F.collect_set(v).over(w)),
        "quart1": perc(0.25),
        "quart3": perc(0.75),
        "perc90": perc(0.9),
    }
    if quantile is not None:
        ks["quantile"] = perc(quantile)
    return ks


NEIGHBOR_METHODS = tuple(_kernels("v", 0.5).keys())


def neighbors(
    df: DataFrame,
    *,
    keys: list[str] | None = None,
    time_col: str = "bucket_start",
    value_col: str = "value",
    size: int = 3,
    methods: tuple[str, ...] = ("average",),
    quantile: float | None = None,
) -> DataFrame:
    """Rolling neighborhood aggregation over ±size//2 granules.

    ``size`` must be odd (the reference's neighborhood semantics —
    r.neighbors requires odd sizes).  Output keeps the input columns
    and appends one column per method, named after the method (the
    reference's ``method`` output-name suffix convention).
    """
    if size < 1 or size % 2 == 0:
        raise ValueError("size must be a positive odd integer")
    keys = [] if keys is None else list(keys)
    half = size // 2
    w = (
        (Window.partitionBy(*keys) if keys else Window.partitionBy())
        .orderBy(time_col)
        .rowsBetween(-half, half)
    )
    ks = _kernels(value_col, quantile)
    out = df
    for m in methods:
        if m not in ks:
            raise KeyError(f"unknown neighbors method {m!r}")
        out = out.withColumn(m, ks[m](w))
    return out
