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
