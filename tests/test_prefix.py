"""Distributed exclusive prefix sums (operators/prefix.py): exact
equality with the naive single-partition window, for any bucketing."""

from __future__ import annotations

import pytest

from pyspark.sql import Window
from pyspark.sql import functions as F

from grass_spark.operators.prefix import exclusive_prefix_sums


def _census(spark, vals_counts):
    return spark.createDataFrame(vals_counts, "v double, c long, d long")


def _naive(df, cols):
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    out = df
    for c in cols:
        out = out.withColumn(
            f"want_{c}", F.coalesce(F.sum(c).over(w), F.lit(0))
        )
    return out


@pytest.mark.parametrize("n_buckets", [1, 3, 8, 64])
def test_prefix_equals_naive_window(spark, n_buckets):
    import numpy as np

    rng = np.random.default_rng(13)
    vals = sorted(set(rng.normal(0, 100, size=300).round(3).tolist()))
    rows = [
        (float(v), int(rng.integers(1, 50)), int(rng.integers(0, 9)))
        for v in vals
    ]
    df = _census(spark, rows)
    got = exclusive_prefix_sums(df, "v", ["c", "d"], n_buckets=n_buckets)
    merged = got.join(
        _naive(df, ["c", "d"]).select("v", "want_c", "want_d"), "v"
    )
    bad = merged.where(
        (F.col("_prev_c") != F.col("want_c"))
        | (F.col("_prev_d") != F.col("want_d"))
    ).count()
    assert bad == 0
    assert got.count() == len(rows)


def test_prefix_all_equal_values_single_bucket(spark):
    # span 0: everything lands in bucket 0, still exact
    df = _census(spark, [(5.0, 7, 1)])
    r = exclusive_prefix_sums(df, "v", ["c"]).collect()[0]
    assert r["_prev_c"] == 0


def test_prefix_negative_and_extreme_values(spark):
    rows = [(-1e9, 1, 0), (-3.5, 2, 0), (0.0, 4, 0), (2.25, 8, 0), (1e9, 16, 0)]
    df = _census(spark, rows)
    got = {
        r.v: r["_prev_c"]
        for r in exclusive_prefix_sums(df, "v", ["c"]).collect()
    }
    assert got == {-1e9: 0, -3.5: 1, 0.0: 3, 2.25: 7, 1e9: 15}


def test_prefix_no_single_partition_exchange_on_census(spark):
    # the data-sized frames never pass through Exchange SinglePartition;
    # the only single-partition stage is the <= n_buckets offsets frame
    df = _census(spark, [(float(i), 1, 0) for i in range(100)])
    plan = (
        exclusive_prefix_sums(df, "v", ["c"], n_buckets=16)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the census-side window must be hash-partitioned on the bucket
    assert "hashpartitioning(_b" in plan
