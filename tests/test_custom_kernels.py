"""register_kernel — the Spark analog of the reference's stat_func
plug-in ABI (include/grass/stats.h; raster/r.series/main.c:34-39):
user kernels flow through kernel_sql/agg_exprs and the temporal
aggregation pipeline exactly like built-ins.  SQL-expression kernels
stay JVM-side; pandas kernels cross via Arrow GROUPED_AGG batches
(never per-row Python)."""

from __future__ import annotations

import math
from datetime import datetime, timedelta

import numpy as np
import pytest
from pyspark.sql import functions as F

from grass_spark.functions.kernels import (
    CUSTOM_KERNELS,
    agg_exprs,
    kernel_sql,
    register_kernel,
    unregister_kernel,
)
from grass_spark.operators.aggregate import aggregate


@pytest.fixture()
def _clean():
    yield
    unregister_kernel("midrange")
    unregister_kernel("geomean")


def test_sql_kernel_flows_through_agg_exprs(spark, _clean):
    register_kernel("midrange", lambda v, i: f"(min({v}) + max({v})) / 2")
    df = spark.createDataFrame(
        [(1, 2.0), (1, 10.0), (2, 6.0)], ["k", "value"]
    )
    out = {
        r["k"]: r["midrange"]
        for r in df.groupBy("k").agg(*agg_exprs(["midrange"], "value")).collect()
    }
    assert out[1] == 6.0 and out[2] == 6.0


def test_pandas_kernel_matches_closed_form(spark, _clean):
    def geomean(s) -> float:
        return float(np.exp(np.log(s.to_numpy()).mean()))

    register_kernel("geomean", pandas_fn=geomean, spark=spark)
    df = spark.createDataFrame(
        [(1, float(x)) for x in (1, 2, 4, 8)], ["k", "value"]
    )
    got = df.groupBy("k").agg(*agg_exprs(["geomean"], "value")).collect()[0]
    assert got["geomean"] == pytest.approx(math.exp(sum(math.log(x) for x in (1, 2, 4, 8)) / 4))


def test_custom_kernel_in_temporal_aggregate_pipeline(spark, _clean):
    register_kernel("midrange", lambda v, i: f"(min({v}) + max({v})) / 2")
    t0 = datetime(2024, 3, 1)
    rows = [
        ("c1", t0 + timedelta(minutes=m), float(v))
        for m, v in [(0, 1.0), (10, 9.0), (70, 4.0)]
    ]
    df = spark.createDataFrame(rows, ["conv_id", "ts", "value"])
    out = {
        r["bucket_start"]: r
        for r in aggregate(df, "1 hour", ["midrange", "count"]).collect()
    }
    assert out[t0]["midrange"] == 5.0
    assert out[t0 + timedelta(hours=1)]["midrange"] == 4.0


def test_mixed_pandas_and_jvm_kernels_autosplit(spark, _clean):
    # Spark forbids GROUPED_AGG pandas UDFs alongside JVM aggregates in
    # one agg() — aggregate() must auto-split and join co-keyed
    def geomean(s) -> float:
        return float(np.exp(np.log(s.to_numpy()).mean()))

    register_kernel("geomean", pandas_fn=geomean, spark=spark)
    t0 = datetime(2024, 3, 1)
    rows = [
        ("c1", t0 + timedelta(minutes=m), float(v))
        for m, v in [(0, 2.0), (10, 8.0), (70, 5.0)]
    ]
    df = spark.createDataFrame(rows, ["conv_id", "ts", "value"])
    out = aggregate(df, "1 hour", ["count", "geomean", "average"])
    assert out.columns == [
        "conv_id", "bucket_start", "count", "geomean", "average", "bucket_end"
    ]
    got = {r["bucket_start"]: r for r in out.collect()}
    assert got[t0]["count"] == 2 and got[t0]["average"] == 5.0
    assert got[t0]["geomean"] == pytest.approx(4.0)
    assert got[t0 + timedelta(hours=1)]["geomean"] == pytest.approx(5.0)
    with pytest.raises(ValueError, match="propagate_null"):
        aggregate(df, "1 hour", ["count", "geomean"], propagate_null=True)


def test_pandas_kernel_in_series(spark, _clean):
    from grass_spark.operators.aggregate import series

    def geomean(s) -> float:
        return float(np.exp(np.log(s.to_numpy()).mean()))

    register_kernel("geomean", pandas_fn=geomean, spark=spark)
    t0 = datetime(2024, 3, 1)
    df = spark.createDataFrame(
        [("c1", t0 + timedelta(minutes=m), float(v))
         for m, v in [(0, 2.0), (10, 8.0)]],
        ["conv_id", "ts", "value"],
    )
    r = series(df, ["count", "geomean"]).collect()[0]
    assert r["count"] == 2 and r["geomean"] == pytest.approx(4.0)
    assert r["series_start"] == t0


def test_register_guard_rails(spark, _clean):
    with pytest.raises(ValueError, match="exactly one"):
        register_kernel("x", lambda v, i: "1", pandas_fn=lambda s: 0.0)
    with pytest.raises(ValueError, match="already registered"):
        register_kernel("average", lambda v, i: "avg(1)")
    with pytest.raises(ValueError, match="spark session"):
        register_kernel("y", pandas_fn=lambda s: 0.0)
    register_kernel("midrange", lambda v, i: f"min({v})")
    with pytest.raises(ValueError, match="already registered"):
        register_kernel("midrange", lambda v, i: f"max({v})")
    register_kernel("midrange", lambda v, i: f"max({v})", overwrite=True)
    unregister_kernel("midrange")
    with pytest.raises(ValueError, match="unknown kernel"):
        kernel_sql("midrange", "value")
    assert "midrange" not in CUSTOM_KERNELS
