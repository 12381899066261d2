"""layout="auto": RollupPipeline picks plain vs bucketed per store from
MEASURED day density (the decision rule BASELINE.md's write-cost matrix
derives: day-sparse -> plain, dense conversation-keyed days ->
bucketed), pins the choice, and records it with its evidence in the
manifest (round-3 VERDICT item #5).
"""

from __future__ import annotations

import json
import os

from pyspark.sql import functions as F

from grass_spark.operators.rollup import RollupPipeline


def _shaped_raw(spark, n_days: int, rows_per_day: int):
    """Deterministic raw transcripts with an exact (days, rows/day)
    shape — the layout decision's only inputs."""
    n = n_days * rows_per_day
    base = 1704067200  # 2024-01-01 UTC
    return (
        spark.range(n)
        .withColumn(
            "conv_id",
            F.concat(F.lit("c"), (F.col("id") % 50).cast("string")),
        )
        .withColumn(
            "ts",
            F.timestamp_seconds(
                F.lit(base)
                + (F.col("id") / rows_per_day).cast("long") * 86400
                + (F.col("id") % rows_per_day) % 86400
            ),
        )
        .withColumn("role", F.lit("user"))
        .withColumn("tool", F.lit(None).cast("string"))
        .withColumn("text", F.lit("hello world"))
        .drop("id")
    )


def _pin(base):
    with open(os.path.join(base, "_layout.json")) as f:
        return json.load(f)


def test_auto_picks_bucketed_on_dense_days(spark, tmp_path):
    base = str(tmp_path / "tiers")
    raw = _shaped_raw(spark, n_days=3, rows_per_day=20000)
    pipe = RollupPipeline(base, layout="auto", buckets=2)
    pipe.run(raw)
    assert pipe.layout == "bucketed"
    assert _pin(base) == {"layout": "bucketed", "buckets": 2}
    dec = pipe.manifest.get_meta("layout_decision")
    assert dec["layout"] == "bucketed" and dec["median_day_rows"] == 20000
    assert dec["buckets_t0"] == 2 and dec["n_days"] == 3
    # the written store really is bucketed: catalog table exists and a
    # keyed agg over it plans shuffle-free
    lower = pipe._read_tier_frame(spark, "t1m")
    agg = lower.groupBy("conv_id", "bucket_start").agg(F.sum("turn_cnt"))
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 0


def test_auto_picks_plain_on_sparse_days(spark, tmp_path):
    base = str(tmp_path / "tiers")
    raw = _shaped_raw(spark, n_days=30, rows_per_day=100)
    pipe = RollupPipeline(base, layout="auto", buckets=2)
    pipe.run(raw)
    assert pipe.layout == "plain"
    assert _pin(base) == {"layout": "plain"}
    dec = pipe.manifest.get_meta("layout_decision")
    assert dec["layout"] == "plain" and dec["median_day_rows"] == 100


def test_auto_adopts_existing_pin_without_redeciding(spark, tmp_path):
    """An existing store's layout is a fact — auto must adopt the pin
    even when the new input's density would decide differently."""
    base = str(tmp_path / "tiers")
    dense = _shaped_raw(spark, n_days=3, rows_per_day=20000)
    RollupPipeline(base, layout="auto", buckets=2).run(dense)
    # re-open with auto and feed day-sparse data: stays bucketed
    sparse = _shaped_raw(spark, n_days=30, rows_per_day=100)
    pipe2 = RollupPipeline(base, layout="auto", buckets=2)
    assert pipe2.layout == "bucketed"  # adopted in the constructor
    pipe2.run(sparse, incremental=True)
    assert _pin(base) == {"layout": "bucketed", "buckets": 2}


def test_auto_treats_legacy_prepin_store_as_plain(spark, tmp_path):
    base = str(tmp_path / "tiers")
    raw = _shaped_raw(spark, n_days=3, rows_per_day=20000)
    RollupPipeline(base).run(raw)
    os.remove(os.path.join(base, "_layout.json"))  # simulate pre-pin
    pipe = RollupPipeline(base, layout="auto", buckets=2)
    assert pipe.layout == "plain"
    assert _pin(base) == {"layout": "plain"}


def test_explicit_layout_overrides_density(spark, tmp_path):
    """auto is opt-in: an explicit layout wins regardless of shape."""
    base = str(tmp_path / "tiers")
    dense = _shaped_raw(spark, n_days=3, rows_per_day=20000)
    pipe = RollupPipeline(base, layout="plain")
    pipe.run(dense)
    assert pipe.layout == "plain" and _pin(base) == {"layout": "plain"}
