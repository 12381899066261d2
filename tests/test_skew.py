"""Adversarial key skew: one conversation 1000x bigger than the rest.

The cascade's grouping keys include the bucket, so a pathological
conversation spreads across its time buckets instead of landing on one
reducer — assert that holds (per-task row bound), and that results stay
exact.  Companion to the LSH bucket-cap adversarial test
(test_trainingdata.py): this one covers the rollup path.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from grass_spark.datagen import synth_transcripts
from grass_spark.operators.rollup import rollup_from_raw

T0 = dt.datetime(2024, 1, 1)


def _skewed_raw(spark, normal_convs=50, hot_turns=60_000):
    normal = synth_transcripts(spark, n_convs=normal_convs, avg_turns=30, seed=5)
    # hot conversation built by explode (never a driver-side loop):
    # 60k turns at 1-minute cadence = ~41 days, ~1000x the normal size
    hot = (
        spark.range(1)
        .select(F.explode(F.sequence(F.lit(0), F.lit(hot_turns - 1))).alias("turn_idx"))
        .select(
            F.lit("conv-hot").alias("conv_id"),
            F.col("turn_idx").cast("int"),
            F.lit("user").alias("role"),
            F.lit("x " * 10).alias("text"),
            F.lit(None).cast("string").alias("tool"),
            (F.lit(T0).cast("timestamp")
             + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0),
                                  (F.col("turn_idx") * 60).cast("double"))).alias("ts"),
        )
    )
    return normal.unionByName(hot.select(*normal.columns))


def test_hot_conversation_spreads_across_buckets(spark):
    raw = _skewed_raw(spark)
    tier = rollup_from_raw(raw, "1 hour", T0, ["conv_id"]).persist()
    try:
        # exact despite skew
        total = tier.agg(F.sum("turn_cnt")).collect()[0][0]
        assert total == raw.count()
        # the hot conv's rows land in ~1000 distinct (conv, bucket)
        # groups, not one: the reducer-side max group is bounded by the
        # bucket width (60 rows/hour), not by conversation size
        hot = tier.where(F.col("conv_id") == "conv-hot")
        n_groups = hot.count()
        max_group = hot.agg(F.max("turn_cnt")).collect()[0][0]
        assert n_groups >= 900
        assert max_group <= 60
    finally:
        tier.unpersist()


def test_skewed_per_conv_totals_exact(spark):
    raw = _skewed_raw(spark, normal_convs=20, hot_turns=30_000)
    tier = rollup_from_raw(raw, "1 day", T0, ["conv_id"])
    per_conv = tier.groupBy("conv_id").agg(F.sum("turn_cnt").alias("n"))
    got = {r.conv_id: r.n for r in per_conv.collect()}
    want = {r.conv_id: r.n for r in raw.groupBy("conv_id").agg(F.count("*").alias("n")).collect()}
    assert got == want


def test_bucketed_pipeline_exact_under_skew(spark, tmp_path):
    """The native bucketed layout hashes conv_id into a FIXED bucket
    set, so the hot conversation owns one bucket file per day — results
    must stay exact and the tier re-aggregation shuffle-free
    (correctness twin of the bucketed.py 1000x-skew plan test, now on
    the pipeline-written layout)."""
    from grass_spark.operators.rollup import RollupPipeline

    raw = _skewed_raw(spark)
    pipe = RollupPipeline(
        str(tmp_path / "tiers"), layout="bucketed", buckets=8
    )
    pipe.run(raw, input_fingerprint="fp")
    t1d = pipe.read_tier(spark, "t1d")
    assert t1d.agg(F.sum("turn_cnt")).collect()[0][0] == raw.count()
    hot = t1d.where(F.col("conv_id") == "conv-hot")
    # the hot conv spans ~41 days of day buckets, one row each
    assert hot.count() >= 40
    assert hot.agg(F.max("turn_cnt")).collect()[0][0] <= 24 * 60
