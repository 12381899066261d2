"""Structured Streaming continuous aggregate vs the batch minute tier."""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.datagen import synth_transcripts
from grass_spark.functions.granularity import adjust_datetime_to_granularity
from grass_spark.operators.rollup import rollup_from_raw
from grass_spark.streaming.continuous import run_stream_once


def _batch_minute(raw):
    t0 = raw.agg(F.min("ts")).collect()[0][0]
    origin = adjust_datetime_to_granularity(t0, "1 minute")
    return rollup_from_raw(raw, "1 minute", origin, ["conv_id"])


def test_stream_matches_batch_for_closed_windows(spark, tmp_path):
    raw = synth_transcripts(spark, n_convs=20, avg_turns=30, seed=5).cache()
    in_dir = str(tmp_path / "in")
    raw.repartition(4).write.parquet(in_dir)

    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    run_stream_once(spark, in_dir, out, ckpt, watermark="0 seconds")

    streamed = spark.read.parquet(out)
    max_ts = raw.agg(F.max("ts")).collect()[0][0]
    batch = _batch_minute(raw).withColumn(
        "bucket_end", F.col("bucket_start") + F.expr("INTERVAL 1 MINUTE")
    )
    # append mode emits windows whose end <= final watermark (= max ts)
    closed = batch.filter(F.col("bucket_end") <= F.lit(max_ts))
    cols = ["conv_id", "bucket_start", "turn_cnt", "len_sum", "len_min", "len_max"]
    a, b = streamed.select(*cols), closed.select(*cols)
    assert a.exceptAll(b).count() == 0
    assert b.exceptAll(a).count() == 0
    assert a.count() > 0


def test_stream_incremental_drain_no_duplicates(spark, tmp_path):
    raw = synth_transcripts(spark, n_convs=10, avg_turns=20, seed=6).cache()
    in_dir = str(tmp_path / "in")
    raw.repartition(2).write.parquet(in_dir)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_stream_once(spark, in_dir, out, ckpt, watermark="0 seconds")
    n1 = spark.read.parquet(out).count()

    # append strictly-later data and drain again with the same checkpoint
    later = raw.withColumn("ts", F.col("ts") + F.expr("INTERVAL 60 DAYS"))
    later.repartition(2).write.mode("append").parquet(in_dir)
    run_stream_once(spark, in_dir, out, ckpt, watermark="0 seconds")
    streamed = spark.read.parquet(out)
    assert streamed.count() > n1
    dup = (
        streamed.groupBy("conv_id", "bucket_start").count().filter("count > 1").count()
    )
    assert dup == 0


def test_stream_watermark_drops_too_late_rows(spark, tmp_path):
    """A row arriving after the watermark has advanced past its event
    time is dropped from the aggregation (the documented
    streaming-only semantic — continuous.py module docstring)."""
    from datetime import datetime

    in_dir, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    mk = lambda ts, idx: [("c1", idx, "user", "hello", None, ts)]  # noqa: E731

    schema = ("conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    spark.createDataFrame(
        mk(datetime(2024, 1, 1, 0, 0, 30), 0)
        + mk(datetime(2024, 1, 1, 3, 0, 0), 1), schema
    ).write.parquet(in_dir)
    run_stream_once(spark, in_dir, out, ckpt, watermark="10 minutes")
    n1 = spark.read.parquet(out).count()   # 00:00 window closed by 03:00 wm

    # a 3-hour-late row for the already-closed 00:00 window + a fresh row
    spark.createDataFrame(
        mk(datetime(2024, 1, 1, 0, 0, 45), 2)
        + mk(datetime(2024, 1, 1, 6, 0, 0), 3), schema
    ).write.mode("append").parquet(in_dir)
    run_stream_once(spark, in_dir, out, ckpt, watermark="10 minutes")

    streamed = spark.read.parquet(out)
    first_window = streamed.filter(
        "bucket_start = TIMESTAMP '2024-01-01 00:00:00'"
    ).collect()
    # the late row was dropped: the closed window still counts 1 turn
    assert len(first_window) == 1 and first_window[0]["turn_cnt"] == 1
    assert streamed.count() > n1  # the fresh 03:00 window did emit


def test_stream_cascade_matches_batch_tiers(spark, tmp_path):
    """foreachBatch cascade: hour/day tiers re-aggregated per epoch
    equal the batch cascade over the same closed windows."""
    from grass_spark.operators.rollup import rollup_from_tier
    from grass_spark.streaming.continuous import run_stream_cascade

    raw = synth_transcripts(spark, n_convs=12, avg_turns=25, seed=9).cache()
    in_dir = str(tmp_path / "in")
    raw.repartition(3).write.parquet(in_dir)
    base, ckpt = str(tmp_path / "tiers"), str(tmp_path / "ckpt")
    run_stream_cascade(spark, in_dir, base, ckpt, watermark="0 seconds")

    max_ts = raw.agg(F.max("ts")).collect()[0][0]
    batch_min = _batch_minute(raw).withColumn(
        "bucket_end", F.col("bucket_start") + F.expr("INTERVAL 1 MINUTE")
    ).filter(F.col("bucket_end") <= F.lit(max_ts)).drop("bucket_end")

    got_min = spark.read.parquet(f"{base}/t1m").drop("d", "epoch", "bucket_end")
    cols = ["conv_id", "bucket_start", "turn_cnt", "len_sum", "len_min", "len_max"]
    assert got_min.select(*cols).exceptAll(batch_min.select(*cols)).count() == 0
    assert batch_min.select(*cols).exceptAll(got_min.select(*cols)).count() == 0

    # hour tier == batch rollup of the SAME closed minute set
    t0 = batch_min.agg(F.min("bucket_start")).collect()[0][0]
    want_hour = rollup_from_tier(
        batch_min, "1 hour", adjust_datetime_to_granularity(t0, "1 hour"),
        ["conv_id"],
    )
    got_hour = spark.read.parquet(f"{base}/t1h").drop("d")
    assert got_hour.select(*cols).exceptAll(want_hour.select(*cols)).count() == 0
    assert want_hour.select(*cols).exceptAll(got_hour.select(*cols)).count() == 0

    # day tier exists and aggregates the hour tier
    got_day = spark.read.parquet(f"{base}/t1d")
    assert got_day.count() > 0
    assert got_day.agg(F.sum("turn_cnt")).collect()[0][0] == \
        got_hour.agg(F.sum("turn_cnt")).collect()[0][0]
