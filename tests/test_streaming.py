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
