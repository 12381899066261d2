"""Gorilla-style codec: numpy round-trips + Spark block operator."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from grass_spark.datagen import synth_transcripts
from grass_spark.functions import compress as C
from grass_spark.operators.blocks import (
    compress_blocks,
    compression_report,
    decompress_blocks,
)
from grass_spark.operators.rollup import rollup_from_raw
from grass_spark.functions.granularity import adjust_datetime_to_granularity


# ---------------- numpy codec ----------------


def test_ts_roundtrip_regular():
    ts = np.arange(0, 60_000_000 * 100, 60_000_000, dtype=np.int64) + 1_700_000_000_000_000
    assert np.array_equal(C.decode_timestamps(C.encode_timestamps(ts)), ts)


def test_ts_roundtrip_irregular():
    rng = np.random.default_rng(7)
    deltas = rng.integers(1, 10_000_000, 5000)
    ts = 1_700_000_000_000_000 + np.cumsum(deltas)
    assert np.array_equal(C.decode_timestamps(C.encode_timestamps(ts)), ts)


def test_ts_regular_compresses_hard():
    """Perfectly regular cadence -> all dods are 0 -> ~2 bits/value."""
    ts = np.arange(0, 60_000_000 * 10000, 60_000_000, dtype=np.int64)
    blob = C.encode_timestamps(ts)
    assert len(blob) < 10000  # vs 80000 raw bytes (>8x)


def test_float_roundtrip_bitexact():
    rng = np.random.default_rng(3)
    v = rng.normal(250.0, 2.0, 4096)
    v[17] = np.nan
    v[100] = np.inf
    v[101] = -0.0
    out = C.decode_floats(C.encode_floats(v))
    assert np.array_equal(v.view(np.uint64), out.view(np.uint64))  # bit-exact incl NaN


def test_float_constant_compresses():
    v = np.full(5000, 123.456)
    blob = C.encode_floats(v)
    assert len(blob) < 2500  # vs 40000 raw


def test_int_roundtrip():
    rng = np.random.default_rng(5)
    v = np.cumsum(rng.integers(-3, 4, 3000)).astype(np.int64)
    assert np.array_equal(C.decode_ints(C.encode_ints(v)), v)
    big = np.array([0, 2**62, -(2**62), 17], dtype=np.int64)
    assert np.array_equal(C.decode_ints(C.encode_ints(big)), big)


def test_empty_and_single():
    assert len(C.decode_timestamps(C.encode_timestamps(np.array([], dtype=np.int64)))) == 0
    one = np.array([1_700_000_000_000_000], dtype=np.int64)
    assert np.array_equal(C.decode_timestamps(C.encode_timestamps(one)), one)
    assert C.decode_floats(C.encode_floats(np.array([3.14])))[0] == 3.14


def test_validity_bitmap():
    m = np.array([True, False, True, True, False])
    assert np.array_equal(C.decode_validity(C.encode_validity(m), 5), m)


def test_bad_header_rejected():
    with pytest.raises(ValueError):
        C.decode_floats(b"\x00" * 16)


# ---------------- Spark block operator ----------------


@pytest.fixture(scope="module")
def tier(spark):
    raw = synth_transcripts(spark, n_convs=20, avg_turns=40, seed=3)
    t0 = raw.agg(F.min("ts")).collect()[0][0]
    origin = adjust_datetime_to_granularity(t0, "1 minute")
    t = rollup_from_raw(raw, "1 minute", origin, ["conv_id"]).withColumn(
        "len_avg", F.col("len_sum") / F.col("len_cnt")
    )
    return t.cache()


def test_block_roundtrip(spark, tier):
    blocks = compress_blocks(
        tier, ts_col="bucket_start",
        float_cols=["len_avg"], int_cols=["turn_cnt", "len_sum"],
    )
    back = decompress_blocks(
        blocks, ts_col="bucket_start",
        float_cols=["len_avg"], int_cols=["turn_cnt", "len_sum"],
    )
    orig = tier.select(
        "conv_id", "bucket_start",
        F.col("len_avg").cast("double"),
        F.col("turn_cnt").cast("double"),
        F.col("len_sum").cast("double"),
    )
    got = back.select(
        "conv_id", "bucket_start",
        F.col("len_avg").cast("double"),
        F.col("turn_cnt").cast("double"),
        F.col("len_sum").cast("double"),
    )
    assert orig.exceptAll(got).count() == 0
    assert got.exceptAll(orig).count() == 0


def test_block_compression_ratio(spark, tier):
    blocks = compress_blocks(
        tier, ts_col="bucket_start",
        float_cols=["len_avg"], int_cols=["turn_cnt", "len_sum"],
    )
    rep = compression_report(blocks).collect()[0]
    assert rep["n_points"] == tier.count()
    assert rep["ratio"] > 2.0, f"weak compression: {rep['ratio']}"


def test_block_one_per_conv_day(spark, tier):
    blocks = compress_blocks(
        tier, ts_col="bucket_start", int_cols=["turn_cnt"],
    )
    dup = (
        blocks.groupBy("conv_id", "block_start").count().filter("count > 1").count()
    )
    assert dup == 0


def test_int_decode_exact_above_2_53(spark):
    """ADVICE round-1: int64 values above 2^53 must restore bit-exactly
    (the decode path uses a masked Int64 carrier, not float64+NaN)."""
    from datetime import datetime, timedelta

    big = 2**60 + 12345
    rows = [
        ("c", datetime(2024, 1, 1) + timedelta(minutes=i), big + i)
        for i in range(5)
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, bucket_start timestamp, v bigint"
    )
    blocks = compress_blocks(df, ts_col="bucket_start", int_cols=["v"])
    back = decompress_blocks(blocks, ts_col="bucket_start", int_cols=["v"])
    got = sorted(r["v"] for r in back.collect())
    assert got == [big + i for i in range(5)]
