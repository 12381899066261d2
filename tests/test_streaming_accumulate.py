"""Streaming accumulate: stream-vs-batch equality + cross-drain state.

The drained stream must be row-identical to the batch operator,
including when a micro-batch boundary lands mid-cycle (the carried
accumulator picks up exactly where the previous drain stopped).
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from grass_spark.operators.accumulate import accumulate
from grass_spark.streaming.accumulate import run_accumulate_once

ORIGIN = dt.datetime(2024, 3, 1)


def _mk_rows(n_per_conv: int = 48):
    rows = []
    for conv in ("c1", "c2"):
        for i in range(n_per_conv):
            ts = ORIGIN + dt.timedelta(hours=3 * i + (1 if conv == "c2" else 0))
            value = float((i * 7 + len(conv)) % 40)
            rows.append((conv, ts, value))
    return rows


def _batch(spark, rows, **kw):
    df = spark.createDataFrame(rows, "conv_id string, ts timestamp, value double")
    return (
        accumulate(df, keys=["conv_id"], **kw)
        .select("conv_id", "ts", "value", "cycle_idx", "acc")
        .orderBy("conv_id", "ts")
        .collect()
    )


def _stream(spark, rows, tmp_path, chunks=2, **kw):
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    per = len(rows) // chunks
    schema = "conv_id string, ts timestamp, value double"
    for c in range(chunks):
        chunk = rows[c * per:] if c == chunks - 1 else rows[c * per:(c + 1) * per]
        spark.createDataFrame(chunk, schema).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
        run_accumulate_once(spark, inp, out, ckpt, **kw)
    return (
        spark.read.parquet(out)
        .select("conv_id", "ts", "value", "cycle_idx", "acc")
        .orderBy("conv_id", "ts")
        .collect()
    )


def test_stream_accumulate_matches_batch_gdd_daily(spark, tmp_path):
    # rows arrive time-ordered per conv; chunk split lands mid-day so
    # the second drain must resume the carried accumulator
    rows = sorted(_mk_rows(), key=lambda r: (r[1], r[0]))
    kw = dict(cycle="1 day", origin=ORIGIN, lower=5.0, upper=30.0, method="gdd")
    assert _stream(spark, rows, tmp_path, chunks=2, **kw) == _batch(spark, rows, **kw)


def test_stream_accumulate_matches_batch_sum_no_cycle(spark, tmp_path):
    rows = sorted(_mk_rows(24), key=lambda r: (r[1], r[0]))
    kw = dict(method="sum")
    assert _stream(spark, rows, tmp_path, chunks=3, **kw) == _batch(spark, rows, **kw)


def test_stream_accumulate_monthly_cycle(spark, tmp_path):
    # 3-hour cadence over ~70 days crosses two month boundaries
    rows = []
    for i in range(560):
        rows.append(("c1", ORIGIN + dt.timedelta(hours=3 * i), float(i % 25)))
    kw = dict(cycle="1 month", origin=ORIGIN, lower=2.0, upper=20.0, method="gdd")
    got = _stream(spark, rows, tmp_path, chunks=2, **kw)
    assert got == _batch(spark, rows, **kw)
    # sanity: more than one cycle actually exercised
    assert len({r.cycle_idx for r in got}) >= 3
