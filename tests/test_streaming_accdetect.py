"""Streaming accdetect: stream-vs-batch equality on closed cycles.

The drained stream must be row-identical to the batch
accumulate+accdetect composition for every CLOSED cycle — including
when a micro-batch boundary lands inside a detection window (the band
entered before the drain, left after it).  The final cycle per conv
stays in state by contract (an unbounded stream cannot know it ended);
the tests append a sentinel row in a later cycle to close the real
data, then compare everything before the sentinel cycle.
"""

from __future__ import annotations

import datetime as dt

from grass_spark.operators.accumulate import accdetect, accumulate
from grass_spark.streaming.accdetect import read_accdetect, run_accdetect_once

ORIGIN = dt.datetime(2024, 3, 1)
SCHEMA = "conv_id string, ts timestamp, value double"
COLS = ["conv_id", "ts", "value", "cycle_idx", "acc",
        "in_range", "occurrence", "indicator"]


def _mk_rows(n_per_conv: int = 48):
    rows = []
    for conv in ("c1", "c2"):
        for i in range(n_per_conv):
            ts = ORIGIN + dt.timedelta(hours=3 * i + (1 if conv == "c2" else 0))
            value = float((i * 7 + len(conv)) % 40)
            rows.append((conv, ts, value))
    # sentinel far in the future: closes every real cycle on both convs
    for conv in ("c1", "c2"):
        rows.append((conv, ORIGIN + dt.timedelta(days=365), 0.0))
    return rows


def _batch(spark, rows, rmin, rmax, **kw):
    df = spark.createDataFrame(rows, SCHEMA)
    acc = accumulate(df, keys=["conv_id"], **kw)
    out = accdetect(acc, rmin, rmax, keys=["conv_id"])
    max_cyc = out.groupBy().max("cycle_idx").collect()[0][0]
    return (
        out.filter(out.cycle_idx < max_cyc)
        .select(*COLS).orderBy("conv_id", "ts").collect()
    )


def _stream(spark, rows, tmp_path, rmin, rmax, chunks=2, **kw):
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    per = len(rows) // chunks
    for c in range(chunks):
        chunk = rows[c * per:] if c == chunks - 1 else rows[c * per:(c + 1) * per]
        spark.createDataFrame(chunk, SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(inp)
        run_accdetect_once(spark, inp, out, ckpt, rmin, rmax, **kw)
    return (
        spark.read.parquet(out)
        .select(*COLS).orderBy("conv_id", "ts").collect()
    )


def test_stream_accdetect_matches_batch_gdd_daily(spark, tmp_path):
    """Chunk split lands mid-day, i.e. inside a detection window: the
    band is entered before the first drain ends and left after the
    second begins — the buffered live cycle must finalize correctly."""
    rows = sorted(_mk_rows(), key=lambda r: (r[1], r[0]))
    kw = dict(cycle="1 day", origin=ORIGIN, lower=5.0, upper=30.0, method="gdd")
    got = _stream(spark, rows, tmp_path, 10.0, 60.0, chunks=2, **kw)
    want = _batch(spark, rows, 10.0, 60.0, **kw)
    assert got == want
    # sanity: all three indicator codes and a NULL actually occur
    inds = {r.indicator for r in got}
    assert {1, 2, 3, None} <= inds


def test_stream_accdetect_band_never_entered(spark, tmp_path):
    """A cycle that never enters the band: NULL occurrence on every
    row, NULL indicator — only knowable at cycle close."""
    rows = sorted(_mk_rows(24), key=lambda r: (r[1], r[0]))
    kw = dict(cycle="1 day", origin=ORIGIN, lower=5.0, upper=30.0, method="gdd")
    got = _stream(spark, rows, tmp_path, 1e7, 2e7, chunks=3, **kw)
    want = _batch(spark, rows, 1e7, 2e7, **kw)
    assert got == want
    assert got and all(r.indicator is None and r.occurrence is None for r in got)


def test_stream_accdetect_monthly_cycles(spark, tmp_path):
    rows = [("c1", ORIGIN + dt.timedelta(hours=3 * i), float(i % 25))
            for i in range(560)]
    rows.append(("c1", ORIGIN + dt.timedelta(days=365), 0.0))
    rows.sort(key=lambda r: r[1])
    kw = dict(cycle="1 month", origin=ORIGIN, lower=2.0, upper=20.0,
              method="gdd")
    got = _stream(spark, rows, tmp_path, 100.0, 1500.0, chunks=2, **kw)
    want = _batch(spark, rows, 100.0, 1500.0, **kw)
    assert got == want
    assert len({r.cycle_idx for r in got}) >= 2


def test_final_cycle_stays_in_state(spark, tmp_path):
    """Without a sentinel the last cycle is NOT emitted — the documented
    streaming contract."""
    rows = [("c1", ORIGIN + dt.timedelta(hours=i), 10.0) for i in range(30)]
    kw = dict(cycle="1 day", origin=ORIGIN, method="sum")
    got = _stream(spark, rows, tmp_path, 0.0, 1e9, chunks=1, **kw)
    # 30 hourly rows span two days; only day 0 (24 rows) is closed
    assert len(got) == 24
    assert {r.cycle_idx for r in got} == {0}


def test_stream_accdetect_requires_cycle(spark):
    import pytest
    from grass_spark.streaming.accdetect import stream_accdetect

    with pytest.raises(ValueError, match="requires cycle"):
        stream_accdetect(spark, "/tmp/nope", 0.0, 1.0, cycle=None, origin=None)


def _batch_full(spark, rows, rmin, rmax, **kw):
    """Batch reference over ALL cycles (no sentinel trimming)."""
    df = spark.createDataFrame(rows, SCHEMA)
    acc = accumulate(df, keys=["conv_id"], **kw)
    return (
        accdetect(acc, rmin, rmax, keys=["conv_id"])
        .select(*COLS).orderBy("conv_id", "ts").collect()
    )


def test_finalize_emits_final_cycle_batch_exact(spark, tmp_path):
    """run_accdetect_once(finalize=True) after the last drain: the sink
    equals the FULL batch output — final live cycle included, no
    sentinel needed (round-3 VERDICT item #6)."""
    rows = sorted(
        [(conv, ORIGIN + dt.timedelta(hours=3 * i + (1 if conv == "c2" else 0)),
          float((i * 7 + len(conv)) % 40))
         for conv in ("c1", "c2") for i in range(48)],
        key=lambda r: (r[1], r[0]),
    )
    kw = dict(cycle="1 day", origin=ORIGIN, lower=5.0, upper=30.0, method="gdd")
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    per = len(rows) // 2
    spark.createDataFrame(rows[:per], SCHEMA).coalesce(1).write.mode(
        "append").parquet(inp)
    run_accdetect_once(spark, inp, out, ckpt, 10.0, 60.0, **kw)
    spark.createDataFrame(rows[per:], SCHEMA).coalesce(1).write.mode(
        "append").parquet(inp)
    run_accdetect_once(spark, inp, out, ckpt, 10.0, 60.0, finalize=True, **kw)
    got = read_accdetect(spark, out).select(*COLS).orderBy("conv_id", "ts").collect()
    want = _batch_full(spark, rows, 10.0, 60.0, **kw)
    assert got == want
    # the finalize really contributed: the max cycle is present
    assert max(r.cycle_idx for r in got) == max(r.cycle_idx for r in want)


def test_finalize_conv_with_single_live_cycle(spark, tmp_path):
    """A conversation whose ONLY cycle never closed (stream emitted
    nothing for it) is flushed whole by finalize."""
    rows = [("c1", ORIGIN + dt.timedelta(hours=i), 10.0) for i in range(10)]
    kw = dict(cycle="1 day", origin=ORIGIN, method="sum")
    inp, out, ckpt = (str(tmp_path / d) for d in ("in", "out", "ckpt"))
    spark.createDataFrame(rows, SCHEMA).coalesce(1).write.parquet(inp)
    run_accdetect_once(spark, inp, out, ckpt, 0.0, 1e9, finalize=True, **kw)
    got = read_accdetect(spark, out).select(*COLS).orderBy("conv_id", "ts").collect()
    want = _batch_full(spark, rows, 0.0, 1e9, **kw)
    assert got == want and len(got) == 10
