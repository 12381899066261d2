"""Sessionization: batch window form + streaming stateful form."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from grass_spark.datagen import synth_transcripts
from grass_spark.operators.sessionize import session_stats, sessionize


def test_sessionize_golden(spark):
    t0 = datetime(2024, 1, 1)
    rows = [
        ("a", t0, 0),
        ("a", t0 + timedelta(minutes=5), 1),
        ("a", t0 + timedelta(minutes=90), 2),   # gap > 30min -> new session
        ("a", t0 + timedelta(minutes=95), 3),
        ("b", t0, 0),
    ]
    df = spark.createDataFrame(rows, ["conv_id", "ts", "turn_idx"])
    out = sessionize(df, 30 * 60, order_cols=["turn_idx"])
    got = {(r["conv_id"], r["turn_idx"]): r["session_idx"] for r in out.collect()}
    assert got == {("a", 0): 0, ("a", 1): 0, ("a", 2): 1, ("a", 3): 1, ("b", 0): 0}
    stats = {
        (r["conv_id"], r["session_idx"]): r
        for r in session_stats(out).collect()
    }
    assert stats[("a", 0)]["n_events"] == 2
    assert stats[("a", 1)]["duration_s"] == 300.0
    assert stats[("b", 0)]["duration_s"] == 0.0


def test_stream_sessionize_matches_batch(spark, tmp_path):
    from grass_spark.streaming.sessionize import run_sessionize_once

    raw = synth_transcripts(spark, n_convs=12, avg_turns=40, seed=8).cache()
    in_dir = str(tmp_path / "in")
    raw.repartition(3).write.parquet(in_dir)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_sessionize_once(spark, in_dir, out, ckpt, timeout_s=120)

    streamed = spark.read.parquet(out)
    batch = sessionize(
        raw.select("conv_id", "ts", "turn_idx"), 120, order_cols=["turn_idx"]
    ).select("conv_id", "ts", "turn_idx", "session_idx")
    s = streamed.select("conv_id", "ts", "turn_idx", "session_idx")
    assert s.count() == raw.count()
    assert s.exceptAll(batch).count() == 0
    assert batch.exceptAll(s).count() == 0


def test_stream_sessionize_state_carries_across_drains(spark, tmp_path):
    """Second drain continues session numbering from carried state."""
    from grass_spark.streaming.sessionize import run_sessionize_once

    t0 = datetime(2024, 1, 1)
    first = spark.createDataFrame(
        [("c", 0, "user", "x", None, t0),
         ("c", 1, "user", "x", None, t0 + timedelta(seconds=30))],
        "conv_id string, turn_idx int, role string, text string, tool string, ts timestamp",
    )
    in_dir = str(tmp_path / "in")
    first.coalesce(1).write.parquet(in_dir)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    run_sessionize_once(spark, in_dir, out, ckpt, timeout_s=60)

    # next file: one row within the timeout of the last seen ts (same
    # session) and one far later (new session)
    second = spark.createDataFrame(
        [("c", 2, "user", "x", None, t0 + timedelta(seconds=60)),
         ("c", 3, "user", "x", None, t0 + timedelta(hours=5))],
        first.schema,
    )
    second.coalesce(1).write.mode("append").parquet(in_dir)
    run_sessionize_once(spark, in_dir, out, ckpt, timeout_s=60)

    got = {
        r["turn_idx"]: r["session_idx"]
        for r in spark.read.parquet(out).collect()
    }
    assert got == {0: 0, 1: 0, 2: 0, 3: 1}
