"""Streaming accumulation-pattern detection — ``t.rast.accdetect`` as a
stateful stream (round-2 VERDICT item #5).

The batch operator (:func:`grass_spark.operators.accumulate.accdetect`)
marks, per (conv, cycle): ``in_range``, ``occurrence`` (the cycle's
FIRST in-band timestamp, stamped on every row of the cycle) and the
``indicator`` (1 first in-band row, 3 last, 2 between, NULL outside —
``temporal/t.rast.accdetect/t.rast.accdetect.py:24-54``).

Why cycle-close emission, not one-row-lookahead: the indicator alone
would only need a single held row (a row's ``3`` is decided by whether
another in-band row follows), but ``occurrence`` is stamped on rows
that arrive BEFORE the first in-band row of their cycle — those are
unknowable until the band is first entered, and a cycle that never
enters the band emits NULL occurrence, unknowable until the cycle
ends.  So the streaming twin buffers the LIVE cycle per conversation
and emits each cycle in full, with exact batch semantics, the moment a
row from a later cycle proves it closed.  State is bounded by one
cycle's rows per live key — the same order as the sessionize session
state.

Contract (documented, pinned by tests): a conversation's FINAL cycle
stays in state at drain — an unbounded stream cannot know the cycle is
over.  Terminating producers have two exits: append a sentinel row in
a later cycle (one test does exactly that), or call
:func:`finalize_accdetect` after the last drain — the explicit
end-of-stream flush (round-3 VERDICT item #6), which emits every
conversation's live cycle batch-exactly (``run_accdetect_once(...,
finalize=True)`` composes the two).  The reference itself is
batch-only (SURVEY §2.10).  Same per-key event-time-order ingestion
contract as streaming/sessionize.py.
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from grass_spark.streaming.accumulate import _contrib, _cycle_idx

STATE_SCHEMA = (
    "cycle_idx long, acc double, "
    "buf_ts array<long>, buf_val array<double>, buf_acc array<double>"
)
OUTPUT_SCHEMA = (
    "conv_id string, ts timestamp, value double, cycle_idx long, "
    "acc double, in_range boolean, occurrence timestamp, indicator int"
)


def _finalize_cycle(
    conv_id: str,
    cyc: int,
    ts_us: np.ndarray,
    val: np.ndarray,
    acc: np.ndarray,
    rmin: float,
    rmax: float,
) -> pd.DataFrame:
    """Batch-exact detect columns for one CLOSED cycle (rows ts-sorted).

    Mirrors the batch CASE exactly, including its ts-equality form: the
    first/last markers compare timestamps, so duplicate-ts rows behave
    identically in both engines."""
    in_range = (acc >= rmin) & (acc <= rmax)
    ts = ts_us.astype("datetime64[us]")
    if in_range.any():
        first_ts = ts[in_range].min()
        last_ts = ts[in_range].max()
        occurrence = np.full(len(ts), first_ts)
        indicator = np.where(
            ~in_range,
            np.int64(-1),  # placeholder for NULL
            np.where(ts == first_ts, 1, np.where(ts == last_ts, 3, 2)),
        )
    else:
        occurrence = np.full(len(ts), np.datetime64("NaT", "us"))
        indicator = np.full(len(ts), -1, dtype="int64")
    return pd.DataFrame({
        "conv_id": conv_id,
        "ts": ts,
        "value": val,
        "cycle_idx": np.int64(cyc),
        "acc": acc,
        "in_range": in_range,
        "occurrence": occurrence,
        "indicator": pd.array(
            [None if i == -1 else int(i) for i in indicator], dtype="Int32"
        ),
    })


def _accdetect_group(
    cycle: str | None,
    origin: datetime | None,
    lower,
    upper,
    method: str,
    rmin: float,
    rmax: float,
):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        conv_id = key[0]
        if state.exists:
            live_cycle, live_acc, b_ts, b_val, b_acc = state.get
            b_ts = list(b_ts or [])
            b_val = list(b_val or [])
            b_acc = list(b_acc or [])
        else:
            live_cycle, live_acc = None, 0.0
            b_ts, b_val, b_acc = [], [], []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts"], kind="mergesort")
            cyc = _cycle_idx(pdf["ts"], cycle, origin)
            val = pdf["value"].to_numpy().astype("float64")
            contrib = _contrib(val, lower, upper, method)
            acc = pd.Series(contrib).groupby(cyc).cumsum().to_numpy()
            if live_cycle is not None:
                acc = np.where(cyc == live_cycle, acc + live_acc, acc)
            ts_us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")

            all_ts = np.concatenate([np.asarray(b_ts, dtype="int64"), ts_us])
            all_val = np.concatenate([np.asarray(b_val, dtype="float64"), val])
            all_acc = np.concatenate([np.asarray(b_acc, dtype="float64"), acc])
            all_cyc = np.concatenate([
                np.full(len(b_ts), live_cycle if live_cycle is not None else 0,
                        dtype="int64"),
                cyc,
            ])
            max_cyc = int(all_cyc[-1])
            closed = all_cyc < max_cyc
            for c in np.unique(all_cyc[closed]):
                m = all_cyc == c
                yield _finalize_cycle(
                    conv_id, int(c), all_ts[m], all_val[m], all_acc[m],
                    rmin, rmax,
                )
            live = all_cyc == max_cyc
            b_ts = all_ts[live].tolist()
            b_val = all_val[live].tolist()
            b_acc = all_acc[live].tolist()
            live_cycle = max_cyc
            live_acc = float(all_acc[live][-1])
        state.update((live_cycle, live_acc, b_ts, b_val, b_acc))

    return fn


def stream_accdetect(
    spark,
    input_path: str,
    range_min: float,
    range_max: float,
    *,
    cycle: str,
    origin: datetime,
    lower: float | None = None,
    upper: float | None = None,
    method: str = "gdd",
    raw_schema: str = "conv_id string, ts timestamp, value double",
) -> DataFrame:
    """readStream -> stateful accumulate + per-closed-cycle detection.

    Unlike ``stream_accumulate`` (where ``cycle=None`` is a meaningful
    single running total), detection EMITS per closed cycle — without a
    cycle nothing would ever close, the stream would emit zero rows and
    buffer every input row in state forever, so both ``cycle`` and
    ``origin`` are required here."""
    if cycle is None or origin is None:
        raise ValueError(
            "stream_accdetect requires cycle and origin: a cycle is the "
            "unit of emission (cycle=None would never emit and grow "
            "state unboundedly; use the batch accdetect for acyclic data)"
        )
    raw = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_path)
    )
    return (
        raw.select("conv_id", "ts", "value")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _accdetect_group(
                cycle, origin, lower, upper, method,
                float(range_min), float(range_max),
            ),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_accdetect_once(
    spark,
    input_path: str,
    output_path: str,
    checkpoint: str,
    range_min: float,
    range_max: float,
    finalize: bool = False,
    **kw,
) -> None:
    q = (
        stream_accdetect(spark, input_path, range_min, range_max, **kw)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", output_path)
        .start()
    )
    q.awaitTermination()
    if finalize:
        finalize_accdetect(
            spark, input_path, output_path, range_min, range_max,
            cycle=kw["cycle"], origin=kw["origin"],
            lower=kw.get("lower"), upper=kw.get("upper"),
            method=kw.get("method", "gdd"),
        )


def finalize_accdetect(
    spark,
    input_path: str,
    output_path: str,
    range_min: float,
    range_max: float,
    *,
    cycle: str,
    origin: datetime,
    lower: float | None = None,
    upper: float | None = None,
    method: str = "gdd",
) -> None:
    """End-of-stream flush: emit every conversation's FINAL (still-live)
    cycle batch-exactly and append it to the sink.

    A terminated stream means all data is on disk, and the only thing
    state still holds is each conversation's max cycle — every lower
    cycle was emitted at close.  acc/occurrence/indicator are all
    CYCLE-LOCAL (the accumulator resets at cycle start), so recomputing
    just those max-cycle rows with the batch operator reproduces
    exactly what the stream would have emitted had one more cycle
    arrived.  Call after the final drain; calling it mid-stream would
    emit a cycle that later input re-opens (same caveat as any
    end-of-stream sentinel).

    The flush lands in ``output_path + "_final"``, not the sink dir:
    the file sink's ``_spark_metadata`` log governs reads of its
    directory, so a batch append there would be invisible (and editing
    the log would forfeit the sink's exactly-once contract).  Writing
    the sibling with overwrite also makes the flush idempotent.  Read
    the combined result with :func:`read_accdetect`.
    """
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from grass_spark.functions.granularity import bucket_idx_col
    from grass_spark.operators.accumulate import accdetect, accumulate

    raw = (
        spark.read.parquet(input_path)
        .select("conv_id", F.col("ts").cast("timestamp").alias("ts"), "value")
    )
    w = Window.partitionBy("conv_id")
    cyc = bucket_idx_col(F.col("ts"), cycle, origin)
    live = (
        raw.withColumn("__cyc", cyc)
        .withColumn("__max", F.max("__cyc").over(w))
        .filter(F.col("__cyc") == F.col("__max"))
        .drop("__cyc", "__max")
    )
    acc = accumulate(
        live, keys=["conv_id"], cycle=cycle, origin=origin,
        lower=lower, upper=upper, method=method,
    )
    out = accdetect(acc, float(range_min), float(range_max), keys=["conv_id"])
    (
        out.select(
            "conv_id", "ts", "value",
            F.col("cycle_idx").cast("long").alias("cycle_idx"),
            F.col("acc").cast("double").alias("acc"),
            "in_range", "occurrence",
            F.col("indicator").cast("int").alias("indicator"),
        )
        .write.mode("overwrite").parquet(output_path + "_final")
    )


def read_accdetect(spark, output_path: str) -> DataFrame:
    """The complete detection output: the streamed sink (closed cycles,
    listed via its own ``_spark_metadata`` log — a batch append there
    would be invisible) plus the :func:`finalize_accdetect` flush of
    live cycles, if one exists."""
    import os

    out = spark.read.parquet(output_path)
    if os.path.isdir(output_path + "_final"):
        out = out.unionByName(spark.read.parquet(output_path + "_final"))
    return out
