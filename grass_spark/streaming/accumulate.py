"""Streaming accumulation — ``t.rast.accumulate`` as a stateful stream.

The batch operator (:mod:`grass_spark.operators.accumulate`) is one
window running-sum; a stream needs the accumulator carried across
micro-batches per key.  Same ``applyInPandasWithState`` pattern as
:mod:`grass_spark.streaming.sessionize`, same per-key event-time-order
ingestion contract (see that module's docstring — late rows fold into
whatever the accumulator currently holds).

State per key: (cycle_idx, acc) — the live cycle and its running
total.  Each trigger's rows are sorted by event time inside the group,
contributions computed vectorized (GDD: ``max(0, min(v, upper) -
lower)``; sum: ``v``), the accumulator reset whenever the row's cycle
index moves past the carried one, and the final (cycle_idx, acc)
written back.  Cycle indexing matches ``bucket_idx_col`` exactly:
calendar months/years by month arithmetic, everything else
fixed-width from ``origin`` — so a drained stream is row-identical to
the batch operator (asserted by tests/test_streaming.py).

Reference: ``temporal/t.rast.accumulate/t.rast.accumulate.py:24-146``
(cycle reset + GDD thresholds); the streaming form has no GRASS analog
(batch-only reference).
"""

from __future__ import annotations

from collections.abc import Iterator
from datetime import datetime

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from grass_spark.functions.granularity import (
    _UNIT_SECONDS,
    parse_granularity,
)

STATE_SCHEMA = "cycle_idx long, acc double"
OUTPUT_SCHEMA = (
    "conv_id string, ts timestamp, value double, cycle_idx long, acc double"
)


def _cycle_idx(ts: pd.Series, cycle: str | None, origin: datetime | None) -> np.ndarray:
    """Vectorized twin of ``bucket_idx_col`` (floor semantics)."""
    if cycle is None:
        return np.zeros(len(ts), dtype="int64")
    num, unit = parse_granularity(cycle)
    if unit == "month":
        mdiff = (ts.dt.year.to_numpy() - origin.year) * 12 + (
            ts.dt.month.to_numpy() - origin.month
        )
        return np.floor_divide(mdiff, num).astype("int64")
    if unit == "year":
        return np.floor_divide(ts.dt.year.to_numpy() - origin.year, num).astype("int64")
    width_us = num * _UNIT_SECONDS[unit] * 1_000_000
    ts_us = ts.to_numpy().astype("datetime64[us]").astype("int64")
    origin_us = np.datetime64(origin, "us").astype("int64")
    return np.floor_divide(ts_us - origin_us, width_us)


def _contrib(v: np.ndarray, lower, upper, method: str) -> np.ndarray:
    if method == "gdd":
        capped = np.minimum(v, float(upper)) if upper is not None else v
        base = float(lower) if lower is not None else 0.0
        return np.maximum(capped - base, 0.0)
    if method == "sum":
        return v.astype("float64")
    raise ValueError(f"unknown accumulate method {method!r} (gdd|sum)")


def _accumulate_group(
    cycle: str | None,
    origin: datetime | None,
    lower,
    upper,
    method: str,
):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        carried_cycle, carried_acc = state.get if state.exists else (None, 0.0)
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts"], kind="mergesort")
            cyc = _cycle_idx(pdf["ts"], cycle, origin)
            contrib = _contrib(pdf["value"].to_numpy(), lower, upper, method)
            # running sum with resets: cumsum per cycle group, then add
            # the carried total onto rows still in the carried cycle
            acc = (
                pd.Series(contrib).groupby(cyc).cumsum().to_numpy()
            )
            if carried_cycle is not None:
                acc = np.where(cyc == carried_cycle, acc + carried_acc, acc)
            carried_cycle = int(cyc[-1])
            carried_acc = float(acc[-1])
            yield pd.DataFrame({
                "conv_id": pdf["conv_id"].to_numpy(),
                "ts": pdf["ts"].to_numpy(),
                "value": pdf["value"].to_numpy(),
                "cycle_idx": cyc,
                "acc": acc,
            })
        state.update((carried_cycle, carried_acc))

    return fn


def stream_accumulate(
    spark,
    input_path: str,
    *,
    cycle: str | None = None,
    origin: datetime | None = None,
    lower: float | None = None,
    upper: float | None = None,
    method: str = "gdd",
    raw_schema: str = "conv_id string, ts timestamp, value double",
) -> DataFrame:
    """readStream -> stateful per-key running accumulation."""
    if cycle is not None and origin is None:
        raise ValueError("cycle requires an origin")
    raw = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_path)
    )
    return (
        raw.select("conv_id", "ts", "value")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _accumulate_group(cycle, origin, lower, upper, method),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_accumulate_once(
    spark,
    input_path: str,
    output_path: str,
    checkpoint: str,
    **kw,
) -> None:
    q = (
        stream_accumulate(spark, input_path, **kw)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", output_path)
        .start()
    )
    q.awaitTermination()
