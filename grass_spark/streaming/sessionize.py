"""Streaming sessionization — custom stateful operator via
``applyInPandasWithState``.

The batch form (:mod:`grass_spark.operators.sessionize`) is one window
pass; streaming needs per-key STATE carried across micro-batches: the
last event time and the running session index of every live key.  This
is the ``applyInPandasWithState`` pattern the engine uses for any
custom stateful operator (GRASS has no analog — batch-only reference).

State per key: (last_ts_us, session_idx).  A batch's rows are sorted by
event time inside the group (Arrow batch = whole group per trigger),
boundaries assigned against the carried state, and the state updated.

**Ingestion-order contract**: event-time order must hold ACROSS
micro-batches per key (within a batch the group is sorted here).  A
late row whose ts precedes the carried ``last_ts_us`` produces a
negative gap and is folded into the current session, diverging from the
batch ``sessionize`` result — no watermark bounds this operator because
``applyInPandasWithState`` exposes no per-row late-data drop.  Sources
that preserve per-key order (Kafka per-partition keyed by conv_id, the
file tailer this engine ships) satisfy the contract; for unordered
sources, buffer/reorder within a watermark horizon upstream
(window + sort per trigger) before this operator.
State TTL: production deployments would use an event-time timeout tied
to the watermark to expire idle keys; under Trigger.AvailableNow a
processing-time timeout schedules an extra never-draining timeout batch
(observed hang), so the drain entry point runs with NoTimeout — state
stays O(live keys) per retention window either way.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

STATE_SCHEMA = "last_ts_us long, session_idx long"
OUTPUT_SCHEMA = (
    "conv_id string, ts timestamp, turn_idx int, session_idx long"
)


def _sessionize_group(timeout_us: int):
    def fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        if state.exists:
            last_ts_us, session_idx = state.get
        else:
            last_ts_us, session_idx = None, -1
        out = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "turn_idx"], kind="mergesort")
            ts_us = pdf["ts"].to_numpy().astype("datetime64[us]").astype("int64")
            idxs = []
            for t in ts_us:  # iterates this batch's rows of ONE key
                if last_ts_us is None or t - last_ts_us > timeout_us:
                    session_idx += 1
                last_ts_us = int(t)
                idxs.append(session_idx)
            out.append(
                pd.DataFrame({
                    "conv_id": pdf["conv_id"].to_numpy(),
                    "ts": pdf["ts"].to_numpy(),
                    "turn_idx": pdf["turn_idx"].to_numpy(),
                    "session_idx": idxs,
                })
            )
        state.update((int(last_ts_us), int(session_idx)))
        for o in out:
            yield o

    return fn


def stream_sessionize(
    spark,
    input_path: str,
    timeout_s: int,
    *,
    raw_schema: str = "conv_id string, turn_idx int, role string, "
                      "text string, tool string, ts timestamp",
) -> DataFrame:
    """readStream -> stateful per-conversation sessionizer."""
    raw = (
        spark.readStream.schema(raw_schema)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_path)
    )
    return (
        raw.select("conv_id", "ts", "turn_idx")
        .groupBy("conv_id")
        .applyInPandasWithState(
            _sessionize_group(timeout_s * 1_000_000),
            outputStructType=OUTPUT_SCHEMA,
            stateStructType=STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def run_sessionize_once(
    spark, input_path: str, output_path: str, checkpoint: str, timeout_s: int
) -> None:
    q = (
        stream_sessionize(spark, input_path, timeout_s)
        .writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .format("parquet")
        .option("path", output_path)
        .start()
    )
    q.awaitTermination()
