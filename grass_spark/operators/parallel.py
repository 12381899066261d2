"""Scale-adaptive scan-stage parallelism (optimization guide §2).

A parquet scan cannot split below a row-group boundary, so a small
input written as one row group runs its ENTIRE scan-stage pipeline
(project, explode, hash chains, partial aggregation) as a single task
no matter how many cores the session has.  ``spread`` widens such an
input with one cheap round-robin exchange; at real scale the input
already carries at least ``defaultParallelism`` partitions and the
call is a structural no-op (no exchange added), so the knob is
scale-adaptive by construction rather than tuned to local core
counts.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame

__all__ = ["spread", "stage_checkpoint"]

#: inputs below this many source bytes skip the multi-consumer
#: localCheckpoint (the checkpoint job + block writes cost more than
#: simply recomputing a map-side subtree this small).  Above it — or
#: when the source size is unknowable (non-file sources, already-
#: checkpointed upstreams) — the checkpoint fires, preserving the
#: multi-consumer-census discipline the 1M-doc soaks established.
def _checkpoint_bytes() -> int:
    # read per call so tests can monkeypatch the env knob
    return int(
        os.environ.get("SPARK_GRAFT_CHECKPOINT_BYTES", str(64 << 20))
    )


def _source_bytes(df: DataFrame) -> int | None:
    """Total size of the frame's file inputs, or None if unknown."""
    try:
        files = df.inputFiles()
    except Exception:
        return None
    if not files:
        return None
    total = 0
    for f in files:
        p = f[len("file:"):] if f.startswith("file:") else f
        if not os.path.exists(p):
            return None
        total += os.path.getsize(p)
    return total


def stage_checkpoint(df: DataFrame, *, eager: bool = False) -> DataFrame:
    """Scale-adaptive ``localCheckpoint``: materialize a frame that
    feeds multiple consumers ONLY when its file inputs exceed
    ``SPARK_GRAFT_CHECKPOINT_BYTES`` (default 64 MiB) or their size is
    unknown.  At soak scale the checkpoint prevents the multi-consumer
    re-execution the census discipline documents; at bench scale the
    checkpoint job itself dominates the subtree it would save — the
    threshold picks per input, not per deployment.  Set the env knob
    to 0 to force checkpointing everywhere (tests pin the checkpointed
    plan shape that way)."""
    if df.isStreaming:
        return df
    size = _source_bytes(df)
    if size is not None and size < _checkpoint_bytes():
        return df
    return df.localCheckpoint(eager=eager)


def spread(df: DataFrame, n: int | None = None) -> DataFrame:
    """Round-robin repartition ``df`` up to the session default
    parallelism (or ``n``) — only when it is currently narrower.

    Round-robin (keyless) repartition is deterministic under retry
    (Spark sorts within the input partition before redistributing,
    ``spark.sql.execution.sortBeforeRepartition``), so downstream
    exact aggregates are unaffected; callers remain responsible for
    the repo-wide discipline that double sums are either exact
    (DECIMAL / integer power sums) or rounded per contract.
    """
    if df.isStreaming:  # no partition probe on streaming frames;
        return df       # micro-batch parallelism is the source's job
    if os.environ.get("SPARK_GRAFT_SPREAD", "1") == "0":  # A/B switch
        return df
    sc = df.sparkSession.sparkContext
    target = int(n) if n else sc.defaultParallelism
    if target <= 1 or df.rdd.getNumPartitions() >= target:
        return df
    return df.repartition(target)
