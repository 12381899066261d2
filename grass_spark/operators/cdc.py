"""Change-data-capture merge — apply an ordered insert/update/delete
log to a snapshot, the generic MERGE INTO primitive behind every
lakehouse upsert (Delta/Iceberg MERGE, Debezium → table sync).

Semantics: for every key, the change with the HIGHEST sequence number
wins; ``U``/``I`` replace the row's payload (upsert — an update to an
absent key inserts, the Debezium convention), ``D`` removes it; keys
without changes pass through untouched.

Scale shape: the change log reduces to one row per key via a
``max(struct(seq, ...))`` election — map-side combinable, a hot key
(the CDC failure mode: one entity updated millions of times) is
absorbed by partial aggregation, never windowed.  The snapshot takes
ONE shuffle join against the (usually much smaller) election result;
pass-through rows move only for the join on their own key.

Contract: ``(key, seq)`` pairs must be unique in the change log —
duplicate sequence numbers for a key make "latest" ambiguous; the
election breaks such ties on the op/payload struct order, which is
deterministic but arbitrary, so ``validate=True`` asserts uniqueness
(one combinable census over the LOG only).

Cross-engine parity: pure relational; the oracle is arg_max + joins.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["apply_cdc"]


def apply_cdc(
    snapshot: DataFrame,
    changes: DataFrame,
    on: str,
    *,
    seq_col: str = "seq",
    op_col: str = "op",
    validate: bool = False,
) -> DataFrame:
    """Apply ``changes`` (same payload columns as ``snapshot``, plus
    ``op_col`` in {'I','U','D'} and ``seq_col``) to ``snapshot``.
    Returns the merged table with the snapshot's schema."""
    payload = [c for c in snapshot.columns if c != on]
    extra = {op_col, seq_col, on} | set(payload)
    missing = extra - set(changes.columns)
    if missing:
        raise ValueError(f"apply_cdc: changes missing columns {missing}")
    if validate:
        dup = (
            changes.groupBy(on, seq_col)
            .agg(F.count(F.lit(1)).alias("_n"))
            .withColumn(
                "_chk",
                F.assert_true(
                    F.col("_n") == 1,
                    f"apply_cdc: duplicate ({on}, {seq_col}) in changes",
                ),
            )
            .where(F.col("_chk").isNull())
        )
        changes = changes.join(
            dup.select(on, seq_col), [on, seq_col], "left_semi"
        )
    latest = (
        changes.groupBy(on)
        .agg(
            F.max(
                F.struct(
                    F.col(seq_col).alias("_seq"),
                    F.col(op_col).alias("_op"),
                    *[F.col(c).alias(c) for c in payload],
                )
            ).alias("_w")
        )
        .select(
            on,
            F.col("_w._op").alias("_op"),
            *[F.col(f"_w.{c}").alias(c) for c in payload],
        )
        .localCheckpoint(eager=False)  # feeds anti-join + upsert rows
    )
    # plain (not broadcast) anti-join: a CDC backlog can touch most
    # keys, so the election result is not assumed small; AQE promotes
    # it to broadcast when it is.
    untouched = snapshot.join(latest.select(on), on, "left_anti")
    upserts = latest.where(F.col("_op") != "D").select(on, *payload)
    return untouched.unionByName(upserts)
