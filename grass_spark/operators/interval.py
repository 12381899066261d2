"""General interval-overlap equi-join — "which of A's time ranges
intersect which of B's, per key" — the temporal-topology primitive
(GRASS t.sample / t.topology, temporal_extent.py overlap relations)
generalized to arbitrary interval frames: concurrent sessions,
incident-vs-deploy windows, ad exposure vs activity spans.

Intervals are HALF-OPEN ``[start, end)``; a and b overlap iff
``a_start < b_end AND b_start < a_end``.

Scale shape — never a banded/cross join: every interval explodes onto
the fixed-size time buckets it covers, both sides join on
``(keys…, bucket)`` (a plain equi-join Spark shuffles and AQE-skews
like any other), and each overlapping pair is emitted EXACTLY ONCE
without any distinct pass: a pair is reported only at the bucket
containing ``greatest(a_start, b_start)`` — that instant lies inside
both intervals whenever they overlap, so exactly one bucket wins
(map-side dedup; a ``distinct`` over pair duplicates would be a
second corpus-wide shuffle).  ``max_buckets`` guards degenerate
intervals with a PER-ROW ``raise_error`` (no extra counting action —
the guard rides the scan).

Cross-engine parity: bucket ids use NAIVE epoch micros
(``timestampdiff`` from the NTZ epoch — session-tz-proof, the
resample_locf lesson) and integer ``div`` (exact; post-1970
timestamps assumed, where trunc == floor); overlap bounds/durations
are exact interval arithmetic in micros.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_EPOCH = "TIMESTAMP_NTZ '1970-01-01 00:00:00'"


def _us(col: str) -> str:
    return (
        f"timestampdiff(MICROSECOND, {_EPOCH}, "
        f"CAST({col} AS TIMESTAMP_NTZ))"
    )


def interval_overlap_join(
    a: DataFrame,
    b: DataFrame,
    *,
    on: list[str] | None = None,
    a_start: str = "a_start",
    a_end: str = "a_end",
    b_start: str = "b_start",
    b_end: str = "b_end",
    bucket: str = "1 hour",
    max_buckets: int = 10_000,
) -> DataFrame:
    """All overlapping (a, b) interval pairs sharing the ``on`` keys.

    Returns every column of ``a`` and ``b`` (keys once) plus
    ``overlap_start``, ``overlap_end`` and ``overlap_us``.  Empty
    intervals (start >= end) never match.  ``bucket`` is
    ``'<n> <second|minute|hour|day>'``; pick it near the typical
    interval length — a row spanning ``max_buckets`` or more buckets
    raises at execution (use a coarser bucket).  Start/end column
    names must be distinct across the two sides, and non-key columns
    must not collide.
    """
    on = list(on or [])
    gran = _bucket_micros(bucket)
    names = {a_start, a_end, b_start, b_end}
    if len(names) != 4:
        raise ValueError("start/end column names must be distinct")
    clash = (set(a.columns) & set(b.columns)) - set(on)
    if clash:
        raise ValueError(f"non-key columns collide across sides: {sorted(clash)}")

    def buckets(df: DataFrame, s: str, e: str) -> DataFrame:
        b0 = f"({_us(s)} div {gran})"
        # end is EXCLUSIVE: the last covered bucket holds end - 1 us
        b1 = f"(({_us(e)} - 1) div {gran})"
        guard = (
            f"CASE WHEN {b1} - {b0} < {max_buckets} THEN {b1} "
            f"ELSE CAST(raise_error('interval spans >= {max_buckets} "
            f"buckets of {gran} us — use a coarser bucket') AS BIGINT) END"
        )
        return (
            df.where(F.col(s) < F.col(e))
            .withColumn(
                "_bk",
                F.explode(F.expr(f"sequence({b0}, {guard})")),
            )
        )

    ea = buckets(a, a_start, a_end)
    eb = buckets(b, b_start, b_end)
    cond = [ea["_bk"] == eb["_bk"]] + [ea[k] == eb[k] for k in on]
    j = ea.join(eb, cond)
    a_s, a_e = ea[a_start], ea[a_end]
    b_s, b_e = eb[b_start], eb[b_end]
    owner = F.expr(
        f"(timestampdiff(MICROSECOND, {_EPOCH}, "
        f"CAST(greatest({a_start}, {b_start}) AS TIMESTAMP_NTZ))"
        f" div {gran})"
    )
    out_cols = (
        [ea[k] for k in on]
        + [ea[c] for c in a.columns if c not in on]
        + [eb[c] for c in b.columns if c not in on]
    )
    return (
        j.where(a_s < b_e)
        .where(b_s < a_e)
        .where(ea["_bk"] == owner)  # exactly-once emission
        .select(
            *out_cols,
            F.greatest(a_s, b_s).alias("overlap_start"),
            F.least(a_e, b_e).alias("overlap_end"),
            F.expr(
                f"timestampdiff(MICROSECOND, "
                f"CAST(greatest({a_start}, {b_start}) AS TIMESTAMP_NTZ), "
                f"CAST(least({a_end}, {b_end}) AS TIMESTAMP_NTZ))"
            ).alias("overlap_us"),
        )
    )


def _bucket_micros(bucket: str) -> int:
    """Parse '<n> <unit>' into total micros."""
    parts = bucket.strip().split()
    if len(parts) != 2:
        raise ValueError(f"bucket must be '<n> <unit>', got {bucket!r}")
    n = int(parts[0])
    unit = parts[1].rstrip("s").lower()
    per = {
        "second": 1_000_000,
        "minute": 60_000_000,
        "hour": 3_600_000_000,
        "day": 86_400_000_000,
    }
    if unit not in per or n < 1:
        raise ValueError(f"unsupported bucket {bucket!r}")
    return n * per[unit]
