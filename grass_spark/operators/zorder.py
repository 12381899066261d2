"""Z-order (Morton) interleave key — the multi-dimensional clustering
primitive behind Delta/Iceberg ``OPTIMIZE ZORDER BY``: sorting a table
by the bit-interleave of several bounded integer columns co-locates
rows that are close in EVERY dimension, so min/max file statistics can
prune scans on any of the participating columns (not just the leading
sort key).

``zorder_key`` is a pure JVM expression tree — ``bits × n_cols``
shift/mask/or terms, zero shuffle, zero Python — producing the key a
writer would ``repartitionByRange`` + ``sortWithinPartitions`` on.
The engine's day-dir/bucketed rollup layout covers the time axis;
z-order is the layout answer when TWO OR MORE query dimensions matter
(e.g. day × user-bucket for per-user time-range scans).

Cross-engine parity: pure integer bit arithmetic, identical in any
engine; inputs are range-checked (negative or >= 2^bits raises rather
than silently aliasing two distant values onto one key).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["zorder_key", "with_zorder"]


def zorder_key(cols: list[Column], bits: int = 16) -> Column:
    """Morton interleave of ``cols`` (each a non-negative integer
    expression < 2**bits) into one long: bit ``i`` of column ``j``
    lands at position ``i * n_cols + j``.  ``bits * n_cols`` must fit
    a long (<= 63)."""
    n = len(cols)
    if n < 2:
        raise ValueError("zorder_key: need >= 2 columns")
    if bits < 1 or bits * n > 63:
        raise ValueError("zorder_key: bits * n_cols must be in [n, 63]")
    terms = []
    for j, c in enumerate(cols):
        cl = c.cast("long")
        for i in range(bits):
            terms.append(
                F.shiftleft(
                    F.shiftright(cl, i).bitwiseAND(F.lit(1)), i * n + j
                )
            )
    return reduce(lambda a, b: a.bitwiseOR(b), terms)


def with_zorder(
    df: DataFrame,
    cols: list[str],
    *,
    bits: int = 16,
    out_col: str = "z",
) -> DataFrame:
    """Append the z-order key of ``cols`` (validated in-range: any
    value outside [0, 2**bits) fails the job loudly via an
    ``assert_true`` guard instead of aliasing)."""
    guarded = []
    for name in cols:
        c = F.col(name).cast("long")
        ok = (c >= 0) & (c < F.lit(1 << bits)) | c.isNull()
        guarded.append(
            F.when(
                F.assert_true(
                    ok, f"zorder: {name} out of [0, 2^{bits})"
                ).isNull(),
                c,
            )
        )
    return df.withColumn(out_col, zorder_key(guarded, bits=bits))
