"""SCD Type-2 effective-dated dimension join — the warehouse pattern
for "which version of the dimension was true when this fact happened".

A slowly-changing-dimension table keeps one row per (key, validity
window); a fact row must join the version whose ``[valid_from,
valid_to)`` interval contains the fact timestamp.  ``asof_join``
answers the related-but-different "latest observation at or before t"
(no expiry); SCD-2 windows also EXPIRE, so an orphaned fact (no
version covers its timestamp) must surface, not silently match.

Scale shape: an equi-join on the dimension key with the interval
containment as a join-side predicate — the fact table shuffles once
on a uniform key; versions-per-key is small by SCD construction
(every version is a business change), so the per-key match fan-out is
bounded.  This deliberately does NOT band by time: banding pays when
the right side is corpus-sized per key (the asof/interval_join case),
not for a dimension with a handful of versions per key.

Contract: windows are half-open ``[from, to)`` and must be disjoint
per key — overlap would duplicate facts.  ``validate=True`` runs a
census assert (one map-side groupBy over the DIMENSION only) that
fails loudly on overlap instead of corrupting the join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["scd2_join"]


def scd2_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str,
    *,
    ts_col: str,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    how: str = "inner",
    validate: bool = False,
) -> DataFrame:
    """Join each fact row to the dim version effective at its
    ``ts_col`` (``from <= ts < to``).  ``how='left'`` keeps orphaned
    facts with NULL dim columns; ``'inner'`` drops them."""
    if how not in ("inner", "left"):
        raise ValueError(
            f"scd2_join: how must be 'inner' or 'left', got {how!r}"
        )
    d = dim
    if validate:
        # disjointness check: within each key, every window must start
        # at or after the previous window's end (sorted by from) and be
        # non-empty.  assert_true returns NULL on success — the
        # where() CONSUMES the column so Catalyst cannot prune the
        # assertion away (a dropped assert column is optimized out).
        # The window runs over the DIMENSION only (small by SCD
        # construction), never the fact side.
        w = Window.partitionBy(on).orderBy(from_col)
        d = (
            dim.withColumn("_prev_t", F.lag(to_col).over(w))
            .withColumn(
                "_chk",
                F.assert_true(
                    (F.col(from_col) < F.col(to_col))
                    & (
                        F.col("_prev_t").isNull()
                        | (F.col(from_col) >= F.col("_prev_t"))
                    ),
                    f"scd2_join: overlapping or empty {from_col}/"
                    f"{to_col} windows",
                ),
            )
            .where(F.col("_chk").isNull())
            .drop("_chk", "_prev_t")
        )
    cond = (
        (fact[on] == d[on])
        & (fact[ts_col] >= d[from_col])
        & (fact[ts_col] < d[to_col])
    )
    joined = fact.join(d, cond, how)
    # drop the dim's duplicate key column; keep the windows for audit
    return joined.drop(d[on])
