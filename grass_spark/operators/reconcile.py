"""Cross-table total reconciliation: does each parent row's stored
total equal the sum of its detail rows?  The classic warehouse sanity
check (order header vs. line items, invoice vs. postings) — run after
every ingest, before anyone trusts a revenue number.

Reference analog: the reference's register-time consistency checks
(``python/grass/temporal/register.py`` map-vs-metadata validation),
lifted to parent/detail monetary containment.

Scale shape: one map-side-combinable ``groupBy(parent key)`` over the
detail table (a 10^5-line order collapses in the partial aggregate),
one equi-join against the parent projection, one global conditional
aggregate.  All money moves in exact integer cents (per-row half-up
rounding mirrored in both engines — the ``round(x*100)`` cent
discipline); diff sums stay in BIGINT (bounded by total corpus value
in cents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def reconcile_totals(
    parent: DataFrame,
    detail: DataFrame,
    *,
    parent_key: str,
    detail_key: str,
    total_expr,
    line_expr,
) -> DataFrame:
    """One row: ``(n_parents, n_no_detail, n_match, n_mismatch,
    max_abs_diff_cents, total_abs_diff_cents)``.

    ``total_expr`` / ``line_expr`` are Column expressions yielding the
    parent total and per-detail-row amount as DOUBLE currency; both
    are rounded to integer cents per row BEFORE summing, so the
    comparison is exact-integer.  Parents with no detail rows count in
    ``n_no_detail`` (not as mismatches — absence asserts nothing,
    the fk_orphans convention).
    """
    cents = lambda c: F.round(c * F.lit(100.0)).cast("long")  # noqa: E731
    det = detail.groupBy(F.col(detail_key).alias("_k")).agg(
        F.sum(cents(line_expr)).alias("_lc")
    )
    par = parent.select(
        F.col(parent_key).alias("_k"), cents(total_expr).alias("_tc")
    )
    j = par.join(det, "_k", "left")
    diff = F.abs(F.col("_tc") - F.col("_lc"))
    has = F.col("_lc").isNotNull()
    return j.agg(
        F.count(F.lit(1)).alias("n_parents"),
        F.sum(F.when(~has, 1).otherwise(0)).alias("n_no_detail"),
        F.sum(F.when(has & (diff == 0), 1).otherwise(0)).alias("n_match"),
        F.sum(F.when(has & (diff > 0), 1).otherwise(0)).alias("n_mismatch"),
        F.max(F.when(has, diff)).alias("max_abs_diff_cents"),
        F.coalesce(
            F.sum(F.when(has, diff)), F.lit(0).cast("long")
        ).alias("total_abs_diff_cents"),
    )
