"""Inter-annotator agreement: Cohen's kappa over two categorical label
columns — chance-corrected agreement between two labelers (or a model
vs. gold labels) on the same items.

Reference analog: the r.series "diversity"/mode census family
(``lib/stats``) — categorical census aggregation — composed into the
standard kappa identity (Cohen 1960, public domain statistics).

Scale shape
-----------
ONE corpus-sized stage: the ``groupBy(label_a, label_b)`` confusion
census (map-side combinable; hot label pairs absorb in the partial
aggregate).  The census result is label-cardinality-squared — tiny —
but it has three consumers (totals, row marginals, column marginals),
so it is lazily ``localCheckpoint``-ed or the corpus scan would
re-execute per consumer (the multi-consumer-census rule).  All products
run in DECIMAL(38,0) (marginal products reach ~10^24 at 10^12 items);
``po``/``pe``/``kappa`` are fixed double expressions over exact
integers — bit-identical across engines after ``round(., 6)``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def cohens_kappa(
    df: DataFrame,
    *,
    col_a: str,
    col_b: str,
    checkpoint: bool = True,
) -> DataFrame:
    """One row ``(n_items, n_agree, po, pe, kappa)``.

    Rows where either label is NULL are excluded (no judgement, no
    agreement).  ``po`` is observed agreement, ``pe`` the chance
    agreement implied by the two labelers' marginal distributions,
    ``kappa = (po - pe) / (1 - pe)`` computed exactly as
    ``(n*n_agree - sum_i r_i*c_i) / (n^2 - sum_i r_i*c_i)`` over exact
    integer counts; NULL when the denominator is exactly zero (both
    labelers constant on the same single class).
    """
    cen = (
        df.where(F.col(col_a).isNotNull() & F.col(col_b).isNotNull())
        .groupBy(F.col(col_a).alias("_a"), F.col(col_b).alias("_b"))
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    if checkpoint:
        cen = cen.localCheckpoint(eager=False)  # totals + 2 marginals

    tot = cen.agg(
        F.sum("_n").alias("n_items"),
        F.sum(F.when(F.col("_a") == F.col("_b"), F.col("_n"))
              .otherwise(F.lit(0))).alias("n_agree"),
    )
    ra = cen.groupBy("_a").agg(F.sum("_n").alias("_rn"))
    cb = cen.groupBy("_b").agg(F.sum("_n").alias("_cn"))
    pe = (
        ra.join(cb, ra["_a"] == cb["_b"])
        .agg(
            F.sum(
                F.col("_rn").cast("decimal(19,0)")
                * F.col("_cn").cast("decimal(19,0)")
            ).alias("_pes")
        )
    )

    nd = F.col("n_items").cast("decimal(19,0)")
    num = (nd * F.col("n_agree").cast("decimal(19,0)") - F.col("_pes"))
    den = (nd * nd - F.col("_pes"))
    return tot.crossJoin(F.broadcast(pe)).select(
        "n_items",
        "n_agree",
        F.round(
            F.col("n_agree").cast("double") / F.col("n_items").cast("double"),
            6,
        ).alias("po"),
        F.round(
            F.col("_pes").cast("double")
            / (F.col("n_items").cast("double")
               * F.col("n_items").cast("double")),
            6,
        ).alias("pe"),
        F.when(
            den != F.lit(0).cast("decimal(38,0)"),
            F.round(num.cast("double") / den.cast("double"), 6),
        ).alias("kappa"),
    )
