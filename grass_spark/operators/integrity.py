"""Referential-integrity audit: orphan foreign keys across declared
parent/child relationships — the first thing a warehouse ingest
pipeline checks before joins silently drop (inner) or null-fill
(left) mismatched rows.

Reference analog: ``t.register``'s map-existence validation
(``python/grass/temporal/register.py`` — registering a map that is
not in the mapset is an error); lifted to declarative cross-table key
containment.

Scale shape
-----------
Per relationship the corpus-sized stages are two map-side-combinable
distinct-key censuses (child FK values with row counts, parent PK
values); the orphan check is a census-vs-census left-anti join on the
key — work is bounded by distinct key cardinality, never row count,
and a hot FK value (one customer with 10^9 orders) collapses into one
census row map-side.  NULL FKs are counted separately, not as orphans
(SQL three-valued semantics: a NULL FK asserts nothing).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def fk_orphans(
    relationships: list[tuple[str, DataFrame, str, DataFrame, str]],
) -> DataFrame:
    """One row per relationship: ``(relationship, n_rows, n_null,
    n_orphan_keys, n_orphan_rows, orphan_rate)``.

    Each spec is ``(name, child_df, fk_col, parent_df, pk_col)``.
    ``n_rows`` counts child rows with a non-NULL FK, ``n_orphan_rows``
    those whose FK matches no parent key, ``orphan_rate`` their ratio
    (6 dp; NULL when the child has no non-NULL FK rows).
    """
    if not relationships:
        raise ValueError("fk_orphans: at least one relationship required")
    outs = []
    for name, child, fk_col, parent, pk_col in relationships:
        cen = (
            child.where(F.col(fk_col).isNotNull())
            .groupBy(F.col(fk_col).alias("_k"))
            .agg(F.count(F.lit(1)).alias("_n"))
        )
        nulls = child.where(F.col(fk_col).isNull()).agg(
            F.count(F.lit(1)).alias("n_null")
        )
        pk = parent.select(F.col(pk_col).alias("_k")).distinct()
        orphans = cen.join(pk, "_k", "left_anti").agg(
            F.count(F.lit(1)).alias("n_orphan_keys"),
            F.coalesce(F.sum("_n"), F.lit(0).cast("long"))
            .alias("n_orphan_rows"),
        )
        totals = cen.agg(
            F.coalesce(F.sum("_n"), F.lit(0).cast("long")).alias("n_rows")
        )
        outs.append(
            totals.crossJoin(F.broadcast(nulls))
            .crossJoin(F.broadcast(orphans))
            .select(
                F.lit(name).alias("relationship"),
                "n_rows",
                "n_null",
                "n_orphan_keys",
                "n_orphan_rows",
                F.when(
                    F.col("n_rows") > 0,
                    F.round(
                        F.col("n_orphan_rows").cast("double")
                        / F.col("n_rows").cast("double"),
                        6,
                    ),
                ).alias("orphan_rate"),
            )
        )
    res = outs[0]
    for o in outs[1:]:
        res = res.unionByName(o)
    return res.orderBy("relationship")
