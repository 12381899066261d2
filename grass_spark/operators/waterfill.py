"""Water-filling mixture solver: given per-source volumes and a global
token budget, find the unique cap level ``L`` with
``sum(min(S_i, L)) = budget`` — small sources keep everything, large
sources cap at ``L``.  This is the constrained version of
``corpus_mixture``'s free-rate sampling: the solver GUARANTEES the
budget while flattening the source distribution as little as possible
(the classic power-allocation identity, public-domain math).

Scale shape: ONE corpus-sized stage — the map-side-combinable
``groupBy(source)`` volume census.  The solve is a cumulative window
over the |sources| census rows (sources are bounded-cardinality by
construction); rates broadcast back trivially because they live ON
the census rows.  All token sums are exact BIGINT; ``L`` and the
rates are single double expressions over exact integers, round 6.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def waterfill_mixture(
    df: DataFrame,
    budget: int,
    *,
    source_col: str = "source",
    weight_expr=None,
) -> DataFrame:
    """Per-source allocation under a global budget:
    ``(source, n_tokens, keep_rate, alloc_tokens)``.

    ``weight_expr`` is a Column of per-row token weight (default 1 =
    row counts).  When total volume <= ``budget`` every rate is 1.0;
    otherwise sources with ``S_i <= L`` keep rate 1.0 and the rest get
    ``L / S_i`` (6 dp).  ``alloc_tokens = min(S_i, L)`` rounded 6 —
    the sum of allocations equals the budget up to rounding.
    """
    if budget <= 0:
        raise ValueError("waterfill_mixture: budget must be positive")
    w = F.lit(1).cast("long") if weight_expr is None else weight_expr
    cen = df.groupBy(F.col(source_col).alias("source")).agg(
        F.sum(w).alias("n_tokens")
    )
    # ascending cumulative census: cum = tokens of all strictly-smaller
    # (by (n_tokens, source)) sources; nb = sources at or above this one
    ws = Window.orderBy("n_tokens", "source")
    ranked = cen.select(
        "source",
        "n_tokens",
        F.coalesce(
            F.sum("n_tokens").over(
                ws.rowsBetween(Window.unboundedPreceding, -1)
            ),
            F.lit(0).cast("long"),
        ).alias("_cum"),
        (
            F.count(F.lit(1)).over(
                ws.rowsBetween(
                    Window.unboundedPreceding, Window.unboundedFollowing
                )
            )
            - F.row_number().over(ws)
            + 1
        ).alias("_nb"),
    )
    # the level lands in the segment of the SMALLEST source i that no
    # longer fits when everyone at-or-above it caps at S_i: there
    # sum(min(S_j, L)) = cum_i + nb_i * L = budget.  (Choosing the
    # largest FITTING source instead is off by one segment — caught by
    # the closed-form unit test; its cum/nb describe the level being
    # ABOVE that source's size.)  When the budget undercuts even the
    # smallest source, that source itself is the first non-fit and the
    # formula degenerates correctly to L = budget / n_sources.
    fits = F.col("_cum") + F.col("_nb") * F.col("n_tokens") <= F.lit(
        int(budget)
    )
    seg = ranked.where(~fits).orderBy("n_tokens", "source").limit(1)
    total = cen.agg(
        F.sum("n_tokens").alias("_tot"),
        F.count(F.lit(1)).alias("_ns"),
    )
    # all-fit (total <= budget): seg is empty; supply a placeholder
    # level (never consulted — the unconstrained flag short-circuits)
    # so the crossJoin keeps its rows
    level = (
        seg.select(
            (
                (F.lit(int(budget)) - F.col("_cum")).cast("double")
                / F.col("_nb").cast("double")
            ).alias("_level"),
            F.lit(1).alias("_pri"),
        )
        .unionByName(
            total.select(
                F.col("_tot").cast("double").alias("_level"),
                F.lit(0).alias("_pri"),
            )
        )
        .orderBy(F.desc("_pri"))
        .limit(1)
        .select("_level")
    )
    out = ranked.crossJoin(F.broadcast(level)).crossJoin(
        F.broadcast(total)
    )
    unconstrained = F.col("_tot") <= F.lit(int(budget))
    rate = F.when(
        unconstrained | (F.col("n_tokens").cast("double") <= F.col("_level")),
        F.lit(1.0),
    ).otherwise(
        F.col("_level") / F.col("n_tokens").cast("double")
    )
    alloc = F.when(
        unconstrained, F.col("n_tokens").cast("double")
    ).otherwise(
        F.least(F.col("n_tokens").cast("double"), F.col("_level"))
    )
    return out.select(
        "source",
        "n_tokens",
        F.round(rate, 6).alias("keep_rate"),
        F.round(alloc, 6).alias("alloc_tokens"),
    ).orderBy("source")
