"""Market-basket association rules over event streams: support /
confidence / lift for ordered item pairs co-occurring in a basket
(default: the same user on the same calendar day).

Reference analog: the reference's temporal-topology census counts
co-occurrence of map pairs per Allen relation
(``t.topology``/``operators/sample.py`` in this repo); association
rules are the same pair-census question over basket membership instead
of interval overlap.

Scale notes:

* Event volume collapses in ONE distinct on (basket, item) — map-side
  combinable, a bot basket is absorbed in the partials.
* The pair census self-joins the DISTINCT membership frame on the
  basket key.  Per-basket fan-out is bounded by the ITEM VOCABULARY
  (``<= |items|^2`` rows per basket, like event_transitions' type
  matrix), never by event volume — the operator guards against
  high-cardinality item columns the same way.
* Metric divisions cast the exact integer counts to double in a fixed
  expression order (``pair * n / (cnt_a * cnt_b)``), so support /
  confidence / lift are bit-identical across engines and shuffle
  orders.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F

__all__ = ["association_rules"]

#: same guard as event_transitions: pair censuses only make sense over
#: small item vocabularies
_MAX_ITEMS = 10_000


def association_rules(
    df: DataFrame,
    *,
    item_col: str = "event_type",
    basket_cols: Sequence[str] | None = None,
    ts_col: str = "ts",
    user_col: str = "user_id",
    min_pair_count: int = 1,
    checkpoint: bool = True,
) -> DataFrame:
    """Ordered association rules ``antecedent -> consequent`` with
    exact support / confidence / lift.

    A basket is the distinct tuple of ``basket_cols`` (default:
    ``(user_col, calendar day of ts_col)``).  ``support`` = fraction
    of baskets containing both items, ``confidence`` = P(consequent |
    antecedent basket), ``lift`` = confidence / P(consequent).  Both
    orientations of each pair are emitted (confidence is
    directional).  Raises when the item vocabulary exceeds
    ``10_000`` (pair censuses need a bounded vocabulary — same
    contract as event_transitions).
    """
    if basket_cols is None:
        basket = F.struct(
            F.col(user_col).alias("u"),
            F.to_date(F.date_trunc("day", F.col(ts_col))).alias("d"),
        )
    else:
        basket = F.struct(*[F.col(c) for c in basket_cols])

    items = (
        df.select(basket.alias("_b"), F.col(item_col).alias("_i"))
        .distinct()
    )
    if checkpoint:  # consumed 4x (n_baskets, item census, join x2)
        items = items.localCheckpoint(eager=False)

    n_items = items.select("_i").distinct().limit(_MAX_ITEMS + 1).count()
    if n_items > _MAX_ITEMS:
        raise ValueError(
            f"association_rules: item vocabulary exceeds {_MAX_ITEMS}; "
            "pair censuses need a bounded item column"
        )

    # 1-row broadcast, keeps the plan lazy (no driver-side action)
    n_baskets = items.agg(F.countDistinct("_b").alias("_n"))

    item_counts = items.groupBy("_i").agg(
        F.count(F.lit(1)).alias("_c")
    )

    a = items.select(F.col("_b"), F.col("_i").alias("antecedent"))
    b = items.select(F.col("_b"), F.col("_i").alias("consequent"))
    pairs = (
        a.join(b, "_b")
        .where(F.col("antecedent") != F.col("consequent"))
        .groupBy("antecedent", "consequent")
        .agg(F.count(F.lit(1)).alias("pair_count"))
    )
    if min_pair_count > 1:
        pairs = pairs.where(F.col("pair_count") >= int(min_pair_count))

    ca = F.broadcast(
        item_counts.select(
            F.col("_i").alias("antecedent"), F.col("_c").alias("_ca")
        )
    )
    cb = F.broadcast(
        item_counts.select(
            F.col("_i").alias("consequent"), F.col("_c").alias("_cb")
        )
    )
    out = (
        pairs.join(ca, "antecedent")
        .join(cb, "consequent")
        .join(F.broadcast(n_baskets))
    )

    n = F.col("_n").cast("double")
    p = F.col("pair_count").cast("double")
    return out.select(
        "antecedent",
        "consequent",
        "pair_count",
        F.round(p / n, 6).alias("support"),
        F.round(p / F.col("_ca").cast("double"), 6).alias("confidence"),
        F.round(
            p * n
            / (F.col("_ca").cast("double") * F.col("_cb").cast("double")),
            6,
        ).alias("lift"),
    ).orderBy("antecedent", "consequent")
