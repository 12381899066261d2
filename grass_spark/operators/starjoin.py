"""Star-schema OLAP join queries over the TPC-H-ish tables — the
classic warehouse shapes (TPC-H Q5/Q4/Q14/Q13/Q15) expressed
Spark-first.

These round out the engine's analytics surface with the multi-table
join patterns a 100-TB warehouse actually runs: a 5-way star join with
tiny broadcast dims (Q5), an EXISTS semi-join with a cross-table
predicate (Q4), a fact⋈dim ratio aggregate (Q14), a left-outer
distribution (Q13), and an argmax-vs-scalar join (Q15).

Scale shapes:

* Dimension tables join in size order: ``region``/``nation`` are
  broadcast literals (25/5 rows at any SF); ``customer``/``supplier``/
  ``part`` shuffle on their keys (at SF100k they are 10^10-row frames —
  never broadcast; AQE promotes them to broadcast automatically at
  small SF, which is exactly the right behavior at both ends).
* The fact table (``lineitem``) shuffles ONCE per equi-join on a
  uniformly distributed key (orderkey/partkey/suppkey) — no hot keys
  by construction of the schema.
* Every aggregate is map-side combinable (sums of exact integers,
  counts); group keys are low-cardinality (nation, month, priority).

Cross-engine parity: money values are 2-dp doubles, so revenue math
runs in EXACT INTEGER "scaled cents": ``cents = round(price*100)``,
``disc_pct = round(discount*100)`` and ``rev_scaled = cents * (100 -
disc_pct)`` (exact bigints; sums in DECIMAL(38,0) == DuckDB HUGEINT);
the single cast of an exact integer to double rounds identically in
both engines, so downstream ratios are bit-identical after round(6).
Reference analog: the reference's region-filtered map selections +
aggregation pipelines (temporal algebra select + t.rast.series), here
over a relational star instead of a time axis.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = [
    "revenue_by_nation",
    "order_priority_counts",
    "promo_share",
    "customer_order_dist",
    "top_suppliers",
]


def _rev_scaled() -> F.Column:
    """Exact-integer revenue in 1/10000 dollars:
    round(price*100) * (100 - round(discount*100))."""
    cents = F.round(F.col("l_extendedprice") * 100).cast("long")
    disc = F.round(F.col("l_discount") * 100).cast("long")
    return (cents * (F.lit(100) - disc)).cast("decimal(38,0)")


def _rev_dollars(sum_col: str) -> F.Column:
    return F.round(F.col(sum_col).cast("double") / F.lit(10000.0), 6)


def revenue_by_nation(
    lineitem: DataFrame,
    orders: DataFrame,
    customer: DataFrame,
    supplier: DataFrame,
    nation: DataFrame,
    region: DataFrame,
    *,
    region_name: str = "ASIA",
    date_lo: str = "1996-01-01",
    date_hi: str = "1997-01-01",
) -> DataFrame:
    """TPC-H Q5 shape: revenue per nation for one region and one order
    year, with the local-supplier constraint (supplier nation ==
    customer nation).  Returns ``(n_name, revenue)`` sorted by revenue
    desc.

    Plan: region⋈nation collapses to a broadcast literal frame; orders
    filters by date at the scan (predicate pushdown) before joining
    customer; lineitem joins orders on orderkey and supplier on
    suppkey; the nation equality is an equi-key of the final join.
    One map-side-combinable groupBy on a ≤25-row key.
    """
    nat = nation.join(
        F.broadcast(region.where(F.col("r_name") == region_name)),
        nation["n_regionkey"] == F.col("r_regionkey"),
    ).select("n_nationkey", "n_name")
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_hi).cast("timestamp"))
    ).select("o_orderkey", "o_custkey")
    cust = customer.join(
        F.broadcast(nat), customer["c_nationkey"] == F.col("n_nationkey")
    ).select("c_custkey", "c_nationkey", "n_name")
    supp = supplier.select("s_suppkey", "s_nationkey")
    joined = (
        lineitem.select("l_orderkey", "l_suppkey", _rev_scaled().alias("_r"))
        .join(ords, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supp,
            (F.col("l_suppkey") == F.col("s_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
    )
    return (
        joined.groupBy("n_name")
        .agg(F.sum("_r").alias("_sr"))
        .select("n_name", _rev_dollars("_sr").alias("revenue"))
        .orderBy(F.desc("revenue"), "n_name")
    )


def order_priority_counts(
    orders: DataFrame,
    lineitem: DataFrame,
    *,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q4 shape: orders per priority that have at least one line
    item shipped strictly after the order date (a late-shipping
    EXISTS), for one order quarter.  Returns ``(o_orderpriority,
    order_count)`` sorted by priority.

    Plan: a LEFT SEMI join — the fact side never duplicates, the
    cross-table predicate (``l_shipdate > o_orderdate``) rides the
    equi-join on orderkey; the quarter filter pushes to the orders
    scan.  Output is a 5-row groupBy.
    """
    ords = orders.where(
        (F.col("o_orderdate") >= F.lit(date_lo).cast("timestamp"))
        & (F.col("o_orderdate") < F.lit(date_hi).cast("timestamp"))
    ).select("o_orderkey", "o_orderdate", "o_orderpriority")
    li = lineitem.select("l_orderkey", "l_shipdate")
    hit = ords.join(
        li,
        (F.col("o_orderkey") == F.col("l_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return (
        hit.groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
        .orderBy("o_orderpriority")
    )


def promo_share(
    lineitem: DataFrame,
    part: DataFrame,
    *,
    promo_type: str = "PROMO",
) -> DataFrame:
    """TPC-H Q14 shape: per ship month, the percentage of revenue from
    promo-type parts.  Returns ``(month, promo_revenue, total_revenue,
    promo_pct)`` sorted by month.

    Plan: lineitem⋈part is a plain equi-join on partkey (part is
    column-pruned to (partkey, type); at small SF AQE broadcasts it, at
    warehouse SF it shuffles — both correct); the promo flag becomes a
    conditional exact-integer sum, so one groupBy on ~84 month keys
    carries both numerator and denominator.
    """
    li = lineitem.select(
        "l_partkey",
        F.date_trunc("month", F.col("l_shipdate").cast("timestamp")).alias(
            "month"
        ),
        _rev_scaled().alias("_r"),
    )
    pt = part.select("p_partkey", "p_type")
    j = li.join(pt, F.col("l_partkey") == F.col("p_partkey"))
    promo = F.when(F.col("p_type") == promo_type, F.col("_r")).otherwise(
        F.lit(0).cast("decimal(38,0)")
    )
    agg = j.groupBy("month").agg(
        F.sum(promo).alias("_pr"), F.sum("_r").alias("_tr")
    )
    return agg.select(
        "month",
        _rev_dollars("_pr").alias("promo_revenue"),
        _rev_dollars("_tr").alias("total_revenue"),
        F.round(
            F.lit(100.0)
            * F.col("_pr").cast("double")
            / F.col("_tr").cast("double"),
            6,
        ).alias("promo_pct"),
    ).orderBy("month")


def customer_order_dist(
    customer: DataFrame, orders: DataFrame
) -> DataFrame:
    """TPC-H Q13 shape: the distribution of orders-per-customer,
    INCLUDING zero-order customers.  Returns ``(n_orders, n_customers)``
    sorted by n_customers desc, n_orders desc.

    Plan: customer LEFT JOINs orders on custkey (both sides shuffle on
    the key — at warehouse SF neither broadcasts), a per-customer count
    (map-side combinable: custkey is unique on the left so the join
    fans out, never hot), then a second tiny groupBy on the count
    value.
    """
    per_cust = (
        customer.select("c_custkey")
        .join(
            orders.select("o_orderkey", "o_custkey"),
            F.col("c_custkey") == F.col("o_custkey"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
        .orderBy(F.desc("n_customers"), F.desc("n_orders"))
    )


def top_suppliers(
    lineitem: DataFrame,
    supplier: DataFrame,
    *,
    date_lo: str = "1996-01-01",
    date_hi: str = "1996-04-01",
) -> DataFrame:
    """TPC-H Q15 shape: the supplier(s) with maximum revenue in one
    ship quarter.  Returns ``(s_suppkey, s_name, revenue)`` sorted by
    suppkey (ties all emit — the reference Q15 contract).

    Plan: the quarter filter pushes to the lineitem scan; revenue per
    suppkey is one map-side-combinable groupBy; the global max is a
    1-row aggregate joined back via broadcast (never a global window);
    the supplier name joins onto the max-revenue rows only.
    """
    li = lineitem.where(
        (F.col("l_shipdate") >= F.lit(date_lo).cast("timestamp"))
        & (F.col("l_shipdate") < F.lit(date_hi).cast("timestamp"))
    ).select("l_suppkey", _rev_scaled().alias("_r"))
    rev = li.groupBy("l_suppkey").agg(F.sum("_r").alias("_sr"))
    mx = rev.agg(F.max("_sr").alias("_mx"))
    top = rev.join(F.broadcast(mx), F.col("_sr") == F.col("_mx")).select(
        "l_suppkey", "_sr"
    )
    return (
        top.join(
            supplier.select("s_suppkey", "s_name"),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .select(
            "s_suppkey", "s_name", _rev_dollars("_sr").alias("revenue")
        )
        .orderBy("s_suppkey")
    )
