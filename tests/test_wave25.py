"""Wave-25 operators: star-schema OLAP joins (TPC-H Q5/Q4/Q14/Q13/Q15
shapes) — semantics on tiny frames + plan contracts."""

from __future__ import annotations

import datetime as dt

from grass_spark.operators.starjoin import (
    customer_order_dist,
    order_priority_counts,
    promo_share,
    revenue_by_nation,
    top_suppliers,
)


def _ts(s):
    return dt.datetime.fromisoformat(s)


def _star(spark):
    region = spark.createDataFrame(
        [(0, "ASIA"), (1, "EUROPE")], "r_regionkey bigint, r_name string"
    )
    nation = spark.createDataFrame(
        [(10, "JAPAN", 0), (11, "CHINA", 0), (20, "FRANCE", 1)],
        "n_nationkey bigint, n_name string, n_regionkey bigint",
    )
    customer = spark.createDataFrame(
        [(1, 10), (2, 11), (3, 20), (4, 10)],
        "c_custkey bigint, c_nationkey bigint",
    )
    supplier = spark.createDataFrame(
        [(100, "Supp#100", 10), (101, "Supp#101", 11), (102, "Supp#102", 20)],
        "s_suppkey bigint, s_name string, s_nationkey bigint",
    )
    orders = spark.createDataFrame(
        [
            (1000, 1, _ts("1996-03-01"), "1-URGENT"),
            (1001, 2, _ts("1996-06-01"), "2-HIGH"),
            (1002, 3, _ts("1996-07-01"), "1-URGENT"),
            (1003, 1, _ts("1995-01-01"), "3-MEDIUM"),  # out of window
            (1004, 4, _ts("1996-02-01"), "1-URGENT"),
        ],
        "o_orderkey bigint, o_custkey bigint, o_orderdate timestamp,"
        " o_orderpriority string",
    )
    lineitem = spark.createDataFrame(
        [
            # orderkey, suppkey, partkey, price, disc, shipdate
            (1000, 100, 7, 1000.0, 0.10, _ts("1996-03-15")),  # JAPAN local
            (1000, 101, 8, 2000.0, 0.00, _ts("1996-03-20")),  # supp CHINA != cust JAPAN
            (1001, 101, 7, 500.0, 0.05, _ts("1996-06-02")),   # CHINA local
            (1002, 102, 8, 800.0, 0.00, _ts("1996-07-04")),   # FRANCE (not ASIA)
            (1003, 100, 7, 999.0, 0.00, _ts("1995-01-05")),   # out of window
            (1004, 100, 8, 100.0, 0.02, _ts("1996-02-01")),   # ship == orderdate (not late)
        ],
        "l_orderkey bigint, l_suppkey bigint, l_partkey bigint,"
        " l_extendedprice double, l_discount double, l_shipdate timestamp",
    )
    part = spark.createDataFrame(
        [(7, "PROMO"), (8, "STANDARD")], "p_partkey bigint, p_type string"
    )
    return region, nation, customer, supplier, orders, lineitem, part


def test_revenue_by_nation_local_supplier_and_window(spark):
    region, nation, customer, supplier, orders, lineitem, _ = _star(spark)
    out = revenue_by_nation(
        lineitem, orders, customer, supplier, nation, region,
        region_name="ASIA", date_lo="1996-01-01", date_hi="1997-01-01",
    ).collect()
    got = {r.n_name: r.revenue for r in out}
    # JAPAN: order 1000 line (1000, 10% off) == 900; line with CHINA supp
    # drops (non-local); order 1004 line (100, 2% off) == 98 -> 998.
    # CHINA: order 1001 (500, 5% off) == 475.  FRANCE region filtered.
    assert got == {"JAPAN": 998.0, "CHINA": 475.0}
    # sorted by revenue desc
    assert [r.n_name for r in out] == ["JAPAN", "CHINA"]


def test_revenue_by_nation_broadcasts_dims(spark):
    region, nation, customer, supplier, orders, lineitem, _ = _star(spark)
    plan = revenue_by_nation(
        lineitem, orders, customer, supplier, nation, region
    )._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "CartesianProduct" not in plan


def test_order_priority_counts_strictly_late_semi(spark):
    _, _, _, _, orders, lineitem, _ = _star(spark)
    out = order_priority_counts(
        orders, lineitem, date_lo="1996-01-01", date_hi="1996-12-31"
    ).collect()
    got = {r.o_orderpriority: r.order_count for r in out}
    # 1000 late (ships 03-15 > 03-01), 1001 late, 1002 late,
    # 1004 ships the same instant -> NOT late; 1003 out of window.
    assert got == {"1-URGENT": 2, "2-HIGH": 1}
    plan = order_priority_counts(orders, lineitem)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "LeftSemi" in plan


def test_promo_share_ratio(spark):
    _, _, _, _, _, lineitem, part = _star(spark)
    out = promo_share(lineitem, part).collect()
    by_m = {r.month.strftime("%Y-%m"): r for r in out}
    m = by_m["1996-03"]
    # part 7 is PROMO: 900 of (900 + 2000)
    assert m.promo_revenue == 900.0 and m.total_revenue == 2900.0
    assert abs(m.promo_pct - 100.0 * 900.0 / 2900.0) < 1e-6
    # a month with only STANDARD parts reports 0 promo share
    assert by_m["1996-07"].promo_pct == 0.0


def test_customer_order_dist_includes_zero_order_customers(spark):
    _, _, customer, _, orders, _, _ = _star(spark)
    cust5 = customer.union(
        customer.sparkSession.createDataFrame(
            [(5, 10)], "c_custkey bigint, c_nationkey bigint"
        )
    )
    out = customer_order_dist(cust5, orders).collect()
    got = {r.n_orders: r.n_customers for r in out}
    # cust 1 has 2 orders; 2, 3, 4 have 1 each; 5 has none
    assert got == {2: 1, 1: 3, 0: 1}


def test_top_suppliers_ties_all_emit(spark):
    _, _, _, supplier, _, lineitem, _ = _star(spark)
    # craft a tie: two suppliers with identical quarter revenue
    tie = lineitem.sparkSession.createDataFrame(
        [
            (1, 100, 0, 1000.0, 0.0, _ts("1996-02-01")),
            (2, 101, 0, 500.0, 0.0, _ts("1996-02-02")),
            (3, 101, 0, 500.0, 0.0, _ts("1996-02-03")),
            (4, 102, 0, 999.0, 0.0, _ts("1996-02-04")),
        ],
        "l_orderkey bigint, l_suppkey bigint, l_partkey bigint,"
        " l_extendedprice double, l_discount double, l_shipdate timestamp",
    )
    out = top_suppliers(
        tie, supplier, date_lo="1996-01-01", date_hi="1996-04-01"
    ).collect()
    assert [(r.s_suppkey, r.revenue) for r in out] == [
        (100, 1000.0),
        (101, 1000.0),
    ]
    # the max is resolved via a broadcast 1-row join, not a window
    plan = top_suppliers(tie, supplier)._jdf.queryExecution(
    ).executedPlan().toString()
    assert "Window" not in plan
