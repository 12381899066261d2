"""Wave-54 operators: dow x hour heatmap lift
(engagement.heatmap_lift) and repeat-purchase behavior
(ltv.repeat_orders)."""

from __future__ import annotations

import datetime as dt

from grass_spark.operators.engagement import heatmap_lift
from grass_spark.operators.ltv import repeat_orders

T = dt.datetime


def _ev(spark, rows):
    return spark.createDataFrame(
        rows, "event_id bigint, ts timestamp, user_id bigint, "
        "event_type string"
    )


def test_heatmap_lift_closed_form(spark):
    # Mon 9h x2, Mon 10h x1, Tue 9h x1: N=4
    rows = [
        (0, T(2024, 1, 1, 9), 1, "a"), (1, T(2024, 1, 1, 9), 1, "a"),
        (2, T(2024, 1, 1, 10), 1, "a"),
        (3, T(2024, 1, 2, 9), 1, "a"),
    ]
    out = {(r.dow, r.hour): r for r in heatmap_lift(
        _ev(spark, rows)).collect()}
    # lift(Mon,9) = 2*4/(3*3); lift(Tue,9) = 1*4/(1*3)
    assert out[(0, 9)].n == 2
    assert out[(0, 9)].lift == round(8 / 9, 6)
    assert out[(1, 9)].lift == round(4 / 3, 6)
    assert out[(0, 10)].lift == round(4 / 3, 6)
    assert (1, 10) not in out    # unobserved cells absent by contract


def test_repeat_orders_rates_and_gaps(spark):
    orders = spark.createDataFrame(
        [
            (1, 10, T(2024, 1, 1)), (2, 10, T(2024, 1, 11)),
            (3, 10, T(2024, 1, 31)),                      # gaps 10, 20
            (4, 20, T(2024, 2, 1)),                       # one-shot
            (5, 30, T(2024, 3, 1)), (6, 30, T(2024, 3, 8)),  # gap 7
        ],
        "o_orderkey bigint, o_custkey bigint, o_orderdate timestamp",
    )
    customers = spark.createDataFrame(
        [(10, "AUTO"), (20, "AUTO"), (30, "HOUSE")],
        "c_custkey bigint, c_mktsegment string",
    )
    out = {r.segment: r for r in repeat_orders(
        orders, customers).collect()}
    auto = out["AUTO"]
    assert auto.n_customers == 2 and auto.n_repeat == 1
    assert auto.repeat_rate == 0.5
    assert auto.median_gap_days == 15.0   # median of {10, 20}
    house = out["HOUSE"]
    assert house.n_repeat == 1 and house.median_gap_days == 7.0
