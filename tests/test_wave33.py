"""Wave-33 operators: difference-in-differences + CUPED means."""

from __future__ import annotations

import math

from grass_spark.operators.abtest import cuped_means, did_estimate


def _frame(spark, rows):
    return spark.createDataFrame(
        rows, "u bigint, g string, period string, value double"
    )


def test_did_hand_checked(spark):
    # T: pre mean 10, post mean 14 (+4); C: pre mean 5, post mean 7 (+2)
    rows = [
        (1, "treat", "pre", 8.0), (1, "treat", "pre", 12.0),
        (2, "treat", "post", 13.0), (2, "treat", "post", 15.0),
        (3, "ctrl", "pre", 4.0), (3, "ctrl", "pre", 6.0),
        (4, "ctrl", "post", 6.0), (4, "ctrl", "post", 8.0),
    ]
    r = did_estimate(
        _frame(spark, rows), group_col="g", period_col="period",
        value_col="value",
    ).collect()[0]
    assert r.n_treat_pre == 2 and r.n_ctrl_post == 2
    assert r.mean_treat_pre == 10.0 and r.mean_treat_post == 14.0
    assert r.mean_ctrl_pre == 5.0 and r.mean_ctrl_post == 7.0
    assert r.did == 2.0


def test_did_empty_cell_nulls(spark):
    rows = [
        (1, "treat", "pre", 10.0),
        (2, "treat", "post", 14.0),
        (3, "ctrl", "post", 7.0),
    ]
    r = did_estimate(
        _frame(spark, rows), group_col="g", period_col="period",
        value_col="value",
    ).collect()[0]
    assert r.n_ctrl_pre == 0
    assert r.mean_ctrl_pre is None and r.did is None
    assert r.mean_treat_post == 14.0


def test_cuped_matches_numpy_oracle(spark):
    # deterministic synthetic: Y correlated with pre-period X
    rows = []
    for u in range(40):
        g = "B" if u % 2 else "A"
        x = float(10 + (u * 7) % 23)
        y = x * 1.5 + (3.0 if g == "B" else 0.0) + float((u * 11) % 5)
        rows.append((u, g, "pre", x))
        rows.append((u, g, "post", y))
    out = {
        r.variant: r
        for r in cuped_means(
            _frame(spark, rows), user_col="u", group_col="g",
            period_col="period", value_col="value",
        ).collect()
    }
    xs = {u: 0.0 for u in range(40)}
    ys = {u: 0.0 for u in range(40)}
    for u, g, p, v in rows:
        (xs if p == "pre" else ys)[u] += v
    n = 40
    mx = sum(xs.values()) / n
    my_all = sum(ys.values()) / n
    cov = sum(xs[u] * ys[u] for u in range(n)) / n - mx * my_all
    var = sum(x * x for x in xs.values()) / n - mx * mx
    theta = cov / var
    for variant in ("A", "B"):
        us = [u for u in range(n) if (u % 2 == 1) == (variant == "B")]
        raw = sum(ys[u] for u in us) / len(us)
        adj = raw - theta * (sum(xs[u] for u in us) / len(us) - mx)
        r = out[variant]
        assert r.n_users == 20
        assert math.isclose(r.mean_post, raw, abs_tol=1e-4)
        assert math.isclose(r.mean_post_adj, adj, abs_tol=1e-4)
        assert math.isclose(r.theta, theta, abs_tol=1e-4)
    # CUPED shrinks the between-variant gap toward the true effect
    # only when X is balanced; here it must preserve the +3 lift
    lift = out["B"].mean_post_adj - out["A"].mean_post_adj
    assert 2.0 < lift < 4.5


def test_cuped_zero_variance_pre_falls_back(spark):
    rows = []
    for u in range(6):
        g = "B" if u % 2 else "A"
        rows.append((u, g, "pre", 5.0))  # constant X -> var 0
        rows.append((u, g, "post", float(u)))
    out = cuped_means(
        _frame(spark, rows), user_col="u", group_col="g",
        period_col="period", value_col="value",
    ).collect()
    for r in out:
        assert r.theta is None
        assert r.mean_post_adj == r.mean_post


def test_cuped_user_without_pre_rows_gets_zero_x(spark):
    rows = [
        (1, "A", "post", 10.0),          # no pre row -> X = 0
        (2, "A", "pre", 4.0), (2, "A", "post", 6.0),
        (3, "B", "pre", 2.0), (3, "B", "post", 8.0),
        (4, "B", "post", 12.0),
    ]
    out = {
        r.variant: r
        for r in cuped_means(
            _frame(spark, rows), user_col="u", group_col="g",
            period_col="period", value_col="value",
        ).collect()
    }
    assert out["A"].n_users == 2 and out["B"].n_users == 2
    assert out["A"].mean_post == 8.0 and out["B"].mean_post == 10.0
