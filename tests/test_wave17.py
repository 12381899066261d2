"""Wave-17 operators: chi-square independence, Mann-Whitney U."""

from __future__ import annotations

import pytest

from grass_spark.operators.stats import chi_square, mann_whitney


def test_chi_square_matches_scipy_free_hand_calc(spark):
    # classic 2x2: [[10, 20], [30, 5]]
    rows = (
        [("x", "p")] * 10 + [("x", "q")] * 20
        + [("y", "p")] * 30 + [("y", "q")] * 5
    )
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi_square(df, "a", "b").collect()[0]
    assert r.n == 65 and r.card_a == 2 and r.card_b == 2 and r.dof == 1
    # hand computation with the same rounding convention
    n = 65.0
    exp = {
        ("x", "p"): 30 * 40 / n, ("x", "q"): 30 * 25 / n,
        ("y", "p"): 35 * 40 / n, ("y", "q"): 35 * 25 / n,
    }
    obs = {("x", "p"): 10, ("x", "q"): 20, ("y", "p"): 30, ("y", "q"): 5}
    chi2 = round(
        sum(round((obs[k] - e) ** 2 / e, 6) for k, e in exp.items()), 6
    )
    assert r.chi2 == pytest.approx(chi2, abs=1e-9)
    assert r.cramers_v == pytest.approx(
        round((r.chi2 / 65.0) ** 0.5, 6), abs=1e-9
    )


def test_chi_square_zero_cells_counted(spark):
    # (y, q) never observed: the grid must still charge its expectation
    rows = [("x", "p")] * 4 + [("x", "q")] * 4 + [("y", "p")] * 4
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi_square(df, "a", "b").collect()[0]
    assert r.n == 12
    # expectation of the empty cell = 4*4/12
    assert r.chi2 > 0


def test_chi_square_independent_is_zero(spark):
    rows = []
    for a in ("x", "y"):
        for b in ("p", "q"):
            rows += [(a, b)] * 10
    df = spark.createDataFrame(rows, "a string, b string")
    r = chi_square(df, "a", "b").collect()[0]
    assert r.chi2 == 0.0 and r.cramers_v == 0.0


def test_chi_square_single_category_null_v(spark):
    df = spark.createDataFrame(
        [("x", "p"), ("x", "q")], "a string, b string"
    )
    r = chi_square(df, "a", "b").collect()[0]
    assert r.dof == 0 and r.cramers_v is None


def test_mann_whitney_matches_scipy_formula(spark):
    import numpy as np

    rng = np.random.default_rng(5)
    xa = rng.integers(0, 40, size=120).astype(float)
    xb = (rng.integers(0, 40, size=90) + 6).astype(float)  # shifted up
    a = spark.createDataFrame([(float(v),) for v in xa], "value double")
    b = spark.createDataFrame([(float(v),) for v in xb], "value double")
    r = mann_whitney(a, b).collect()[0]
    # reference: tie-averaged ranks via numpy
    allv = np.concatenate([xa, xb])
    order = np.argsort(allv, kind="stable")
    ranks = np.empty(len(allv))
    sv = allv[order]
    i = 0
    pos = 1
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        avg = (pos + (pos + (j - i) - 1)) / 2.0
        ranks[order[i:j]] = avg
        pos += j - i
        i = j
    ra = ranks[: len(xa)].sum()
    ua = ra - len(xa) * (len(xa) + 1) / 2.0
    assert r.u_a == pytest.approx(ua, abs=1e-9)
    assert r.u_b == pytest.approx(len(xa) * len(xb) - ua, abs=1e-9)
    # shifted-up b -> a loses most pairs -> strongly negative z
    assert r.z < -3


def test_mann_whitney_identical_samples(spark):
    a = spark.createDataFrame([(1.0,)] * 10, "value double")
    b = spark.createDataFrame([(1.0,)] * 7, "value double")
    r = mann_whitney(a, b).collect()[0]
    # all tied: U_a = U_b = n_a*n_b/2, variance 0 -> z NULL
    assert r.u_a == pytest.approx(35.0) and r.u_b == pytest.approx(35.0)
    assert r.z is None
