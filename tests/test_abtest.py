"""A/B assignment determinism and the pooled two-proportion z."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pytest

from grass_spark.operators.abtest import ab_test, assign_variant

SCHEMA = "event_id bigint, user_id bigint, ts timestamp, event_type string"


def _variant(uid, salt="ab", frac=0.5):
    u = int(hashlib.md5(f"{salt}:{uid}".encode()).hexdigest()[:8], 16) / 2**32
    return "B" if u < frac else "A"


def test_ab_matches_python_recompute(spark):
    rows = []
    eid = 0
    for u in range(1, 61):
        eid += 1
        rows.append((eid, u, dt.datetime(2024, 1, 1), "view"))
        if u % 3 == 0:
            eid += 1
            rows.append((eid, u, dt.datetime(2024, 1, 2), "purchase"))
    out = ab_test(spark.createDataFrame(rows, SCHEMA)).collect()[0]

    arms = {"A": [0, 0], "B": [0, 0]}  # [users, conversions]
    for u in range(1, 61):
        v = _variant(u)
        arms[v][0] += 1
        arms[v][1] += 1 if u % 3 == 0 else 0
    (n_a, c_a), (n_b, c_b) = arms["A"], arms["B"]
    assert (out.n_a, out.n_b, out.conv_a, out.conv_b) == (n_a, n_b, c_a, c_b)
    p_a, p_b = c_a / n_a, c_b / n_b
    pool = (c_a + c_b) / (n_a + n_b)
    se2 = pool * (1.0 - pool) * (1.0 / n_a + 1.0 / n_b)
    assert out.rate_a == pytest.approx(round(p_a, 6), abs=1e-9)
    assert out.lift == pytest.approx(round(p_b - p_a, 6), abs=1e-9)
    assert out.z == pytest.approx(
        round((p_b - p_a) / math.sqrt(se2), 6), abs=1e-9)


def test_ab_empty_arm_yields_nulls(spark):
    # treat_frac tiny: with 5 users the B arm is (almost surely) empty —
    # pick users verified to hash into A at frac=1e-9
    users = [u for u in range(1, 40) if _variant(u, frac=1e-9) == "A"][:5]
    rows = [(i, u, dt.datetime(2024, 1, 1), "purchase")
            for i, u in enumerate(users)]
    out = ab_test(
        spark.createDataFrame(rows, SCHEMA), treat_frac=1e-9
    ).collect()[0]
    assert out.n_b == 0 and out.rate_b is None
    assert out.lift is None and out.z is None


def test_ab_zero_variance_z_null(spark):
    # everyone converts: pooled variance is 0 -> z NULL, lift 0
    rows = [(u, u, dt.datetime(2024, 1, 1), "purchase")
            for u in range(1, 31)]
    out = ab_test(spark.createDataFrame(rows, SCHEMA)).collect()[0]
    assert out.conv_a == out.n_a and out.conv_b == out.n_b
    assert out.lift == 0.0 and out.z is None


def test_assign_variant_validation(spark):
    with pytest.raises(ValueError):
        assign_variant("u", treat_frac=0.0)
    with pytest.raises(ValueError):
        assign_variant("u", treat_frac=1.0)
