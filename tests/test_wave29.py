"""Wave-29 operators: expectations validator + PageRank."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.expectations import expect, validate
from grass_spark.operators.pagerank import pagerank


def test_expectations_counts_each_kind(spark):
    df = spark.createDataFrame(
        [
            (1, "O", 10.0, "1-URGENT"),
            (2, "O", -5.0, "9-BAD"),
            (2, "X", 20.0, "2-HIGH"),
            (None, "F", 99999.0, None),
        ],
        "k bigint, st string, price double, prio string",
    )
    rules = [
        expect("k_not_null", "k", "not_null"),
        expect("k_unique", "k", "unique"),
        expect("st_set", "st", "in_set", values=["O", "F"]),
        expect("price_range", "price", "range", lo=0.0, hi=1000.0),
        expect("prio_fmt", "prio", "regex", pattern="^[1-5]-"),
    ]
    out = {r.rule: r for r in validate(df, rules).collect()}
    assert out["k_not_null"].n_violations == 1
    assert out["k_unique"].n_violations == 1  # one extra copy of 2
    assert out["st_set"].n_violations == 1  # 'X'
    assert out["price_range"].n_violations == 2  # -5 and 99999
    assert out["prio_fmt"].n_violations == 1  # '9-BAD'; NULL skipped
    assert all(r.n_rows == 4 for r in out.values())
    assert not out["k_unique"].passed
    # single aggregate pass: no join, no window in the plan
    plan = validate(df, rules)._jdf.queryExecution().executedPlan(
    ).toString()
    assert "Join" not in plan and "Window" not in plan


def test_expectations_clean_table_passes(spark):
    df = spark.createDataFrame([(1,), (2,)], "k bigint")
    out = validate(df, [expect("u", "k", "unique")]).collect()
    assert out[0].passed and out[0].n_violations == 0


def test_expectations_rejects_bad_rules(spark):
    with pytest.raises(ValueError):
        expect("x", "c", "nope")
    with pytest.raises(ValueError):
        expect("x", "c", "in_set", values=[])
    with pytest.raises(ValueError):
        expect("x", "c", "range", lo=1)
    df = spark.createDataFrame([(1,)], "k bigint")
    with pytest.raises(ValueError):
        validate(df, [])
    with pytest.raises(ValueError):
        validate(df, [expect("a", "k", "not_null"),
                      expect("a", "k", "unique")])


# ----------------------------------------------------------- pagerank
def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_pagerank_uniform_on_symmetric_cycle(spark):
    # a 4-cycle is vertex-transitive: every node must rank 0.25
    cyc = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
    edges = _edges(spark, cyc + [(b, a) for a, b in cyc])
    out = pagerank(edges, iterations=5).collect()
    assert len(out) == 4
    assert all(abs(r.rank - 0.25) < 1e-9 for r in out)


def test_pagerank_hub_ranks_highest_and_mass_conserves(spark):
    # star: hub h connected to 4 leaves (undirected)
    star = [("h", f"l{i}") for i in range(4)]
    edges = _edges(spark, star + [(b, a) for a, b in star])
    out = {r.node: r.rank for r in pagerank(edges, iterations=10).collect()}
    assert all(out["h"] > out[f"l{i}"] for i in range(4))
    assert abs(sum(out.values()) - 1.0) < 1e-6


def test_pagerank_rejects_dangling_and_bad_args(spark):
    with pytest.raises(ValueError):
        pagerank(_edges(spark, [("a", "b")]), iterations=3).collect()
    ok = _edges(spark, [("a", "b"), ("b", "a")])
    with pytest.raises(ValueError):
        pagerank(ok, iterations=0)
    with pytest.raises(ValueError):
        pagerank(ok, damping=1.0)


def test_pagerank_deterministic_across_runs(spark):
    pairs = [(f"n{i}", f"n{(i * 7 + 3) % 20}") for i in range(20)]
    edges = _edges(spark, pairs + [(b, a) for a, b in pairs])
    r1 = sorted((r.node, r.rank) for r in pagerank(edges).collect())
    r2 = sorted((r.node, r.rank) for r in pagerank(edges).collect())
    assert r1 == r2
