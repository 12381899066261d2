"""Wave-21 operators: trimmed/winsorized means, containment pairs,
ROLLUP report."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F

from grass_spark.operators.dedup import ngram_containment_pairs
from grass_spark.operators.olap import rollup_report
from grass_spark.operators.robust import trimmed_stats


# ----------------------------------------------------------------- trimmed


def _vals(spark, vals, group="g"):
    return spark.createDataFrame(
        [(group, float(v)) for v in vals], "source string, n_chars double"
    )


def test_trimmed_stats_matches_scipy_convention(spark):
    # n=10, trim 0.1 -> k=1: drop min and max once each
    vals = [1, 2, 3, 4, 5, 6, 7, 8, 9, 100]
    r = trimmed_stats(_vals(spark, vals), trim_frac=0.1).collect()[0]
    assert (r.n, r.k, r.n_kept) == (10, 1, 8)
    assert r.trimmed_mean == pytest.approx(sum(range(2, 10)) / 8, abs=1e-9)
    # winsorize: min->2, max->9
    assert r.lo_cut == 2.0 and r.hi_cut == 9.0
    assert r.winsor_mean == pytest.approx(
        (sum(range(2, 10)) + 2 + 9) / 10, abs=1e-9
    )


def test_trimmed_stats_ties_spread_across_cut(spark):
    # duplicates straddle the trim boundary: census overlap math must
    # drop exactly k occurrences, not k distinct values
    vals = [1, 1, 1, 5, 5, 5, 5, 9, 9, 9]  # k=1 at trim 0.1
    r = trimmed_stats(_vals(spark, vals), trim_frac=0.1).collect()[0]
    # drop one 1 and one 9 -> kept: 1,1,5,5,5,5,9,9
    assert r.trimmed_mean == pytest.approx((2 * 1 + 4 * 5 + 2 * 9) / 8)
    assert r.lo_cut == 1.0 and r.hi_cut == 9.0


def test_trimmed_stats_zero_trim_is_plain_mean(spark):
    vals = [10, 20, 30]
    r = trimmed_stats(_vals(spark, vals), trim_frac=0.0).collect()[0]
    assert r.k == 0 and r.trimmed_mean == 20.0 and r.winsor_mean == 20.0


def test_trimmed_stats_empty_band_null(spark):
    # n=2, trim 0.4 -> k=0 (floor 0.8); n=10 trim 0.45 -> k=4, kept 2
    r = trimmed_stats(
        _vals(spark, list(range(10))), trim_frac=0.45
    ).collect()[0]
    assert r.k == 4 and r.n_kept == 2
    assert r.trimmed_mean == pytest.approx((4 + 5) / 2)
    with pytest.raises(ValueError):
        trimmed_stats(_vals(spark, [1]), trim_frac=0.5)


def test_trimmed_stats_per_group_independent(spark):
    df = _vals(spark, range(10), "a").unionAll(_vals(spark, [7] * 5, "b"))
    out = {r.source: r for r in trimmed_stats(df, trim_frac=0.1).collect()}
    assert out["a"].k == 1 and out["b"].k == 0
    assert out["b"].trimmed_mean == 7.0


# ------------------------------------------------------------- containment


def test_containment_detects_subset_duplicate(spark):
    short = "alpha beta gamma delta epsilon"
    longd = short + " " + " ".join(f"w{k}" for k in range(40))
    docs = spark.createDataFrame(
        [(1, short), (2, longd)], "doc_id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = ngram_containment_pairs(docs, pairs).collect()[0]
    assert r.containment_a == 1.0  # doc 1 fully inside doc 2
    assert r.containment_b < 0.3  # but Jaccard-style symmetry is low
    assert r.jaccard < 0.3


def test_containment_empty_shingles_null(spark):
    # with_shingles never emits an empty set (short docs fall back to
    # the whole text) — the NULL guard covers caller-provided frames
    sh = spark.createDataFrame(
        [(1, []), (2, ["x y z"])],
        "doc_id long, sh_arr array<string>",
    )
    pairs = spark.createDataFrame([(1, 2)], "id_a long, id_b long")
    r = ngram_containment_pairs(None, pairs, shingles=sh).collect()[0]
    assert r.n_a == 0 and r.containment_a is None
    assert r.containment_b == 0.0


# ------------------------------------------------------------------ rollup


def test_rollup_levels_and_sums(spark):
    rows = [
        ("a", 1, 1.25), ("a", 1, 2.00), ("a", 2, 0.75), ("b", 1, 10.0),
    ]
    df = spark.createDataFrame(rows, "t string, d int, value double")
    out = rollup_report(df, ["t", "d"], value_col="value").collect()
    by_key = {(r.t, r.d, r.level): (r.n, r.value_sum) for r in out}
    assert by_key[("a", 1, 0)] == (2, 3.25)
    assert by_key[("a", None, 1)] == (3, 4.0)  # subtotal over d
    assert by_key[("b", None, 1)] == (1, 10.0)
    assert by_key[(None, None, 3)] == (4, 14.0)  # grand total
    assert len(out) == 3 + 2 + 1  # detail + per-t + total


def test_rollup_single_pass_plan(spark):
    # ROLLUP must compile to ONE Expand + one partial/final agg pair —
    # never one scan per level
    df = spark.createDataFrame([("a", 1, 1.0)], "t string, d int, value double")
    plan = (
        rollup_report(df, ["t", "d"], value_col="value")
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert plan.count("Expand") == 1
    assert "Union" not in plan


def test_rollup_requires_dims(spark):
    df = spark.createDataFrame([(1.0,)], "value double")
    with pytest.raises(ValueError):
        rollup_report(df, [], value_col="value")
