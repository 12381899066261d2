"""preference_pairs + upsample_epochs (operators/preference.py).

Election determinism, margin gating, skew-safe plan shape, and the
fractional-epoch hash contract.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.preference import preference_pairs, upsample_epochs
from grass_spark.operators.sampling import uniform_hash


def _completions(spark, rows):
    return spark.createDataFrame(
        rows, "prompt_id bigint, doc_id bigint, text string, score double"
    )


def test_preference_elects_best_and_worst(spark):
    df = _completions(
        spark,
        [
            (1, 10, "a", 0.9),
            (1, 11, "b", 0.1),
            (1, 12, "c", 0.5),
            (2, 20, "d", 0.7),
            (2, 21, "e", 0.3),
        ],
    )
    out = {
        r["prompt_id"]: r
        for r in preference_pairs(df).collect()
    }
    assert out[1]["chosen_id"] == 10 and out[1]["rejected_id"] == 11
    assert out[1]["margin"] == pytest.approx(0.8)
    assert out[1]["n_completions"] == 3
    assert out[2]["chosen_id"] == 20 and out[2]["rejected_id"] == 21


def test_preference_tie_breaks_on_id(spark):
    # equal rounded scores: chosen = larger id, rejected = smaller id
    df = _completions(spark, [(1, 10, "a", 0.5), (1, 11, "b", 0.5)])
    r = preference_pairs(df).collect()[0]
    assert r["chosen_id"] == 11 and r["rejected_id"] == 10
    assert r["margin"] == 0.0


def test_preference_min_margin_and_singletons_drop(spark):
    df = _completions(
        spark,
        [
            (1, 10, "a", 0.52),
            (1, 11, "b", 0.50),  # margin 0.02 < 0.1 -> drop
            (2, 20, "c", 0.9),  # singleton -> drop
            (3, 30, "d", 0.9),
            (3, 31, "e", 0.1),  # margin 0.8 -> keep
        ],
    )
    rows = preference_pairs(df, min_margin=0.1).collect()
    assert [r["prompt_id"] for r in rows] == [3]


def test_preference_rounds_scores_before_election(spark):
    # last-ulp score difference must NOT decide the election: both
    # round to 0.5, so the tie-break (id) wins.
    df = _completions(
        spark, [(1, 10, "a", 0.5 + 1e-12), (1, 11, "b", 0.5)]
    )
    r = preference_pairs(df).collect()[0]
    assert r["chosen_id"] == 11  # id tie-break, not the ulp


def test_preference_plan_partial_agg_no_window(spark):
    """Hot-prompt skew safety: the election must be a partial/final
    HashAggregate pair on the prompt key with NO Window node (same
    contract as the segment-dedup election, r4 verdict #1)."""
    df = _completions(spark, [(1, 10, "a", 0.9), (1, 11, "b", 0.1)])
    plan = (
        preference_pairs(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Window" not in plan
    # struct min/max plans as SortAggregate (not hash-able) — what
    # matters is the partial/final pair: map-side combine present.
    assert "partial_max" in plan and "partial_min" in plan
    assert plan.count("Aggregate") >= 2


def _docs(spark, n=40, sources=("s0", "s1")):
    rows = [(i, sources[i % len(sources)]) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id bigint, source string")


def test_upsample_integer_weight_repeats_exactly(spark):
    df = _docs(spark, 10, ("s0",))
    out = upsample_epochs(df, {"s0": 3.0}).collect()
    assert len(out) == 30
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    assert all(sorted(v) == [0, 1, 2] for v in per_doc.values())


def test_upsample_fractional_weight_hash_subset(spark):
    df = _docs(spark, 200, ("s0",))
    out = upsample_epochs(df, {"s0": 2.5}).collect()
    per_doc = {}
    for r in out:
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    # every doc gets epochs {0,1}; the third epoch is exactly the
    # hash < 0.5 subset
    hashes = {
        r["doc_id"]: r["h"]
        for r in df.select(
            "doc_id", uniform_hash(F.col("doc_id"), "epoch").alias("h")
        ).collect()
    }
    for d, eps in per_doc.items():
        expect = [0, 1, 2] if hashes[d] < 0.5 else [0, 1]
        assert sorted(eps) == expect
    n3 = sum(1 for v in per_doc.values() if len(v) == 3)
    assert 0 < n3 < 200  # the subset is non-trivial


def test_upsample_zero_weight_drops_default_applies(spark):
    df = _docs(spark, 20, ("s0", "s1"))
    out = upsample_epochs(df, {"s0": 0.0}, default_weight=1.0).collect()
    # s0 gone entirely; s1 (absent from the dict) keeps 1 epoch
    assert all(r["source"] == "s1" for r in out)
    assert len(out) == 10 and all(r["epoch"] == 0 for r in out)


def test_upsample_weights_dataframe_equals_dict(spark):
    df = _docs(spark, 30, ("s0", "s1"))
    wdf = spark.createDataFrame(
        [("s0", 2.5), ("s1", 0.4)], "source string, weight double"
    )
    a = sorted(
        (r["doc_id"], r["epoch"])
        for r in upsample_epochs(df, {"s0": 2.5, "s1": 0.4}).collect()
    )
    b = sorted(
        (r["doc_id"], r["epoch"]) for r in upsample_epochs(df, wdf).collect()
    )
    assert a == b


def test_upsample_negative_weight_raises(spark):
    df = _docs(spark, 4)
    with pytest.raises(ValueError):
        upsample_epochs(df, {"s0": -1.0})


def test_upsample_plan_no_shuffle(spark):
    """Stateless scan-stage contract: dict weights are a plan literal,
    explode + filter only — no Exchange anywhere."""
    df = _docs(spark, 8)
    plan = (
        upsample_epochs(df, {"s0": 2.5, "s1": 1.0})
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "Exchange" not in plan
    assert "Generate" in plan


# ---------------------------------------------------------------------
# length_batches (operators/pack.py)
# ---------------------------------------------------------------------

def _len_docs(spark):
    rows = [(i, "s%d" % (i % 2), (i * 7) % 23 + 1) for i in range(40)]
    return spark.createDataFrame(rows, "doc_id bigint, source string, n_tokens bigint")


def test_length_batches_groups_similar_lengths(spark):
    from grass_spark.operators.pack import length_batches

    out = length_batches(
        _len_docs(spark), 4, group_col="source"
    ).collect()
    by_batch = {}
    for r in out:
        by_batch.setdefault((r["source"], r["batch_idx"]), []).append(r)
    for rows in by_batch.values():
        mx = max(r["n_tokens"] for r in rows)
        assert all(r["padded_to"] == mx for r in rows)
        assert all(r["pad_waste"] == mx - r["n_tokens"] for r in rows)
        assert len(rows) <= 4
    # sorted batching: batch maxes are non-decreasing per group
    for src in ("s0", "s1"):
        maxes = [
            max(r["n_tokens"] for r in rows)
            for (s, b), rows in sorted(by_batch.items())
            if s == src
        ]
        assert maxes == sorted(maxes)


def test_length_batches_drop_partial(spark):
    from grass_spark.operators.pack import length_batches

    # 20 docs per source, batch 8 -> 2 full batches, 4-row tail dropped
    out = length_batches(
        _len_docs(spark), 8, group_col="source", drop_partial=True
    ).collect()
    assert len(out) == 32
    by_batch = {}
    for r in out:
        by_batch.setdefault((r["source"], r["batch_idx"]), []).append(r)
    assert all(len(v) == 8 for v in by_batch.values())


def test_length_batches_single_exchange(spark):
    """The (group, batch_idx) padded_to window must reuse the first
    window's HashPartitioning(group) — exactly ONE Exchange."""
    from grass_spark.operators.pack import length_batches

    plan = (
        length_batches(_len_docs(spark), 4, group_col="source")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1


def test_length_batches_global_warns(spark):
    import warnings as W

    from grass_spark.operators.pack import length_batches

    with W.catch_warnings(record=True) as caught:
        W.simplefilter("always")
        length_batches(_len_docs(spark), 4)
    assert any("ONE window partition" in str(c.message) for c in caught)
