"""Wave-16 operators: table profiler, leakage-safe splits, n-gram
novelty."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.decontaminate import novelty_report
from grass_spark.operators.export import (
    content_splits,
    grouped_splits,
    split_assignments,
)
from grass_spark.operators.profile import profile_table


# ------------------------------------------------------------- profile
def test_profile_table_counts(spark):
    df = spark.createDataFrame(
        [(1, "a", None), (2, "b", 5.0), (3, "a", None), (4, None, 7.5)],
        "id bigint, cat string, num double",
    )
    out = {r.column: r for r in profile_table(df).collect()}
    assert set(out) == {"id", "cat", "num"}
    assert out["id"].n_rows == 4 and out["id"].n_nulls == 0
    assert out["id"].n_distinct == 4
    assert out["id"].min_val == "1" and out["id"].max_val == "4"
    assert out["cat"].n_nulls == 1 and out["cat"].n_distinct == 2
    assert out["cat"].min_val == "a" and out["cat"].max_val == "b"
    assert out["num"].n_nulls == 2 and out["num"].n_distinct == 2


def test_profile_table_all_null_column(spark):
    df = spark.createDataFrame([(1, None), (2, None)], "id bigint, x string")
    out = {r.column: r for r in profile_table(df, columns=["x"]).collect()}
    r = out["x"]
    assert r.n_rows == 2 and r.n_nulls == 2 and r.n_distinct == 0
    assert r.min_val is None and r.max_val is None


def test_profile_table_validates_columns(spark):
    df = spark.createDataFrame([(1,)], "id bigint")
    with pytest.raises(ValueError):
        profile_table(df, columns=["nope"])
    with pytest.raises(ValueError):
        profile_table(df, columns=[])


# -------------------------------------------------------------- splits
def test_grouped_splits_co_assign(spark):
    rows = [(i, f"g{i % 7}") for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id bigint, grp string")
    out = grouped_splits(
        df, {"train": 0.8, "val": 0.1, "test": 0.1}, group_col="grp"
    )
    per_group = (
        out.groupBy("grp").agg(F.countDistinct("split").alias("k")).collect()
    )
    assert all(r.k == 1 for r in per_group)


def test_content_splits_dups_co_assign_and_match_plain(spark):
    rows = [
        (1, "Same   Text here"),
        (2, "same text HERE"),  # normalizes identically to doc 1
        (3, "different entirely"),
    ]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = content_splits(df, {"train": 0.5, "test": 0.5}).collect()
    by_id = {r.doc_id: r for r in out}
    assert by_id[1].content_key == by_id[2].content_key
    assert by_id[1].split == by_id[2].split
    # the label equals split_assignments applied to the content key
    ref = {
        r.content_key: r.split
        for r in split_assignments(
            spark.createDataFrame(
                [(by_id[i].content_key,) for i in (1, 3)],
                "content_key string",
            ),
            {"train": 0.5, "test": 0.5},
            id_col="content_key",
        ).collect()
    }
    assert by_id[1].split == ref[by_id[1].content_key]
    assert by_id[3].split == ref[by_id[3].content_key]


# ------------------------------------------------------------- novelty
def test_novelty_verbatim_copy_scores_zero(spark):
    ref = spark.createDataFrame(
        [(100, "alpha beta gamma delta epsilon")], "doc_id bigint, text string"
    )
    corpus = spark.createDataFrame(
        [
            (1, "alpha beta gamma delta epsilon"),   # verbatim
            (2, "zeta eta theta iota kappa"),        # fully novel
            (3, "alpha beta gamma zeta eta theta"),  # half and half
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in novelty_report(corpus, ref, n=3).collect()}
    assert out[1].novelty == 0.0
    assert out[2].novelty == 1.0
    # doc 3: 4 positions; 'alpha beta gamma' hits -> 1 seen of 4
    assert out[3].n_shingles == 4 and out[3].n_seen == 1
    assert out[3].novelty == pytest.approx(0.75, abs=1e-9)


def test_novelty_short_doc_whole_text_rule(spark):
    ref = spark.createDataFrame([(9, "hi there")], "doc_id bigint, text string")
    corpus = spark.createDataFrame(
        [(1, "HI  there"), (2, "bye now")], "doc_id bigint, text string"
    )
    out = {r.doc_id: r for r in novelty_report(corpus, ref, n=3).collect()}
    # both are shorter than n: single whole-text position
    assert out[1].n_shingles == 1 and out[1].novelty == 0.0
    assert out[2].n_shingles == 1 and out[2].novelty == 1.0
