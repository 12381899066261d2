"""Wave-34 operators: blocked fuzzy record linkage (linkage.py) and
the exact prefix-filtered set-similarity self-join (setsim.py)."""

from __future__ import annotations

import itertools

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.linkage import blocked_fuzzy_pairs
from grass_spark.operators.setsim import setsim_pairs


# ------------------------------------------------------------ linkage
def _names(spark, rows):
    return spark.createDataFrame(rows, "id bigint, name string")


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(
                min(prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (ca != cb))
            )
        prev = cur
    return prev[-1]


def test_fuzzy_pairs_match_bruteforce_within_blocks(spark):
    rows = [
        (1, "smith john"),
        (2, "smith jon"),
        (3, "smith joan"),
        (4, "smyth john"),  # different block (prefix 3 = 'smy')
        (5, "doe jane"),
        (6, "doe janet"),
        (7, "doe jane"),  # exact dup of 5
    ]
    df = _names(spark, rows)
    out = blocked_fuzzy_pairs(
        df, id_col="id", name_col="name", block=3, max_dist=1
    ).collect()
    got = {(r.id_a, r.id_b): r.dist for r in out}
    want = {}
    for (ia, na), (ib, nb) in itertools.combinations(rows, 2):
        if na[:3] == nb[:3] and _lev(na, nb) <= 1:
            want[(ia, ib)] = _lev(na, nb)
    assert got == want
    assert (1, 4) not in got  # cross-block true match missed by design
    assert got[(5, 7)] == 0  # exact dup at distance 0


def test_fuzzy_pairs_block_expression_and_maxdist0(spark):
    rows = [(1, "abcd"), (2, "abce"), (3, "abcd"), (4, "xbcd")]
    df = _names(spark, rows)
    # length-band block: every name same length -> one block
    out = blocked_fuzzy_pairs(
        df,
        id_col="id",
        name_col="name",
        block=F.length("name"),
        max_dist=0,
    ).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(1, 3)}
    assert out[0].dist == 0


def test_fuzzy_pairs_max_block_guard_raises(spark):
    df = _names(spark, [(i, "same prefix %d" % i) for i in range(10)])
    with pytest.raises(ValueError, match="hottest block"):
        blocked_fuzzy_pairs(
            df, id_col="id", name_col="name", block=4, max_block=5
        )
    # under the bound it runs
    blocked_fuzzy_pairs(
        df, id_col="id", name_col="name", block=4, max_block=10
    ).collect()


def test_fuzzy_pairs_negative_maxdist_raises(spark):
    df = _names(spark, [(1, "a")])
    with pytest.raises(ValueError, match="max_dist"):
        blocked_fuzzy_pairs(df, id_col="id", name_col="name", block=1,
                            max_dist=-1)


def test_fuzzy_pairs_null_name_dropped(spark):
    df = spark.createDataFrame(
        [(1, "abc"), (2, None), (3, "abd")], "id bigint, name string"
    )
    out = blocked_fuzzy_pairs(
        df, id_col="id", name_col="name", block=2, max_dist=1
    ).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(1, 3)}


# ------------------------------------------------------------- setsim
def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id bigint, text string")


def _brute_pairs(rows, threshold):
    sets = {i: set(t.split()) for i, t in rows}
    want = {}
    for ia, ib in itertools.combinations(sorted(sets), 2):
        a, b = sets[ia], sets[ib]
        if not a or not b:
            continue
        inter = len(a & b)
        union = len(a | b)
        if inter / union >= threshold:
            want[(ia, ib)] = (inter, union)
    return want


SETSIM_ROWS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over a lazy dog"),  # near-dup of 1
    (3, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (4, "completely different content about spark joins"),
    (5, "completely different content about spark joins too"),
    (6, "singleton"),
    (7, "unrelated words nothing shared here at all ok"),
]


@pytest.mark.parametrize("threshold", [0.3, 0.5, 0.8, 1.0])
def test_setsim_matches_bruteforce(spark, threshold):
    out = setsim_pairs(
        _docs(spark, SETSIM_ROWS),
        id_col="doc_id",
        text_col="text",
        threshold=threshold,
        checkpoint=False,
    ).collect()
    got = {(r.id_a, r.id_b): (r.n_inter, r.n_union) for r in out}
    assert got == _brute_pairs(SETSIM_ROWS, threshold)
    for r in out:
        assert r.jaccard == round(r.n_inter / r.n_union, 6)


def test_setsim_exact_dup_jaccard_one(spark):
    out = setsim_pairs(
        _docs(spark, SETSIM_ROWS), threshold=1.0, checkpoint=False
    ).collect()
    assert {(r.id_a, r.id_b) for r in out} == {(1, 3)}
    assert out[0].jaccard == 1.0 and out[0].n_inter == out[0].n_union


def test_setsim_tokens_col_equals_text_path(spark):
    df = _docs(spark, SETSIM_ROWS).withColumn(
        "toks", F.filter(F.split("text", " "), lambda x: x != "")
    )
    a = setsim_pairs(
        df, id_col="doc_id", text_col="text", threshold=0.5,
        checkpoint=False,
    ).collect()
    b = setsim_pairs(
        df, id_col="doc_id", tokens_col="toks", threshold=0.5,
        checkpoint=False,
    ).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_setsim_duplicate_tokens_are_set_semantics(spark):
    rows = [(1, "a a a b"), (2, "a b b b")]
    out = setsim_pairs(
        _docs(spark, rows), threshold=0.9, checkpoint=False
    ).collect()
    assert len(out) == 1 and out[0].jaccard == 1.0


def test_setsim_threshold_validation(spark):
    df = _docs(spark, [(1, "a")])
    for bad in (0.0, -0.1, 1.5):
        with pytest.raises(ValueError, match="threshold"):
            setsim_pairs(df, threshold=bad)


def test_setsim_plan_has_no_cartesian(spark):
    plan = setsim_pairs(
        _docs(spark, SETSIM_ROWS), threshold=0.8, checkpoint=False
    )._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
