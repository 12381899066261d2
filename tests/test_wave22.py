"""Wave-22 operators: RRF rank fusion, NDCG@k evaluation, Matryoshka
shortlist + exact re-rank, CUBE report."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from grass_spark.operators.fusion import ndcg_at_k, rrf_fuse
from grass_spark.operators.olap import cube_report
from grass_spark.operators.similarity import dot, l2norm, mrl_rerank


# ----------------------------------------------------------------- rrf


def _ranking(spark, rows):
    return spark.createDataFrame(
        rows, "query_id int, doc_id bigint, rank int"
    )


def test_rrf_fuse_hand_example(spark):
    a = _ranking(spark, [(1, 10, 1), (1, 11, 2), (1, 12, 3)])
    b = _ranking(spark, [(1, 13, 1), (1, 11, 2)])
    out = {
        r.doc_id: r
        for r in rrf_fuse([a, b], k_rrf=60, top_k=10).collect()
    }
    # doc 11 appears in both lists at rank 2: 1/62 + 1/62
    assert out[11].rrf_score == pytest.approx(
        round(2 / 62, 6), abs=1e-9
    )
    assert out[11].n_lists == 2 and out[11].best_rank == 2
    # winner is the double-listed doc despite never ranking first
    assert out[11].rank == 1
    # single-list docs at equal rank tie on score -> id tie-break
    assert out[10].rrf_score == out[13].rrf_score == round(1 / 61, 6)
    assert out[10].rank < out[13].rank


def test_rrf_fuse_top_k_and_validation(spark):
    a = _ranking(spark, [(1, i, i) for i in range(1, 30)])
    got = rrf_fuse([a], top_k=5).collect()
    assert len(got) == 5 and [r.rank for r in got] != []
    with pytest.raises(ValueError):
        rrf_fuse([])
    with pytest.raises(ValueError):
        rrf_fuse([a], k_rrf=0)


# ----------------------------------------------------------------- ndcg


def test_ndcg_perfect_and_partial(spark):
    # q1: perfect ranking of its 2 relevant items -> ndcg = 1
    # q2: relevant item at rank 3 of 3 -> dcg = 1/log2(4), idcg = 1
    # q3: nothing relevant in the corpus -> ndcg NULL
    ranked = spark.createDataFrame(
        [
            (1, 1, 1), (1, 2, 1), (1, 3, 0),
            (2, 1, 0), (2, 2, 0), (2, 3, 1),
            (3, 1, 0),
        ],
        "q_id int, rank int, rel int",
    )
    totals = spark.createDataFrame(
        [(1, 2), (2, 1), (3, 0)], "q_id int, n_rel int"
    )
    out = {r.q_id: r for r in ndcg_at_k(ranked, totals, k=10).collect()}
    assert out[1].ndcg == pytest.approx(1.0)
    assert out[2].dcg == pytest.approx(round(1 / math.log2(4), 6))
    assert out[2].idcg == pytest.approx(1.0)
    assert out[2].ndcg == pytest.approx(round(round(1 / math.log2(4), 6), 6))
    assert out[3].idcg is None and out[3].ndcg is None
    assert out[3].dcg == 0.0 and out[3].rel_at_k == 0


def test_ndcg_k_cutoff_and_idcg_truncation(spark):
    # 5 relevant in corpus but k=2: idcg uses min(k, n_rel) = 2 terms
    ranked = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 0), (1, 3, 1)], "q_id int, rank int, rel int"
    )
    totals = spark.createDataFrame([(1, 5)], "q_id int, n_rel int")
    r = ndcg_at_k(ranked, totals, k=2).collect()[0]
    # rank-3 rel excluded by the cutoff
    assert r.rel_at_k == 1
    assert r.idcg == pytest.approx(
        round(1 / math.log2(2) + 1 / math.log2(3), 6)
    )


# ----------------------------------------------------------------- mrl


def _emb_frame(spark, n=60, dims=32, seed=7):
    rng = np.random.default_rng(seed)
    # clustered vectors so truncated prefixes stay discriminative
    centers = rng.normal(size=(4, dims))
    rows = []
    for i in range(n):
        v = centers[i % 4] + 0.05 * rng.normal(size=dims)
        rows.append((i, [float(x) for x in v]))
    return spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")


def test_mrl_rerank_covers_bruteforce_when_shortlist_large(spark):
    emb = _emb_frame(spark)
    q = emb.filter(F.col("vec_id") < 2)
    # shortlist == corpus: the cascade MUST equal brute force exactly
    got = mrl_rerank(emb, q, trunc_dims=8, shortlist=59, k=5)
    sim = F.round(dot("qe", "e") / (l2norm("qe") * l2norm("e")), 6)
    pairs = (
        F.broadcast(
            q.select(F.col("vec_id").alias("q_id"), F.col("embedding").alias("qe"))
        )
        .crossJoin(emb.select(F.col("vec_id").alias("nid"), F.col("embedding").alias("e")))
        .filter(F.col("nid") != F.col("q_id"))
        .select("q_id", "nid", sim.alias("cosine"))
    )
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("nid"))
    brute = (
        pairs.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
    )
    g = {(r.q_id, r.rank): (r.neighbor_id, r.cosine) for r in got.collect()}
    b = {(r.q_id, r.rank): (r.nid, r.cosine) for r in brute.collect()}
    assert g == b


def test_mrl_shortlist_recall_on_clustered_vectors(spark):
    # tight clusters: an 8-dim prefix shortlist of 20 must recover the
    # full-dim top-5 (same-cluster neighbors dominate both metrics)
    emb = _emb_frame(spark)
    q = emb.filter(F.col("vec_id") < 2)
    casc = mrl_rerank(emb, q, trunc_dims=8, shortlist=20, k=5)
    exact = mrl_rerank(emb, q, trunc_dims=32, shortlist=59, k=5)
    c = {(r.q_id, r.rank): r.neighbor_id for r in casc.collect()}
    e = {(r.q_id, r.rank): r.neighbor_id for r in exact.collect()}
    assert c == e


def test_mrl_validation(spark):
    emb = _emb_frame(spark, n=10)
    with pytest.raises(ValueError):
        mrl_rerank(emb, emb, trunc_dims=0, shortlist=5, k=3)
    with pytest.raises(ValueError):
        mrl_rerank(emb, emb, trunc_dims=4, shortlist=2, k=3)


# ----------------------------------------------------------------- cube


def test_cube_report_all_grouping_sets(spark):
    df = spark.createDataFrame(
        [("a", 1, 10.0), ("a", 2, 20.0), ("b", 1, 5.0)],
        "t string, d int, value double",
    )
    rows = cube_report(df, ["t", "d"], value_col="value").collect()
    by_level = {}
    for r in rows:
        by_level.setdefault(r.level, []).append(r)
    # levels: 0 detail, 1 (t, *), 2 (*, d), 3 grand total
    assert set(by_level) == {0, 1, 2, 3}
    assert len(by_level[0]) == 3 and len(by_level[1]) == 2
    assert len(by_level[2]) == 2 and len(by_level[3]) == 1
    gt = by_level[3][0]
    assert gt.n == 3 and gt.value_sum == 35.0
    ad = [r for r in by_level[1] if r.t == "a"][0]
    assert ad.n == 2 and ad.value_sum == 30.0


def test_cube_report_single_expand_plan(spark):
    df = spark.createDataFrame(
        [("a", 1, 1.0)], "t string, d int, value double"
    )
    plan = cube_report(df, ["t", "d"], value_col="value")._jdf.queryExecution(
    ).executedPlan().toString()
    assert plan.count("Expand") == 1
    with pytest.raises(ValueError):
        cube_report(df, [])
