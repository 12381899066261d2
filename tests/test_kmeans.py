"""Lloyd refinement (operators/kmeans.py) for the quantizer stack."""

from __future__ import annotations

import numpy as np
import pytest

from grass_spark.operators.kmeans import lloyd_refine, pq_train


def _clustered(spark, n=200, k=8, dims=16, noise=0.15, seed=11):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, dims)) * 3.0
    rows = [
        (i, [float(x) for x in centers[i % k] + rng.normal(size=dims) * noise])
        for i in range(n)
    ]
    return rows, spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def test_lloyd_objective_decreases_and_recovers_clusters(spark):
    rows, df = _clustered(spark)
    cents, hist = lloyd_refine(df, 8, rounds=3)
    assert len(hist) == 4 and len(cents) == 8
    # Lloyd is monotone up to fp noise
    for a, b in zip(hist, hist[1:]):
        assert b <= a + 1e-9
    assert hist[-1] < hist[0]
    # trained centroids separate the planted clusters: every member of
    # a planted cluster maps to the same trained centroid
    from grass_spark.operators.semdedup import assign_clusters, centroid_frame

    got = {
        r.vec_id: r.cluster_id
        for r in assign_clusters(
            df, centroid_frame(spark, cents)
        ).collect()
    }
    for planted in range(8):
        labels = {got[i] for i in range(200) if i % 8 == planted}
        assert len(labels) == 1, planted
    # and distinct planted clusters get distinct centroids
    assert len({got[i] for i in range(8)}) == 8


def test_lloyd_empty_cluster_keeps_previous_centroid(spark):
    # one-hot axis vectors each pick their own axis centroid (cos 1);
    # the 4th centroid points away from every vector (cos < 0) so its
    # cluster stays empty and it must survive the update verbatim
    rows = [(i, [1.0 if t == i % 3 else 0.0 for t in range(4)])
            for i in range(30)]
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    away = [-1.0, -1.0, -1.0, -1.0]
    init = [[1.0, 0, 0, 0], [0, 1.0, 0, 0], [0, 0, 1.0, 0], away]
    cents, hist = lloyd_refine(df, 4, rounds=2, init=init)
    assert cents[3] == away  # nobody assigns to it; it survives verbatim


def test_lloyd_validates_init(spark):
    rows, df = _clustered(spark)
    with pytest.raises(ValueError, match="len\\(init\\) != k"):
        lloyd_refine(df, 4, init=[[0.0] * 16])
    with pytest.raises(ValueError, match="need >= "):
        lloyd_refine(df.limit(2), 4)


def test_pq_train_distortion_decreases(spark):
    rows, df = _clustered(spark, dims=16)
    cb, hist = pq_train(df, m=4, k=8, rounds=3)
    assert len(hist) == 4
    for a, b in zip(hist, hist[1:]):
        assert b <= a + 1e-9
    assert hist[-1] < hist[0]
    assert len(cb) == 4 and len(cb[0]) == 8 and len(cb[0][0]) == 4
    # trained codebook encodes with lower distortion than the seeded one
    from grass_spark.operators.pq import pq_codebook, pq_encode
    from pyspark.sql import functions as F

    seeded = pq_codebook(df, 4, 8)
    e0 = pq_encode(df, seeded, with_err=True).agg(
        F.avg("recon_err")
    ).collect()[0][0]
    e1 = pq_encode(df, cb, with_err=True).agg(
        F.avg("recon_err")
    ).collect()[0][0]
    assert e1 < e0


def test_semantic_dedup_with_training_keeps_contract(spark):
    """train_rounds composes: same keep/cluster contract, and on
    planted near-dups the trained run still flags every copy."""
    import numpy as np
    from pyspark.sql import functions as F

    from grass_spark.operators.semdedup import semantic_dedup

    rng = np.random.default_rng(21)
    rows = []
    for i in range(120):
        if i % 10 == 1:  # copy of the previous id with tiny noise
            base = np.array(rows[i - 1][1])
            v = base + rng.normal(size=32) * 0.002
        else:
            v = rng.normal(size=32)
        rows.append((i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id bigint, embedding array<double>")
    out = semantic_dedup(df, k=8, threshold=0.95, train_rounds=2)
    got = {r.vec_id: r for r in out.collect()}
    assert len(got) == 120
    for i in range(1, 120, 10):
        assert got[i].cluster_id == got[i - 1].cluster_id == i - 1
        assert not got[i].keep and got[i - 1].keep
    # tiny input degrades instead of raising
    small = semantic_dedup(df.limit(3), k=8, train_rounds=2)
    assert small.count() == 3
