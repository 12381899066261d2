"""Wave-48 operators: cluster assignment quality
(semdedup.cluster_quality) and quantizer drift
(semdedup.centroid_shift)."""

from __future__ import annotations

from grass_spark.operators.semdedup import (
    centroid_shift,
    cluster_quality,
    seeded_centroid_frame,
)


def _emb(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<double>"
    )


def test_cluster_quality_axes(spark):
    # centroids = vecs 0 (x-axis) and 1 (y-axis); members near each
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [1.0, 0.0]),        # perfect cohesion with centroid 0
        (3, [0.8, 0.6]),        # closer to x: cos 0.8 vs 0.6
    ]
    emb = _emb(spark, rows)
    out = {r.cluster_id: r for r in cluster_quality(
        emb, seeded_centroid_frame(emb, 2)).collect()}
    assert out[0].n == 3 and out[1].n == 1
    # cluster 0 members: cos {1.0 (self), 1.0 (vec2), 0.8 (vec3)}
    assert out[0].min_cohesion == 0.8
    assert out[0].mean_cohesion == round((1.0 + 1.0 + 0.8) / 3, 6)
    # vec3 margin = 0.8 - 0.6; self/vec2 margins = 1.0 - 0.0
    assert out[0].mean_margin == round((1.0 + 1.0 + 0.2) / 3, 6)


def test_centroid_shift_detects_drift(spark):
    # all of centroid 0's members sit ON it -> shift_cos 1; cluster 1
    # gets a member pulled toward x, so its mean drifts off [0,1]
    rows = [
        (0, [1.0, 0.0]),
        (1, [0.0, 1.0]),
        (2, [1.0, 0.0]),
        (3, [0.6, 0.8]),        # assigned to y-centroid (cos .8 > .6)
    ]
    emb = _emb(spark, rows)
    out = {r.cluster_id: r for r in centroid_shift(
        emb, seeded_centroid_frame(emb, 2)).collect()}
    assert out[0].n == 2 and out[0].shift_cos == 1.0
    assert out[1].n == 2
    # mean of [0,1] and [.6,.8] = [.3,.9]; cos with [0,1] = .9/|[.3,.9]|
    import math
    expect = round(0.9 / math.hypot(0.3, 0.9), 6)
    assert abs(out[1].shift_cos - expect) <= 2e-6  # per-pos rounding
