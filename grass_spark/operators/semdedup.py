"""Semantic deduplication over embedding columns (SemDeDup-style).

The published recipe (Abbas et al. 2023, "SemDeDup: Data-efficient
learning at web-scale through semantic deduplication"): cluster the
corpus embeddings with a coarse k-means, then look for near-duplicate
pairs ONLY within a cluster — the cluster assignment bounds the
pairwise work the way LSH bands bound MinHash (never an all-pairs
join), and ``k`` scales with corpus size so per-cluster candidate sets
stay roughly constant.  Pairs above the cosine threshold form edges;
connected components pick one survivor per semantic group.

Spark shapes (100 TB story):

* cluster assignment — corpus x broadcast(k centroid rows); one narrow
  k-fan-out + a row_number window keyed by vec_id (map-side after the
  broadcast).  The corpus never shuffles to get its cluster.
* within-cluster pairs — a self equi-join on ``cluster_id`` with an
  optional per-cluster cap (same contract as the LSH bucket cap in
  :mod:`grass_spark.operators.dedup`): a runaway cluster degrades to
  "first ``cap`` members considered", it never goes quadratic-global.
* components — :func:`grass_spark.operators.dedup.dedup_clusters`
  (min-label + pointer doubling, O(log diameter) rounds).

Centroids here are *seeded* deterministically (the ``k`` smallest ids)
rather than k-means-trained so the whole pipeline is reproducible in
any engine — the DuckDB oracle replays it bit-for-bit.  For a trained
quantizer plug :func:`grass_spark.operators.similarity.train_ivf_centroids`
output into :func:`assign_clusters` via ``centroids=``.

Reference analog: the reference's sampling/topology machinery has no
embedding ops; this is part of the training-data wave the engine adds
on top of SURVEY §2 (grades as first-class per the round-3 verdict).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from grass_spark.operators.dedup import dedup_clusters
from grass_spark.operators.similarity import _as_double, dot, l2norm


def seeded_centroid_frame(
    emb: DataFrame,
    k: int,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Deterministic centroid set: the ``k`` smallest ids' vectors.

    A tiny (k-row) frame meant for the broadcast side of
    :func:`assign_clusters`.  Seeding by id (not a sample of the value
    space) keeps the choice engine-portable; callers who want trained
    centroids pass their own frame of the same shape.
    """
    return (
        emb.select(
            F.col(id_col).alias("c_id"), _as_double(vec_col).alias("ce")
        )
        # sort+limit compiles to TakeOrderedAndProject: per-partition
        # partial top-k, no global sort — safe at corpus scale
        .orderBy("c_id")
        .limit(k)
    )


def assign_clusters(
    emb: DataFrame,
    centroids: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Nearest-centroid (max cosine) assignment — fully map-side.

    The k-row centroid frame collects to the driver (bounded by
    construction: it IS the quantizer) and ships as literal arrays in
    the plan, the same shape as IVF's ``_cell_of``; the winner is
    ``array_max`` over (similarity, -centroid_id) structs — argmax with
    similarity-desc / centroid-id-asc tie-break, identical to a
    ``row_number`` over the fanned-out pairs but with ZERO shuffle and
    no N x k row blow-up.  Similarity is rounded to 6 decimals so the
    tie-break is engine-portable (the DuckDB oracle replays the same
    rounded argmax).  Adds ``cluster_id``; passes ``id_col`` + the
    double-cast vector through as ``_e`` for downstream pair scoring.
    """
    import math

    cents = [(r["c_id"], list(r["ce"])) for r in centroids.collect()]
    e = emb.select(F.col(id_col), _as_double(vec_col).alias("_e"))
    scored = []
    for c_id, ce in cents:
        lit_c = F.array(*[F.lit(float(v)) for v in ce])
        # same a/(b*c) shape and left-to-right norm sum as the DuckDB
        # oracle so the rounded value agrees bit-for-bit
        c_norm = math.sqrt(sum((v * v for v in ce), 0.0))
        sim = F.round(
            dot("_e", lit_c) / (l2norm("_e") * F.lit(c_norm)), 6
        )
        scored.append(F.struct(
            sim.alias("s"), F.lit(-c_id).cast("long").alias("ni")
        ))
    best = F.array_max(F.array(*scored))
    return e.withColumn("cluster_id", (-best["ni"]).cast("long"))


def semantic_pairs(
    assigned: DataFrame,
    threshold: float,
    *,
    id_col: str = "vec_id",
    cluster_cap: int | None = None,
) -> DataFrame:
    """Within-cluster near-duplicate pairs: cosine >= ``threshold``.

    Self equi-join on ``cluster_id`` (id_a < id_b).  ``cluster_cap``
    bounds a pathological cluster exactly like the LSH bucket cap —
    only the first ``cap`` members (by id) participate, so the worst
    cluster costs cap^2, never |cluster|^2.  The similarity is rounded
    to 6 decimals BEFORE the threshold compare so the predicate is
    engine-portable (same contract as the knn_cosine ranking).
    """
    a = assigned
    if cluster_cap is not None:
        w = Window.partitionBy("cluster_id").orderBy(F.col(id_col))
        a = (
            a.withColumn("_crn", F.row_number().over(w))
            .filter(F.col("_crn") <= cluster_cap)
            .drop("_crn")
        )
    lhs = a.select(
        F.col("cluster_id"),
        F.col(id_col).alias("id_a"),
        F.col("_e").alias("_ea"),
    )
    rhs = a.select(
        F.col("cluster_id"),
        F.col(id_col).alias("id_b"),
        F.col("_e").alias("_eb"),
    )
    sim = F.round(
        dot("_ea", "_eb") / (l2norm("_ea") * l2norm("_eb")), 6
    )
    return (
        lhs.join(rhs, on="cluster_id")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("cosine", sim)
        .filter(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )


def semantic_dedup(
    emb: DataFrame,
    *,
    k: int = 16,
    threshold: float = 0.9,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    centroids: DataFrame | None = None,
    cluster_cap: int | None = None,
    max_iters: int | None = None,
) -> DataFrame:
    """End-to-end semantic dedup: every input id labeled with its
    semantic-group survivor.

    Returns (id_col, cluster_id = smallest reachable id over
    above-threshold within-cluster edges, keep = id == cluster_id);
    singletons keep themselves.  Deterministic.
    """
    cents = (
        centroids
        if centroids is not None
        else seeded_centroid_frame(emb, k, id_col=id_col, vec_col=vec_col)
    )
    assigned = assign_clusters(emb, cents, id_col=id_col, vec_col=vec_col)
    pairs = semantic_pairs(
        assigned, threshold, id_col=id_col, cluster_cap=cluster_cap
    )
    comps = dedup_clusters(pairs, max_iters=max_iters)
    return (
        emb.select(F.col(id_col))
        .join(comps.withColumnRenamed("id", id_col), on=id_col, how="left")
        .withColumn(
            "cluster_id", F.coalesce(F.col("cluster_id"), F.col(id_col))
        )
        .select(
            id_col,
            F.col("cluster_id").cast("long").alias("cluster_id"),
            (F.col(id_col) == F.col("cluster_id")).alias("keep"),
        )
    )
