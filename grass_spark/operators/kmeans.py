"""Distributed Lloyd refinement for the engine's quantizers.

The ANN/semantic operators (:mod:`semdedup`, :mod:`similarity`,
:mod:`pq`) ship with SEEDED centroids — deterministic and
oracle-replayable, but untrained.  This module adds the training step:
classic Lloyd iterations expressed as Spark aggregations, so centroid
quality is a knob rather than a limitation.

Scale shape per round (both trainers):

* **assignment** — the existing zero-shuffle paths
  (:func:`semdedup.assign_clusters` for cosine,
  :func:`pq.pq_encode` for per-subspace L2): map-side only;
* **update** — ONE shuffle: ``posexplode`` the vector elements and
  ``groupBy(cluster, position).avg`` — map-side partial aggregation
  absorbs any hot cluster (the element key spreads k*dims ways), the
  reduced frame is k*dims rows and collects k-bounded to the driver;
* **objective** — a scalar agg on the already-assigned frame.

Nothing data-sized ever reaches the driver; each round's lineage is
cut by the k-bounded collect itself (the next round's plan starts from
literals).  Distributed float sums differ run-to-run in the last ulp,
so trained centroids are deterministic only up to fp addition order —
callers needing bit-exact replay keep the seeded centroids (the
oracle-gated queries do exactly that).

Reference analog: none in GRASS — this is FAISS-style index training
(Jégou et al. 2011) expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _mean_by_key(
    assigned: DataFrame, key_cols: list[str], vec_col: str
) -> DataFrame:
    """(key..., pos, avg) — the Lloyd update aggregation."""
    return (
        assigned.select(
            *key_cols, F.posexplode(F.col(vec_col)).alias("_pos", "_x")
        )
        .groupBy(*key_cols, "_pos")
        .agg(F.avg("_x").alias("_m"))
    )


def lloyd_refine(
    emb: DataFrame,
    k: int,
    rounds: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    init: list[list[float]] | None = None,
) -> tuple[list[list[float]], list[float]]:
    """Spherical k-means (cosine assignment, mean update) for the
    SemDeDup / IVF centroid sets.

    Starts from ``init`` or the seeded contract (the ``k``
    smallest-``id_col`` vectors); runs ``rounds`` Lloyd iterations;
    returns ``(centroids, objective_history)`` where the objective is
    the mean ``1 - cos(x, centroid(x))`` BEFORE each update (history
    is non-increasing up to fp noise and the final post-update value
    is appended).  Empty clusters keep their previous centroid.
    """
    from grass_spark.operators.semdedup import (
        assign_clusters,
        centroid_frame,
    )

    spark = emb.sparkSession
    base = emb.select(
        id_col, F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    if init is None:
        rows = base.orderBy(id_col).limit(k).collect()
        if len(rows) < k:
            raise ValueError(f"need >= {k} vectors to seed k={k}")
        cents = [list(r[vec_col]) for r in rows]
    else:
        if len(init) != k:
            raise ValueError("len(init) != k")
        cents = [list(map(float, c)) for c in init]
    history: list[float] = []
    for _ in range(rounds + 1):
        cf = centroid_frame(spark, cents)
        assigned = assign_clusters(
            base, cf, id_col=id_col, vec_col=vec_col,
        )
        # objective: mean (1 - cos) to the assigned centroid — a
        # broadcast join with the k-row centroid frame + one fold
        withc = assigned.join(
            F.broadcast(cf.withColumnRenamed("c_id", "cluster_id")),
            "cluster_id",
        )
        dot = F.aggregate(
            F.zip_with("_e", "ce", lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x,
        )
        nrm = lambda c: F.sqrt(F.aggregate(  # noqa: E731
            F.zip_with(c, c, lambda a, b: a * b),
            F.lit(0.0), lambda acc, x: acc + x,
        ))
        cos = dot / (nrm("_e") * nrm("ce"))
        obj = withc.agg(F.avg(F.lit(1.0) - cos).alias("o")).collect()[0]["o"]
        history.append(float(obj))
        if len(history) == rounds + 1:
            break
        means = _mean_by_key(assigned, ["cluster_id"], "_e").collect()
        upd: dict[int, list[float]] = {}
        for r in means:
            upd.setdefault(int(r["cluster_id"]), [0.0] * len(cents[0]))[
                r["_pos"]
            ] = r["_m"]
        cents = [upd.get(c, cents[c]) for c in range(k)]
    return cents, history


def pq_train(
    emb: DataFrame,
    m: int,
    k: int,
    rounds: int = 5,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    method: str = "expr",
) -> tuple[list[list[list[float]]], list[float]]:
    """Lloyd-trained PQ codebook: per-subspace L2 k-means, all ``m``
    subspaces updated in the SAME single aggregation pass per round
    (the element position encodes its subspace: ``j = pos / subdim``).
    ``method`` passes through to :func:`pq.pq_encode` — ``"arrow"`` is
    the corpus-scale assignment path.

    Starts from :func:`pq.pq_codebook`'s seeded contract; returns
    ``(codebook, distortion_history)`` — mean ``recon_err`` before
    each update, final value appended.  Empty (subspace, code) cells
    keep their previous centroid.
    """
    from grass_spark.operators.pq import pq_codebook, pq_encode

    cb = pq_codebook(emb, m, k, emb_col=vec_col, id_col=id_col)
    sub = len(cb[0][0])
    base = emb.select(
        id_col, F.col(vec_col).cast("array<double>").alias(vec_col)
    )
    history: list[float] = []
    for _ in range(rounds + 1):
        enc = pq_encode(
            base, cb, emb_col=vec_col, id_col=id_col, with_err=True,
            method=method,
        )
        history.append(
            float(enc.agg(F.avg("recon_err")).collect()[0][0])
        )
        if len(history) == rounds + 1:
            break
        ex = enc.select(
            "codes", F.posexplode(F.col(vec_col)).alias("_pos", "_x")
        ).select(
            (F.col("_pos") / sub).cast("int").alias("_j"),
            F.element_at(
                F.col("codes"), (F.col("_pos") / sub).cast("int") + 1
            ).alias("_c"),
            (F.col("_pos") % sub).alias("_t"),
            "_x",
        )
        means = (
            ex.groupBy("_j", "_c", "_t").agg(F.avg("_x").alias("_m"))
        ).collect()
        nxt = [[list(cv) for cv in js] for js in cb]
        for r in means:
            nxt[r["_j"]][r["_c"]][r["_t"]] = r["_m"]
        cb = nxt
    return cb, history
