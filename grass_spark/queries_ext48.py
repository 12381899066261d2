"""Forty-eighth wave of driver-contract queries: per-cluster
assignment quality (operators/semdedup.py ``cluster_quality`` —
cohesion + runner-up margin over the seeded-16 quantizer) and
quantizer drift (``centroid_shift`` — cosine between each centroid
and its members' mean vector, per-position means rounded before the
fold).  Both replay the exact seeded assignment the semantic_dedup
oracle uses.

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from grass_spark.operators.semdedup import (
    centroid_shift,
    cluster_quality,
    seeded_centroid_frame,
)
from grass_spark.queries_ext import _t

EXT48_QUERIES: dict = {}
EXT48_ORACLES: dict = {}

_K = 16

_ASSIGN_CTES = f"""
e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), cent AS (
  SELECT vec_id AS c_id, e AS ce FROM e ORDER BY vec_id LIMIT {_K}
), sims AS (
  SELECT e.vec_id, cent.c_id, e.e,
         round(list_inner_product(e.e, cent.ce)
               / (sqrt(list_inner_product(e.e, e.e))
                  * sqrt(list_inner_product(cent.ce, cent.ce))), 6) AS sim
  FROM e CROSS JOIN cent
), r AS (
  SELECT vec_id, c_id, e, sim,
         row_number() OVER (
           PARTITION BY vec_id ORDER BY sim DESC, c_id ASC) AS rn
  FROM sims
)
"""


# ---------------------------------------------------------------------
# cluster quality
# ---------------------------------------------------------------------


def q_cluster_quality(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return cluster_quality(emb, seeded_centroid_frame(emb, _K))


ORACLE_CLUSTER_QUALITY = f"""
WITH {_ASSIGN_CTES},
pv AS (
  SELECT vec_id,
         max(CASE WHEN rn = 1 THEN c_id END) AS cluster_id,
         max(CASE WHEN rn = 1 THEN sim END) AS best,
         max(CASE WHEN rn = 2 THEN sim END) AS second
  FROM r WHERE rn <= 2 GROUP BY 1
)
SELECT cluster_id, CAST(count(*) AS BIGINT) AS n,
       round(avg(best), 6) AS mean_cohesion,
       min(best) AS min_cohesion,
       round(avg(best - second), 6) AS mean_margin
FROM pv GROUP BY 1
ORDER BY cluster_id
"""


# ---------------------------------------------------------------------
# centroid shift
# ---------------------------------------------------------------------


def q_centroid_shift(spark, sf_dir):
    emb = _t(spark, sf_dir, "embeddings")
    return centroid_shift(emb, seeded_centroid_frame(emb, _K))


ORACLE_CENTROID_SHIFT = f"""
WITH {_ASSIGN_CTES},
a AS (SELECT c_id AS cluster_id, e FROM r WHERE rn = 1),
pos AS (
  SELECT cluster_id, unnest(e) AS v, generate_subscripts(e, 1) AS i
  FROM a
),
m AS (
  SELECT cluster_id, i, round(avg(v), 6) AS mv
  FROM pos GROUP BY 1, 2
),
mv AS (
  SELECT cluster_id, list(mv ORDER BY i) AS mean FROM m GROUP BY 1
),
cnt AS (
  SELECT cluster_id, CAST(count(*) AS BIGINT) AS n FROM a GROUP BY 1
)
SELECT mv.cluster_id, cnt.n,
       CASE WHEN sqrt(list_inner_product(mean, mean))
                 * sqrt(list_inner_product(ce, ce)) > 0 THEN
         round(list_inner_product(mean, ce)
               / (sqrt(list_inner_product(mean, mean))
                  * sqrt(list_inner_product(ce, ce))), 6)
       END AS shift_cos
FROM mv JOIN cent ON cent.c_id = mv.cluster_id
JOIN cnt ON cnt.cluster_id = mv.cluster_id
ORDER BY mv.cluster_id
"""


EXT48_QUERIES.update(
    {
        "cluster_quality": q_cluster_quality,
        "centroid_shift": q_centroid_shift,
    }
)
EXT48_ORACLES.update(
    {
        "cluster_quality": ORACLE_CLUSTER_QUALITY,
        "centroid_shift": ORACLE_CENTROID_SHIFT,
    }
)
