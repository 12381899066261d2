"""Fourth wave of driver-contract queries: late round-4 training-data
operators — SemDeDup-style semantic dedup over the embeddings table
and the deterministic training-export sharder.

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.queries_ext import _t

EXT4_QUERIES: dict = {}
EXT4_ORACLES: dict = {}


# ---------------------------------------------------------------------
# SemDeDup (operators/semdedup.py) — seeded-centroid clustering, within-
# cluster cosine edges, connected components -> survivor per group
# ---------------------------------------------------------------------


def q_semantic_dedup(spark, sf_dir):
    """Semantic dedup over the embeddings table: 16 seeded centroids
    (the 16 smallest vec_ids), within-cluster cosine >= 0.35 edges,
    pointer-doubling components, keep = smallest id per group.  The
    threshold is calibrated to the synthetic near-orthogonal vectors
    (max pairwise cosine ~0.51) so the result is non-trivial; real
    corpora run ~0.9.  cluster_cap=None because the DuckDB twin replays
    the UNCAPPED pairing; the auto cap's bounded-work contract is
    pinned by the adversarial one-cluster test in tests."""
    from grass_spark.operators.semdedup import semantic_dedup

    emb = _t(spark, sf_dir, "embeddings")
    return semantic_dedup(
        emb, k=16, threshold=0.35, cluster_cap=None
    ).orderBy("vec_id")


# DuckDB twin: identical seeded centroids, argmax-cosine assignment
# (row_number with the same (sim desc, c_id) tie-break), rounded-sim
# edges, recursive reachability closure for the components.
ORACLE_SEMANTIC_DEDUP = """
WITH RECURSIVE e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings
), cent AS (
  SELECT vec_id AS c_id, e AS ce FROM e ORDER BY vec_id LIMIT 16
), sims AS (
  SELECT e.vec_id, cent.c_id, e.e,
         round(list_inner_product(e.e, cent.ce)
               / (sqrt(list_inner_product(e.e, e.e))
                  * sqrt(list_inner_product(cent.ce, cent.ce))), 6) AS sim
  FROM e CROSS JOIN cent
), assign AS (
  SELECT vec_id, c_id, e FROM (
    SELECT *, row_number() OVER (
      PARTITION BY vec_id ORDER BY sim DESC, c_id ASC) AS rn
    FROM sims
  ) WHERE rn = 1
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM assign a JOIN assign b
    ON a.c_id = b.c_id AND a.vec_id < b.vec_id
  WHERE round(list_inner_product(a.e, b.e)
              / (sqrt(list_inner_product(a.e, a.e))
                 * sqrt(list_inner_product(b.e, b.e))), 6) >= 0.35
), edges AS (
  SELECT id_a AS s, id_b AS d FROM pairs
  UNION
  SELECT id_b AS s, id_a AS d FROM pairs
), reach AS (
  SELECT s AS id, s AS r FROM edges
  UNION
  SELECT e.s AS id, reach.r AS r
  FROM edges e JOIN reach ON e.d = reach.id
), clusters AS (
  SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
)
SELECT v.vec_id,
       CAST(coalesce(c.cluster_id, v.vec_id) AS BIGINT) AS cluster_id,
       v.vec_id = coalesce(c.cluster_id, v.vec_id) AS keep
FROM embeddings v
LEFT JOIN clusters c ON c.id = v.vec_id
ORDER BY v.vec_id
"""

EXT4_QUERIES["semantic_dedup"] = q_semantic_dedup
EXT4_ORACLES["semantic_dedup"] = ORACLE_SEMANTIC_DEDUP


# ---------------------------------------------------------------------
# Training-export sharder (operators/export.py) — deterministic hash
# permutation, 8 shards, per-shard positions
# ---------------------------------------------------------------------


def q_export_shards(spark, sf_dir):
    """Deterministic export shuffle: every document labeled with its
    shard (md5-hash permutation, 8 shards) and 0-based position within
    the shard.  One shuffle (the shard repartition) at scale."""
    from grass_spark.operators.export import shard_assignments

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    return shard_assignments(d, 8, salt="export").select(
        "doc_id", "shard_id", F.col("pos").cast("long").alias("pos"), "n_chars"
    )


ORACLE_EXPORT_SHARDS = """
WITH u AS (
  SELECT doc_id, n_chars,
         CAST(('0x' || substr(md5(doc_id || ':export'), 1, 8)) AS UBIGINT)
           / 4294967296.0 AS u
  FROM documents
)
SELECT doc_id,
       CAST(floor(u * 8) AS INTEGER) AS shard_id,
       CAST(row_number() OVER (
         PARTITION BY floor(u * 8) ORDER BY u, doc_id) - 1 AS BIGINT) AS pos,
       n_chars
FROM u
"""

EXT4_QUERIES["export_shards"] = q_export_shards
EXT4_ORACLES["export_shards"] = ORACLE_EXPORT_SHARDS


def q_dataset_splits(spark, sf_dir):
    """Deterministic train/val/test labels (75/12.5/12.5 — dyadic
    fractions so the cumulative thresholds are float-exact in any
    engine) + per-split size/char totals as a second sanity column
    set.  The label is a scan-stage CASE chain; the only shuffle is
    the tiny per-split rollup."""
    from grass_spark.operators.export import split_assignments

    d = _t(spark, sf_dir, "documents").select("doc_id", "n_chars")
    lab = split_assignments(
        d, {"train": 0.75, "val": 0.125, "test": 0.125}
    )
    return lab.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.min("doc_id").alias("min_doc"),
        F.max("doc_id").alias("max_doc"),
    )


ORACLE_DATASET_SPLITS = """
WITH u AS (
  SELECT doc_id, n_chars,
         CAST(('0x' || substr(md5(doc_id || ':split'), 1, 8)) AS UBIGINT)
           / 4294967296.0 AS u
  FROM documents
), lab AS (
  SELECT doc_id, n_chars,
         CASE WHEN u < 0.75 THEN 'train'
              WHEN u < 0.875 THEN 'val'
              ELSE 'test' END AS split
  FROM u
)
SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       min(doc_id) AS min_doc, max(doc_id) AS max_doc
FROM lab GROUP BY split
"""

EXT4_QUERIES["dataset_splits"] = q_dataset_splits
EXT4_ORACLES["dataset_splits"] = ORACLE_DATASET_SPLITS
