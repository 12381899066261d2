"""Ninth wave of driver-contract queries: rejection sampling
(skew-safe best-of-N top-k, operators/caps.py) and the word-boundary
blocklist gate (operators/blocklist.py).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.blocklist import blocklist_pattern, blocklist_stats
from grass_spark.operators.caps import top_per_group
from grass_spark.queries_ext import _t
from grass_spark.queries_ext8 import _DUCK_HASH, _scored_completions

EXT9_QUERIES: dict = {}
EXT9_ORACLES: dict = {}


# ---------------------------------------------------------------------
# rejection sampling — top-3 scored completions per prompt, skew-safe
# ---------------------------------------------------------------------

def q_rejection_sample(spark, sf_dir):
    kept = top_per_group(
        _scored_completions(spark, sf_dir),
        3,
        score_col="score",
        group_col="prompt_id",
        id_col="doc_id",
        salts=4,
    )
    return kept.select(
        "prompt_id", "doc_id", F.round("score", 6).alias("score")
    ).orderBy("prompt_id", "doc_id")


ORACLE_REJECTION_SAMPLE = f"""
WITH s AS (
  SELECT CAST({_DUCK_HASH.format(salt='prompt')} % 64 AS BIGINT) AS prompt_id,
         doc_id,
         round({_DUCK_HASH.format(salt='score')} / 4294967296.0, 6) AS score
  FROM documents
),
ranked AS (
  SELECT prompt_id, doc_id, score,
         row_number() OVER (PARTITION BY prompt_id
                            ORDER BY score DESC, doc_id ASC) AS rn
  FROM s
)
SELECT prompt_id, doc_id, score
FROM ranked WHERE rn <= 3
ORDER BY prompt_id, doc_id
"""

EXT9_QUERIES["rejection_sample"] = q_rejection_sample
EXT9_ORACLES["rejection_sample"] = ORACLE_REJECTION_SAMPLE


# ---------------------------------------------------------------------
# blocklist gate — word-boundary term counting, C4 badword-list analog
# ---------------------------------------------------------------------

#: multi-word phrase first (greedy longest-alternative), plus single
#: words present in the synthetic vocab so hits actually vary
_BLOCK_TERMS = ("fast table", "merge", "spark")

_BLOCK_PATTERN = blocklist_pattern(_BLOCK_TERMS)


def q_blocklist_flags(spark, sf_dir):
    docs = _t(spark, sf_dir, "documents")
    out = blocklist_stats(docs, _BLOCK_TERMS, text_col="text", max_hits=2)
    return out.select(
        "doc_id", "n_blocked", "blocked_frac", "keep"
    ).orderBy("doc_id")


ORACLE_BLOCKLIST_FLAGS = f"""
SELECT doc_id,
       CAST(len(regexp_extract_all(lower(text), '{_BLOCK_PATTERN}'))
            AS BIGINT) AS n_blocked,
       round(CAST(len(regexp_extract_all(lower(text), '{_BLOCK_PATTERN}'))
                  AS DOUBLE)
             / greatest(len(list_filter(regexp_split_to_array(text, '\\s+'),
                                        x -> x <> '')), 1),
             6) AS blocked_frac,
       len(regexp_extract_all(lower(text), '{_BLOCK_PATTERN}')) <= 2 AS keep
FROM documents
ORDER BY doc_id
"""

EXT9_QUERIES["blocklist_flags"] = q_blocklist_flags
EXT9_ORACLES["blocklist_flags"] = ORACLE_BLOCKLIST_FLAGS


# ---------------------------------------------------------------------
# hard-negative mining — top-5 cross-label neighbors per query vector
# ---------------------------------------------------------------------

def q_hard_negatives(spark, sf_dir):
    from grass_spark.operators.similarity import hard_negatives

    emb = _t(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") < 3)
    out = hard_negatives(emb, q, k=5)
    return out.orderBy("q_id", "rank")


ORACLE_HARD_NEGATIVES = """
WITH e AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e, label
           FROM embeddings),
q AS (SELECT vec_id AS q_id, e AS qe, label AS ql FROM e WHERE vec_id < 3),
pairs AS (
  SELECT q.q_id, e.vec_id, e.label,
         round(list_inner_product(q.qe, e.e)
               / (sqrt(list_inner_product(q.qe, q.qe))
                  * sqrt(list_inner_product(e.e, e.e))), 6) AS cosine
  FROM q CROSS JOIN e
  WHERE e.label <> q.ql AND e.vec_id <> q.q_id
), ranked AS (
  SELECT q_id, vec_id, label, cosine,
         row_number() OVER (PARTITION BY q_id
                            ORDER BY cosine DESC, vec_id ASC) AS rank
  FROM pairs
)
SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id AS neighbor_id,
       label, cosine
FROM ranked WHERE rank <= 5
ORDER BY q_id, rank
"""

EXT9_QUERIES["hard_negatives"] = q_hard_negatives
EXT9_ORACLES["hard_negatives"] = ORACLE_HARD_NEGATIVES


# ---------------------------------------------------------------------
# shard manifest — order-independent per-shard integrity fingerprints
# ---------------------------------------------------------------------

def q_shard_manifest(spark, sf_dir):
    from grass_spark.operators.export import shard_manifest

    docs = _t(spark, sf_dir, "documents")
    out = shard_manifest(docs, 8, tokens_col="n_chars")
    return out.orderBy("shard_id")


ORACLE_SHARD_MANIFEST = f"""
WITH staged AS (
  SELECT doc_id, text, n_chars,
         CAST(floor({_DUCK_HASH.format(salt='export')} / 4294967296.0 * 8)
              AS INTEGER) AS shard_id,
         CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':' || md5(text)),
                             1, 8) AS UBIGINT) AS fp
  FROM documents
)
SELECT shard_id,
       count(*) AS n_docs,
       CAST(sum(len(text)) AS BIGINT) AS n_chars,
       CAST(sum(n_chars) AS BIGINT) AS n_tokens,
       min(doc_id) AS min_id,
       max(doc_id) AS max_id,
       CAST(sum(fp) AS BIGINT) AS fingerprint
FROM staged
GROUP BY shard_id
ORDER BY shard_id
"""

EXT9_QUERIES["shard_manifest"] = q_shard_manifest
EXT9_ORACLES["shard_manifest"] = ORACLE_SHARD_MANIFEST
