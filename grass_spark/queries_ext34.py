"""Thirty-fourth wave of driver-contract queries: entity-resolution
candidates (operators/linkage.py — blocked fuzzy self-join with exact
Levenshtein verification over customer names) and the exact
set-similarity self-join (operators/setsim.py — Bayardo prefix-filtered
Jaccard over 3-word shingle sets of the documents table).

Both oracles are naive-exact DuckDB replays: the blocked join is a
plain block-key self-join (levenshtein is the identical classic DP
metric in both engines); the set-similarity oracle brute-forces the
shared-token candidate join — prefix filtering on the Spark side is a
pure candidate PRUNE, so the result sets must be identical.

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.dedup import shingles_of_words
from grass_spark.operators.linkage import blocked_fuzzy_pairs
from grass_spark.operators.setsim import setsim_pairs
from grass_spark.queries_ext import _t

EXT34_QUERIES: dict = {}
EXT34_ORACLES: dict = {}


# ---------------------------------------------------------------------
# blocked fuzzy record linkage: customer names within edit distance 1,
# blocked on the first 15 characters ("Customer#" + 6 leading digits →
# blocks of at most 1000 names at any SF)
# ---------------------------------------------------------------------


def q_fuzzy_pairs(spark, sf_dir):
    out = blocked_fuzzy_pairs(
        _t(spark, sf_dir, "customer"),
        id_col="c_custkey",
        name_col="c_name",
        block=15,
        max_dist=1,
    )
    return out.select(
        "id_a", "id_b", F.col("dist").cast("long").alias("dist")
    ).orderBy("id_a", "id_b")


ORACLE_FUZZY_PAIRS = """
WITH c AS (
  SELECT c_custkey AS id, c_name AS nm, substr(c_name, 1, 15) AS bk
  FROM customer WHERE c_name IS NOT NULL
)
SELECT a.id AS id_a, b.id AS id_b,
       CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS dist
FROM c a JOIN c b ON a.bk = b.bk AND a.id < b.id
WHERE levenshtein(a.nm, b.nm) <= 1
ORDER BY id_a, id_b
"""


# ---------------------------------------------------------------------
# exact set-similarity self-join: Jaccard >= 0.6 over 3-word shingle
# sets (whitespace words; shingles space-joined, short docs fall back
# to the whole text — mirrors dedup.shingles_of_words exactly)
# ---------------------------------------------------------------------


def q_setsim_docs(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    words = F.filter(F.split(F.col("text"), " "), lambda x: x != "")
    toks = d.select(
        F.col("doc_id"), shingles_of_words(words, 3).alias("sh")
    )
    return setsim_pairs(
        toks, id_col="doc_id", tokens_col="sh", threshold=0.6
    )


ORACLE_SETSIM_DOCS = """
WITH w AS (
  SELECT doc_id,
         list_filter(string_split(text, ' '), x -> x <> '') AS ws
  FROM documents
),
sh AS (
  SELECT DISTINCT doc_id,
         CASE WHEN len(ws) >= 3
              THEN ws[i] || ' ' || ws[i + 1] || ' ' || ws[i + 2]
              ELSE coalesce(array_to_string(ws, ' '), '') END AS tok
  FROM w, unnest(generate_series(1, greatest(len(ws) - 2, 1))) AS t(i)
),
n AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS i
  FROM sh a JOIN sh b ON a.tok = b.tok AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, i AS n_inter, na.n + nb.n - i AS n_union,
       round(CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE), 6)
         AS jaccard
FROM inter
JOIN n na ON id_a = na.doc_id
JOIN n nb ON id_b = nb.doc_id
WHERE CAST(i AS DOUBLE) / CAST(na.n + nb.n - i AS DOUBLE)
      >= CAST('0.6' AS DOUBLE)
ORDER BY id_a, id_b
"""


EXT34_QUERIES.update(
    {"fuzzy_pairs": q_fuzzy_pairs, "setsim_docs": q_setsim_docs}
)
EXT34_ORACLES.update(
    {"fuzzy_pairs": ORACLE_FUZZY_PAIRS, "setsim_docs": ORACLE_SETSIM_DOCS}
)
