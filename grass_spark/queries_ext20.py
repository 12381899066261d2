"""Twentieth wave of driver-contract queries: co-occurrence graph
analytics (operators/graph.py) over the part-per-order bipartite
relation, and exact Levenshtein re-scoring of the banded-LSH
candidate pairs (operators/editsim.py).

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.editsim import edit_similarity_pairs
from grass_spark.operators.graph import cooccurrence_edges, triangle_stats
from grass_spark.queries_ext import _t
from grass_spark.queries_ext3 import _md5_cands, _SQL_CANDS, _SQL_SHINGLES
from grass_spark.operators.dedup import with_shingles

EXT20_QUERIES: dict = {}
EXT20_ORACLES: dict = {}

_MAX_GROUP = 16

#: shared oracle chain: distinct membership -> density cap -> pairs
_SQL_EDGES = f"""m AS (
  SELECT DISTINCT l_orderkey AS g, l_partkey AS i FROM lineitem
  WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
),
sz AS (
  SELECT g FROM (SELECT g, count(*) AS c FROM m GROUP BY 1)
  WHERE c <= {_MAX_GROUP}
),
k AS (SELECT m.g, m.i FROM m JOIN sz USING (g)),
e AS (
  SELECT a.i AS src, b.i AS dst, CAST(count(*) AS BIGINT) AS weight
  FROM k a JOIN k b ON a.g = b.g AND a.i < b.i
  GROUP BY 1, 2
)"""


# ---------------------------------------------------------------------
# co-purchase affinity edges: parts sharing >= 2 orders
# ---------------------------------------------------------------------


def q_cooccur_edges(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        cooccurrence_edges(
            li,
            group_col="l_orderkey",
            item_col="l_partkey",
            max_group=_MAX_GROUP,
            min_weight=2,
        )
        .orderBy("src", "dst")
    )


ORACLE_COOCCUR_EDGES = f"""
WITH {_SQL_EDGES}
SELECT src, dst, weight FROM e WHERE weight >= 2 ORDER BY src, dst
"""

EXT20_QUERIES["cooccur_edges"] = q_cooccur_edges
EXT20_ORACLES["cooccur_edges"] = ORACLE_COOCCUR_EDGES


# ---------------------------------------------------------------------
# triangle census of the full co-purchase graph
# ---------------------------------------------------------------------


def q_graph_triangles(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    edges = cooccurrence_edges(
        li,
        group_col="l_orderkey",
        item_col="l_partkey",
        max_group=_MAX_GROUP,
    )
    return triangle_stats(edges)


ORACLE_GRAPH_TRIANGLES = f"""
WITH {_SQL_EDGES},
canon AS (SELECT src AS a, dst AS b FROM e),
deg AS (
  SELECT v, count(*) AS d FROM (
    SELECT a AS v FROM canon UNION ALL SELECT b AS v FROM canon
  ) GROUP BY 1
),
tri AS (
  SELECT CAST(count(*) AS BIGINT) AS n_triangles
  FROM canon e1
  JOIN canon e2 ON e2.a = e1.b
  JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b
),
nd AS (
  SELECT CAST(count(*) AS BIGINT) AS n_nodes,
         CAST(sum(CAST((d * (d - 1)) // 2 AS HUGEINT)) AS BIGINT)
           AS n_wedges
  FROM deg
),
ne AS (SELECT CAST(count(*) AS BIGINT) AS n_edges FROM canon)
SELECT n_nodes, n_edges, n_wedges, n_triangles,
       CASE WHEN n_wedges > 0 THEN
         round(CAST(3 AS DOUBLE) * CAST(n_triangles AS DOUBLE)
               / CAST(n_wedges AS DOUBLE), 6)
       END AS clustering
FROM nd, ne, tri
"""

EXT20_QUERIES["graph_triangles"] = q_graph_triangles
EXT20_ORACLES["graph_triangles"] = ORACLE_GRAPH_TRIANGLES


# ---------------------------------------------------------------------
# Levenshtein re-score of the banded-LSH candidate pairs
# ---------------------------------------------------------------------

_EDIT_THRESHOLD = 0.3


def q_edit_verify(spark, sf_dir):
    d = _t(spark, sf_dir, "documents")
    sh = with_shingles(d, "text", 3).select("doc_id", "sh_arr").localCheckpoint()
    cands = _md5_cands(sh)
    return edit_similarity_pairs(
        cands, d, threshold=_EDIT_THRESHOLD
    ).orderBy("id_a", "id_b")


ORACLE_EDIT_VERIFY = f"""
WITH {_SQL_SHINGLES},
{_SQL_CANDS},
t AS (
  SELECT doc_id, text, CAST(length(text) AS INT) AS len FROM documents
),
j AS (
  SELECT c.id_a, c.id_b, ta.len AS len_a, tb.len AS len_b,
         ta.text AS xa, tb.text AS xb
  FROM cands c
  JOIN t ta ON ta.doc_id = c.id_a
  JOIN t tb ON tb.doc_id = c.id_b
  WHERE CAST(least(ta.len, tb.len) AS DOUBLE)
        >= {_EDIT_THRESHOLD} * CAST(greatest(ta.len, tb.len) AS DOUBLE)
),
s AS (
  SELECT id_a, id_b, len_a, len_b,
         CAST(levenshtein(xa, xb) AS INT) AS lev,
         CASE WHEN len_a + len_b = 0 THEN CAST(1 AS DOUBLE)
         ELSE round(CAST(1 AS DOUBLE)
                    - CAST(levenshtein(xa, xb) AS DOUBLE)
                      / CAST(greatest(len_a, len_b) AS DOUBLE), 6)
         END AS sim
  FROM j
)
SELECT id_a, id_b, len_a, len_b, lev, sim
FROM s WHERE sim >= {_EDIT_THRESHOLD}
ORDER BY id_a, id_b
"""

EXT20_QUERIES["edit_verify"] = q_edit_verify
EXT20_ORACLES["edit_verify"] = ORACLE_EDIT_VERIFY
