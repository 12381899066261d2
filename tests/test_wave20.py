"""Wave-20 operators: co-occurrence edges, triangle stats, Levenshtein
candidate re-scoring."""

from __future__ import annotations

import pytest

from grass_spark.operators.editsim import edit_similarity_pairs
from grass_spark.operators.graph import cooccurrence_edges, triangle_stats


# ------------------------------------------------------------------- edges


def test_cooccurrence_edges_weights_and_order(spark):
    rows = [
        ("g1", "b"), ("g1", "a"), ("g1", "c"),
        ("g2", "a"), ("g2", "b"),
        ("g2", "b"),  # duplicate membership must not inflate weight
    ]
    df = spark.createDataFrame(rows, "g string, i string")
    out = {
        (r.src, r.dst): r.weight
        for r in cooccurrence_edges(df, group_col="g", item_col="i").collect()
    }
    assert out == {("a", "b"): 2, ("a", "c"): 1, ("b", "c"): 1}


def test_cooccurrence_edges_density_cap_drops_hot_group(spark):
    hot = [("big", f"i{k}") for k in range(10)]
    cold = [("s", "x"), ("s", "y")]
    df = spark.createDataFrame(hot + cold, "g string, i string")
    out = cooccurrence_edges(
        df, group_col="g", item_col="i", max_group=4
    ).collect()
    assert [(r.src, r.dst) for r in out] == [("x", "y")]
    with pytest.raises(ValueError):
        cooccurrence_edges(df, group_col="g", item_col="i", max_group=1)


def test_cooccurrence_min_weight(spark):
    rows = [("g1", "a"), ("g1", "b"), ("g2", "a"), ("g2", "b"), ("g3", "a"), ("g3", "c")]
    df = spark.createDataFrame(rows, "g string, i string")
    out = cooccurrence_edges(
        df, group_col="g", item_col="i", min_weight=2
    ).collect()
    assert [(r.src, r.dst, r.weight) for r in out] == [("a", "b", 2)]


# --------------------------------------------------------------- triangles


def _edges(spark, pairs):
    return spark.createDataFrame(pairs, "src string, dst string")


def test_triangle_stats_k4(spark):
    # complete graph on 4 nodes: 6 edges, 4 triangles, 12 wedges
    nodes = ["a", "b", "c", "d"]
    pairs = [(x, y) for i, x in enumerate(nodes) for y in nodes[i + 1:]]
    r = triangle_stats(_edges(spark, pairs)).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_wedges, r.n_triangles) == (4, 6, 12, 4)
    assert r.clustering == 1.0


def test_triangle_stats_path_graph_no_triangles(spark):
    r = triangle_stats(
        _edges(spark, [("a", "b"), ("b", "c"), ("c", "d")])
    ).collect()[0]
    assert r.n_triangles == 0 and r.n_wedges == 2
    assert r.clustering == 0.0


def test_triangle_stats_dedups_and_drops_self_loops(spark):
    pairs = [
        ("a", "b"), ("b", "a"), ("a", "b"),  # one edge
        ("a", "a"),  # self loop dropped
        ("b", "c"), ("a", "c"),
    ]
    r = triangle_stats(_edges(spark, pairs)).collect()[0]
    assert (r.n_nodes, r.n_edges, r.n_triangles) == (3, 3, 1)


def test_triangle_stats_hub_star_counts_once(spark):
    # star + one rim edge: exactly 1 triangle regardless of orientation
    pairs = [("hub", f"r{k}") for k in range(6)] + [("r0", "r1")]
    r = triangle_stats(_edges(spark, pairs)).collect()[0]
    assert r.n_triangles == 1
    assert r.n_wedges == 15 + 1 + 1  # hub C(6,2)=15, r0/r1 deg 2 -> 1 each


def test_triangle_stats_empty_graph_null_clustering(spark):
    r = triangle_stats(_edges(spark, [("a", "b")])).collect()[0]
    assert r.n_wedges == 0 and r.clustering is None


# ----------------------------------------------------------------- editsim


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "id_a long, id_b long")


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_edit_similarity_scores(spark):
    docs = _docs(
        spark,
        [(1, "kitten"), (2, "sitting"), (3, "kitten"), (4, "zzzzzz")],
    )
    pairs = _pairs(spark, [(1, 2), (1, 3), (1, 4)])
    out = {
        (r.id_a, r.id_b): r
        for r in edit_similarity_pairs(pairs, docs, threshold=0.0).collect()
    }
    assert out[(1, 2)].lev == 3
    assert out[(1, 2)].sim == pytest.approx(1 - 3 / 7, abs=1e-6)
    assert out[(1, 3)].lev == 0 and out[(1, 3)].sim == 1.0
    assert out[(1, 4)].sim == 0.0


def test_edit_similarity_length_prefilter_drops_before_dp(spark):
    docs = _docs(spark, [(1, "a" * 100), (2, "a" * 10)])
    pairs = _pairs(spark, [(1, 2)])
    # min/max = 0.1 < 0.8 threshold -> filtered by lengths alone
    assert edit_similarity_pairs(pairs, docs, threshold=0.8).count() == 0


def test_edit_similarity_empty_texts_score_one(spark):
    docs = _docs(spark, [(1, ""), (2, "")])
    out = edit_similarity_pairs(
        _pairs(spark, [(1, 2)]), docs, threshold=0.5
    ).collect()
    assert len(out) == 1 and out[0].sim == 1.0


def test_levenshtein_parity_spark_vs_duckdb(spark):
    import duckdb

    cases = [
        ("kitten", "sitting"),
        ("", "abc"),
        ("flaw", "lawn"),
        ("same", "same"),
        ("a b  c", "a b c"),
        ("the quick brown fox " * 5, "the quick brown fax " * 5),
    ]
    df = spark.createDataFrame(cases, "a string, b string")
    from pyspark.sql import functions as F

    got = [
        r.lv
        for r in df.select(F.levenshtein("a", "b").alias("lv"))
        .collect()
    ]
    con = duckdb.connect()
    want = [
        con.execute("SELECT levenshtein(?, ?)", [a, b]).fetchone()[0]
        for a, b in cases
    ]
    assert got == want
    # pinned DIVERGENCE: Spark counts characters, DuckDB UTF-8 bytes —
    # the oracle contract is ASCII text (editsim module docstring)
    uni = ("Ünïcödé tèxt", "Unicode text")
    sp = (
        df.limit(1)
        .select(F.levenshtein(F.lit(uni[0]), F.lit(uni[1])).alias("lv"))
        .collect()[0]
        .lv
    )
    dk = con.execute("SELECT levenshtein(?, ?)", list(uni)).fetchone()[0]
    assert sp == 5 and dk == 10
