"""Semantic benchmark decontamination (operators/semdecon.py)."""

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.semdecon import (
    semantic_contamination,
    semantic_decontaminate,
)


@pytest.fixture(scope="module")
def frames(spark):
    corpus_emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0]),     # identical to bench -> cos 1
            (2, [0.9, 0.1, 0.0]),     # near bench
            (3, [0.0, 0.0, 1.0]),     # orthogonal
            (4, [0.0, 0.0, 0.0]),     # zero vector -> cos 0
        ],
        "vec_id bigint, embedding array<double>",
    )
    bench_emb = spark.createDataFrame(
        [(100, [1.0, 0.0, 0.0]), (101, [0.0, 1.0, 0.0])],
        "vec_id bigint, embedding array<double>",
    )
    docs = spark.createDataFrame(
        [(i, f"doc {i}") for i in (1, 2, 3, 4, 5)],  # 5 has no embedding
        "doc_id bigint, text string",
    )
    return docs, corpus_emb, bench_emb


def test_max_cosine_flags(frames):
    _, corpus_emb, bench_emb = frames
    got = {
        r["vec_id"]: r["max_bench_cos"]
        for r in semantic_contamination(corpus_emb, bench_emb).collect()
    }
    import math

    assert got[1] == 1.0
    assert got[2] == round(0.9 / math.sqrt(0.82), 6)  # vs bench 100
    assert got[3] == 0.0
    assert got[4] == 0.0  # zero-norm contract


def test_decontaminate_keeps_unembedded(frames):
    docs, corpus_emb, bench_emb = frames
    kept = sorted(
        r["doc_id"]
        for r in semantic_decontaminate(
            docs, corpus_emb, bench_emb, emb_id_col="vec_id", threshold=0.95
        ).collect()
    )
    # 1 dropped (cos 1.0) and 2 dropped (cos 0.993884 >= 0.95);
    # 5 kept (no embedding — no evidence, no drop)
    assert kept == [3, 4, 5]


def test_plan_broadcasts_bench(frames):
    _, corpus_emb, bench_emb = frames
    plan = (
        semantic_contamination(corpus_emb, bench_emb)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan
    assert "SortMergeJoin" not in plan
    assert "partial_max" in plan  # per-id max combines map-side


def test_arrow_path_matches_expr(frames):
    """Same contract on both physical strategies: 6-dp-rounded max
    cosine (round is monotone, so max-of-rounded == rounded-max)."""
    _, corpus_emb, bench_emb = frames
    expr = {
        r["vec_id"]: r["max_bench_cos"]
        for r in semantic_contamination(
            corpus_emb, bench_emb, method="expr"
        ).collect()
    }
    arrow = {
        r["vec_id"]: r["max_bench_cos"]
        for r in semantic_contamination(
            corpus_emb, bench_emb, method="arrow"
        ).collect()
    }
    assert arrow == expr


def test_arrow_path_empty_bench_flags_nothing(frames):
    _, corpus_emb, bench_emb = frames
    empty = bench_emb.limit(0)
    for method in ("expr", "arrow"):
        out = semantic_contamination(corpus_emb, empty, method=method)
        assert out.count() == 0, method


def test_method_auto_routes_on_bench_kdims(spark, frames):
    """auto == expr below the threshold (the oracle query's regime);
    a bench set past _EXPR_KDIMS_LIMIT routes to the pandas udf."""
    _, corpus_emb, _ = frames
    big_bench = spark.range(60).select(
        F.col("id").alias("vec_id"),
        F.array_repeat((F.col("id") + 1).cast("double"), 128).alias(
            "embedding"
        ),
    )  # 60 * 128 = 7680 > 4096
    plan = (
        semantic_contamination(corpus_emb.withColumn(
            "embedding", F.array_repeat(F.lit(1.0), 128)
        ), big_bench)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" in plan
    small = (
        semantic_contamination(*frames[1:])
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "ArrowEvalPython" not in small


def test_method_validation(frames):
    _, corpus_emb, bench_emb = frames
    with pytest.raises(ValueError, match="method"):
        semantic_contamination(corpus_emb, bench_emb, method="blas")


def test_arrow_path_composes_on_readstream(spark, frames, tmp_path):
    """The arrow scoring path is a stateless per-row projection —
    it runs unchanged on readStream and emits batch-identical rows
    (the expr path's groupBy(id) max does NOT stream; arrow is the
    streaming-ingest scoring shape)."""
    _, corpus_emb, bench_emb = frames
    src = str(tmp_path / "src")
    corpus_emb.write.parquet(src)
    stream = spark.readStream.schema(
        "vec_id bigint, embedding array<double>"
    ).parquet(src)
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    q = (
        semantic_contamination(stream, bench_emb, method="arrow")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {(r["vec_id"], r["max_bench_cos"])
           for r in spark.read.parquet(out).collect()}
    want = {(r["vec_id"], r["max_bench_cos"])
            for r in semantic_contamination(
                corpus_emb, bench_emb, method="arrow").collect()}
    assert got == want
