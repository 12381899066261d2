"""Semantic benchmark decontamination (embedding-space leakage).

The n-gram decontaminator (operators/decontaminate.py, the GPT-3
13-gram rule) misses PARAPHRASED benchmark leakage — same question,
different surface form.  This operator flags corpus documents whose
embedding is too close (cosine) to any benchmark embedding, the
embedding-space complement every modern decontamination pipeline runs
beside the n-gram pass.

Scale shape: the benchmark set is eval-sized — it BROADCASTS; the
corpus embedding frame streams through a broadcast nested-loop scoring
pass (rows × |bench| fused multiply-adds, whole-stage codegen'd HOFs,
no Python), then ONE map-side-combinable groupBy(id) takes the max
cosine per document.  The corpus never shuffles on anything but its
own id, and only the (id, max_cos) pair moves.

Cross-engine parity: the max cosine rounds to 6 dp and the threshold
compares against the ROUNDED value in both engines — an unrounded
comparison can flip keep flags on a last-ulp sum-order difference
exactly at the boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grass_spark.operators.similarity import _as_double, dot, l2norm


def semantic_contamination(
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_vec_col: str | None = None,
) -> DataFrame:
    """(id, max_bench_cos) — per corpus vector, the highest cosine to
    any benchmark vector (rounded 6 dp).  Zero-norm vectors score 0."""
    bench_vec_col = bench_vec_col or vec_col
    c = corpus_emb.select(
        F.col(id_col), _as_double(vec_col).alias("_e")
    ).withColumn("_n", l2norm("_e"))
    b = bench_emb.select(_as_double(bench_vec_col).alias("_be")).withColumn(
        "_bn", l2norm("_be")
    )
    cos = F.when(
        (F.col("_n") == 0.0) | (F.col("_bn") == 0.0), F.lit(0.0)
    ).otherwise(dot("_e", "_be") / (F.col("_n") * F.col("_bn")))
    return (
        c.crossJoin(F.broadcast(b))
        .select(id_col, cos.alias("_cos"))
        .groupBy(id_col)
        .agg(F.round(F.max("_cos"), 6).alias("max_bench_cos"))
    )


def semantic_decontaminate(
    docs: DataFrame,
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    *,
    id_col: str = "doc_id",
    emb_id_col: str = "vec_id",
    threshold: float = 0.95,
) -> DataFrame:
    """Drop docs whose embedding cosine to ANY benchmark embedding is
    >= ``threshold`` (on the 6-dp-rounded max).  Docs WITHOUT an
    embedding row keep — no evidence, no drop (same contract as the
    n-gram decontaminator and prepare_corpus's semantic stage)."""
    flagged = (
        semantic_contamination(corpus_emb, bench_emb, id_col=emb_id_col)
        .filter(F.col("max_bench_cos") >= threshold)
        .select(F.col(emb_id_col).alias(id_col))
    )
    return docs.join(F.broadcast(flagged), id_col, "left_anti")
