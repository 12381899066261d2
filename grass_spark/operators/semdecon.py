"""Semantic benchmark decontamination (embedding-space leakage).

The n-gram decontaminator (operators/decontaminate.py, the GPT-3
13-gram rule) misses PARAPHRASED benchmark leakage — same question,
different surface form.  This operator flags corpus documents whose
embedding is too close (cosine) to any benchmark embedding, the
embedding-space complement every modern decontamination pipeline runs
beside the n-gram pass.

Scale shape: the benchmark set is eval-sized — it BROADCASTS (or, on
the arrow path, rides the udf closure once per executor); the corpus
embedding frame streams through a scoring pass and never shuffles on
anything but its own id.  Two physical strategies with one contract
(max cosine rounded to 6 dp):

* ``"expr"`` — broadcast nested-loop crossJoin + whole-stage-codegen'd
  HOF dot products, then ONE map-side-combinable groupBy(id) max.
  Bit-identical to the DuckDB oracle; ~190k cosines/s/core.
* ``"arrow"`` — a vectorized ``pandas_udf``: the benchmark matrix is
  collected once (bounded by contract: it IS the eval suite) and each
  Arrow batch costs one BLAS matmul + row max.  numpy's pairwise
  summation can differ from the fold in the last ulp *before*
  rounding, so this path is equivalent-after-rounding, not
  bit-identical — oracle queries stay on ``"expr"``.  Measured 58x
  on 1M x 200 at 8 cores (134.5 s expr, 2.3 s arrow —
  scripts/scale_soak.py --semdecon-vecs); at honest minutes-long
  walls (8M x 4000 = 32e9 cosines) 664M cos/s at 8 cores with 2->8
  scaling efficiency 0.869.  The GEMM is ROW-BLOCKED
  (_SCORE_BLOCK_ROWS) — a batch-wide sims temporary was
  memory-bandwidth-bound (eff 0.54, 4x slower); max runs BEFORE
  round (both monotone-safe: max-of-rounded == rounded-max, and
  dividing the max by the positive norm preserves argmax).

``"auto"`` routes to arrow when |bench| * dims crosses the same
threshold the SemDeDup assigner uses.

Cross-engine parity: the keep/drop threshold compares against the
ROUNDED max cosine in both engines — an unrounded comparison can flip
keep flags on a last-ulp sum-order difference exactly at the boundary.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grass_spark.operators.semdedup import _EXPR_KDIMS_LIMIT
from grass_spark.operators.similarity import _as_double, dot, l2norm


def semantic_contamination(
    corpus_emb: DataFrame,
    bench_emb: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bench_vec_col: str | None = None,
    method: str = "auto",
) -> DataFrame:
    """(id, max_bench_cos) — per corpus vector, the highest cosine to
    any benchmark vector (rounded 6 dp).  Zero-norm vectors score 0.
    Assumes one embedding row per id (the corpus-embedding contract)."""
    bench_vec_col = bench_vec_col or vec_col
    if method not in ("expr", "arrow", "auto"):
        raise ValueError(f"method must be expr/arrow/auto, got {method!r}")
    c = corpus_emb.select(
        F.col(id_col), _as_double(vec_col).alias("_e")
    ).withColumn("_n", l2norm("_e"))

    if method != "expr":
        # the bench frame is eval-suite-sized by contract — bounded
        # collect, same pattern as the SemDeDup centroid frame
        rows = [list(r[0]) for r in
                bench_emb.select(_as_double(bench_vec_col)).collect()]
        dims = len(rows[0]) if rows else 0
        if method == "auto":
            method = "arrow" if len(rows) * dims > _EXPR_KDIMS_LIMIT else "expr"
        if method == "arrow":
            if not rows:
                return c.select(
                    id_col, F.lit(0.0).alias("max_bench_cos")
                ).limit(0)
            bmat = np.array(rows, dtype=np.float64)
            b_norm = np.sqrt((bmat * bmat).sum(axis=1))
            # pre-normalize once: zero-norm bench rows become zero
            # vectors, i.e. cosine contribution 0 — same as the expr
            # path's explicit 0.0 for zero-norm pairs
            b_safe = np.where(b_norm > 0.0, b_norm, 1.0)
            b_unit = np.where(
                b_norm[:, None] > 0.0, bmat / b_safe[:, None], 0.0
            )

            from grass_spark.operators.semdedup import _SCORE_BLOCK_ROWS
            from pyspark.sql.functions import pandas_udf

            @pandas_udf("double")
            def _maxcos(batch: pd.Series) -> pd.Series:
                n_rows = len(batch)
                if n_rows == 0:
                    return pd.Series([], dtype="float64")
                emat = np.vstack(batch.to_numpy())
                out = np.empty(n_rows, dtype=np.float64)
                # row-block the GEMM so the sims block stays cache-sized
                # instead of an 80 MB batch-wide temporary — the full
                # matrix was memory-bandwidth-bound and didn't scale
                # with cores.  max BEFORE round (round is monotone);
                # dividing the max by the positive norm afterwards
                # preserves argmax.
                for s in range(0, n_rows, _SCORE_BLOCK_ROWS):
                    blk = emat[s:s + _SCORE_BLOCK_ROWS]
                    e_norm = np.sqrt((blk * blk).sum(axis=1))
                    e_safe = np.where(e_norm > 0.0, e_norm, 1.0)
                    m = (blk @ b_unit.T).max(axis=1)
                    out[s:s + _SCORE_BLOCK_ROWS] = np.where(
                        e_norm > 0.0, m / e_safe, 0.0
                    )
                return pd.Series(np.round(out, 6))

            return c.select(
                F.col(id_col), _maxcos(F.col("_e")).alias("max_bench_cos")
            )

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
    method: str = "auto",
) -> DataFrame:
    """Drop docs whose embedding cosine to ANY benchmark embedding is
    >= ``threshold`` (on the 6-dp-rounded max).  Docs WITHOUT an
    embedding row keep — no evidence, no drop (same contract as the
    n-gram decontaminator and prepare_corpus's semantic stage)."""
    flagged = (
        semantic_contamination(
            corpus_emb, bench_emb, id_col=emb_id_col, method=method
        )
        .filter(F.col("max_bench_cos") >= threshold)
        .select(F.col(emb_id_col).alias(id_col))
    )
    return docs.join(F.broadcast(flagged), id_col, "left_anti")
