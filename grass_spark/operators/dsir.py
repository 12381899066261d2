"""DSIR data selection (importance resampling over hashed n-grams).

DSIR (Xie et al. 2023) selects pretraining documents that *look like a
trusted target corpus*: fit two bag-of-hashed-ngram multinomials — the
target distribution p and the raw-pool distribution q — and weight each
raw document by its log importance ratio

    log w(doc) = sum over gram occurrences of  [ln p_b - ln q_b]

(b = the gram's hash bucket).  Sampling k docs *without replacement*
proportional to w is the Gumbel-top-k trick: key = log w + Gumbel
noise, take the k largest keys.  The noise here is DETERMINISTIC
(md5-derived uniform, the engine's portable-hash recipe) so the exact
same sample reproduces on any engine and any run.

Scale shape (100 TB raw pool):

* gram rows are two scan-stage Generates (unigram explode + the
  index-explode bigram shape — one fused multi-n Generate measured 3x
  slower, PLANS.md round-4); the corpus never shuffles to featurize;
* both distributions are one map-side-combined ``groupBy(bucket)``
  each — output is exactly ``n_buckets`` rows;
* the log-ratio table is densified over ``range(n_buckets)`` (absent
  buckets still carry the smoothed ratio) and BROADCASTS — scoring is
  a map-side join + one combinable ``groupBy(id)``;
* selection is ``ORDER BY key DESC LIMIT k`` = TakeOrderedAndProject
  (per-partition top-k, never a global sort).

Cross-engine parity: bucket ids and the Gumbel uniform come from the
portable md5 recipe (bit-identical in DuckDB); ``ln`` differs JVM vs
libm in the last ulp, so the per-doc sum and the final key round to
6 dp and ties break on the id column.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from grass_spark.operators.dedup import normalize_text


def _bucket(gram: Column, n_buckets: int) -> Column:
    """Portable gram -> bucket: first 8 md5 hex digits as uint32, mod
    n_buckets (DuckDB: CAST('0x' || substr(md5(g),1,8) AS UBIGINT) % B)."""
    u32 = F.conv(F.substring(F.md5(gram), 1, 8), 16, 10).cast("long")
    return F.pmod(u32, F.lit(n_buckets))


def hashed_gram_rows(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    bigrams: bool = True,
) -> DataFrame:
    """(id, bucket) — one row per unigram (and bigram) occurrence.
    Two separate scan-stage Generates union'd, never one fused pass."""
    d = docs.withColumn(
        "_ws", F.split(normalize_text(F.col(text_col)), " ")
    )
    # empty text normalizes to [""] — the empty string is not a gram
    uni = (
        d.select(id_col, F.explode("_ws").alias("_g"))
        .filter(F.col("_g") != "")
        .select(id_col, _bucket(F.col("_g"), n_buckets).alias("bucket"))
    )
    if not bigrams:
        return uni
    bi = (
        d.filter(F.size("_ws") >= 2)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.size("_ws") - 2)).alias("_i"),
            "_ws",
        )
        .select(
            id_col,
            _bucket(
                F.concat_ws(
                    " ",
                    F.element_at("_ws", F.col("_i") + 1),
                    F.element_at("_ws", F.col("_i") + 2),
                ),
                n_buckets,
            ).alias("bucket"),
        )
    )
    return uni.unionByName(bi)


def bucket_logratio(
    target: DataFrame,
    raw: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    alpha: float = 1.0,
    bigrams: bool = True,
) -> DataFrame:
    """(bucket, lam) for EVERY bucket in [0, n_buckets): the smoothed
    log importance ratio ln p_b - ln q_b.  Both corpus totals ride as
    1-row broadcast frames — nothing collects on the driver."""
    a = float(alpha)
    if a <= 0:
        raise ValueError(f"alpha must be > 0, got {alpha}")

    def counts(df: DataFrame, cname: str, tname: str) -> tuple[DataFrame, DataFrame]:
        g = hashed_gram_rows(
            df, id_col=id_col, text_col=text_col,
            n_buckets=n_buckets, bigrams=bigrams,
        )
        c = g.groupBy("bucket").agg(
            F.count(F.lit(1)).cast("double").alias(cname)
        )
        tot = c.agg(F.sum(cname).alias(tname))
        return c, tot

    ct, tt = counts(target, "_ct", "_nt")
    cr, tr = counts(raw, "_cr", "_nr")
    # dense is the PRESERVED side of the left joins below — a broadcast
    # hint there is unusable (build-left on a left join); the broadcast
    # that matters is the finished lam table into the scoring join.
    dense = target.sparkSession.range(n_buckets).select(
        F.col("id").cast("long").alias("bucket")
    )
    b = float(n_buckets)
    return (
        dense.join(ct, "bucket", "left")
        .join(cr, "bucket", "left")
        .join(F.broadcast(tt))
        .join(F.broadcast(tr))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce("_ct", F.lit(0.0)) + a)
                    / (F.coalesce("_nt", F.lit(0.0)) + a * b)
                )
                - F.log(
                    (F.coalesce("_cr", F.lit(0.0)) + a)
                    / (F.coalesce("_nr", F.lit(0.0)) + a * b)
                )
            ).alias("lam"),
        )
    )


def dsir_weights(
    raw: DataFrame,
    target: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    alpha: float = 1.0,
    bigrams: bool = True,
    logratio: DataFrame | None = None,
) -> DataFrame:
    """(id, logw) for every raw doc — the 6-dp-rounded log importance
    weight.  Docs with no grams (empty/whitespace text) score 0.0:
    an empty product of ratios is weight 1.  Pass ``logratio`` (a
    :func:`bucket_logratio` frame) to reuse a fitted model."""
    lam = logratio if logratio is not None else bucket_logratio(
        target, raw, id_col=id_col, text_col=text_col,
        n_buckets=n_buckets, alpha=alpha, bigrams=bigrams,
    )
    grams = hashed_gram_rows(
        raw, id_col=id_col, text_col=text_col,
        n_buckets=n_buckets, bigrams=bigrams,
    )
    w = grams.join(F.broadcast(lam), "bucket").groupBy(id_col).agg(
        F.round(F.sum("lam"), 6).alias("logw")
    )
    return (
        raw.select(id_col)
        .join(w, id_col, "left")
        .select(id_col, F.coalesce("logw", F.lit(0.0)).alias("logw"))
    )


def dsir_sample(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = 10_000,
    alpha: float = 1.0,
    bigrams: bool = True,
    salt: str = "",
    logratio: DataFrame | None = None,
) -> DataFrame:
    """Gumbel-top-k sample of ``k`` raw docs without replacement,
    proportional to the DSIR importance weight: (id, logw, key) —
    the k largest keys, key = round(logw + Gumbel(u), 6), u the
    deterministic md5 uniform shifted to (0, 1) so ln never sees 0.
    Ties at the boundary break on the id column (ascending)."""
    if k <= 0:
        raise ValueError(f"k must be positive, got {k}")
    w = dsir_weights(
        raw, target, id_col=id_col, text_col=text_col,
        n_buckets=n_buckets, alpha=alpha, bigrams=bigrams,
        logratio=logratio,
    )
    h = F.md5(F.concat_ws(":", F.col(id_col).cast("string"), F.lit(salt)))
    u32 = F.conv(F.substring(h, 1, 8), 16, 10).cast("double")
    u = (u32 + F.lit(0.5)) / F.lit(2.0**32)
    gumbel = -F.log(-F.log(u))
    return (
        w.withColumn("key", F.round(F.col("logw") + gumbel, 6))
        .orderBy(F.col("key").desc(), F.col(id_col))
        .limit(k)
    )
