"""Hashed linear quality classifier (fastText-style hashing trick).

Model-based quality filtering at corpus scale: a linear text
classifier whose features are hash buckets of the document's tokens
(Weinberger et al. 2009 "feature hashing"; the fastText quality
filters used for GPT-3/CCNet-style corpus curation are this shape).
The model is just a (bucket, weight) table — tiny (the bucket count),
so it BROADCASTS; the corpus explodes to tokens, buckets map-side, and
the only shuffle is the per-document score groupBy (map-side
combinable).  Nothing ever collects and no Python runs per row.

Portability: the bucket hash is the repo's portable md5-uint32
(operators/sampling.py:27) mod ``n_buckets``, bit-identical in DuckDB;
scores round to 6 dp (sum order + sigmoid exp differ in the last ulp
across engines — CLAUDE.md convention).

``synth_weights`` derives a deterministic weight table from the bucket
ids themselves (uniform [-1, 1) via the same md5 hash) so tests and
oracles can rebuild the exact model anywhere; a real deployment swaps
in trained weights with the same schema.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from grass_spark.operators.keywords import WORD_PATTERN
from grass_spark.operators.sampling import uniform_hash


def hash_bucket(
    word: Column, n_buckets: int, *, salt: str = "", hash: str = "portable"
) -> Column:
    """Feature-hash bucket in [0, n_buckets).

    ``"portable"`` is the md5-uint32 recipe (bit-identical in DuckDB —
    the oracle contract) but allocates an md5 hex string PER TOKEN,
    which at corpus scale is allocation-bound (the line_filter wall,
    PLANS.md).  ``"fast"`` is ``xxhash64`` — pure JVM long math, no
    string temporaries — for training/scoring paths that don't need an
    external-engine replay.  The two produce DIFFERENT bucketings:
    weights trained under one hash must be scored under the same one.
    """
    if hash == "fast":
        return F.pmod(F.xxhash64(word, F.lit(salt)), F.lit(n_buckets))
    if hash != "portable":
        raise ValueError(f"unknown hash {hash!r}")
    h = F.md5(F.concat_ws(":", word.cast("string"), F.lit(salt)))
    u32 = F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
    return (u32 % n_buckets).cast("long")


def synth_weights(
    spark: SparkSession, n_buckets: int, *, salt: str = "w"
) -> DataFrame:
    """(bucket, weight) with weight = round(uniform[-1,1), 6) from the
    bucket's own md5 — deterministic and rebuildable in any engine."""
    b = spark.range(n_buckets).withColumnRenamed("id", "bucket")
    u = uniform_hash(F.col("bucket"), salt=salt)
    return b.withColumn("weight", F.round(u * 2.0 - 1.0, 6))


def linear_quality_score(
    df: DataFrame,
    weights: DataFrame,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    salt: str = "",
    hash: str = "portable",
) -> DataFrame:
    """Per-document linear score + length-normalized sigmoid prob.

    ``score = round(sum_tokens weight[bucket(token)], 6)`` (token
    multiplicity counts, fastText bag-of-words style);
    ``prob = round(sigmoid(score / n_tokens), 6)``.  Docs with no
    token are absent (no features to score).  ``weights`` must cover
    every bucket in [0, n_buckets) — synth or trained.
    """
    words = F.explode(
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
        )
    ).alias("word")
    toks = df.select(F.col(id_col), words).withColumn(
        "bucket", hash_bucket(F.col("word"), n_buckets, salt=salt, hash=hash)
    )
    scored = (
        toks.join(F.broadcast(weights), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("weight").alias("_raw"),
        )
    )
    # prob is computed from the ROUNDED score: two engines' sums can
    # differ in the last ulp (order), but their round-6 almost never
    # does — feeding the rounded value through exp keeps prob identical
    score = F.round(F.col("_raw"), 6)
    prob = F.round(
        F.lit(1.0) / (F.lit(1.0) + F.exp(-(score / F.col("n_tokens")))),
        6,
    )
    return scored.select(
        id_col,
        "n_tokens",
        score.alias("score"),
        prob.alias("prob"),
    )


def train_classifier(
    docs: DataFrame,
    rounds: int = 10,
    lr: float = 1.0,
    l2: float = 0.0,
    *,
    label_col: str = "label",
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    salt: str = "",
    hash: str = "portable",
) -> tuple[DataFrame, list[float]]:
    """Distributed logistic-regression training for the hashed
    classifier — the fastText-style quality-filter fit, in-engine.

    Model matches :func:`linear_quality_score` exactly: mean-pooled
    hashed bag-of-words, ``p = sigmoid(sum_t w[bucket_t] / n_tokens)``.
    ``label_col`` is 0/1 (e.g. curated=1 vs raw=0, the CCNet recipe).

    Scale shape per round: features stage ONCE up front — (doc, bucket,
    count) + per-doc totals, eagerly checkpointed so no round re-scans
    text; each round is two map-side-combinable groupBys (score by doc,
    gradient by bucket — the bucket key spreads hot docs, the doc key
    spreads hot buckets) and ONE n_buckets-row collect that also cuts
    the round's lineage (the kmeans discipline — weights re-enter the
    next plan as a fresh local frame).  Docs with no token are skipped
    (no features).  Returns ``(weights, logloss_history)`` — weights is
    a (bucket, weight) frame covering every bucket, directly usable by
    :func:`linear_quality_score`; history has ``rounds + 1`` entries
    (loss before each update, final value appended).
    """
    spark = docs.sparkSession
    if rounds < 0:
        raise ValueError("rounds must be >= 0")
    words = F.explode(
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
        )
    ).alias("word")
    feats = (
        docs.select(F.col(id_col), F.col(label_col).alias("_y"), words)
        .withColumn(
            "bucket",
            hash_bucket(F.col("word"), n_buckets, salt=salt, hash=hash),
        )
        .groupBy(id_col, "_y", "bucket")
        .agg(F.count(F.lit(1)).alias("_c"))
    ).localCheckpoint()  # eager: every round re-scans this frame
    totals = (
        feats.groupBy(id_col)
        .agg(F.sum("_c").alias("_n"))
        .localCheckpoint()
    )
    n_docs = totals.count()
    if n_docs == 0:
        raise ValueError("no documents with tokens to train on")
    w = [0.0] * n_buckets
    history: list[float] = []
    for _ in range(rounds + 1):
        wdf = spark.createDataFrame(
            [(b, float(v)) for b, v in enumerate(w)],
            "bucket long, weight double",
        )
        scored = (
            feats.join(F.broadcast(wdf), "bucket")
            .groupBy(id_col, "_y")
            .agg(F.sum(F.col("_c") * F.col("weight")).alias("_s"))
            .join(totals, id_col)
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-(F.col("_s") / F.col("_n"))))
        pc = F.greatest(F.least(p, F.lit(1.0 - 1e-12)), F.lit(1e-12))
        scored = scored.withColumn("_p", p).withColumn(
            "_ll",
            -(F.col("_y") * F.log(pc)
              + (1 - F.col("_y")) * F.log(F.lit(1.0) - pc)),
        )
        # one pass: loss AND the per-doc error both come off `scored`;
        # localCheckpoint would be overkill (two cheap jobs on a
        # checkpointed-feature join)
        history.append(
            float(scored.agg(F.avg("_ll")).collect()[0][0])
        )
        if len(history) == rounds + 1:
            break
        # gradient: per-doc error joined back onto the feature frame.
        # The error side is (id, _g) — 16 bytes/doc — so up to tens of
        # millions of docs it BROADCASTS and the 40x-bigger feature
        # frame never reshuffles (measured: the SMJ re-sorted the
        # feature frame EVERY round).  Past the gate, fall back to the
        # shuffle join (executor memory, not correctness, is the bound).
        err = scored.select(
            id_col, ((F.col("_p") - F.col("_y")) / F.col("_n")).alias("_g")
        )
        if n_docs <= 20_000_000:
            err = F.broadcast(err)
        grad_rows = (
            feats.select(id_col, "bucket", "_c")
            .join(err, id_col)
            .groupBy("bucket")
            .agg(F.sum(F.col("_g") * F.col("_c")).alias("_grad"))
        ).collect()
        grad = [0.0] * n_buckets
        for r in grad_rows:
            grad[int(r["bucket"])] = float(r["_grad"])
        # mean gradient: keeps lr meaningful at any corpus size
        w = [
            wi - lr * (gi / n_docs + l2 * wi)
            for wi, gi in zip(w, grad)
        ]
    weights = spark.createDataFrame(
        [(b, float(v)) for b, v in enumerate(w)],
        "bucket long, weight double",
    )
    return weights, history
