"""Per-source corpus-statistics diagnostics: unigram Shannon entropy
(token diversity / degenerate-source detector) and a Zipf-law slope
fit (natural corpora run slope ≈ −1; generated/boilerplate text bends
the curve — a cheap synthetic-data / template-spam signal).

Scale shape: everything derives from ONE map-side-combinable
``groupBy(source, word)`` census; entropy is a census-sized aggregate,
the Zipf fit ranks only within a source's vocabulary (window bounded
by per-source DISTINCT words, never corpus rows) and regresses over
the top-``n_top`` ranks per source.

Cross-engine parity: entropy uses H = ln(n) − Σ c·ln(c) / n over
exact integer counts with each ``c·ln(c)`` term rounded to 6 dp
before the sum (JVM/libm ln last-ulp; at petabyte counts the terms
reach ~1e11 where round-6 cannot absorb ulp error — the 6-dp gate is
a small-scale correctness proof, the operator itself is
order-independent to ~1e-9 relative).  The Zipf OLS composes from
per-rank ln terms rounded the same way; ranks are deterministic
(freq desc, word asc).  sqrt/division are IEEE-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from grass_spark.operators.keywords import WORD_PATTERN


def source_word_census(
    df: DataFrame, *, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """(source, word, c) — per-source word counts, one corpus scan."""
    words = F.explode(
        F.regexp_extract_all(
            F.lower(F.col(text_col)), F.lit(WORD_PATTERN), F.lit(0)
        )
    ).alias("word")
    return (
        df.select(F.col(group_col).alias("source"), words)
        .groupBy("source", "word")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def source_entropy(
    df: DataFrame, *, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """(source, n_tokens, vocab, entropy, entropy_norm, perplexity).

    ``entropy`` is the unigram Shannon entropy in nats (6-dp),
    ``entropy_norm`` divides by ln(vocab) (1.0 = perfectly uniform;
    NULL for a single-word source), ``perplexity = exp(entropy)``.
    """
    cen = source_word_census(df, text_col=text_col, group_col=group_col)
    agg = cen.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("vocab"),
        F.sum(
            F.round(F.col("c").cast("double") * F.log(F.col("c").cast("double")), 6)
        ).alias("_sclnc"),
    )
    n_d = F.col("n_tokens").cast("double")
    h = F.round(F.log(n_d) - F.col("_sclnc") / n_d, 6)
    return agg.select(
        "source",
        "n_tokens",
        "vocab",
        h.alias("entropy"),
        F.when(
            F.col("vocab") > 1,
            F.round(h / F.log(F.col("vocab").cast("double")), 6),
        ).alias("entropy_norm"),
        F.round(F.exp(h), 6).alias("perplexity"),
    ).orderBy("source")


def zipf_slope(
    df: DataFrame,
    *,
    text_col: str = "text",
    group_col: str = "source",
    n_top: int = 100,
) -> DataFrame:
    """(source, n_top, slope, intercept, r2) — OLS of ln(freq) on
    ln(rank) over the top-``n_top`` words per source (rank 1 =
    most frequent; ties break word-asc so ranks are deterministic,
    and tied frequencies make the fit order-invariant anyway).

    slope/intercept/r2 are 6-dp rounded; sources with a single ranked
    word return NULL slope (no x-variance).  r2 is NULL when the
    top-``n_top`` frequencies are all equal (zero y-variance).
    """
    if n_top < 2:
        raise ValueError(f"n_top must be >= 2, got {n_top}")
    cen = source_word_census(df, text_col=text_col, group_col=group_col)
    w = Window.partitionBy("source").orderBy(F.desc("c"), F.asc("word"))
    top = cen.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= n_top
    )
    x = F.round(F.log(F.col("rank").cast("double")), 6)
    y = F.round(F.log(F.col("c").cast("double")), 6)
    pts = top.select("source", x.alias("_x"), y.alias("_y"))
    agg = pts.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_top"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_y") * F.col("_y")).alias("_syy"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
    )
    n_d = F.col("n_top").cast("double")
    sxx = n_d * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    syy = n_d * F.col("_syy") - F.col("_sy") * F.col("_sy")
    sxy = n_d * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    slope = F.when(F.round(sxx, 6) != 0.0, F.round(sxy / sxx, 6))
    intercept = F.when(
        F.round(sxx, 6) != 0.0,
        F.round((F.col("_sy") - (sxy / sxx) * F.col("_sx")) / n_d, 6),
    )
    r2 = F.when(
        (F.round(sxx, 6) != 0.0) & (F.round(syy, 6) != 0.0),
        F.round((sxy * sxy) / (sxx * syy), 6),
    )
    return agg.select(
        "source",
        "n_top",
        slope.alias("slope"),
        intercept.alias("intercept"),
        r2.alias("r2"),
    ).orderBy("source")


def corpus_diff(
    old: DataFrame,
    new: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Version diff between two corpus snapshots: one row per status
    in {added, removed, changed, unchanged} with ``n_docs`` — the
    release audit an incremental pipeline prints before shipping a
    new snapshot (and the sanity gate on the dedup-store ingest
    path: |added| should match the delta batch's survivor count).

    Compares content by ``md5(text)`` so the join carries (id, 32-hex)
    instead of full documents; statuses come from a full-outer join on
    the id.  All four statuses always appear (zero-filled) so
    downstream diffs of diffs stay aligned.

    Scale shape: each snapshot projects to (id, hash) in its scan
    stage, ONE full-outer shuffle join on the id (co-located and
    exchange-free when both snapshots share a bucketed layout), one
    combinable groupBy over 4 keys.  The 4-row status spine is the
    broadcast side of nothing — it LEFT-joins the aggregate, which is
    4 rows at most.
    """
    o = old.select(
        F.col(id_col).alias("_id"), F.md5(F.col(text_col)).alias("_ho")
    )
    n = new.select(
        F.col(id_col).alias("_id"), F.md5(F.col(text_col)).alias("_hn")
    )
    j = o.join(n, "_id", "full_outer").select(
        F.when(F.col("_ho").isNull(), F.lit("added"))
        .when(F.col("_hn").isNull(), F.lit("removed"))
        .when(F.col("_ho") == F.col("_hn"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
        .alias("status")
    )
    counts = j.groupBy("status").agg(F.count(F.lit(1)).alias("n_docs"))
    spine = counts.sparkSession.createDataFrame(
        [("added",), ("removed",), ("changed",), ("unchanged",)],
        "status string",
    )
    return spine.join(F.broadcast(counts), "status", "left").select(
        "status",
        F.coalesce("n_docs", F.lit(0).cast("long")).alias("n_docs"),
    )


def vocab_growth(
    docs: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    bucket_size: int = 1000,
) -> DataFrame:
    """Heaps-law vocabulary growth curve: walking the corpus in
    ``id_col`` order in buckets of ``bucket_size`` docs, how many
    NEVER-before-seen whitespace words each bucket contributes and the
    running vocabulary / token totals — the log-log slope of
    ``cum_vocab`` vs ``cum_tokens`` is the Heaps exponent.

    Returns ``(bucket, n_docs, bucket_tokens, new_words, cum_vocab,
    cum_tokens)`` — one row per occupied id bucket.

    Scale shape: first-occurrence election is a map-side-combinable
    ``groupBy(word).min(id)`` (the corpus-sized stage — a stopword's
    10^9 occurrences collapse in the partial aggregate); token counts
    are a scan-stage projection into a bucket census.  Both cumulative
    windows run over the <= n_docs/bucket_size census rows.  The two
    corpus consumers re-scan the parquet rather than checkpoint: the
    shared subtree is a plain scan + split (cheap), not a reduced
    frame — the multi-consumer rule targets expensive subtrees.
    """
    if bucket_size < 1:
        raise ValueError("vocab_growth: bucket_size must be >= 1")
    words = F.filter(
        F.split(F.col(text_col), " "), lambda x: x != ""
    )
    base = docs.select(
        F.col(id_col).cast("long").alias("_id"),
        words.alias("_ws"),
    ).select(
        # integer floor division (Spark `div` == DuckDB `//`) — the
        # m4_downsample bucket-id discipline
        F.expr(f"_id div {int(bucket_size)}").alias("bucket"),
        "_ws",
    )
    toks = base.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size("_ws")).alias("bucket_tokens"),
    )
    fo = (
        base.select("bucket", F.explode(F.array_distinct("_ws")).alias("_w"))
        .groupBy("_w")
        .agg(F.min("bucket").alias("_fb"))
    )
    wc = fo.groupBy(F.col("_fb").alias("bucket")).agg(
        F.count(F.lit(1)).alias("new_words")
    )
    w = Window.orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return (
        toks.join(wc, "bucket", "left")
        .select(
            "bucket",
            "n_docs",
            "bucket_tokens",
            F.coalesce("new_words", F.lit(0).cast("long"))
            .alias("new_words"),
        )
        .select(
            "bucket",
            "n_docs",
            "bucket_tokens",
            "new_words",
            F.sum("new_words").over(w).alias("cum_vocab"),
            F.sum("bucket_tokens").over(w).alias("cum_tokens"),
        )
        .orderBy("bucket")
    )
