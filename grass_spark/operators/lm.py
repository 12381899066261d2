"""N-gram language-model perplexity scoring (the CCNet quality filter).

CCNet-style pipelines score every document against a language model
trained on a trusted reference corpus and keep the low-perplexity
stratum (gibberish, boilerplate and mojibake score high).  This is the
n-gram formulation: a bigram model with add-k smoothing,

    P(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k * V),

``doc_logprob = mean(-log2 P)`` over the document's bigram positions
and ``perplexity = 2 ** doc_logprob``.

Scale shape (100 TB corpus):

* model training is two map-side-combined ``groupBy`` counts (bigram,
  first-word) over the reference corpus — the model IS a DataFrame,
  arbitrarily large, never collected;
* scoring is two bounded equi-joins (positions ⋈ bigram counts on the
  bigram key, ⋈ first-word counts on w1) + one ``groupBy(doc)``;
* the vocabulary size joins in as a 1-row broadcast (no driver
  collect in the plan);
* unseen bigrams take the smoothed floor via left joins + coalesce(0).

Everything is JVM expressions; the gram explode uses the
index-explode + slice shape (see PLANS.md round-4 notes).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grass_spark.operators.dedup import normalize_text


def _bigram_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, idx, w1, w2) — one row per bigram position; docs with
    fewer than 2 words have none."""
    d = df.withColumn("_ws", F.split(normalize_text(F.col(text_col)), " "))
    return (
        d.filter(F.size("_ws") >= 2)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.size("_ws") - 2)).alias("idx"),
            "_ws",
        )
        .select(
            id_col,
            "idx",
            F.element_at("_ws", F.col("idx") + 1).alias("w1"),
            F.element_at("_ws", F.col("idx") + 2).alias("w2"),
        )
    )


def bigram_model(
    train: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Train the model: (bigram counts, first-word counts, 1-row vocab
    size) — three DataFrames, no driver materialization."""
    grams = _bigram_rows(train, id_col, text_col)
    big = grams.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("c12"))
    uni = big.groupBy("w1").agg(F.sum("c12").alias("c1"))
    vocab = (
        train.withColumn(
            "_w", F.explode(F.split(normalize_text(F.col(text_col)), " "))
        )
        .agg(F.countDistinct("_w").cast("double").alias("v"))
    )
    return big, uni, vocab


def lm_score(
    docs: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame] | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    add_k: float = 0.5,
    train: DataFrame | None = None,
) -> DataFrame:
    """Per-document bigram cross-entropy + perplexity.

    ``model`` is :func:`bigram_model` output; with neither ``model``
    nor ``train`` given, the model trains on ``docs`` itself (the
    self-scoring mode: outliers against the corpus's own statistics).
    Returns one row per doc with >= 1 bigram: ``n_bigrams``,
    ``logprob`` (mean -log2 P) and ``perplexity``.
    """
    if model is None:
        model = bigram_model(
            train if train is not None else docs,
            id_col=id_col, text_col=text_col,
        )
    big, uni, vocab = model
    k = float(add_k)
    pos = _bigram_rows(docs, id_col, text_col)
    scored = (
        pos.join(big, ["w1", "w2"], "left")
        .join(uni, "w1", "left")
        .join(F.broadcast(vocab))
        .withColumn(
            "_p",
            (F.coalesce(F.col("c12"), F.lit(0)) + F.lit(k))
            / (F.coalesce(F.col("c1"), F.lit(0)) + F.lit(k) * F.col("v")),
        )
        .withColumn("_nlp", -F.log2("_p"))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.avg("_nlp").alias("logprob"),
        )
        .withColumn("perplexity", F.pow(F.lit(2.0), F.col("logprob")))
    )


def perplexity_buckets(
    docs: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame] | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    cuts: tuple[float, float] = (1 / 3, 2 / 3),
    add_k: float = 0.5,
    train: DataFrame | None = None,
    exact: bool = True,
) -> DataFrame:
    """CCNet head/middle/tail strata: bucket each document by where its
    LM perplexity falls among documents of the SAME language.

    CCNet keeps the low-perplexity head+middle and drops the tail
    (gibberish, mojibake, boilerplate); the thresholds are per-language
    perplexity quantiles at ``cuts`` — NOT global, because languages
    have wildly different base perplexities under any one model.

    Scale shape (100 TB): scoring is :func:`lm_score` (two equi-joins +
    one groupBy(doc)); the threshold frame is |languages| rows — it
    broadcasts back, the scored corpus never reshuffles.  With
    ``exact=True`` the per-language quantile is Spark's exact
    ``percentile`` (Hyndman-Fan type 7, == DuckDB ``quantile_cont``) —
    the aggregation buffers each language's value multiset, fine up to
    ~10^8 docs per language; past that pass ``exact=False`` for
    Greenwald-Khanna ``approx_percentile`` (rank error <= 1e-4,
    NOT a cross-engine parity substitute — same contract as
    ``APPROX_KERNELS``).

    Cross-engine parity: quantiles are taken over the 6-dp-ROUNDED
    perplexities and the thresholds round to 6 dp again before the
    bucket comparison — JVM vs libm ``log``/``pow`` differ in the last
    ulp, so unrounded inputs would flip bucket labels at the cut.

    Returns one row per doc with >= 1 bigram: ``(id, lang, n_bigrams,
    perplexity, ppl_head_cut, ppl_middle_cut, bucket)``.
    """
    lo, hi = float(cuts[0]), float(cuts[1])
    if not (0.0 < lo < hi < 1.0):
        raise ValueError(f"cuts must satisfy 0 < lo < hi < 1, got {cuts}")
    scores = lm_score(
        docs, model, id_col=id_col, text_col=text_col,
        add_k=add_k, train=train,
    )
    j = (
        docs.select(id_col, lang_col)
        .join(scores, id_col)
        .select(
            id_col, lang_col, "n_bigrams",
            F.round("perplexity", 6).alias("perplexity"),
        )
        # BOTH the threshold agg and the final join consume this frame:
        # without the checkpoint the whole lm_score subtree (several
        # corpus scans + two model joins) executes twice per action —
        # the standard multi-consumer lineage trap.  The materialized
        # frame is 4 narrow columns per doc.
        .localCheckpoint(eager=False)
    )
    if exact:
        q = F.expr(f"percentile(perplexity, array({lo!r}D, {hi!r}D))")
    else:
        q = F.expr(
            f"approx_percentile(perplexity, array({lo!r}D, {hi!r}D), 10000)"
        )
    thr = j.groupBy(lang_col).agg(
        F.round(F.element_at(q, 1), 6).alias("ppl_head_cut"),
        F.round(F.element_at(q, 2), 6).alias("ppl_middle_cut"),
    )
    return j.join(F.broadcast(thr), lang_col).select(
        id_col, lang_col, "n_bigrams", "perplexity",
        "ppl_head_cut", "ppl_middle_cut",
        F.when(F.col("perplexity") <= F.col("ppl_head_cut"), "head")
        .when(F.col("perplexity") <= F.col("ppl_middle_cut"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


def ccnet_filter(
    docs: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame] | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    lang_col: str = "lang",
    keep: tuple[str, ...] = ("head", "middle"),
    cuts: tuple[float, float] = (1 / 3, 2 / 3),
    add_k: float = 0.5,
    train: DataFrame | None = None,
    exact: bool = True,
) -> DataFrame:
    """Keep only the docs whose per-language perplexity bucket is in
    ``keep`` (CCNet default: drop the tail).  Docs with no bigram
    positions have no perplexity evidence and KEEP — same
    no-evidence-no-drop contract as the decontaminators."""
    bad = {b for b in keep if b not in ("head", "middle", "tail")}
    if bad:
        raise ValueError(f"unknown buckets in keep: {sorted(bad)}")
    flagged = (
        perplexity_buckets(
            docs, model, id_col=id_col, text_col=text_col,
            lang_col=lang_col, cuts=cuts, add_k=add_k,
            train=train, exact=exact,
        )
        .filter(~F.col("bucket").isin(*keep))
        .select(id_col)
    )
    return docs.join(flagged, id_col, "left_anti")


# ---------------------------------------------------------------------
# Trigram stupid backoff (Brants et al. 2007, "Large Language Models in
# Machine Translation") — the web-scale n-gram score: no discounting,
# no normalization, just count ratios with a fixed backoff penalty.
# ---------------------------------------------------------------------


def _word_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, i, w) — one row per word position (1-based index)."""
    d = df.withColumn("_ws", F.split(normalize_text(F.col(text_col)), " "))
    return (
        d.filter(F.length(F.trim(F.col(text_col))) > 0)
        .select(
            id_col,
            F.posexplode("_ws").alias("i0", "w"),
        )
        .select(id_col, (F.col("i0") + 1).alias("i"), "w")
    )


def trigram_model(
    train: DataFrame, *, id_col: str = "doc_id", text_col: str = "text"
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Count tables for stupid backoff: (trigram, bigram, unigram,
    1-row total-token count) — four DataFrames, never collected.

    Unigrams count every word occurrence; bigrams/trigrams the adjacent
    pairs/triples.  Each table is one map-side-combined groupBy fed
    straight from the scan-stage gram explode (the index-explode +
    slice shape, PLANS.md) — no joins, the corpus shuffles only on the
    gram keys themselves, which IS the model, not overhead.
    """
    words = _word_rows(train, id_col, text_col)
    uni = words.groupBy(F.col("w").alias("u_w")).agg(
        F.count(F.lit(1)).alias("c1")
    )
    big = _bigram_rows(train, id_col, text_col).groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c12")
    )
    tri = _trigram_rows(train, id_col, text_col).groupBy(
        "w1", "w2", "w3"
    ).agg(F.count(F.lit(1)).alias("c123"))
    total = words.agg(F.count(F.lit(1)).cast("double").alias("n_tokens"))
    return tri, big, uni, total


def _trigram_rows(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, idx, w1, w2, w3) — one row per trigram position (the
    index-explode + slice shape, PLANS.md round-4 notes)."""
    d = df.withColumn("_ws", F.split(normalize_text(F.col(text_col)), " "))
    return (
        d.filter(F.size("_ws") >= 3)
        .select(
            id_col,
            F.explode(F.sequence(F.lit(0), F.size("_ws") - 3)).alias("idx"),
            "_ws",
        )
        .select(
            id_col,
            "idx",
            F.element_at("_ws", F.col("idx") + 1).alias("w1"),
            F.element_at("_ws", F.col("idx") + 2).alias("w2"),
            F.element_at("_ws", F.col("idx") + 3).alias("w3"),
        )
    )


def stupid_backoff_score(
    docs: DataFrame,
    model: tuple[DataFrame, DataFrame, DataFrame, DataFrame] | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.4,
    add_k: float = 0.0,
    train: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean -log2 stupid-backoff score + pseudo-perplexity.

        S(w3 | w1 w2) = c123/c12           if c123 > 0
                      = a * c23/c2         elif c23 > 0
                      = a^2 * (c3+k)/(N+kV) otherwise

    ``alpha`` is Brants' fixed 0.4 backoff penalty; scores are NOT a
    normalized distribution (by design), so ``sb_perplexity`` is a
    relative quality signal, not cross-entropy.  With the default
    ``add_k=0`` the unigram floor is the raw relative frequency —
    exact only when every scored word occurs in the training corpus
    (always true in self-scoring mode, ``model is None and train is
    None``); scoring unseen text against a fixed model needs
    ``add_k > 0`` or OOV words hit log(0).

    Scale shape: scoring = 5 equi-joins from the position frame into
    the count tables (tri once, big twice under both key rotations,
    uni twice) + one groupBy(doc); the 1-row totals frame broadcasts.
    No window, no collect.
    """
    if model is None:
        model = trigram_model(
            train if train is not None else docs,
            id_col=id_col, text_col=text_col,
        )
    tri, big, uni, total = model
    a = float(alpha)
    k = float(add_k)
    pos = _trigram_rows(docs, id_col, text_col)
    big12 = big.select("w1", "w2", F.col("c12").alias("c12"))
    big23 = big.select(
        F.col("w1").alias("w2"), F.col("w2").alias("w3"),
        F.col("c12").alias("c23"),
    )
    uni2 = uni.select(F.col("u_w").alias("w2"), F.col("c1").alias("c2"))
    uni3 = uni.select(F.col("u_w").alias("w3"), F.col("c1").alias("c3"))
    vocab = uni.agg(F.count(F.lit(1)).cast("double").alias("v"))
    scored = (
        pos.join(tri, ["w1", "w2", "w3"], "left")
        .join(big12, ["w1", "w2"], "left")
        .join(big23, ["w2", "w3"], "left")
        .join(uni2, ["w2"], "left")
        .join(uni3, ["w3"], "left")
        .join(F.broadcast(total))
        .join(F.broadcast(vocab))
        .withColumn(
            "_s",
            F.when(
                F.coalesce(F.col("c123"), F.lit(0)) > 0,
                F.col("c123") / F.col("c12"),
            )
            .when(
                F.coalesce(F.col("c23"), F.lit(0)) > 0,
                F.lit(a) * F.col("c23") / F.col("c2"),
            )
            .otherwise(
                F.lit(a * a)
                * (F.coalesce(F.col("c3"), F.lit(0)) + F.lit(k))
                / (F.col("n_tokens") + F.lit(k) * F.col("v"))
            ),
        )
        .withColumn("_nls", -F.log2("_s"))
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.avg("_nls").alias("sb_logscore"),
        )
        .withColumn("sb_perplexity", F.pow(F.lit(2.0), F.col("sb_logscore")))
    )
