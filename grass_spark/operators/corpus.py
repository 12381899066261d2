"""End-to-end pre-training corpus preparation.

``prepare_corpus`` composes the individually-tested hygiene operators
into the standard pipeline order (the C4 / MassiveText / RefinedWeb
recipe), all as ONE declarative Spark plan per stage:

1. **PII redaction** (``redact``) — scrub before anything else reads
   the text;
1b. **line-level cleaning** (optional, ``line_rules``) — the
   C4/RefinedWeb line rules: drop boilerplate/chrome lines inside each
   document, swap in the cleaned text, reject docs that lost too much;
2. **quality + repetition filter** — drop docs outside length bounds
   or above the repetition-fraction thresholds; optionally the full
   Gopher structural rule set (``quality_rules``) and/or an LM
   perplexity gate (``max_perplexity``, CCNet-style) against the
   corpus's own bigram statistics;
3. **exact dedup** — keep the smallest id per content hash;
4. **near dedup** (MinHash-LSH, optional) — drop non-representative
   members of near-duplicate clusters;
4b. **semantic dedup** (SemDeDup, optional) — given an embedding
   frame, drop non-survivors of embedding-cosine clusters (runs on
   the near-dedup survivors only; docs without embeddings keep);
5. **segment dedup** (optional) — strip corpus-wide repeated spans
   and keep docs that retain ≥ ``min_kept_frac`` of their segments;
6. **benchmark decontamination** — drop docs sharing a 13-gram with
   the held-out eval suite;
6b. **per-source cap** (optional) — bound any one source/domain's
   contribution (RefinedWeb-style) with the skew-safe deterministic
   draw of :func:`grass_spark.operators.caps.cap_per_group`;
7. **mixture sampling** (optional) — deterministic hash sampling to a
   target group mixture;
8. **DSIR selection** (optional) — keep the ``dsir_k`` docs most like
   a trusted target corpus (hashed-ngram importance weights +
   deterministic Gumbel-top-k);
9. **epoch upsampling** (optional) — ``epoch_weights`` fans the
   survivors into (doc, epoch) training-schedule rows for sources
   repeated more than once per run (weights above 1; see
   :func:`grass_spark.operators.preference.upsample_epochs`).

Every stage is the same operator the driver queries gate one-by-one;
this module only sequences them.  Stages that re-use the corpus more
than once (near/segment dedup) checkpoint their input so lineage does
not re-execute the upstream stages per action.

Returns the surviving documents plus a ``stats`` dict of per-stage
counts (each count is one cheap job on the stage's already-pruned
frame).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grass_spark.operators.decontaminate import decontaminate
from grass_spark.operators.dedup import exact_dedup, near_dedup
from grass_spark.operators.redact import redact
from grass_spark.operators.repetition import repetition_stats
from grass_spark.operators.sampling import hash_sample, mixture_rates
from grass_spark.operators.segdedup import dedup_segments, segments_by_words


def prepare_corpus(
    docs: DataFrame,
    benchmark: DataFrame | None = None,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    normalize: bool = False,
    line_rules=None,
    min_words: int = 5,
    max_words: int | None = None,
    max_word_rep_frac: float = 0.6,
    max_dup5_frac: float = 0.6,
    quality_rules=None,
    blocklist_terms: tuple[str, ...] | list[str] | None = None,
    blocklist_max_hits: int = 0,
    max_perplexity: float | None = None,
    ppl_bucket_keep: tuple[str, ...] | None = None,
    ppl_bucket_cuts: tuple[float, float] = (1 / 3, 2 / 3),
    max_zlib_ratio: float | None = None,
    min_zlib_ratio: float | None = None,
    classifier_weights: DataFrame | None = None,
    classifier_buckets: int = 1024,
    min_quality_prob: float = 0.5,
    near_dedup_threshold: float | None = 0.8,
    embeddings: DataFrame | None = None,
    semantic_threshold: float = 0.9,
    semantic_k: int | None = None,
    semantic_probes: int = 2,
    semantic_cluster_cap: int | None | str = "auto",
    segment_words: int | None = None,
    span_n: int | None = None,
    min_kept_frac: float = 0.5,
    decontaminate_n: int = 13,
    bench_embeddings: DataFrame | None = None,
    semantic_decon_threshold: float = 0.95,
    source_cap: int | None = None,
    source_col: str = "source",
    mixture_targets: dict[str, float] | None = None,
    mixture_alpha: float | None = None,
    mixture_budget_tokens: int | None = None,
    mixture_token_mode: str = "whitespace",
    group_col: str = "lang",
    dsir_target: DataFrame | None = None,
    dsir_k: int | None = None,
    dsir_buckets: int = 10_000,
    epoch_weights=None,
    epoch_default_weight: float = 1.0,
    collect_stats: bool = True,
) -> tuple[DataFrame, dict]:
    """Run the full hygiene pipeline; see module docstring for stages.

    ``None`` disables a stage (``benchmark=None`` skips
    decontamination, ``near_dedup_threshold=None`` skips near dedup,
    ``line_rules=None`` skips line-level cleaning (pass a
    :class:`grass_spark.operators.linefilter.LineRules`),
    ``quality_rules=None`` skips the Gopher structural rules,
    ``blocklist_terms=None`` skips the C4-style word-boundary
    blocklist gate (``blocklist_max_hits`` occurrences allowed),
    ``classifier_weights=None`` skips the hashed-linear quality
    classifier (pass a (bucket, weight) frame + ``min_quality_prob``),
    ``embeddings=None`` skips semantic dedup, ``segment_words=None``
    skips segment dedup, ``span_n=None`` skips exact-substring span
    dedup, ``source_cap=None`` skips the per-source cap,
    ``mixture_targets=None`` skips sampling).  ``quality_rules`` takes
    a :class:`grass_spark.operators.quality.QualityRules`;
    ``bench_embeddings`` (with ``embeddings=``) adds embedding-space
    benchmark decontamination at ``semantic_decon_threshold`` beside
    the n-gram pass; ``source_cap`` bounds each ``source_col`` value to
    that many docs
    (deterministic hash draw, skew-safe hot-source selection).
    ``ppl_bucket_keep`` (e.g. ``("head", "middle")``) enables the
    CCNet per-``group_col`` perplexity-stratum gate; ``dsir_target``
    (a docs frame) + ``dsir_k`` enable the final DSIR selection.
    ``collect_stats=False`` skips the per-stage count jobs and returns
    an empty stats dict (pure-plan mode).

    ``embeddings`` is a frame of (``id_col``, ``embedding``) rows —
    SemDeDup (:func:`grass_spark.operators.semdedup.semantic_dedup`)
    runs over the embeddings of the docs still alive after near dedup
    (surface-form dups are already gone, so the semantic pass only
    pays for the survivors); docs WITHOUT an embedding row are kept
    (no evidence, no drop).  ``semantic_k`` defaults to the SemDeDup
    k-grows-with-N contract ``max(16, n/256)`` (one count job).  An
    EMPTY embedding overlap skips the stage (instead of crashing on
    the probes/centroid validation) and ``semantic_probes`` clamps to
    the available centroid count.  ``semantic_cluster_cap`` passes
    through to :func:`semantic_dedup` (default ``"auto"`` =
    ``ceil(8n/k)`` — bounds a degenerate all-one-cluster embedding
    distribution's quadratic pair work).
    """
    stats: dict = {}

    def _count(stage: str, df: DataFrame) -> None:
        if collect_stats:
            stats[stage] = df.count()

    _count("input", docs)

    # 0b. canonical normalization (optional): typographic cleanup +
    # whitespace collapse BEFORE anything hashes or matches the text —
    # dedup keys, decontamination shingles and quality ratios then all
    # share one canonical form.  NOTE lowercasing is part of the
    # canonical form; run before redaction (patterns are case-robust).
    if normalize:
        from grass_spark.operators.textstats import normalize_text

        cur = (
            normalize_text(docs, text_col=text_col)
            .drop(text_col)
            .withColumnRenamed("norm_text", text_col)
        )
    else:
        cur = docs

    # 1. redaction (adds n_<kind> count columns, scrubs text in place)
    cur = redact(cur, text_col=text_col)

    # 1b. line-level cleaning (optional): drop chrome lines inside each
    # doc, substitute the cleaned text, reject docs that lost too much.
    # Pure scan-stage projection — no checkpoint needed.
    if line_rules is not None:
        from grass_spark.operators.linefilter import line_filter

        cur = (
            line_filter(cur, line_rules, text_col=text_col)
            .filter("keep")
            .drop(text_col, "n_lines", "n_kept_lines",
                  "removed_char_frac", "reject_reason", "keep")
            .withColumnRenamed("clean_text", text_col)
        )
        _count("after_line_filter", cur)

    # 2. quality gates: length bounds + repetition fractions
    rep = repetition_stats(cur, id_col=id_col, text_col=text_col)
    bounds = (F.col("n_words") >= min_words) & (
        F.lit(True) if max_words is None else (F.col("n_words") <= max_words)
    )
    good = rep.filter(
        bounds
        & (F.col("word_rep_frac") <= max_word_rep_frac)
        & (F.col("dup5_frac") <= max_dup5_frac)
    ).select(id_col)
    cur = cur.join(good, id_col, "left_semi")
    _count("after_quality", cur)

    # 2a. Gopher structural rules (optional): pure scan-stage gates
    if quality_rules is not None:
        from grass_spark.operators.quality import quality_filter

        ok = (
            quality_filter(cur, quality_rules, text_col=text_col)
            .filter("keep")
            .select(id_col)
        )
        cur = cur.join(ok, id_col, "left_semi")
        _count("after_quality_rules", cur)

    # 2a''. word-boundary blocklist gate (optional): the C4
    # badword-list rule — pure scan-stage regexp count, no shuffle.
    if blocklist_terms is not None:
        from grass_spark.operators.blocklist import blocklist_stats

        ok = (
            blocklist_stats(
                cur, blocklist_terms, text_col=text_col,
                max_hits=blocklist_max_hits,
            )
            .filter("keep")
            .select(id_col)
        )
        cur = cur.join(ok, id_col, "left_semi")
        _count("after_blocklist", cur)

    # 2a'. compression-ratio gate (optional): the RedPajama-v2/Dolma
    # entropy proxy — too-compressible docs are boilerplate/repetition,
    # near-incompressible ones are junk/binary soup.  The engine's one
    # Python-path signal (Arrow-batched zlib); docs with empty text
    # (NULL ratio) drop only if a bound is set on that side.
    if max_zlib_ratio is not None or min_zlib_ratio is not None:
        from grass_spark.operators.textstats import compression_ratio

        scored = compression_ratio(cur, text_col=text_col)
        cond = F.lit(True)
        if min_zlib_ratio is not None:
            cond = cond & (F.col("zlib_ratio") >= min_zlib_ratio)
        if max_zlib_ratio is not None:
            cond = cond & (F.col("zlib_ratio") <= max_zlib_ratio)
        cur = scored.filter(cond).drop("zlib_ratio")
        _count("after_zlib_gate", cur)

    # 2b. LM perplexity gate (optional): self-scored bigram model over
    # the quality-surviving corpus; docs above the threshold drop
    # (docs with no bigram positions were already length-gated)
    if max_perplexity is not None:
        from grass_spark.operators.lm import lm_score

        ok = lm_score(cur, id_col=id_col, text_col=text_col).filter(
            F.col("perplexity") <= max_perplexity
        ).select(id_col)
        cur = cur.join(ok, id_col, "left_semi")
        _count("after_lm_filter", cur)

    # 2b'. CCNet per-language perplexity strata (optional): keep only
    # the named head/middle/tail buckets, thresholds per group_col.
    # Relative alternative to the absolute max_perplexity gate; docs
    # with no bigram evidence keep.
    if ppl_bucket_keep is not None:
        from grass_spark.operators.lm import ccnet_filter

        cur = ccnet_filter(
            cur, id_col=id_col, text_col=text_col, lang_col=group_col,
            keep=ppl_bucket_keep, cuts=ppl_bucket_cuts,
        )
        _count("after_ppl_buckets", cur)

    # 2c. hashed-linear classifier gate (optional): fastText-style
    # model-based quality score; docs under the prob floor drop.
    # classifier_weights is a (bucket, weight) frame — trained or
    # synth_weights — small enough to broadcast at any corpus size.
    if classifier_weights is not None:
        from grass_spark.operators.classify import linear_quality_score

        ok = linear_quality_score(
            cur, classifier_weights,
            id_col=id_col, text_col=text_col,
            n_buckets=classifier_buckets,
        ).filter(F.col("prob") >= min_quality_prob).select(id_col)
        cur = cur.join(ok, id_col, "left_semi")
        _count("after_classifier", cur)

    # 3. exact dedup: keep the smallest id per content hash
    keep_exact = exact_dedup(cur, id_col=id_col, text_col=text_col).select(
        F.col("keep_id").alias(id_col)
    )
    cur = cur.join(keep_exact, id_col, "left_semi")
    _count("after_exact_dedup", cur)

    # later stages scan `cur` repeatedly — cut lineage once
    cur = cur.localCheckpoint(eager=False)

    # 4. near dedup (MinHash-LSH + CC keep decisions)
    if near_dedup_threshold is not None:
        keep_near = near_dedup(
            cur.select(id_col, text_col),
            id_col=id_col, text_col=text_col,
            jaccard_threshold=near_dedup_threshold,
        ).filter(F.col("keep")).select(id_col)
        cur = cur.join(keep_near, id_col, "left_semi")
        # sever the MinHash/LSH/CC subtree — every later stage (and its
        # stats count) would otherwise re-execute it per action
        cur = cur.localCheckpoint(eager=False)
        _count("after_near_dedup", cur)

    # 4b. semantic dedup (SemDeDup over caller-supplied embeddings).
    # Degrades instead of raising on thin overlap: an empty embedding
    # overlap skips the stage entirely (no evidence, no drop) and
    # probes clamps to the centroids actually available.
    if embeddings is not None:
        from grass_spark.operators.semdedup import semantic_dedup

        emb_live = embeddings.join(
            cur.select(id_col), id_col, "left_semi"
        )
        n_emb = emb_live.count()
        if n_emb > 0:
            k = semantic_k
            if k is None:
                k = max(16, n_emb // 256)
            k = min(k, n_emb)
            flagged = semantic_dedup(
                emb_live, k=k, threshold=semantic_threshold,
                id_col=id_col, probes=min(semantic_probes, k),
                cluster_cap=semantic_cluster_cap,
            ).filter(~F.col("keep")).select(id_col)
            cur = cur.join(flagged, id_col, "left_anti")
            # sever the cosine/CC subtree
            cur = cur.localCheckpoint(eager=False)
        _count("after_semantic_dedup", cur)

    # 5. segment dedup: strip repeated spans, keep docs retaining
    #    enough of themselves, swap in the cleaned text
    if segment_words is not None:
        seg = dedup_segments(
            segments_by_words(cur, text_col, segment_words), id_col=id_col
        ).filter(
            F.col("n_kept") >= F.lit(min_kept_frac) * F.col("n_segments")
        )
        cur = (
            cur.drop(text_col)
            .join(
                seg.select(id_col, F.col("dedup_text").alias(text_col)),
                id_col,
            )
        )
        # sever the explode+window segment subtree for the same reason
        cur = cur.localCheckpoint(eager=False)
        _count("after_segment_dedup", cur)

    # 5b. exact-substring span dedup (optional): strip maximal repeated
    #     n-word spans (corpus-wide first occurrence keeps its text),
    #     same retention gate as segment dedup.  The census scans the
    #     window explode once; the per-doc join re-scans cur —
    #     checkpoint after, like every other reducing stage.
    if span_n is not None:
        from grass_spark.operators.spans import duplicate_spans

        sp = duplicate_spans(
            cur, text_col=text_col, n=span_n, id_col=id_col
        ).filter(
            (F.col("n_words") - F.col("dup_words"))
            >= F.lit(min_kept_frac) * F.col("n_words")
        )
        cur = cur.drop(text_col).join(
            sp.select(id_col, F.col("clean_text").alias(text_col)), id_col
        )
        cur = cur.localCheckpoint(eager=False)
        _count("after_span_dedup", cur)

    # 6. benchmark decontamination
    if benchmark is not None:
        cur = decontaminate(
            cur, benchmark, n=decontaminate_n,
            id_col=id_col, text_col=text_col,
        )
        _count("after_decontaminate", cur)

    # 6a. semantic decontamination (optional): embedding-space leakage
    # the n-gram rule misses.  Needs both the corpus embeddings frame
    # AND a benchmark embeddings frame; docs without an embedding keep.
    if bench_embeddings is not None:
        if embeddings is None:
            raise ValueError(
                "bench_embeddings requires embeddings= (corpus side)"
            )
        from grass_spark.operators.semdecon import semantic_decontaminate

        cur = semantic_decontaminate(
            cur, embeddings, bench_embeddings,
            id_col=id_col, emb_id_col=id_col,
            threshold=semantic_decon_threshold,
        )
        _count("after_semantic_decontaminate", cur)

    # 6b. per-source cap (optional): skew-safe deterministic bound on
    # any one source's contribution.  cap_per_group scans its input
    # more than once (hot-group census + joins) — checkpoint after.
    if source_cap is not None:
        from grass_spark.operators.caps import cap_per_group

        cur = cap_per_group(
            cur, source_cap, group_col=source_col, id_col=id_col,
            salt="corpus-cap",
        )
        cur = cur.localCheckpoint(eager=False)
        _count("after_source_cap", cur)

    # 7. mixture sampling.  Token budgets default to whitespace counts;
    # "subword" budgets with the greedy tokenizer instead (whitespace
    # under-counts what a trained tokenizer produces — long/rare words
    # explode into pieces), still a pure scan-stage expression.
    # ``mixture_targets`` gives explicit shares; ``mixture_alpha``
    # derives them from the data instead (share ∝ tokens^alpha — the
    # XLM-R temperature rule; mutually exclusive with targets).
    if mixture_targets is not None and mixture_alpha is not None:
        raise ValueError(
            "pass mixture_targets OR mixture_alpha, not both"
        )
    if mixture_alpha is not None:
        mixture_targets = "temperature"  # sentinel: enter the stage
    if mixture_targets is not None:
        if mixture_token_mode == "subword":
            from grass_spark.operators.textstats import (
                subword_token_counts,
            )

            toks = subword_token_counts(cur, text_col=text_col, out="_nt")
        elif mixture_token_mode == "whitespace":
            toks = cur.withColumn(
                "_nt",
                F.size(F.split(F.col(text_col), r"\s+")).cast("bigint"),
            )
        else:
            raise ValueError(
                f"unknown mixture_token_mode {mixture_token_mode!r}"
            )
        if mixture_budget_tokens is None:
            total = toks.agg(F.sum("_nt")).collect()[0][0] or 0
            mixture_budget_tokens = int(total * 0.5)
        if mixture_alpha is not None:
            from grass_spark.operators.sampling import temperature_rates

            rates = temperature_rates(
                toks, mixture_alpha, mixture_budget_tokens,
                group_col=group_col, weight_col="_nt",
            )
        else:
            rates = mixture_rates(
                toks, mixture_targets, mixture_budget_tokens,
                group_col=group_col, weight_col="_nt",
            )
        cur = hash_sample(
            toks, rates, id_col=id_col, group_col=group_col, salt="corpus"
        ).drop("_nt")
        _count("after_mixture_sample", cur)

    # 8. DSIR selection (optional): keep the dsir_k surviving docs most
    # like the target corpus.  dsir_sample scans cur twice (raw-pool
    # fit + scoring) on top of the target fit — checkpoint after.
    if dsir_target is not None:
        if dsir_k is None or dsir_k <= 0:
            raise ValueError("dsir_target requires a positive dsir_k")
        from grass_spark.operators.dsir import dsir_sample

        picked = dsir_sample(
            cur.select(id_col, text_col), dsir_target, dsir_k,
            id_col=id_col, text_col=text_col, n_buckets=dsir_buckets,
            salt="corpus-dsir",
        ).select(id_col)
        cur = cur.join(picked, id_col, "left_semi")
        cur = cur.localCheckpoint(eager=False)
        _count("after_dsir", cur)

    # 9. epoch upsampling (optional): mixture weights ABOVE 1 — fan
    # the surviving docs into (doc, epoch) training-schedule rows
    # (LLaMA-style source repeats).  Pure scan-stage explode on top of
    # the already-checkpointed survivors; adds an ``epoch`` column.
    if epoch_weights is not None:
        from grass_spark.operators.preference import upsample_epochs

        cur = upsample_epochs(
            cur, epoch_weights, group_col=group_col, id_col=id_col,
            default_weight=epoch_default_weight, salt="corpus-epoch",
        )
        _count("after_epochs", cur)

    return cur, stats
