"""End-to-end prepare_corpus pipeline (operators/corpus.py): every
stage drops exactly the docs it should, in the standard recipe order."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.corpus import prepare_corpus

GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest to find some food for the long cold winter"
)
GOOD2 = (
    "completely different content about spark engines aggregating huge "
    "tables with shuffles joins and windows at massive petabyte scale"
)
EVAL_Q = (
    "what is the capital of the ancient kingdom that ruled the northern "
    "river valley for three hundred years before the flood"
)


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "en", GOOD),
        (2, "en", GOOD),                          # exact dup of 1
        (3, "en", GOOD.replace("green", "dark")),  # near dup of 1
        (4, "en", "too short"),                   # quality: < 5 words
        (5, "en", " ".join(["spam"] * 40)),       # quality: repetition
        (6, "en", "leak " + EVAL_Q + " answer here okay"),  # contaminated
        (7, "de", GOOD2),
        (8, "de", "mail me at a@b.example.com " + GOOD2.replace("spark", "flink")),
    ]
    return spark.createDataFrame(rows, ["doc_id", "lang", "text"])


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame([(100, EVAL_Q)], ["doc_id", "text"])


def test_stages_drop_expected_docs(spark, corpus, bench):
    out, stats = prepare_corpus(corpus, bench, near_dedup_threshold=0.7)
    kept = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # 2 exact-dup, 3 near-dup, 4+5 quality, 6 contaminated -> 1, 7, 8
    assert kept == [1, 7, 8]
    assert stats["input"] == 8
    assert stats["after_quality"] == 6          # 4, 5 gone
    assert stats["after_exact_dedup"] == 5      # 2 gone
    assert stats["after_near_dedup"] == 4       # 3 gone
    assert stats["after_decontaminate"] == 3    # 6 gone


def test_redaction_applied_before_output(spark, corpus, bench):
    out, _ = prepare_corpus(corpus, bench, near_dedup_threshold=0.7,
                            collect_stats=False)
    r = {x["doc_id"]: x for x in out.collect()}
    assert "<EMAIL>" in r[8]["text"] and "a@b.example.com" not in r[8]["text"]
    assert r[8]["n_email"] == 1


def test_optional_stages_disabled(spark, corpus):
    out, stats = prepare_corpus(
        corpus, None, near_dedup_threshold=None, collect_stats=True
    )
    kept = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    # only quality + exact dedup run: near-dup 3 and "contaminated" 6 stay
    assert kept == [1, 3, 6, 7, 8]
    assert "after_near_dedup" not in stats
    assert "after_decontaminate" not in stats


def test_lm_perplexity_stage(spark, corpus, bench):
    # an absurdly low threshold drops everything; a huge one nothing
    out, stats = prepare_corpus(
        corpus, None, near_dedup_threshold=None, max_perplexity=1.0
    )
    assert stats["after_lm_filter"] == 0 and out.count() == 0
    out2, stats2 = prepare_corpus(
        corpus, None, near_dedup_threshold=None, max_perplexity=1e9
    )
    assert stats2["after_lm_filter"] == stats2["after_quality"]


def test_segment_dedup_and_mixture_stages(spark, corpus, bench):
    out, stats = prepare_corpus(
        corpus,
        bench,
        near_dedup_threshold=0.7,
        segment_words=10,
        min_kept_frac=0.3,
        mixture_targets={"en": 0.5, "de": 0.5},
        mixture_budget_tokens=10_000,  # huge budget -> rates cap at 1.0
    )
    kept = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert kept == [1, 7, 8]  # rates 1.0: sampling drops nothing
    # segment dedup runs BEFORE decontamination: doc 6 still present
    assert stats["after_segment_dedup"] == 4
    assert stats["after_mixture_sample"] == 3
    # segment dedup rewrote text from normalized segments
    t = {r["doc_id"]: r["text"] for r in out.collect()}
    assert t[1].startswith("the quick brown fox")


def test_semantic_dedup_stage(spark, corpus, bench):
    """Optional 4b: docs 7 and 8 carry near-identical embeddings (8
    survives near dedup — different surface text) so SemDeDup drops
    the larger id; doc 1 has a distinct embedding and keeps; docs
    WITHOUT an embedding row keep (no evidence, no drop)."""
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0, 0.0, 0.0]),
            (7, [0.0, 1.0, 0.0, 0.0]),
            (8, [0.01, 0.999, 0.0, 0.0]),   # cosine(7, 8) ~ 0.9999
        ],
        "doc_id long, embedding array<float>",
    )
    out, stats = prepare_corpus(
        corpus, bench, embeddings=emb, semantic_k=2, semantic_probes=1,
    )
    ids = {r["doc_id"] for r in out.select("doc_id").collect()}
    assert 8 not in ids           # semantic dup of 7 (smaller id wins)
    assert 7 in ids and 1 in ids
    assert stats["after_semantic_dedup"] == stats["after_near_dedup"] - 1
    # disabled by default: same pipeline without embeddings keeps 8
    out2, _ = prepare_corpus(corpus, bench)
    assert 8 in {r["doc_id"] for r in out2.select("doc_id").collect()}


def test_semantic_stage_skips_on_empty_overlap(spark, corpus, bench):
    """ADVICE fix: an embeddings frame that overlaps zero surviving
    docs must SKIP the semantic stage (no evidence, no drop) rather
    than crash on the probes/centroid validation — including the
    default semantic_probes=2 with a 1-doc overlap."""
    # keyed differently: no overlap at all
    emb_none = spark.createDataFrame(
        [(999, [1.0, 0.0, 0.0, 0.0])], "doc_id long, embedding array<float>"
    )
    out, stats = prepare_corpus(
        corpus, bench, embeddings=emb_none, near_dedup_threshold=0.7
    )
    assert sorted(r["doc_id"] for r in out.select("doc_id").collect()) == [1, 7, 8]
    assert stats["after_semantic_dedup"] == stats["after_near_dedup"]
    # 1-doc overlap with default probes=2: clamps instead of raising
    emb_one = spark.createDataFrame(
        [(7, [1.0, 0.0, 0.0, 0.0])], "doc_id long, embedding array<float>"
    )
    out2, _ = prepare_corpus(
        corpus, bench, embeddings=emb_one, near_dedup_threshold=0.7
    )
    assert 7 in {r["doc_id"] for r in out2.select("doc_id").collect()}


def test_quality_rules_stage(spark, corpus, bench):
    """Optional 2a: the Gopher structural rules run as an extra gate
    (permissive thresholds here: the stage must compose without
    changing the baseline [1, 7, 8] outcome; rule-by-rule behavior is
    pinned in tests/test_caps_quality.py)."""
    from grass_spark.operators.quality import QualityRules

    rules = QualityRules(
        min_words=1, max_words=10_000, min_mean_word_len=0.0,
        max_mean_word_len=100.0, max_symbol_ratio=10.0,
        min_alpha_word_frac=0.0, min_stopwords=1,
    )
    out, stats = prepare_corpus(
        corpus, bench, near_dedup_threshold=0.7, quality_rules=rules
    )
    assert "after_quality_rules" in stats
    assert stats["after_quality_rules"] <= stats["after_quality"]
    kept = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    for d in kept:
        assert d in (1, 7, 8)


def test_source_cap_stage(spark, corpus, bench):
    """Optional 6b: with every survivor in ONE source and cap=1,
    exactly one doc comes out; with cap high, the stage is a no-op."""
    src = corpus.withColumn("source", F.lit("onesrc"))
    out, stats = prepare_corpus(
        src, bench, near_dedup_threshold=0.7, source_cap=1
    )
    assert stats["after_source_cap"] == 1
    assert out.count() == 1
    out2, stats2 = prepare_corpus(
        src, bench, near_dedup_threshold=0.7, source_cap=100
    )
    assert stats2["after_source_cap"] == stats2["after_decontaminate"] == 3
    assert sorted(r["doc_id"] for r in out2.select("doc_id").collect()) == [1, 7, 8]


def test_span_dedup_stage(spark, bench):
    """Optional 5b: a shared 8-word boilerplate run is stripped from
    every doc except its corpus-wide first occurrence; a doc that is
    MOSTLY boilerplate falls to the retention gate."""
    boiler = "subscribe to our newsletter for updates every week"
    rows = [
        (1, "en", "alpha beta gamma delta epsilon zeta " + boiler),
        (2, "en", "one two three four five six seven " + boiler),
        # doc 3 is boiler + 2 words: removal leaves 2/10 < 0.3
        (3, "en", boiler + " bye now"),
        (4, "en", "totally unrelated words live here just fine today ok"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out, stats = prepare_corpus(
        docs, None, near_dedup_threshold=None,
        span_n=8, min_kept_frac=0.3,
    )
    t = {r["doc_id"]: r["text"] for r in out.collect()}
    assert sorted(t) == [1, 2, 4]
    assert stats["after_span_dedup"] == 3
    # first occurrence (doc 1) keeps the boilerplate, doc 2 loses it
    assert t[1].endswith(boiler)
    assert t[2] == "one two three four five six seven"
    assert t[4].startswith("totally unrelated")


def test_classifier_stage(spark, corpus):
    from grass_spark.operators.classify import synth_weights

    w = synth_weights(spark, 64)
    # prob floor of 0 keeps everything quality left alive; 1.0 drops all
    out, stats = prepare_corpus(
        corpus, None, near_dedup_threshold=None,
        classifier_weights=w, classifier_buckets=64, min_quality_prob=0.0,
    )
    assert stats["after_classifier"] == stats["after_quality"]
    out2, stats2 = prepare_corpus(
        corpus, None, near_dedup_threshold=None,
        classifier_weights=w, classifier_buckets=64, min_quality_prob=1.01,
    )
    assert stats2["after_classifier"] == 0 and out2.count() == 0


def test_semantic_decontamination_stage(spark, corpus):
    emb = spark.createDataFrame(
        [
            (1, [1.0, 0.0]),   # identical to a bench vector -> drops
            (7, [0.0, 1.0]),   # orthogonal -> keeps
            # 8 has no embedding -> keeps
        ],
        "doc_id bigint, embedding array<double>",
    )
    bench_emb = spark.createDataFrame(
        [(900, [1.0, 0.0])], "doc_id bigint, embedding array<double>"
    )
    out, stats = prepare_corpus(
        corpus, None, near_dedup_threshold=None,
        embeddings=emb, bench_embeddings=bench_emb,
        semantic_decon_threshold=0.95,
    )
    kept = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert 1 not in kept and {7, 8} <= set(kept)
    assert stats["after_semantic_decontaminate"] == stats["after_semantic_dedup"] - 1
    # bench embeddings without the corpus side is a usage error
    with pytest.raises(ValueError):
        prepare_corpus(corpus, None, bench_embeddings=bench_emb)


def test_ppl_bucket_stage(spark, corpus):
    """CCNet stratum gate: keeping only the head third thins the
    survivors; keeping all three strata is a no-op."""
    out_all, _ = prepare_corpus(
        corpus, near_dedup_threshold=0.7,
        ppl_bucket_keep=("head", "middle", "tail"), collect_stats=False,
    )
    base, _ = prepare_corpus(
        corpus, near_dedup_threshold=0.7, collect_stats=False,
    )
    assert (sorted(r["doc_id"] for r in out_all.select("doc_id").collect())
            == sorted(r["doc_id"] for r in base.select("doc_id").collect()))
    out_head, stats = prepare_corpus(
        corpus, near_dedup_threshold=0.7, ppl_bucket_keep=("head",),
    )
    kept = {r["doc_id"] for r in out_head.select("doc_id").collect()}
    assert stats["after_ppl_buckets"] <= stats["after_quality"]
    # every survivor was labeled head among its language peers
    assert kept <= {r["doc_id"]
                    for r in base.select("doc_id").collect()} or kept


def test_dsir_stage(spark, corpus):
    target = spark.createDataFrame(
        [(900, GOOD), (901, GOOD.replace("fox", "wolf"))],
        ["doc_id", "text"],
    )
    out, stats = prepare_corpus(
        corpus, near_dedup_threshold=0.7,
        dsir_target=target, dsir_k=2,
    )
    kept = sorted(r["doc_id"] for r in out.select("doc_id").collect())
    assert len(kept) == 2
    assert stats["after_dsir"] == 2
    # the GOOD-family survivor (doc 1) must out-rank the off-target docs
    assert 1 in kept
    with pytest.raises(ValueError, match="dsir_k"):
        prepare_corpus(corpus, dsir_target=target, collect_stats=False)


def test_line_filter_stage(spark, bench):
    """Stage 1b: chrome lines vanish from the surviving text; docs
    gutted below the removal threshold drop entirely."""
    from grass_spark.operators.linefilter import LineRules

    rows = [
        (1, "en", GOOD + ".\nplease enable javascript to view.\n"
                  + GOOD2 + "."),
        (2, "en", "all rights reserved to the site owner.\n"
                  "click here to read more about cookies."),  # all chrome
        (3, "en", GOOD2 + " and more fresh prose follows here."),
    ]
    corpus = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    rules = LineRules(min_line_words=5, require_terminal_punct=True,
                      min_kept_lines=1, max_removed_frac=0.6)
    out, stats = prepare_corpus(
        corpus, None, line_rules=rules, near_dedup_threshold=None,
    )
    kept = {r["doc_id"]: r["text"] for r in out.collect()}
    assert sorted(kept) == [1, 3]
    assert "javascript" not in kept[1]
    assert GOOD in kept[1] and GOOD2 in kept[1]
    assert stats["after_line_filter"] == 2


def test_mixture_subword_token_mode(spark):
    """mixture_token_mode='subword' budgets with the greedy tokenizer:
    long/rare words weigh more than their whitespace count, so the same
    absolute budget keeps fewer docs of piece-heavy text."""
    rows = [
        (i, "en",
         "internationalization denationalization " * 10 + f"tail {i}")
        for i in range(20)
    ]
    corpus = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    kw = dict(near_dedup_threshold=None, max_word_rep_frac=1.0,
              max_dup5_frac=1.0, mixture_targets={"en": 1.0},
              mixture_budget_tokens=200)
    out_ws, _ = prepare_corpus(corpus, None, **kw)
    out_sw, _ = prepare_corpus(corpus, None,
                               mixture_token_mode="subword", **kw)
    n_ws, n_sw = out_ws.count(), out_sw.count()
    # subword counts per doc are several x the whitespace counts here,
    # so the 200-token budget admits fewer docs
    assert 0 < n_sw < n_ws
    with pytest.raises(ValueError, match="mixture_token_mode"):
        prepare_corpus(corpus, None, mixture_token_mode="bogus", **kw)


def test_mixture_temperature_mode(spark):
    """mixture_alpha derives targets from the data: the low-resource
    group keeps a larger share of itself than under natural sampling
    at the same budget."""
    rows = ([(i, "big", f"common words fill document number {i} nicely")
             for i in range(90)]
            + [(i + 90, "small", f"rare language document number {i} here")
               for i in range(10)])
    corpus = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    kw = dict(near_dedup_threshold=None, max_word_rep_frac=1.0,
              max_dup5_frac=1.0, min_words=3, mixture_budget_tokens=300)
    out_nat, _ = prepare_corpus(
        corpus, None, mixture_targets={"big": 0.9, "small": 0.1}, **kw)
    out_t, _ = prepare_corpus(corpus, None, mixture_alpha=0.2, **kw)
    def frac_small(df):
        n = df.count()
        return df.filter("lang = 'small'").count() / n
    assert frac_small(out_t) > frac_small(out_nat)
    with pytest.raises(ValueError, match="not both"):
        prepare_corpus(corpus, None, mixture_targets={"big": 1.0},
                       mixture_alpha=0.5, **kw)


def test_zlib_gate_stage(spark):
    """Stage 2a': the compression-ratio bounds drop repetitive
    boilerplate (low ratio) and random junk (high ratio), keep prose."""
    import random
    import string

    rnd = random.Random(3)
    junk = " ".join(
        "".join(rnd.choices(string.ascii_letters + string.digits
                            + string.punctuation, k=9))
        for _ in range(150)
    )
    prose = (GOOD + " " + GOOD2 + " meanwhile seven curious wizards "
             "brewed quirky potions beneath the ancient library while "
             "discussing the economics of distributed query engines "
             "and the art of writing honest benchmarks")
    rows = [
        (1, "en", prose),           # ~0.60: natural prose
        (2, "en", "repeat me now " * 80),  # ~0.03: boilerplate
        (3, "en", junk),            # ~0.83: entropy soup
    ]
    corpus = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out, stats = prepare_corpus(
        corpus, None, near_dedup_threshold=None,
        max_word_rep_frac=1.0, max_dup5_frac=1.0,
        min_zlib_ratio=0.2, max_zlib_ratio=0.7,
    )
    assert sorted(r.doc_id for r in out.collect()) == [1]
    assert stats["after_zlib_gate"] == 1


def test_normalize_stage(spark):
    """Stage 0b: typographic variants of the same doc become exact
    duplicates once normalized — dedup then collapses them."""
    rows = [
        (1, "en", "The “Quick”  Brown—Fox jumps over the lazy dog today"),
        (2, "en", 'the "quick" brown-fox jumps over the lazy dog today'),
        (3, "en", GOOD2),
    ]
    corpus = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    out, stats = prepare_corpus(
        corpus, None, normalize=True, near_dedup_threshold=None,
    )
    kept = sorted(r.doc_id for r in out.collect())
    assert kept == [1, 3]  # 2 is an exact dup after normalization
    t = {r.doc_id: r.text for r in out.collect()}
    assert t[1] == 'the "quick" brown-fox jumps over the lazy dog today'
    # without normalization both variants survive exact dedup
    out2, _ = prepare_corpus(corpus, None, near_dedup_threshold=None)
    assert out2.count() == 3


def test_epoch_upsampling_stage(spark, corpus, bench):
    out, stats = prepare_corpus(
        corpus, bench, near_dedup_threshold=0.7,
        epoch_weights={"en": 2.0, "de": 1.0}, group_col="lang",
    )
    rows = out.collect()
    assert "epoch" in out.columns
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], []).append(r["epoch"])
    # survivors: 1 (en, weight 2 -> epochs 0,1), 7+8 (de, 1 epoch)
    assert sorted(per_doc[1]) == [0, 1]
    assert per_doc[7] == [0] and per_doc[8] == [0]
    assert stats["after_epochs"] == 4
