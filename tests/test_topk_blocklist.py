"""top_per_group rejection sampling (operators/caps.py) + the
word-boundary blocklist gate (operators/blocklist.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from grass_spark.operators.blocklist import (
    blocklist_pattern,
    blocklist_stats,
)
from grass_spark.operators.caps import top_per_group
from grass_spark.operators.sampling import uniform_hash


def _completions(spark, n=400, hot_frac=0.5):
    """Scored completions where one prompt holds ``hot_frac`` of all
    rows (the best-of-N sweep skew shape)."""
    hot_n = int(n * hot_frac)
    df = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") < hot_n, F.lit(0))
        .otherwise(1 + F.col("id") % 13).alias("prompt_id"),
        uniform_hash(F.col("id"), "sc").alias("score"),
    )
    return df


def _brute_top(df, k):
    w = Window.partitionBy("prompt_id").orderBy(
        F.round(F.col("score"), 6).desc(), "doc_id"
    )
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .select("prompt_id", "doc_id")
    )


def test_top_equals_brute_window(spark):
    df = _completions(spark)
    for k in (1, 2, 7):
        got = sorted(
            (r.prompt_id, r.doc_id)
            for r in top_per_group(df, k, salts=4).collect()
        )
        want = sorted(
            (r.prompt_id, r.doc_id) for r in _brute_top(df, k).collect()
        )
        assert got == want, f"k={k}"


def test_top_salts_invariant_and_passthrough(spark):
    df = _completions(spark, n=200).withColumn("extra", F.lit("x"))
    a = sorted(r.doc_id for r in top_per_group(df, 3, salts=2).collect())
    b = sorted(r.doc_id for r in top_per_group(df, 3, salts=16).collect())
    assert a == b  # exactness independent of salts
    out = top_per_group(df, 3, salts=2)
    assert out.columns == ["doc_id", "prompt_id", "score", "extra"]


def test_top_ties_break_on_id(spark):
    # identical rounded scores -> smallest ids win deterministically
    df = spark.createDataFrame(
        [(i, 1, 0.5) for i in range(10)],
        "doc_id long, prompt_id long, score double",
    )
    kept = sorted(r.doc_id for r in top_per_group(df, 3).collect())
    assert kept == [0, 1, 2]


def test_top_rounds_score_before_ranking(spark):
    # scores differing only past 6 dp are ties -> id decides, so the
    # last-ulp engine drift cannot flip the kept set
    df = spark.createDataFrame(
        [(0, 1, 0.1000000001), (1, 1, 0.1000000002), (2, 1, 0.2)],
        "doc_id long, prompt_id long, score double",
    )
    kept = sorted(r.doc_id for r in top_per_group(df, 2).collect())
    assert kept == [0, 2]


def test_top_validation(spark):
    df = _completions(spark, n=10)
    with pytest.raises(ValueError):
        top_per_group(df, 0)
    with pytest.raises(ValueError):
        top_per_group(df, 3, salts=0)


def test_top_plan_no_bare_group_window_over_full_input(spark):
    """Skew contract: cold groups bypass all ordering work (broadcast
    anti-join) and the stage-1 window includes the shard column."""
    import re

    df = _completions(spark, n=300)
    plan = (
        top_per_group(df, 3, salts=8)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastHashJoin" in plan
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs, plan
    assert any("_s" in s for s in specs), "stage-1 salted window missing"


# ---------------------------------------------------------------------
# blocklist
# ---------------------------------------------------------------------

def test_blocklist_pattern_longest_first():
    pat = blocklist_pattern(["fast", "fast table", "merge"])
    # length-desc: the phrase alternative precedes its prefix word
    body = pat[len(r"\b(?:"):-len(r")\b")]
    alts = body.split("|")
    assert alts == ["fast\\ table", "merge", "fast"]


def test_blocklist_pattern_validation():
    with pytest.raises(ValueError):
        blocklist_pattern([])
    with pytest.raises(ValueError):
        blocklist_pattern([""])
    with pytest.raises(ValueError):
        blocklist_pattern(["bad!"])  # non-word edge inverts \b
    with pytest.raises(ValueError):
        blocklist_pattern(["!bad"])


def test_blocklist_counts_word_boundaries(spark):
    df = spark.createDataFrame(
        [
            (0, "the fast table of fast tables"),   # phrase + bare fast
            (1, "a fastx fast, FAST. tableau"),     # 2 hits, case-folded
            (2, "nothing here"),                    # 0 hits
            (3, "merge merge merge"),               # 3 hits
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: (r.n_blocked, r.keep) for r in blocklist_stats(
        df, ("fast table", "fast", "merge"), max_hits=2
    ).collect()}
    assert out[0] == (2, True)   # "fast table" greedy + "fast"; "tables" no
    assert out[1] == (2, True)
    assert out[2] == (0, True)
    assert out[3] == (3, False)


def test_blocklist_frac_and_max_frac_gate(spark):
    df = spark.createDataFrame(
        [(0, "merge a b c")], "doc_id long, text string"
    )
    r = blocklist_stats(df, ("merge",), max_hits=5, max_frac=0.1).collect()[0]
    assert r.n_blocked == 1 and r.blocked_frac == 0.25
    assert not r.keep  # frac gate fails even though count passes


def test_blocklist_plan_zero_exchange_zero_python(spark):
    df = spark.createDataFrame([(0, "x")], "doc_id long, text string")
    plan = (
        blocklist_stats(df, ("merge",))
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan


def test_prepare_corpus_blocklist_stage(spark):
    from grass_spark.operators.corpus import prepare_corpus

    clean = "the quick brown fox jumps over the lazy dog near the barn"
    dirty = "the quick brown fox badword jumps over the lazy dog here"
    docs = spark.createDataFrame(
        [(0, clean, "en", "s0"), (1, dirty, "en", "s0")],
        "doc_id long, text string, lang string, source string",
    )
    out, stats = prepare_corpus(
        docs, near_dedup_threshold=None,
        blocklist_terms=("badword",),
    )
    assert sorted(r.doc_id for r in out.collect()) == [0]
    assert stats["after_blocklist"] == 1


def test_stream_blocklist_matches_batch(spark, tmp_path):
    rows = [
        (0, "clean prose about engines and shuffles at scale"),
        (1, "one badword in otherwise clean text"),
        (2, "badword badword badword soup"),
        (3, "badwords is a different token entirely"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    in_dir = str(tmp_path / "in")
    docs.repartition(2).write.parquet(in_dir)

    stage = lambda df: blocklist_stats(df, ("badword",), max_hits=1)  # noqa: E731
    out = str(tmp_path / "out")
    stream = spark.readStream.schema("doc_id bigint, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    q = (
        stage(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()  # availableNow drains deterministically

    got = sorted(
        (r.doc_id, r.n_blocked, r.keep)
        for r in spark.read.parquet(out).collect()
    )
    want = sorted(
        (r.doc_id, r.n_blocked, r.keep) for r in stage(docs).collect()
    )
    assert got == want
    assert dict((d, (n, k)) for d, n, k in got)[3] == (0, True)


# ---------------------------------------------------------------------
# two-stage knn + hard negatives
# ---------------------------------------------------------------------

def _emb(spark):
    import math
    rows = []
    for i in range(40):
        a = i * 0.37
        rows.append((i, [math.cos(a), math.sin(a), 0.1 * (i % 5)], i % 3))
    return spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, label int"
    )


def test_cosine_topk_two_stage_equals_bare_window(spark):
    from grass_spark.operators.similarity import cosine_topk

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 4)
    got = sorted(
        (r.q_id, r.rank, r.neighbor_id)
        for r in cosine_topk(emb, q, k=6).collect()
    )
    # brute single-window reference
    c = emb.select(F.col("vec_id").alias("neighbor_id"), "embedding")
    pairs = q.select(F.col("vec_id").alias("q_id"),
                     F.col("embedding").alias("qe")).crossJoin(c)
    dot = F.aggregate(F.zip_with("qe", "embedding", lambda a, b: a * b),
                      F.lit(0.0), lambda acc, x: acc + x)
    norm = lambda col: F.sqrt(F.aggregate(  # noqa: E731
        F.transform(col, lambda x: x * x), F.lit(0.0), lambda a, x: a + x))
    sim = dot / (norm(F.col("qe")) * norm(F.col("embedding")))
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id"))
    want = sorted(
        (r.q_id, r.rank, r.neighbor_id)
        for r in pairs.filter("q_id <> neighbor_id")
        .select("q_id", "neighbor_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 6).collect()
    )
    assert got == want


def test_cosine_topk_plan_has_sharded_stage1_window(spark):
    import re

    from grass_spark.operators.similarity import cosine_topk

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 2)
    plan = (
        cosine_topk(emb, q, k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    specs = re.findall(r"windowspecdefinition\(([^)]*)\)", plan)
    assert specs and any("_s" in s for s in specs), plan


def test_hard_negatives_excludes_same_label(spark):
    from grass_spark.operators.similarity import hard_negatives

    emb = _emb(spark)
    q = emb.filter(F.col("vec_id") < 3)
    out = hard_negatives(emb, q, k=5).collect()
    labels = {r.vec_id: r.label for r in emb.collect()}
    assert len(out) == 15
    for r in out:
        assert r.label != labels[r.q_id]
        assert r.neighbor_id != r.q_id
    # ranks are 1..5 per query, cosine non-increasing
    by_q = {}
    for r in sorted(out, key=lambda r: (r.q_id, r.rank)):
        by_q.setdefault(r.q_id, []).append(r.cosine)
    for sims in by_q.values():
        assert sims == sorted(sims, reverse=True) and len(sims) == 5


# ---------------------------------------------------------------------
# shard manifest
# ---------------------------------------------------------------------

def test_shard_manifest_matches_written_shards(spark, tmp_path):
    from grass_spark.operators.export import shard_manifest, write_shards

    docs = spark.range(300).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body "), F.col("id").cast("string")).alias("text"),
    )
    path = str(tmp_path / "shards")
    write_shards(docs, path, 4)
    man = {r.shard_id: (r.n_docs, r.fingerprint)
           for r in shard_manifest(docs, 4).collect()}

    back = spark.read.parquet(path)
    fp = F.conv(F.substring(F.md5(F.concat_ws(
        ":", F.col("doc_id").cast("string"), F.md5("text"))), 1, 8),
        16, 10).cast("bigint")
    got = {r.shard_id: (r.n, r.f) for r in back.groupBy("shard_id").agg(
        F.count("*").alias("n"), F.sum(fp).alias("f")).collect()}
    assert got == man
    assert sum(n for n, _ in man.values()) == 300


def test_shard_manifest_detects_mutation(spark):
    from grass_spark.operators.export import shard_manifest

    docs = spark.range(50).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body "), F.col("id").cast("string")).alias("text"),
    )
    base = {r.shard_id: r.fingerprint
            for r in shard_manifest(docs, 2).collect()}
    mutated = docs.withColumn(
        "text",
        F.when(F.col("doc_id") == 7, F.lit("tampered")).otherwise(F.col("text")),
    )
    after = {r.shard_id: r.fingerprint
             for r in shard_manifest(mutated, 2).collect()}
    assert base != after
    # exactly the shard holding doc 7 moved
    assert sum(1 for k in base if base[k] != after.get(k)) == 1


def test_write_shards_curriculum_order(spark, tmp_path):
    from grass_spark.operators.export import write_shards

    docs = spark.range(200).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("body "), F.col("id").cast("string")).alias("text"),
        ((F.col("id") * 37) % 101).cast("double").alias("difficulty"),
    )
    plain = str(tmp_path / "plain")
    curr = str(tmp_path / "curr")
    write_shards(docs, plain, 4)
    write_shards(docs, curr, 4, order_col="difficulty")

    a = spark.read.parquet(plain)
    b = spark.read.parquet(curr)
    # same membership per shard
    sa = sorted((r.shard_id, r.doc_id) for r in a.collect())
    sb = sorted((r.shard_id, r.doc_id) for r in b.collect())
    assert sa == sb
    # in-shard order is ascending difficulty (file row order preserved
    # by per-file reads; single file per shard at this size)
    for s in range(4):
        rows = spark.read.parquet(f"{curr}/shard_id={s}").collect()
        difficulties = [r.difficulty for r in rows]
        assert difficulties == sorted(difficulties)
        assert len(rows) > 0
