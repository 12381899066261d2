"""Streaming corpus hygiene: the stateless stages (PII redaction,
map-side quality gates, deterministic hash sampling) compose onto a
file stream unchanged and emit batch-identical rows.

The stateful stages stay batch/foreachBatch territory by design:
near/segment dedup and decontamination aggregate across documents
(first-occurrence election, per-doc hit counts), which in a stream
means unbounded state; the ingest pattern is stream the stateless
scrub, micro-batch the corpus-wide ops via foreachBatch (same split as
streaming/continuous.py's cascade)."""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.redact import redact
from grass_spark.operators.sampling import hash_sample


def _hygiene(df):
    """Stateless scrub: redact, keep docs >= 5 words with word-rep
    <= 0.6 (map-side array exprs), 50% deterministic hash sample."""
    ws = F.split(F.col("text"), r"\s+")
    scrubbed = redact(df).withColumn("n_words", F.size(ws).cast("bigint"))
    kept = scrubbed.filter(
        (F.col("n_words") >= 5)
        & (1.0 - F.size(F.array_distinct(ws)) / F.size(ws).cast("double")
           <= 0.6)
    )
    return hash_sample(kept, 0.5, salt="stream")


def test_stream_hygiene_matches_batch(spark, tmp_path):
    rows = [
        (1, "mail a@b.example.com the quick brown fox jumps over dogs"),
        (2, "too short"),
        (3, " ".join(["spam"] * 30)),
        (4, "completely unique prose about engines and shuffles at scale"),
        (5, "call +1 (415) 555-0199 about the seven distinct topics today"),
        (6, "another perfectly ordinary document with enough words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    in_dir = str(tmp_path / "in")
    docs.repartition(3).write.parquet(in_dir)

    out = str(tmp_path / "out")
    stream = spark.readStream.schema("doc_id bigint, text string").option(
        "maxFilesPerTrigger", 2
    ).parquet(in_dir)
    q = (
        _hygiene(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()  # availableNow drains deterministically

    got = {r["doc_id"]: r for r in spark.read.parquet(out).collect()}
    want = {r["doc_id"]: r for r in _hygiene(docs).collect()}
    assert set(got) == set(want) and len(want) > 0
    for k in want:
        assert got[k]["text"] == want[k]["text"]
        assert got[k]["n_email"] == want[k]["n_email"]
        assert got[k]["n_digits"] == want[k]["n_digits"]


def test_stream_quality_rules_match_batch(spark, tmp_path):
    """The Gopher structural rules (operators/quality.py) are pure
    scan-stage expressions, so they compose onto readStream unchanged
    and emit batch-identical metrics + keep decisions."""
    from grass_spark.operators.quality import QualityRules, quality_filter

    rules = QualityRules(min_words=5, min_stopwords=1,
                         min_mean_word_len=2.0, min_alpha_word_frac=0.5)
    rows = [
        (1, "the quick brown fox jumps over the lazy sleeping dog"),
        (2, "nope"),
        (3, " ".join(["12345"] * 20)),
        (4, "- a\n- b\n- c\n- d"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    in_dir = str(tmp_path / "qin")
    docs.repartition(2).write.parquet(in_dir)

    batch = {
        r["doc_id"]: (r["keep"], r["reject_reason"], r["n_words"])
        for r in quality_filter(docs, rules).collect()
    }

    out = str(tmp_path / "qout")
    stream = spark.readStream.schema("doc_id bigint, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    q = (
        quality_filter(stream, rules)
        .select("doc_id", "keep", "reject_reason", "n_words")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "qckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    got = {
        r["doc_id"]: (r["keep"], r["reject_reason"], r["n_words"])
        for r in spark.read.parquet(out).collect()
    }
    assert got == batch
    assert got[1][0] and not got[2][0]


def test_stream_chunking_matches_batch(spark, tmp_path):
    """chunk_documents is a pure scan-stage Generate — it composes onto
    readStream unchanged and emits batch-identical chunk rows."""
    from grass_spark.operators.chunks import chunk_documents

    rows = [
        (1, "the quick brown fox jumps over the lazy dog again today"),
        (2, "x y"),
        (3, "   "),
        (4, " ".join(f"w{i}" for i in range(23))),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    in_dir = str(tmp_path / "in")
    docs.repartition(2).write.parquet(in_dir)

    out = str(tmp_path / "out")
    stream = spark.readStream.schema("doc_id bigint, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    q = (
        chunk_documents(stream, size=8, stride=4)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    batch = chunk_documents(docs, size=8, stride=4)
    key = lambda r: (r["doc_id"], r["chunk_idx"])
    got = sorted((tuple(r) for r in spark.read.parquet(out).collect()),
                 key=lambda t: (t[0], t[1]))
    want = sorted((tuple(r) for r in batch.collect()),
                  key=lambda t: (t[0], t[1]))
    assert got == want and len(want) > 0


def test_stream_subword_and_pq_match_batch(spark, tmp_path):
    """subword_encode and pq_encode are stateless scan-stage
    projections — both compose onto readStream unchanged."""
    import numpy as np

    from grass_spark.operators.pq import pq_codebook, pq_encode
    from grass_spark.operators.textstats import subword_encode

    # --- subword over a doc stream
    docs = spark.createDataFrame(
        [(i, f"document number {i} with engineering nationalization")
         for i in range(8)],
        "doc_id bigint, text string",
    )
    din = str(tmp_path / "docs")
    docs.repartition(2).write.parquet(din)
    stream = spark.readStream.schema("doc_id bigint, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(din)
    dout = str(tmp_path / "docs_out")
    q = (
        subword_encode(stream)
        .writeStream.format("parquet").option("path", dout)
        .option("checkpointLocation", str(tmp_path / "ck1"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {r.doc_id: (r.n_tokens, r.token_ids)
           for r in spark.read.parquet(dout).collect()}
    want = {r.doc_id: (r.n_tokens, r.token_ids)
            for r in subword_encode(docs).collect()}
    assert got == want and len(want) == 8

    # --- PQ encode over an embedding stream (codebook trained on the
    # batch frame; the stream only runs the stateless encode)
    rng = np.random.default_rng(5)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in rng.normal(size=16)]) for i in range(40)],
        "vec_id bigint, embedding array<double>",
    )
    vin = str(tmp_path / "vecs")
    vecs.repartition(2).write.parquet(vin)
    cb = pq_codebook(vecs, 4, 8)
    vstream = spark.readStream.schema(
        "vec_id bigint, embedding array<double>"
    ).option("maxFilesPerTrigger", 1).parquet(vin)
    vout = str(tmp_path / "vecs_out")
    q = (
        pq_encode(vstream, cb, with_err=True)
        .writeStream.format("parquet").option("path", vout)
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {r.vec_id: (r.codes, r.recon_err)
           for r in spark.read.parquet(vout).collect()}
    want = {r.vec_id: (r.codes, r.recon_err)
            for r in pq_encode(vecs, cb, with_err=True).collect()}
    assert got == want and len(want) == 40


def test_stream_upsample_epochs_matches_batch(spark, tmp_path):
    """upsample_epochs is a stateless explode + filter (dict weights
    are a plan literal), so it composes onto readStream unchanged and
    emits batch-identical (doc, epoch) rows."""
    from grass_spark.operators.preference import upsample_epochs

    rows = [(i, "s%d" % (i % 3)) for i in range(30)]
    docs = spark.createDataFrame(rows, "doc_id bigint, source string")
    in_dir = str(tmp_path / "uin")
    docs.repartition(2).write.parquet(in_dir)

    weights = {"s0": 2.5, "s1": 1.0, "s2": 0.0}
    batch = sorted(
        (r["doc_id"], r["epoch"])
        for r in upsample_epochs(docs, weights).collect()
    )

    out = str(tmp_path / "uout")
    stream = spark.readStream.schema("doc_id bigint, source string").option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    q = (
        upsample_epochs(stream, weights)
        .select("doc_id", "epoch")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "uckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    streamed = sorted(
        (r["doc_id"], r["epoch"])
        for r in spark.read.parquet(out).collect()
    )
    assert streamed == batch
