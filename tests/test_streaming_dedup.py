"""Streaming dedup vs the batch dedup operators."""

from __future__ import annotations

from datetime import datetime, timedelta

from pyspark.sql import functions as F

from grass_spark.operators.dedup import exact_dedup, minhash_signatures
from grass_spark.streaming.dedup import (
    stream_docs,
    stream_exact_dedup,
    stream_minhash_signatures,
)

T0 = datetime(2024, 3, 1, 12, 0, 0)


def _docs(spark, n=60, dup_every=3):
    """n docs; every ``dup_every``-th shares its text with doc i-1."""
    rows = []
    for i in range(n):
        text = f"some sample document body number {i if i % dup_every else i - 1}"
        rows.append((i, text, T0 + timedelta(minutes=i)))
    return spark.createDataFrame(rows, "doc_id bigint, text string, ts timestamp")


def test_stream_exact_dedup_matches_batch_hash_set(spark, tmp_path):
    docs = _docs(spark).cache()
    in_dir = str(tmp_path / "in")
    docs.repartition(3).write.parquet(in_dir)

    out = str(tmp_path / "out")
    deduped = stream_exact_dedup(
        stream_docs(spark, in_dir, max_files=2), watermark="5 minutes"
    )
    q = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()  # availableNow drains deterministically; a bound flakes under host load

    got = spark.read.parquet(out)
    batch = exact_dedup(docs)
    # invariant shared by stream and batch: the surviving hash set —
    # one survivor per content hash, every batch hash present
    assert got.groupBy("content_hash").count().filter("count > 1").count() == 0
    stream_hashes = {r["content_hash"] for r in got.select("content_hash").collect()}
    batch_hashes = {r["content_hash"] for r in batch.select("content_hash").collect()}
    assert stream_hashes == batch_hashes
    # each survivor is a member of that hash's batch duplicate group
    members = {
        r["content_hash"]: set(r["member_ids"]) for r in batch.collect()
    }
    for r in got.select("content_hash", "doc_id").collect():
        assert r["doc_id"] in members[r["content_hash"]]


def test_stream_minhash_signatures_match_batch(spark, tmp_path):
    docs = _docs(spark, n=30).cache()
    in_dir = str(tmp_path / "in")
    docs.repartition(2).write.parquet(in_dir)

    sigs = stream_minhash_signatures(
        stream_docs(spark, in_dir), n_hashes=8
    )
    q = (
        sigs.writeStream.format("memory")
        .queryName("sigstream")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()  # availableNow drains deterministically; a bound flakes under host load

    streamed = {
        r["doc_id"]: tuple(r["sig"])
        for r in spark.sql("SELECT * FROM sigstream").collect()
    }
    batch = {
        r["doc_id"]: tuple(r["sig"])
        for r in minhash_signatures(docs, n_hashes=8).collect()
    }
    assert streamed == batch
    assert len(streamed) == 30


def test_stream_exact_dedup_state_is_watermark_bounded(spark, tmp_path):
    """A duplicate arriving AFTER the watermark passed its twin is kept
    (state expired) — the documented horizon contract, and the reason
    state stays bounded at stream scale."""
    in_dir = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id bigint, text string, ts timestamp"
    )
    # batch 1: original at T0 (+ a far-future row to advance the
    # watermark well past T0 + horizon).  coalesce(1): with
    # maxFilesPerTrigger=1 each FILE is a micro-batch, and if the two
    # rows split across files the watermark-advancing row can be
    # processed first, dropping doc 0 as late data (file listing order
    # is not guaranteed) — both rows must share one micro-batch for the
    # watermark to advance only after doc 0 is admitted.
    mk([(0, "dup body", T0), (1, "advance wm", T0 + timedelta(hours=6))]).coalesce(
        1
    ).write.parquet(in_dir, mode="append")
    deduped = stream_exact_dedup(
        stream_docs(spark, in_dir, max_files=1), watermark="10 minutes"
    )
    writer = (
        deduped.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
    )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()  # availableNow drains deterministically; a bound flakes under host load

    # batch 2: same text again — event time AHEAD of the current
    # watermark (~T0+6h-10m, else the row is dropped as late data) and
    # far past the twin's state expiry (T0 + 10 min)
    mk([(2, "dup body", T0 + timedelta(hours=7))]).write.parquet(
        in_dir, mode="append"
    )
    q = writer.trigger(availableNow=True).start()
    q.awaitTermination()  # availableNow drains deterministically; a bound flakes under host load

    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [0, 1, 2]  # doc 2 re-admitted: its twin's state expired
