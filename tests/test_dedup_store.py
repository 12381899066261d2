"""Incremental dedup store (operators/dedup_store.py): delta-batch
labels must equal a from-scratch near_dedup over the union, restricted
to the delta ids — the store exists so each ingest pays delta-sized
work instead of re-scanning the corpus."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from grass_spark.datagen import synth_documents
from grass_spark.operators.dedup import near_dedup
from grass_spark.operators.dedup_store import DedupStore


def _rows(df):
    return sorted(
        (r["doc_id"], r["cluster_id"], r["keep"]) for r in df.collect()
    )


def _keeps(df):
    return sorted((r["doc_id"], r["keep"]) for r in df.collect())


@pytest.fixture(scope="module")
def corpus(spark):
    # 600 docs: near-dup clusters of 3 over the first 240 ids,
    # boilerplate EXACT dups every 50th id above — both straddle the
    # 301 split (cluster {300..} would not straddle a multiple of 3)
    return synth_documents(
        spark, n_docs=600, seed=13, dup_frac=0.4, cluster_size=3
    ).select("doc_id", "text").localCheckpoint()


@pytest.fixture(scope="module")
def scratch(corpus):
    """From-scratch labels over the whole corpus — the parity target."""
    return near_dedup(corpus, jaccard_threshold=0.8).localCheckpoint()


def test_build_matches_batch_near_dedup(spark, corpus, tmp_path_factory):
    b1 = corpus.filter(F.col("doc_id") <= 301)
    store = DedupStore(str(tmp_path_factory.mktemp("store_build")))
    got = _rows(store.build(b1))
    want = _rows(near_dedup(b1, jaccard_threshold=0.8))
    assert got == want
    assert store.exists()


def test_first_ingest_is_cluster_exact_vs_scratch(
    spark, corpus, scratch, tmp_path_factory
):
    """build(b1) + ingest(b2) == near_dedup(b1 ∪ b2) restricted to b2,
    INCLUDING cluster ids (first-ingest guarantee)."""
    store = DedupStore(str(tmp_path_factory.mktemp("store_parity")))
    store.build(corpus.filter(F.col("doc_id") <= 301))
    out = store.ingest(spark, corpus.filter(F.col("doc_id") > 301))
    want = _rows(scratch.filter(F.col("doc_id") > 301))
    assert _rows(out) == want
    # the straddling near-dup cluster and a boilerplate exact hit both
    # resolved against the store (sanity that the split bites)
    got = {r[0]: r for r in _rows(out)}
    assert any(not k for (_, _, k) in got.values())


def test_multi_batch_keep_parity(spark, corpus, scratch, tmp_path_factory):
    """Three-way split: keep decisions stay from-scratch-exact for
    every later batch (stored labels may go stale after cross-batch
    merges — the documented contract is keep parity)."""
    store = DedupStore(str(tmp_path_factory.mktemp("store_chain")))
    store.build(corpus.filter(F.col("doc_id") <= 200))
    out2 = store.ingest(
        spark, corpus.filter((F.col("doc_id") > 200) & (F.col("doc_id") <= 400))
    )
    out3 = store.ingest(spark, corpus.filter(F.col("doc_id") > 400))
    assert _keeps(out2) == _keeps(scratch.filter(
        (F.col("doc_id") > 200) & (F.col("doc_id") <= 400)))
    assert _keeps(out3) == _keeps(scratch.filter(F.col("doc_id") > 400))


def test_monotone_id_contract(spark, corpus, tmp_path_factory):
    store = DedupStore(str(tmp_path_factory.mktemp("store_mono")))
    store.build(corpus.filter(F.col("doc_id") <= 301))
    with pytest.raises(ValueError, match="monotone"):
        store.ingest(spark, corpus.filter(F.col("doc_id") <= 10))


def test_param_mismatch_raises(spark, corpus, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("store_params"))
    DedupStore(path).build(corpus.filter(F.col("doc_id") <= 100))
    with pytest.raises(ValueError, match="different"):
        DedupStore(path, bands=4).ingest(
            spark, corpus.filter(F.col("doc_id") > 100)
        )


def test_dry_run_leaves_store_unchanged(spark, corpus, tmp_path_factory):
    store = DedupStore(str(tmp_path_factory.mktemp("store_dry")))
    store.build(corpus.filter(F.col("doc_id") <= 301))
    delta = corpus.filter(F.col("doc_id") > 301)
    a = _rows(store.ingest(spark, delta, update=False))
    b = _rows(store.ingest(spark, delta, update=True))  # still accepted
    assert a == b


def test_exact_hit_against_store_drops(spark, tmp_path_factory):
    store = DedupStore(str(tmp_path_factory.mktemp("store_exact")))
    b1 = [(i, f"completely unique document number {i} body text") for i in range(5)]
    store.build(spark.createDataFrame(b1, ["doc_id", "text"]))
    delta = spark.createDataFrame(
        [
            (10, "completely unique DOCUMENT   number 3 body text"),  # exact mod norm
            (11, "entirely fresh material nothing like the rest"),
        ],
        ["doc_id", "text"],
    )
    got = {r["doc_id"]: (r["cluster_id"], r["keep"]) for r in
           store.ingest(spark, delta).collect()}
    assert got[10] == (3, False)
    assert got[11] == (11, True)


def test_empty_delta_noop(spark, corpus, tmp_path_factory):
    store = DedupStore(str(tmp_path_factory.mktemp("store_empty")))
    store.build(corpus.filter(F.col("doc_id") <= 50))
    out = store.ingest(spark, corpus.filter(F.col("doc_id") < 0))
    assert out.count() == 0


def test_stream_ingest_equals_batch(spark, corpus, scratch, tmp_path):
    """stream==batch: micro-batched ingest through foreachBatch yields
    the same keep decisions as the one-shot from-scratch run."""
    import time

    src = str(tmp_path / "src")
    os.makedirs(src)
    cuts = [(0, 200), (201, 400), (401, 599)]
    for i, (lo, hi) in enumerate(cuts):
        p = os.path.join(src, f"part{i}.parquet")
        (
            corpus.filter(F.col("doc_id").between(lo, hi))
            .coalesce(1).write.mode("overwrite").parquet(p + ".dir")
        )
        # single data file per batch, increasing mtimes => file order
        data = [f for f in os.listdir(p + ".dir") if f.endswith(".parquet")]
        os.rename(os.path.join(p + ".dir", data[0]), p)
        os.utime(p, (time.time() + i, time.time() + i))

    store = DedupStore(str(tmp_path / "store"))
    store.build(spark.createDataFrame([], "doc_id long, text string"))
    got: list = []

    def _sink(batch_df, batch_id):
        if batch_df.count():
            got.extend(_keeps(store.ingest(spark, batch_df)))

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(_sink)
        .trigger(availableNow=True)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    q.awaitTermination()
    assert sorted(got) == _keeps(scratch)
