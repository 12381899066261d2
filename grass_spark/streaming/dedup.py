"""Streaming deduplication — the always-on form of the training-data
dedup stack (:mod:`grass_spark.operators.dedup`).

Two shapes, matching what actually distributes in a streaming context:

* **exact dedup** is a keyed state problem: the first document seen per
  content hash passes, later copies are dropped.  Implemented with
  ``dropDuplicatesWithinWatermark`` — state is bounded by the event-time
  watermark horizon (a content hash is remembered until the watermark
  passes its last sighting), so the state store never grows without
  bound the way a global ``dropDuplicates`` on a stream would.
* **signature extraction** (MinHash / SimHash) is stateless per
  document, so it runs unchanged inside a streaming ``select`` — each
  micro-batch computes signatures with the exact batch kernels.  The
  LSH *candidate join* stays a batch job over the signature store
  (foreachBatch-appended): a streaming self-join on band hashes would
  need unbounded two-sided state.  This mirrors the continuous-tier
  design (streaming/continuous.py): stateless/windowed work streams,
  cross-row joins run per-epoch over the accumulated store.

Which copy survives exact dedup is arrival-order-dependent (the batch
twin keeps the smallest id; a stream keeps the first seen) — the
invariant shared by both is the *set of surviving content hashes*, and
that is what the tests pin.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grass_spark.operators.dedup import minhash_signatures, normalize_text

DOC_SCHEMA = "doc_id bigint, text string, ts timestamp"


def stream_docs(
    spark: SparkSession, input_path: str, *, max_files: int = 16
) -> DataFrame:
    """readStream over a growing directory of document parquet files."""
    return (
        spark.readStream.schema(DOC_SCHEMA)
        .option("maxFilesPerTrigger", max_files)
        .parquet(input_path)
    )


def stream_exact_dedup(
    docs: DataFrame,
    *,
    text_col: str = "text",
    ts_col: str = "ts",
    watermark: str = "10 minutes",
) -> DataFrame:
    """First document per content hash passes; duplicates arriving
    within the watermark horizon are dropped.  State per key expires
    once the watermark passes — bounded by (horizon × distinct-rate),
    not by stream length."""
    hashed = docs.withColumn(
        "content_hash", F.md5(normalize_text(F.col(text_col)))
    )
    return hashed.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["content_hash"]
    )


def stream_minhash_signatures(
    docs: DataFrame,
    *,
    n_hashes: int = 32,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-document MinHash signatures inside the stream — the batch
    kernel (:func:`grass_spark.operators.dedup.minhash_signatures`) is
    a pure per-row fold (no explode, no groupBy), so it is legal in a
    streaming ``select`` as-is and needs no streaming state at all."""
    return minhash_signatures(docs, n_hashes=n_hashes, shingle_n=shingle_n)
