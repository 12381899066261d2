"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over ``mapInPandas``.  The decode kernels themselves are
STUBBED (no image/audio libraries in this container): by default they
raise ``NotImplementedError`` naming the missing dependency; with
``fake=True`` they produce a deterministic fake (seeded from the bytes'
hash) so the Spark-side plumbing — schema, batching, partitioning, UDF
signatures — is real and testable end-to-end.

Scale notes: binary payloads stay in Arrow buffers end to end (no
Python-object copies); ``mapInPandas`` streams record batches, so
executor memory is bounded by ``spark.sql.execution.arrow
.maxRecordsPerBatch`` regardless of blob sizes; repartition by
``media_id`` hash before heavy extraction so skewed blob sizes spread.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "width int, height int, duration_ms int, codec string"
)

FEATURE_DIM = 16


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in for a real decoder+featurizer: bytes ->
    fixed-size float vector seeded by the content digest."""
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.normal(size=dim).astype(np.float32)


def extract_features(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = FEATURE_DIM,
    fake: bool = False,
) -> DataFrame:
    """media rows -> (media_id, feature array<float>).

    Real implementation would decode the payload (PIL/libav) and run a
    feature extractor; stubbed per module docstring.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "media decode requires an image/audio library "
                    "(PIL / soundfile / av) not present in this "
                    "environment; pass fake=True for the deterministic stub"
                )
            feats = [
                _fake_features(p, dim).tolist() for p in pdf[payload_col]
            ]
            yield pd.DataFrame({id_col: pdf[id_col], "feature": feats})

    out_schema = f"{id_col} bigint, feature array<float>"
    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    *,
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Image resize stub: real impl decodes + resamples; the fake
    truncates/pads the payload deterministically to width*height bytes
    so batch shapes and output sizes are exercised."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "image resize requires PIL/opencv; pass fake=True "
                    "for the deterministic stub"
                )
            out = []
            for p in pdf[payload_col]:
                p = bytes(p or b"")
                rep = (p * (target // max(len(p), 1) + 1))[:target]
                out.append(rep)
            pdf = pdf.copy()
            pdf[payload_col] = out
            pdf["width"] = width
            pdf["height"] = height
            yield pdf

    return df.mapInPandas(run, schema=df.schema)


def sample_frames(
    df: DataFrame,
    every_ms: int,
    *,
    id_col: str = "media_id",
    payload_col: str = "payload",
    duration_col: str = "duration_ms",
    fake: bool = False,
) -> DataFrame:
    """Video frame sampling stub -> one row per sampled frame offset."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if not fake:
                raise NotImplementedError(
                    "frame sampling requires av/ffmpeg; pass fake=True"
                )
            ids, offs, frames = [], [], []
            for _, r in pdf.iterrows():  # iterates MEDIA rows (few per batch)
                dur = int(r[duration_col] or 0)
                payload = bytes(r[payload_col] or b"")
                for off in range(0, max(dur, 1), every_ms):
                    ids.append(r[id_col])
                    offs.append(off)
                    frames.append(
                        hashlib.sha256(payload + off.to_bytes(8, "little")).digest()
                    )
            yield pd.DataFrame(
                {id_col: ids, "frame_ms": offs, "frame": frames}
            )

    return df.mapInPandas(
        run, schema=f"{id_col} bigint, frame_ms int, frame binary"
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests."""
    return (
        spark.range(n)
        .select(
            F.col("id").alias("media_id"),
            F.element_at(
                F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
                (F.col("id") % 3 + 1).cast("int"),
            ).alias("kind"),
            F.sha2(F.concat(F.lit(str(seed)), F.col("id").cast("string")), 256)
            .cast("binary")
            .alias("payload"),
            (F.col("id") % 640 + 16).cast("int").alias("width"),
            (F.col("id") % 480 + 16).cast("int").alias("height"),
            (F.col("id") * 100 % 5000).cast("int").alias("duration_ms"),
            F.lit("fake").alias("codec"),
        )
    )
