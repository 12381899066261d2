"""Multimodal column plumbing: opaque binary payloads + typed metadata.

Images/audio/video ride as ``binary`` columns with a metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
pandas UDFs over ``mapInPandas``.

The decode kernels are REAL for the two in-contract formats —
uncompressed **BMP** images and PCM **WAV** audio, decoded by the
dependency-free codecs in :mod:`grass_spark.functions.codecs`; "video"
is a concatenated-BMP frame stream (splittable by the per-frame size
field, ``codecs.bmp_size``).  Payloads in any other format raise
``ValueError`` naming the unsupported codec — an input-domain error:
external formats (JPEG/H.264/Opus) are declared out of contract for
this container, not stubbed.  ``fake=True`` keeps the deterministic
hash-seeded stand-ins for plumbing tests with arbitrary bytes.

Scale notes: binary payloads stay in Arrow buffers end to end (no
Python-object copies); ``mapInPandas`` streams record batches, so
executor memory is bounded by ``spark.sql.execution.arrow
.maxRecordsPerBatch`` regardless of blob sizes; repartition by
``media_id`` hash before heavy extraction so skewed blob sizes spread.
Per-frame offset generation is vectorized (numpy arange/repeat) — no
per-row Python beyond the per-blob decode itself.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grass_spark.functions import codecs

MEDIA_SCHEMA = (
    "media_id bigint, kind string, payload binary, "
    "width int, height int, duration_ms int, codec string"
)

FEATURE_DIM = 16


def _fake_features(payload: bytes, dim: int) -> np.ndarray:
    """Deterministic stand-in featurizer: bytes -> fixed-size float
    vector seeded by the content digest (plumbing tests only)."""
    digest = hashlib.sha256(payload or b"").digest()
    seed = int.from_bytes(digest[:8], "little")
    rng = np.random.default_rng(seed)
    return rng.normal(size=dim).astype(np.float32)


def _real_features(payload: bytes, dim: int) -> np.ndarray:
    """Decode by payload magic and featurize — BMP and WAV in
    contract; anything else is a ValueError."""
    p = bytes(payload or b"")
    if p[:2] == b"BM":
        return codecs.image_features(codecs.decode_bmp(p), dim)
    if p[:4] == b"RIFF":
        x, rate = codecs.decode_wav(p)
        return codecs.audio_features(x, rate, dim)
    raise ValueError(
        "unsupported media payload (in-contract formats: BMP, PCM WAV); "
        f"got magic {p[:4]!r}"
    )


def extract_features(
    df: DataFrame,
    *,
    payload_col: str = "payload",
    id_col: str = "media_id",
    dim: int = FEATURE_DIM,
    fake: bool = False,
) -> DataFrame:
    """media rows -> (media_id, feature array<float>).

    Real decode for BMP/WAV payloads (``functions/codecs.py``);
    ``fake=True`` substitutes the hash-seeded featurizer for arbitrary
    test bytes."""

    featurize = _fake_features if fake else _real_features

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = [featurize(p, dim).tolist() for p in pdf[payload_col]]
            yield pd.DataFrame({id_col: pdf[id_col], "feature": feats})

    out_schema = f"{id_col} bigint, feature array<float>"
    return df.select(id_col, payload_col).mapInPandas(run, schema=out_schema)


def _resize_nn(img: np.ndarray, width: int, height: int) -> np.ndarray:
    """Nearest-neighbor resample via numpy index maps."""
    h, w, _ = img.shape
    rows = (np.arange(height) * (h / height)).astype(np.int64).clip(0, h - 1)
    cols = (np.arange(width) * (w / width)).astype(np.int64).clip(0, w - 1)
    return img[np.ix_(rows, cols)]


def resize_images(
    df: DataFrame,
    width: int,
    height: int,
    *,
    payload_col: str = "payload",
    fake: bool = False,
) -> DataFrame:
    """Resize BMP payloads to width x height (nearest neighbor),
    re-encoded as BMP.  ``fake=True``: deterministic byte
    truncate/pad stand-in for arbitrary payload bytes."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        target = width * height
        for pdf in batches:
            out = []
            for p in pdf[payload_col]:
                p = bytes(p or b"")
                if fake:
                    rep = (p * (target // max(len(p), 1) + 1))[:target]
                    out.append(rep)
                else:
                    out.append(
                        codecs.encode_bmp(
                            _resize_nn(codecs.decode_bmp(p), width, height)
                        )
                    )
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
    """One row per sampled frame at ``every_ms`` spacing.

    Real path: the payload is a concatenated-BMP frame stream
    (``codecs.split_bmp_stream``); the sampled offset maps to a frame
    index at uniform spacing over ``duration_ms``, and the row carries
    the that frame's BMP bytes.  ``fake=True`` emits hash-derived
    pseudo frames for arbitrary payload bytes.  Offsets are vectorized
    (numpy arange/repeat) — no per-row Python loops over frames."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            durs = pdf[duration_col].fillna(0).astype(np.int64).to_numpy()
            n_offs = np.maximum(durs, 1) // every_ms + (np.maximum(durs, 1) % every_ms > 0)
            n_offs = np.maximum(n_offs, 1)
            ids = np.repeat(pdf[id_col].to_numpy(), n_offs)
            # per-row arange(0, dur, every_ms), concatenated:
            cum = np.concatenate([[0], np.cumsum(n_offs)[:-1]])
            offs = (np.arange(n_offs.sum()) - np.repeat(cum, n_offs)) * every_ms
            frames: list[bytes] = []
            for p, dur, k in zip(pdf[payload_col], durs, n_offs):
                p = bytes(p or b"")
                row_offs = np.arange(k) * every_ms
                if fake:
                    frames.extend(
                        hashlib.sha256(p + int(o).to_bytes(8, "little")).digest()
                        for o in row_offs
                    )
                else:
                    parts = codecs.split_bmp_stream(p)
                    idx = (row_offs * len(parts) // max(int(dur), 1)).clip(
                        0, len(parts) - 1
                    )
                    frames.extend(parts[int(i)] for i in idx)
            yield pd.DataFrame(
                {id_col: ids, "frame_ms": offs.astype(np.int32), "frame": frames}
            )

    return df.mapInPandas(
        run, schema=f"{id_col} bigint, frame_ms int, frame binary"
    )


def synth_media(spark, n: int = 64, seed: int = 42) -> DataFrame:
    """Deterministic fake media table for plumbing tests (arbitrary
    bytes — pair with ``fake=True`` kernels)."""
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


def synth_real_media(spark, n: int = 12, seed: int = 7) -> DataFrame:
    """Small table of REAL decodable payloads: BMP images, WAV audio,
    concatenated-BMP video streams — built with the vendored codecs so
    the real kernels run end-to-end with no external data."""
    rng = np.random.default_rng(seed)
    rows = []
    for i in range(n):
        kind = ("image", "audio", "video")[i % 3]
        if kind == "image":
            w, h = 8 + i, 6 + i
            img = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
            rows.append((i, kind, bytearray(codecs.encode_bmp(img)),
                         w, h, None, "bmp"))
        elif kind == "audio":
            dur_ms = 200 + 40 * i
            t = np.arange(int(16000 * dur_ms / 1000)) / 16000.0
            x = 0.5 * np.sin(2 * np.pi * (110 + 10 * i) * t)
            rows.append((i, kind, bytearray(codecs.encode_wav(x, 16000)),
                         None, None, dur_ms, "pcm16"))
        else:
            frames = [
                rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
                for _ in range(5)
            ]
            payload = b"".join(codecs.encode_bmp(f) for f in frames)
            rows.append((i, kind, bytearray(payload), 4, 4, 1000, "bmpseq"))
    return spark.createDataFrame(rows, MEDIA_SCHEMA)
