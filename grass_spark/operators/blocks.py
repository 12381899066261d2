"""Compressed bucket blocks — Arrow-backed Gorilla layer as an operator.

Turns a (keys..., ts, metrics...) tier into one row per (keys...,
block_start) holding delta-of-delta-compressed timestamps and
XOR/delta-compressed metric columns (:mod:`grass_spark.functions.compress`),
plus byte-level lineage (raw vs compressed sizes).  The inverse operator
restores the original rows bit-exactly.

This is the engine's counterpart of GRASS's per-row raster compression
(``lib/gis/compress.c:21-27``) — but time-series-aware, and implemented
as ``applyInPandas`` / ``mapInPandas`` over Arrow record batches: the
only Python in the plan is whole-array numpy inside the UDF (the
BASELINE "zero per-row Python" rule).

Scale notes: blocks are keyed by (conv_id, block period) so one block
never exceeds one conversation-day; the groupBy shuffle is the same
shuffle the tier rollup already pays, and AQE handles skewed
conversations.  Block rows are ~10-50x smaller than their input, so
everything downstream of the codec is cheap.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grass_spark.functions import compress as C


def _ts_to_us(series: pd.Series) -> np.ndarray:
    return series.to_numpy().astype("datetime64[us]").astype(np.int64)


def compress_blocks(
    df: DataFrame,
    *,
    keys: list[str] | None = None,
    ts_col: str = "bucket_start",
    float_cols: list[str] | None = None,
    int_cols: list[str] | None = None,
    block: str = "day",
) -> DataFrame:
    """One compressed block per (keys..., date_trunc(block, ts))."""
    keys = ["conv_id"] if keys is None else list(keys)
    float_cols = list(float_cols or [])
    int_cols = list(int_cols or [])
    metric_cols = float_cols + int_cols

    key_fields = ", ".join(
        f"{k} {t}" for k, t in df.select(*keys).dtypes
    )
    blob_fields = ", ".join(
        [f"{m}_blob binary, {m}_valid binary" for m in metric_cols]
    )
    schema = (
        f"{key_fields}, block_start timestamp, n bigint, "
        f"ts_blob binary, raw_bytes bigint, comp_bytes bigint"
        + (", " + blob_fields if blob_fields else "")
    )

    def encode(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(ts_col, kind="mergesort")
        ts_us = _ts_to_us(pdf[ts_col])
        n = len(pdf)
        ts_blob = C.encode_timestamps(ts_us)
        row: dict = {k: [pdf[k].iloc[0]] for k in keys}
        row["block_start"] = [pdf["_block"].iloc[0]]
        row["n"] = [n]
        row["ts_blob"] = [ts_blob]
        comp = len(ts_blob)
        raw = n * 8
        for m in float_cols:
            valid = pdf[m].notna().to_numpy()
            vals = pdf[m].to_numpy(dtype=np.float64, na_value=np.nan)
            blob = C.encode_floats(vals)
            row[f"{m}_blob"] = [blob]
            row[f"{m}_valid"] = [C.encode_validity(valid)]
            comp += len(blob) + (n + 7) // 8
            raw += n * 8
        for m in int_cols:
            valid = pdf[m].notna().to_numpy()
            vals = pdf[m].fillna(0).to_numpy(dtype=np.int64)
            blob = C.encode_ints(vals)
            row[f"{m}_blob"] = [blob]
            row[f"{m}_valid"] = [C.encode_validity(valid)]
            comp += len(blob) + (n + 7) // 8
            raw += n * 8
        row["raw_bytes"] = [raw]
        row["comp_bytes"] = [comp]
        return pd.DataFrame(row)

    with_block = df.withColumn("_block", F.date_trunc(block, F.col(ts_col)))
    return with_block.groupBy(*keys, "_block").applyInPandas(encode, schema=schema)


def decompress_blocks(
    blocks: DataFrame,
    *,
    keys: list[str] | None = None,
    ts_col: str = "bucket_start",
    float_cols: list[str] | None = None,
    int_cols: list[str] | None = None,
) -> DataFrame:
    """Inverse of :func:`compress_blocks` — bit-exact restore."""
    keys = ["conv_id"] if keys is None else list(keys)
    float_cols = list(float_cols or [])
    int_cols = list(int_cols or [])

    key_fields = ", ".join(
        f"{k} {t}" for k, t in blocks.select(*keys).dtypes
    )
    out_fields = ", ".join(
        [f"{m} double" for m in float_cols] + [f"{m} bigint" for m in int_cols]
    )
    schema = f"{key_fields}, {ts_col} timestamp" + (
        ", " + out_fields if out_fields else ""
    )

    def decode(batches):
        for pdf in batches:
            frames = []
            for _, r in pdf.iterrows():   # iterates BLOCKS, not rows
                n = int(r["n"])
                ts = C.decode_timestamps(r["ts_blob"]).astype("datetime64[us]")
                d: dict = {k: np.repeat(r[k], n) for k in keys}
                d[ts_col] = ts
                for m in float_cols:
                    vals = C.decode_floats(r[f"{m}_blob"])
                    valid = C.decode_validity(r[f"{m}_valid"], n)
                    vals = np.where(valid, vals, np.nan)
                    d[m] = vals
                for m in int_cols:
                    # pandas nullable Int64 (masked), NOT float64+NaN:
                    # values above 2^53 would silently lose precision in
                    # a float carrier, breaking the bit-exact contract
                    vals = C.decode_ints(r[f"{m}_blob"])
                    valid = C.decode_validity(r[f"{m}_valid"], n)
                    d[m] = pd.arrays.IntegerArray(
                        vals.astype("int64"), mask=~valid
                    )
                frames.append(pd.DataFrame(d))
            if frames:
                yield pd.concat(frames, ignore_index=True)

    return blocks.mapInPandas(decode, schema=schema)


def compression_report(blocks: DataFrame) -> DataFrame:
    """Aggregate codec metrics (lineage for the manifest)."""
    return blocks.agg(
        F.count(F.lit(1)).alias("n_blocks"),
        F.sum("n").alias("n_points"),
        F.sum("raw_bytes").alias("raw_bytes"),
        F.sum("comp_bytes").alias("comp_bytes"),
        F.round(F.sum("raw_bytes") / F.sum("comp_bytes"), 3).alias("ratio"),
    )
