"""Document-corpus connectors: JSONL / CSV / parquet in, with a
scale-safe quarantine lane for malformed records.

Crawl corpora arrive as JSONL (one document object per line, usually
gzipped); curated sets as CSV or parquet.  This module reads any of
them onto the engine's documents contract

    doc_id bigint, text string, lang string, source string,
    n_chars bigint

and hands malformed input to a QUARANTINE frame instead of silently
dropping or crashing the 100-TB job.

Scale shape / design notes:

* JSONL is read as ``text`` + ``from_json`` — ONE scan, fully
  expression-based, identical on ``readStream`` (the standard
  corrupt-record column needs the scan cached before it can be
  filtered, which is a non-starter at corpus scale; ``from_json``
  needs nothing).  The quarantine frame keeps the RAW LINE, so a
  re-ingest after a parser fix loses nothing.
* CSV uses the native reader in PERMISSIVE mode; contract violations
  (null ``doc_id``/``text``) quarantine as parsed rows.  Multiline
  quoted fields are supported via ``multiLine`` only on request — it
  makes files unsplittable (one task per file), the wrong default for
  large inputs.
* gzip etc. are transparent (``.jsonl.gz`` splits per FILE — document
  shards should be many small-ish files, the standard crawl layout).
* ``n_chars`` derives from ``text`` when the source lacks it.
* Writers emit one JSONL object / CSV row per document;
  ``write_documents(..., format="jsonl")`` round-trips exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    LongType,
    StringType,
    StructField,
    StructType,
)

#: the engine's documents contract (TESTDATA.md table shape)
DOCUMENT_SCHEMA = StructType(
    [
        StructField("doc_id", LongType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
        StructField("source", StringType()),
        StructField("n_chars", LongType()),
    ]
)

_FORMATS = ("parquet", "jsonl", "csv")


def _finish(parsed: DataFrame) -> DataFrame:
    """Project onto the contract, deriving n_chars when absent."""
    cols = {c.lower() for c in parsed.columns}
    out = parsed
    for f in DOCUMENT_SCHEMA.fields:
        if f.name not in cols:
            out = out.withColumn(f.name, F.lit(None).cast(f.dataType))
    out = out.withColumn(
        "n_chars",
        F.coalesce(
            F.col("n_chars").cast("long"), F.length("text").cast("long")
        ),
    )
    return out.select([f.name for f in DOCUMENT_SCHEMA.fields])


def _valid() -> F.Column:
    return F.col("doc_id").isNotNull() & F.col("text").isNotNull()


def read_documents(
    spark: SparkSession,
    path: str,
    *,
    format: str = "jsonl",
    with_quarantine: bool = False,
    csv_header: bool = True,
    csv_multiline: bool = False,
):
    """Read a document corpus onto the contract schema.

    Returns the documents frame, or ``(docs, quarantine)`` when
    ``with_quarantine=True``.  The quarantine frame is
    ``(raw string, reason string)`` for JSONL (the unparsed line) and
    the parsed-but-invalid contract rows for CSV/parquet.
    """
    if format not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {format!r}")

    if format == "parquet":
        parsed = _finish(spark.read.parquet(path))
        good = parsed.filter(_valid())
        if not with_quarantine:
            return good
        return good, parsed.filter(~_valid())

    if format == "jsonl":
        raw = spark.read.text(path)
        return _jsonl_split(raw, with_quarantine)

    # csv — PERMISSIVE: malformed cells become nulls, the contract
    # filter quarantines them as parsed rows
    parsed = _finish(
        spark.read.options(
            header=str(csv_header).lower(),
            multiLine=str(csv_multiline).lower(),
            escape='"',
        )
        .schema(DOCUMENT_SCHEMA)
        .csv(path)
    )
    good = parsed.filter(_valid())
    if not with_quarantine:
        return good
    return good, parsed.filter(~_valid())


def _jsonl_split(raw: DataFrame, with_quarantine: bool):
    """text lines -> (docs[, quarantine]) via one from_json pass."""
    parsed = raw.select(
        F.col("value"),
        F.from_json(F.col("value"), DOCUMENT_SCHEMA).alias("_j"),
    )
    ok = (
        F.col("_j").isNotNull()
        & F.col("_j.doc_id").isNotNull()
        & F.col("_j.text").isNotNull()
    )
    good = _finish(parsed.filter(ok).select("_j.*"))
    if not with_quarantine:
        return good
    bad = parsed.filter(~ok | F.col("_j").isNull()).select(
        F.col("value").alias("raw"),
        F.when(F.col("_j").isNull(), "unparseable")
        .otherwise("missing doc_id/text")
        .alias("reason"),
    )
    return good, bad


def stream_documents(
    spark: SparkSession,
    path: str,
    *,
    format: str = "jsonl",
    with_quarantine: bool = False,
    max_files_per_trigger: int | None = None,
):
    """Streaming twin of :func:`read_documents` — same one-scan
    ``text`` + ``from_json`` shape, so batch and stream results are
    identical row sets.  CSV/parquet stream via the native readers
    (no quarantine lane: contract-invalid rows are filtered out)."""
    if format not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {format!r}")
    reader = spark.readStream
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    if format == "jsonl":
        raw = reader.text(path)
        return _jsonl_split(raw, with_quarantine)
    if with_quarantine:
        raise ValueError("quarantine lane is jsonl-only on streams")
    if format == "parquet":
        parsed = _finish(reader.schema(DOCUMENT_SCHEMA).parquet(path))
    else:
        parsed = _finish(
            reader.options(header="true", escape='"')
            .schema(DOCUMENT_SCHEMA)
            .csv(path)
        )
    return parsed.filter(_valid())


def write_documents(
    docs: DataFrame,
    path: str,
    *,
    format: str = "jsonl",
    mode: str = "error",
    partition_by: str | None = None,
) -> None:
    """Write a documents frame as JSONL (one object per line — the
    native json sink), CSV (quoted+escaped) or parquet."""
    if format not in _FORMATS:
        raise ValueError(f"format must be one of {_FORMATS}, got {format!r}")
    out = docs.select([f.name for f in DOCUMENT_SCHEMA.fields])
    w = out.write.mode(mode)
    if partition_by:
        w = w.partitionBy(partition_by)
    if format == "jsonl":
        w.json(path)
    elif format == "csv":
        w.options(header="true", escape='"').csv(path)
    else:
        w.parquet(path)
