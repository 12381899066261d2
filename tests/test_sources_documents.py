"""Document connectors (sources/documents.py): JSONL/CSV/parquet
round-trips, the quarantine lane, derived n_chars, stream==batch."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from grass_spark.sources import (
    read_documents,
    stream_documents,
    write_documents,
)

ROWS = [
    (1, "plain text", "en", "srcA", None),
    (2, 'with "quotes", commas\tand\ttabs', "de", "srcB", None),
    (3, "unicode ümläut 中文", "zh", "srcA", None),
    (4, "n_chars supplied", "en", "srcB", 999),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        ROWS, "doc_id long, text string, lang string, source string, n_chars long"
    )


def _as_sets(df):
    return {tuple(r) for r in df.collect()}


@pytest.mark.parametrize("fmt", ["jsonl", "csv", "parquet"])
def test_roundtrip(spark, docs, tmp_path_factory, fmt):
    path = str(tmp_path_factory.mktemp("docs") / fmt)
    write_documents(docs, path, format=fmt)
    back = read_documents(spark, path, format=fmt)
    assert back.columns == ["doc_id", "text", "lang", "source", "n_chars"]
    got = _as_sets(back)
    want = {
        (i, t, la, s, n if n is not None else len(t))
        for i, t, la, s, n in ROWS
    }
    assert got == want, fmt


def test_jsonl_quarantine_keeps_raw_lines(spark, tmp_path):
    p = tmp_path / "crawl"
    p.mkdir()
    lines = [
        json.dumps({"doc_id": 1, "text": "ok", "lang": "en"}),
        "{ not json at all",
        json.dumps({"doc_id": None, "text": "no id"}),
        json.dumps({"doc_id": 7, "lang": "en"}),  # missing text
        json.dumps({"doc_id": 2, "text": "fine", "source": "s"}),
    ]
    (p / "part-0.jsonl").write_text("\n".join(lines) + "\n")
    good, bad = read_documents(
        spark, str(p), format="jsonl", with_quarantine=True
    )
    ids = {r["doc_id"] for r in good.collect()}
    assert ids == {1, 2}
    badrows = {r["raw"]: r["reason"] for r in bad.collect()}
    assert set(badrows) == set(lines[1:4])
    # the raw line survives verbatim for re-ingest
    assert "{ not json at all" in badrows
    # counts: nothing silently dropped
    assert good.count() + bad.count() == len(lines)


def test_csv_quarantine_contract_rows(spark, tmp_path):
    p = tmp_path / "csv"
    p.mkdir()
    (p / "a.csv").write_text(
        "doc_id,text,lang,source,n_chars\n"
        '5,"hello, world",en,s,\n'
        'not_a_number,"bad id",en,s,\n'
        "6,,en,s,\n"  # null text
    )
    good, bad = read_documents(
        spark, str(p), format="csv", with_quarantine=True
    )
    assert {r["doc_id"] for r in good.collect()} == {5}
    assert good.collect()[0]["n_chars"] == len("hello, world")
    assert bad.count() == 2


def test_stream_equals_batch_jsonl(spark, docs, tmp_path):
    src = str(tmp_path / "stream_src")
    write_documents(docs, src, format="jsonl")
    batch = read_documents(spark, src, format="jsonl")
    out = str(tmp_path / "out")
    chk = str(tmp_path / "chk")
    q = (
        stream_documents(spark, src, format="jsonl")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", chk)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = _as_sets(spark.read.parquet(out).select(*batch.columns))
    assert got == _as_sets(batch)


def test_validation_errors(spark, docs, tmp_path):
    with pytest.raises(ValueError, match="format"):
        read_documents(spark, "/tmp/x", format="orc")
    with pytest.raises(ValueError, match="format"):
        write_documents(docs, "/tmp/x", format="orc")
    with pytest.raises(ValueError, match="jsonl-only"):
        stream_documents(spark, "/tmp/x", format="csv",
                         with_quarantine=True)


def test_jsonl_feeds_corpus_stage(spark, docs, tmp_path):
    """Connector output plugs straight into the hygiene operators."""
    from grass_spark.operators.dedup import exact_dedup

    src = str(tmp_path / "src")
    write_documents(docs.union(docs.limit(1)), src, format="jsonl")
    d = read_documents(spark, src, format="jsonl")
    assert d.count() == 5
    keeps = exact_dedup(d).count()
    assert keeps == 4  # the duplicated doc collapses
