"""The full user story, connector to connector: raw JSONL crawl in →
hygiene pipeline → deterministic training shards out.  Everything in
between is the gated operators; this test pins that the seams hold."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.corpus import prepare_corpus
from grass_spark.operators.export import write_shards
from grass_spark.sources import read_documents, write_documents

GOOD = (
    "the quick brown fox jumps over the lazy dog and then runs far away "
    "into the deep green forest to find some food for the long cold winter"
)
ALT = (
    "completely different content about spark engines aggregating huge "
    "tables with shuffles joins and windows at massive petabyte scale"
)


@pytest.fixture(scope="module")
def crawl_dir(spark, tmp_path_factory):
    p = tmp_path_factory.mktemp("crawl")
    lines = []
    for i in range(40):
        text = (GOOD if i % 2 else ALT) + f" marker {i // 4}"
        lines.append(json.dumps(
            {"doc_id": i, "text": text, "lang": "en",
             "source": f"src{i % 3}"}
        ))
    lines.append("{ corrupted line")
    lines.append(json.dumps({"doc_id": 999}))  # no text
    (p / "part-0.jsonl").write_text("\n".join(lines) + "\n")
    return str(p)


def test_jsonl_to_shards(spark, crawl_dir, tmp_path):
    docs, bad = read_documents(
        spark, crawl_dir, format="jsonl", with_quarantine=True
    )
    assert bad.count() == 2
    assert docs.count() == 40

    cleaned, stats = prepare_corpus(docs, near_dedup_threshold=0.5)
    n = cleaned.count()
    assert 0 < n < 40  # near-dups collapsed, survivors remain
    assert stats["input"] == 40

    out = str(tmp_path / "shards")
    write_shards(cleaned.select("doc_id", "text"), out, n_shards=4)
    back = spark.read.parquet(out)
    assert back.count() == n
    assert {r["doc_id"] for r in back.collect()} == {
        r["doc_id"] for r in cleaned.collect()
    }

    # the whole chain is deterministic: same input -> same shard sets
    cleaned2, _ = prepare_corpus(docs, near_dedup_threshold=0.5,
                                 collect_stats=False)
    out2 = str(tmp_path / "shards2")
    write_shards(cleaned2.select("doc_id", "text"), out2, n_shards=4)
    a = sorted(tuple(r) for r in spark.read.parquet(out).collect())
    b = sorted(tuple(r) for r in spark.read.parquet(out2).collect())
    assert a == b


def test_roundtrip_jsonl_export(spark, crawl_dir, tmp_path):
    """Cleaned corpus exports back to JSONL and re-ingests losslessly."""
    docs = read_documents(spark, crawl_dir, format="jsonl")
    cleaned, _ = prepare_corpus(docs, near_dedup_threshold=0.5,
                                collect_stats=False)
    out = str(tmp_path / "clean_jsonl")
    write_documents(cleaned.select(
        "doc_id", "text", "lang", "source",
        F.length("text").cast("long").alias("n_chars"),
    ), out, format="jsonl")
    again = read_documents(spark, out, format="jsonl")
    assert sorted(tuple(r) for r in again.collect()) == sorted(
        tuple(r) for r in cleaned.select(
            "doc_id", "text", "lang", "source",
            F.length("text").cast("long").alias("n_chars"),
        ).collect()
    )
