"""Sliding-window chunking (operators/chunks.py)."""

import pytest

from grass_spark.operators.chunks import chunk_documents


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "a b c d e f g"),    # 7 words
            (2, "x y"),              # shorter than one window
            (3, "   "),              # empty after normalization
        ],
        ["doc_id", "text"],
    )


def test_overlapping_windows(docs):
    out = chunk_documents(docs, size=4, stride=2).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    # doc 1: starts 0,2,4,6 — last window begins inside the text
    got = [(r["chunk_start"], r["chunk_text"]) for r in by_doc[1]]
    assert got == [
        (0, "a b c d"), (2, "c d e f"), (4, "e f g"), (6, "g"),
    ]
    assert [r["n_chunk_words"] for r in by_doc[1]] == [4, 4, 3, 1]
    assert [r["chunk_idx"] for r in by_doc[1]] == [0, 1, 2, 3]
    # doc 2: one short window; doc 3: no chunks
    assert [(r["chunk_start"], r["chunk_text"]) for r in by_doc[2]] == [(0, "x y")]
    assert 3 not in by_doc


def test_nonoverlapping_covers_every_word(docs):
    out = chunk_documents(docs, size=3).collect()  # stride defaults to size
    d1 = sorted(
        (r for r in out if r["doc_id"] == 1), key=lambda r: r["chunk_idx"]
    )
    assert [r["chunk_text"] for r in d1] == ["a b c", "d e f", "g"]
    rebuilt = " ".join(r["chunk_text"] for r in d1)
    assert rebuilt == "a b c d e f g"


def test_validation(docs):
    with pytest.raises(ValueError):
        chunk_documents(docs, size=0)
    with pytest.raises(ValueError):
        chunk_documents(docs, size=4, stride=5)  # gaps would drop words


def test_plan_is_shuffle_free(docs):
    plan = (
        chunk_documents(docs, size=4, stride=2)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Generate" in plan


def test_empty_frame(spark):
    empty = spark.createDataFrame([], "doc_id bigint, text string")
    assert chunk_documents(empty).count() == 0
