"""DSIR importance resampling (operators/dsir.py): log-weight parity
against a pure-Python md5 reference, no-gram docs, Gumbel-top-k
determinism, plan contracts."""

from __future__ import annotations

import hashlib
import math
import re

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.dsir import (
    bucket_logratio,
    dsir_sample,
    dsir_weights,
    hashed_gram_rows,
)

B = 50  # small bucket count -> real collisions exercised


def _grams(text: str) -> list[str]:
    ws = re.sub(r"\s+", " ", text.strip().lower()).split(" ")
    out = [w for w in ws if w]
    out += [f"{a} {b}" for a, b in zip(ws, ws[1:])]
    return out


def _bucket(g: str) -> int:
    return int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % B


def _ref_weights(raw_rows, target_rows, alpha=1.0):
    ct: dict[int, float] = {}
    cr: dict[int, float] = {}
    for _, t in target_rows:
        for g in _grams(t):
            ct[_bucket(g)] = ct.get(_bucket(g), 0.0) + 1.0
    for _, t in raw_rows:
        for g in _grams(t):
            cr[_bucket(g)] = cr.get(_bucket(g), 0.0) + 1.0
    nt, nr = sum(ct.values()), sum(cr.values())
    lam = {
        b: math.log((ct.get(b, 0.0) + alpha) / (nt + alpha * B))
        - math.log((cr.get(b, 0.0) + alpha) / (nr + alpha * B))
        for b in range(B)
    }
    return {
        i: round(sum(lam[_bucket(g)] for g in _grams(t)), 6)
        for i, t in raw_rows
    }


RAW = [
    (1, "the cat sat on the mat"),
    (2, "spark shuffles the hash join"),
    (3, "the cat purred"),
    (4, "gradient descent on the loss"),
]
TARGET = [
    (100, "the cat sat"),
    (101, "a cat on a mat"),
]


@pytest.fixture(scope="module")
def frames(spark):
    raw = spark.createDataFrame(RAW, ["doc_id", "text"])
    target = spark.createDataFrame(TARGET, ["doc_id", "text"])
    return raw, target


def test_gram_rows_match_reference(spark, frames):
    raw, _ = frames
    got = sorted(
        (r["doc_id"], r["bucket"])
        for r in hashed_gram_rows(raw, n_buckets=B).collect()
    )
    want = sorted(
        (i, _bucket(g)) for i, t in RAW for g in _grams(t)
    )
    assert got == want


def test_weights_match_python_reference(spark, frames):
    raw, target = frames
    got = {
        r["doc_id"]: r["logw"]
        for r in dsir_weights(raw, target, n_buckets=B).collect()
    }
    want = _ref_weights(RAW, TARGET)
    assert set(got) == set(want)
    for i in want:
        assert got[i] == pytest.approx(want[i], abs=2e-6), i
    # semantics: cat-docs look more target-like than the ML docs
    assert got[1] > got[2] > got[4] or got[3] > got[4]
    assert max(got[1], got[3]) > max(got[2], got[4])


def test_no_gram_doc_scores_zero(spark, frames):
    _, target = frames
    raw = frames[0].sparkSession.createDataFrame(
        [(9, "   "), (10, "the cat")], ["doc_id", "text"]
    )
    got = {r["doc_id"]: r["logw"]
           for r in dsir_weights(raw, target, n_buckets=B).collect()}
    assert got[9] == 0.0
    assert got[10] != 0.0


def test_gumbel_topk_deterministic_and_keyed(spark, frames):
    raw, target = frames
    a = dsir_sample(raw, target, 2, n_buckets=B).collect()
    b = dsir_sample(raw, target, 2, n_buckets=B).collect()
    assert [r.asDict() for r in a] == [r.asDict() for r in b]
    assert len(a) == 2
    # key == round(logw + gumbel(u(md5(id:'')))) recomputed in Python
    w = _ref_weights(RAW, TARGET)
    keys = {}
    for i, _ in RAW:
        u32 = int(hashlib.md5(f"{i}:".encode()).hexdigest()[:8], 16)
        u = (u32 + 0.5) / 2.0**32
        keys[i] = round(w[i] + -math.log(-math.log(u)), 6)
    want_ids = [i for i, _ in sorted(keys.items(),
                                     key=lambda kv: (-kv[1], kv[0]))][:2]
    assert [r["doc_id"] for r in a] == want_ids
    for r in a:
        assert r["key"] == pytest.approx(keys[r["doc_id"]], abs=2e-6)
    # a different salt reshuffles the noise deterministically
    c = dsir_sample(raw, target, 2, n_buckets=B, salt="v2").collect()
    assert len(c) == 2


def test_logratio_reuse_and_validation(spark, frames):
    raw, target = frames
    lam = bucket_logratio(target, raw, n_buckets=B)
    assert lam.count() == B  # densified: every bucket present
    via_reuse = {
        r["doc_id"]: r["logw"]
        for r in dsir_weights(raw, target, n_buckets=B,
                              logratio=lam).collect()
    }
    direct = {
        r["doc_id"]: r["logw"]
        for r in dsir_weights(raw, target, n_buckets=B).collect()
    }
    assert via_reuse == direct
    with pytest.raises(ValueError, match="alpha"):
        bucket_logratio(target, raw, n_buckets=B, alpha=0.0)
    with pytest.raises(ValueError, match="k"):
        dsir_sample(raw, target, 0, n_buckets=B)


def test_plan_contracts(frames):
    raw, target = frames
    wplan = (
        dsir_weights(raw, target, n_buckets=B)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # the densified log-ratio table broadcasts into the scoring join
    assert "BroadcastHashJoin" in wplan
    splan = (
        dsir_sample(raw, target, 3, n_buckets=B)
        ._jdf.queryExecution().executedPlan().toString()
    )
    # top-k is per-partition TakeOrdered, never a global sort
    assert "TakeOrderedAndProject" in splan
