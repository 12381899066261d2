"""Readability / lexical diversity / KS drift (textstats.py,
divergence.py) pinned against brute-force Python references."""

from __future__ import annotations

import random
import re

import pytest

from grass_spark.operators.divergence import ks_test
from grass_spark.operators.textstats import lexical_diversity, readability


def _norm(t):
    return re.sub(r"\s+", " ", t.strip().lower())


def _syll(w):
    return max(len(re.findall(r"[aeiouy]+", w)), 1)


def test_readability_vs_reference(spark):
    texts = [
        (0, "The quick brown fox jumps over the lazy dog."),
        (1, "Hello world! How are you today? I am fine."),
        (2, "supercalifragilisticexpialidocious"),
        (3, "a b c d"),
    ]
    df = spark.createDataFrame(texts, ["doc_id", "text"])
    got = {r.doc_id: r for r in readability(df).collect()}
    for doc_id, text in texts:
        words = _norm(text).split(" ")
        nw = len(words)
        ns = max(len(re.findall(r"[.!?]+", text)), 1)
        sy = sum(_syll(w) for w in words)
        r = got[doc_id]
        assert (r.n_words, r.n_sentences, r.n_syllables) == (nw, ns, sy)
        assert r.flesch == round(206.835 - 1.015 * (nw / ns) - 84.6 * (sy / nw), 6)
        assert r.fk_grade == round(0.39 * (nw / ns) + 11.8 * (sy / nw) - 15.59, 6)


def test_lexical_diversity_vs_reference(spark):
    rows = [
        (0, "a a b c", "s1"),
        (1, "c d", "s1"),
        (2, "x x x x", "s2"),
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    got = {r.source: r for r in lexical_diversity(df).collect()}
    # s1 tokens: a a b c c d -> 6 tokens, 4 types, hapax {b, d}
    assert got["s1"].n_tokens == 6 and got["s1"].n_types == 4
    assert got["s1"].ttr == round(4 / 6, 6)
    assert got["s1"].hapax_share == 0.5
    assert got["s2"].n_tokens == 4 and got["s2"].n_types == 1
    assert got["s2"].hapax_share == 0.0


def _ref_ks(xs, ys):
    vals = sorted(set(xs) | set(ys))
    na, nb = len(xs), len(ys)
    best, at = -1, None
    ca = cb = 0
    from collections import Counter

    fa, fb = Counter(xs), Counter(ys)
    for v in vals:
        ca += fa.get(v, 0)
        cb += fb.get(v, 0)
        num = abs(ca * nb - cb * na)
        if num > best:
            best, at = num, v
    return na, nb, round(best / (na * nb), 6), at


def test_ks_test_vs_reference(spark):
    rng = random.Random(23)
    xs = [rng.randint(0, 60) for _ in range(500)]
    ys = [rng.randint(10, 80) for _ in range(300)]
    a = spark.createDataFrame([(v,) for v in xs], ["val"])
    b = spark.createDataFrame([(v,) for v in ys], ["val"])
    r = ks_test(a, b, value_col="val").collect()[0]
    assert (r.n_a, r.n_b, r.ks_stat, r.ks_at) == _ref_ks(xs, ys)


def test_ks_identical_distributions_zero(spark):
    xs = [(v % 7,) for v in range(70)]
    a = spark.createDataFrame(xs, ["val"])
    b = spark.createDataFrame(xs, ["val"])
    r = ks_test(a, b, value_col="val").collect()[0]
    assert r.ks_stat == 0.0


def test_ks_disjoint_distributions_one(spark):
    a = spark.createDataFrame([(v,) for v in range(5)], ["val"])
    b = spark.createDataFrame([(v + 100,) for v in range(5)], ["val"])
    r = ks_test(a, b, value_col="val").collect()[0]
    assert r.ks_stat == 1.0 and r.ks_at == 4
