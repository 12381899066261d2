"""Unit tests: redact.py (PII scrubbing) and repetition.py (Gopher
repetition-fraction quality signals)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.redact import PII_RULES, redact
from grass_spark.operators.repetition import repetition_stats

# ---------------- PII redaction ----------------


def test_redact_all_rule_kinds(spark):
    df = spark.createDataFrame(
        [
            (1, "mail Jane.Doe+x@corp.example.org now"),
            (2, "server at 192.168.0.17 down"),
            (3, "ssn 123-45-6789 on file"),
            (4, "call +1 (415) 555-0199 today"),
            (5, "clean text with no pii at all"),
        ],
        ["doc_id", "text"],
    )
    out = {r["doc_id"]: r for r in redact(df).collect()}
    assert out[1]["text"] == "mail <EMAIL> now" and out[1]["n_email"] == 1
    assert out[2]["text"] == "server at <IP> down" and out[2]["n_ipv4"] == 1
    assert out[3]["text"] == "ssn <SSN> on file" and out[3]["n_ssn"] == 1
    assert out[4]["text"] == "call <NUMBER> today"
    assert out[4]["n_digits"] == 1
    assert out[5]["text"] == "clean text with no pii at all"
    assert all(out[5][f"n_{k}"] == 0 for k, _, _ in PII_RULES)


def test_redact_rule_order_no_double_count(spark):
    # the email's digits must be consumed by the email rule, not ALSO
    # counted as a digit run; the ip inside the email local part is
    # part of the email match
    df = spark.createDataFrame(
        [(1, "a1234567890@x.example.com and 1234567890123")],
        ["doc_id", "text"],
    )
    r = redact(df).collect()[0]
    assert r["n_email"] == 1 and r["n_digits"] == 1 and r["n_ipv4"] == 0
    assert r["text"] == "<EMAIL> and <NUMBER>"


def test_redact_out_col_preserves_original(spark):
    df = spark.createDataFrame([(1, "x@y.example.com")], ["doc_id", "text"])
    r = redact(df, out_col="clean").collect()[0]
    assert r["text"] == "x@y.example.com" and r["clean"] == "<EMAIL>"


def test_redact_plan_is_pure_projection(spark):
    df = spark.createDataFrame([(1, "a")], ["doc_id", "text"])
    plan = redact(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan


# ---------------- repetition signals ----------------


def test_repetition_fracs_hand_computed(spark):
    # "a b a b a": words 5, distinct 2 -> word_rep 3/5
    # 2-grams: "a b","b a","a b","b a" -> top 2/4
    # 5-grams: one window, count 1 -> dup5 0
    df = spark.createDataFrame([(1, "a b a b a")], ["doc_id", "text"])
    r = repetition_stats(df).collect()[0]
    assert r["n_words"] == 5
    assert r["word_rep_frac"] == pytest.approx(0.6)
    assert r["top2_frac"] == pytest.approx(0.5)
    assert r["dup5_frac"] == 0.0


def test_repetition_dup5_detects_looped_text(spark):
    loop = " ".join(["u v w x y"] * 4)  # 20 words, every 5-gram repeats
    clean = " ".join(f"w{i}" for i in range(20))
    df = spark.createDataFrame([(1, loop), (2, clean)], ["doc_id", "text"])
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["dup5_frac"] == 1.0
    assert out[2]["dup5_frac"] == 0.0 and out[2]["word_rep_frac"] == 0.0


def test_repetition_short_docs_zero_fracs(spark):
    df = spark.createDataFrame(
        [(1, "solo"), (2, "two words")], ["doc_id", "text"]
    )
    out = {r["doc_id"]: r for r in repetition_stats(df).collect()}
    assert out[1]["top2_frac"] == 0.0 and out[1]["dup5_frac"] == 0.0
    assert out[2]["top2_frac"] == pytest.approx(1.0)  # single 2-gram
    assert out[2]["dup5_frac"] == 0.0  # < 5 words: no 5-gram windows
