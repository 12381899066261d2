"""SFT example assembly / context truncation / transcript lint
(operators/sft.py) and the trigram stupid-backoff LM (operators/lm.py).

The load-bearing invariant for sft_examples is checked literally: every
mask span, sliced out of the rendered text, must reproduce exactly the
masked turn's text, in turn order.
"""

from __future__ import annotations

import datetime as dt
import math

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.sft import context_tail, sft_examples, transcript_lint

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _turns(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )


@pytest.fixture(scope="module")
def conv(spark):
    return _turns(
        spark,
        [
            ("c1", 0, "user", "hello there", T0),
            ("c1", 1, "assistant", "hi! how can I help?", T0 + dt.timedelta(seconds=5)),
            ("c1", 2, "user", "sum 2 and 2", T0 + dt.timedelta(seconds=9)),
            ("c1", 3, "assistant", "4", T0 + dt.timedelta(seconds=12)),
            ("c2", 0, "user", "solo opener", T0),
        ],
    )


class TestSftExamples:
    def test_spans_slice_back_to_turn_texts(self, spark, conv):
        out = {r["conv_id"]: r for r in sft_examples(conv).collect()}
        r = out["c1"]
        expect = (
            "user: hello there\n"
            "assistant: hi! how can I help?\n"
            "user: sum 2 and 2\n"
            "assistant: 4\n"
        )
        assert r["text"] == expect
        assert r["n_turns"] == 4
        spans = [tuple(map(int, s.split("-"))) for s in r["mask_spans"].split(",")]
        assert [r["text"][s:e] for s, e in spans] == ["hi! how can I help?", "4"]
        assert r["n_mask_chars"] == len("hi! how can I help?") + 1

    def test_conv_without_masked_roles_has_empty_spans(self, spark, conv):
        out = {r["conv_id"]: r for r in sft_examples(conv).collect()}
        r = out["c2"]
        assert r["mask_spans"] == "" and r["n_mask_chars"] == 0
        assert r["text"] == "user: solo opener\n"

    def test_null_text_renders_empty_with_degenerate_span(self, spark):
        t = _turns(spark, [("c", 0, "assistant", None, T0)])
        r = sft_examples(t).collect()[0]
        assert r["text"] == "assistant: \n"
        s, e = map(int, r["mask_spans"].split("-"))
        assert s == e == len("assistant: ")

    def test_custom_mask_roles_and_separators(self, spark, conv):
        out = sft_examples(
            conv, mask_roles=("user",), header_sep="|", sep=""
        ).collect()
        r = {x["conv_id"]: x for x in out}["c1"]
        assert r["text"].startswith("user|hello there")
        spans = [tuple(map(int, s.split("-"))) for s in r["mask_spans"].split(",")]
        assert [r["text"][s:e] for s, e in spans] == ["hello there", "sum 2 and 2"]

    def test_no_python_in_plan(self, conv):
        plan = sft_examples(conv)._jdf.queryExecution().executedPlan().toString()
        assert "BatchEvalPython" not in plan and "ArrowEval" not in plan


class TestContextTail:
    def test_budget_keeps_maximal_suffix(self, spark):
        t = _turns(
            spark,
            [
                ("c", 0, "user", "a b c d", T0),          # 4 tokens
                ("c", 1, "assistant", "e f", T0),          # 2
                ("c", 2, "user", "g h i", T0),             # 3
            ],
        )
        kept = sorted(
            (r["turn_idx"], r["n_tokens"], r["cum_from_end"])
            for r in context_tail(t, 5).collect()
        )
        # suffix sums from the end: idx2=3, idx1=5, idx0=9 -> keep 1,2
        assert kept == [(1, 2, 5), (2, 3, 3)]

    def test_last_turn_always_kept_when_over_budget(self, spark):
        t = _turns(spark, [("c", 0, "user", "a b c d e", T0)])
        assert context_tail(t, 2).count() == 1
        assert context_tail(t, 2, keep_first_over=False).count() == 0

    def test_empty_and_null_text_count_zero_tokens(self, spark):
        t = _turns(
            spark,
            [("c", 0, "user", "", T0), ("c", 1, "user", None, T0),
             ("c", 2, "user", "  ", T0)],
        )
        rows = context_tail(t, 10).collect()
        assert len(rows) == 3 and all(r["n_tokens"] == 0 for r in rows)


class TestTranscriptLint:
    def _one(self, spark, rows, **kw):
        return transcript_lint(_turns(spark, rows), **kw).collect()[0]

    def test_clean_conversation_keeps(self, spark, conv):
        out = {r["conv_id"]: r for r in transcript_lint(conv).collect()}
        r = out["c1"]
        assert r["keep"] and r["reject_reason"] is None
        assert r["idx_contiguous"] and r["n_role_repeats"] == 0

    def test_role_repeat_flagged(self, spark):
        r = self._one(
            spark,
            [("c", 0, "user", "x", T0), ("c", 1, "user", "y", T0)],
        )
        assert r["n_role_repeats"] == 1 and r["reject_reason"] == "role_repeat"

    def test_ts_regression_flagged(self, spark):
        r = self._one(
            spark,
            [
                ("c", 0, "user", "x", T0),
                ("c", 1, "assistant", "y", T0 - dt.timedelta(hours=1)),
            ],
        )
        assert r["n_ts_regressions"] == 1 and r["reject_reason"] == "ts_regression"

    def test_idx_gap_wins_first_fail(self, spark):
        r = self._one(
            spark,
            [("c", 0, "user", "x", T0), ("c", 2, "user", "", T0)],
        )
        assert not r["idx_contiguous"]
        # idx_gap outranks the role repeat AND the empty turn
        assert r["reject_reason"] == "idx_gap"
        assert r["n_empty_turns"] == 1

    def test_first_role_check_optional(self, spark):
        rows = [("c", 0, "assistant", "x", T0), ("c", 1, "user", "y", T0)]
        assert self._one(spark, rows)["reject_reason"] == "first_role"
        assert self._one(spark, rows, first_role=None)["keep"]

    def test_single_turn_conversation(self, spark):
        r = self._one(spark, [("c", 0, "user", "x", T0)])
        assert r["keep"] and r["n_role_repeats"] == 0 and r["n_turns"] == 1


class TestStupidBackoff:
    def test_hand_computed_tiny_corpus(self, spark):
        from grass_spark.operators.lm import stupid_backoff_score

        # corpus: d1 = "a b c", d2 = "a b d"
        docs = spark.createDataFrame(
            [(1, "a b c"), (2, "a b d")], "doc_id long, text string"
        )
        out = {r["doc_id"]: r for r in stupid_backoff_score(docs).collect()}
        # trigram (a,b,c): c123=1, c12=c(a b)=2 -> S=0.5, one position per doc
        assert out[1]["n_trigrams"] == 1
        assert math.isclose(out[1]["sb_logscore"], 1.0)  # -log2(0.5)
        assert math.isclose(out[1]["sb_perplexity"], 2.0)
        assert math.isclose(out[2]["sb_logscore"], 1.0)

    def test_backoff_branches_against_fixed_model(self, spark):
        from grass_spark.operators.lm import stupid_backoff_score, trigram_model

        train = spark.createDataFrame(
            [(1, "a b c"), (2, "b c e"), (3, "c e f")],
            "doc_id long, text string",
        )
        model = trigram_model(train)
        # "a b c": trigram seen -> c123/c12 = 1/1
        # "b c f": trigram unseen, bigram (c,f) unseen, (c3=f count)=1 of N=9
        #          -> alpha^2 * 1/9
        docs = spark.createDataFrame(
            [(10, "a b c"), (11, "b c f")], "doc_id long, text string"
        )
        out = {
            r["doc_id"]: r
            for r in stupid_backoff_score(docs, model).collect()
        }
        assert math.isclose(out[10]["sb_logscore"], 0.0)
        assert math.isclose(
            out[11]["sb_logscore"], -math.log2(0.4 * 0.4 * (1 / 9))
        )

    def test_short_docs_have_no_trigram_rows(self, spark):
        from grass_spark.operators.lm import stupid_backoff_score

        docs = spark.createDataFrame(
            [(1, "one two"), (2, "a b c d")], "doc_id long, text string"
        )
        rows = stupid_backoff_score(docs).collect()
        assert [r["doc_id"] for r in rows] == [2]
        assert rows[0]["n_trigrams"] == 2


class TestSftJsonl:
    def test_lines_roundtrip_through_from_json(self, spark, conv):
        from grass_spark.operators.sft import sft_examples, sft_jsonl_lines

        ex = sft_examples(conv)
        lines = sft_jsonl_lines(ex)
        parsed = lines.select(
            F.from_json(
                "line",
                "conv_id string, text string, n_mask_chars long, "
                "mask_spans string",
            ).alias("j")
        ).select("j.*")
        orig = {r["conv_id"]: r for r in ex.collect()}
        back = {r["conv_id"]: r for r in parsed.collect()}
        assert set(orig) == set(back)
        for cid, r in back.items():
            assert r["text"] == orig[cid]["text"]
            assert r["n_mask_chars"] == orig[cid]["n_mask_chars"]
            assert r["mask_spans"] == orig[cid]["mask_spans"]

    def test_line_is_compact_single_line_json(self, spark, conv):
        from grass_spark.operators.sft import sft_examples, sft_jsonl_lines

        line = sft_jsonl_lines(sft_examples(conv)).collect()[0]["line"]
        assert "\n" not in line and '": ' not in line
        assert line.startswith('{"conv_id":')
