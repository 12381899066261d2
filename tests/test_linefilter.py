"""Line-level C4/RefinedWeb cleaning (operators/linefilter.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.operators.linefilter import LineRules, line_filter

_RULES = LineRules(min_line_words=3, min_kept_lines=1, max_removed_frac=0.9)


def _one(spark, text, rules=_RULES):
    df = spark.createDataFrame([(1, text)], "doc_id bigint, text string")
    return line_filter(df, rules).collect()[0]


def test_terminal_punct_rule(spark):
    r = _one(spark, "this line ends with a period.\nthis line does not end")
    assert r.n_lines == 2 and r.n_kept_lines == 1
    assert r.clean_text == "this line ends with a period."
    # quotes and ! ? also terminate
    r = _one(spark, 'he said "stop right there!"\nis this really a line?')
    assert r.n_kept_lines == 2


def test_min_line_words_rule(spark):
    r = _one(spark, "one two three words here.\ntoo short.")
    assert r.n_kept_lines == 1 and "too short" not in r.clean_text


def test_keyword_lines_dropped(spark):
    txt = (
        "a perfectly normal sentence about engines.\n"
        "please enable javascript to view this site.\n"
        "we use cookie banners for consent tracking.\n"
        "another normal sentence closes the document."
    )
    r = _one(spark, txt)
    assert r.n_kept_lines == 2
    assert "javascript" not in r.clean_text
    assert "cookie" not in r.clean_text


def test_mainly_uppercase_and_digit_lines(spark):
    txt = (
        "THIS ENTIRE LINE IS SHOUTING AT YOU.\n"
        "a normal line with Mixed Case words here.\n"
        "1992 2001 4096 65536 123456 999 000 111.\n"
        "10 20 ok."
    )
    rules = LineRules(min_line_words=3, require_terminal_punct=True,
                      min_kept_lines=1, max_removed_frac=0.9)
    r = _one(spark, txt, rules)
    kept = r.clean_text.split("\n")
    assert "SHOUTING" not in r.clean_text
    assert any("Mixed Case" in ln for ln in kept)
    # the mainly-digit line drops; the short digit-light line drops on
    # word count anyway
    assert "4096" not in r.clean_text


def test_no_letters_line_passes_upper_guard(spark):
    # zero letters: the uppercase ratio is undefined -> rule passes,
    # the digit rule decides instead
    rules = LineRules(min_line_words=1, require_terminal_punct=False,
                      max_digit_frac=1.0, min_kept_lines=1,
                      max_removed_frac=0.9)
    r = _one(spark, "12 34 56", rules)
    assert r.n_kept_lines == 1


def test_doc_rules_first_fail_order(spark):
    rules = LineRules(min_line_words=1, require_terminal_punct=False,
                      min_kept_lines=2, max_removed_frac=0.5)
    base = "a good line stays.\nanother good line stays."
    assert _one(spark, base, rules).reject_reason == "keep"
    r = _one(spark, base + "\nsome lorem ipsum filler text.", rules)
    assert r.reject_reason == "lorem_ipsum" and not r.keep
    r = _one(spark, base + "\nfunction f() { return 1; }", rules)
    assert r.reject_reason == "curly_brace"
    r = _one(spark, "only one line here.",
             LineRules(min_line_words=1, require_terminal_punct=False,
                       min_kept_lines=2, max_removed_frac=0.9))
    assert r.reject_reason == "too_few_lines"
    r = _one(
        spark,
        "keep this.\nkeep this too.\n"
        + "ALL CAPS BOILERPLATE NAVIGATION CHROME EVERYWHERE "
        + "FILLING MOST OF THE DOCUMENT BY CHARACTER COUNT HERE",
        LineRules(min_line_words=1, require_terminal_punct=False,
                  min_kept_lines=2, max_removed_frac=0.5),
    )
    assert r.reject_reason == "removed_frac"


def test_clean_text_preserves_order(spark):
    txt = "first kept line.\nxx\nsecond kept line.\nyy\nthird kept line."
    r = _one(spark, txt)
    assert r.clean_text == (
        "first kept line.\nsecond kept line.\nthird kept line."
    )
    assert r.removed_char_frac > 0


def test_empty_and_whitespace_docs(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "   \n  \n "), (3, "short.")],
        "doc_id bigint, text string",
    )
    rows = {r.doc_id: r for r in line_filter(df, _RULES).collect()}
    assert rows[1].n_kept_lines == 0 and rows[1].clean_text == ""
    assert rows[2].n_kept_lines == 0
    assert rows[1].reject_reason == "too_few_lines"


def test_plan_zero_exchange(spark):
    """Scan-stage projection: no shuffle, no Python eval."""
    df = spark.createDataFrame(
        [(i, f"line number {i} of the corpus.") for i in range(20)],
        "doc_id bigint, text string",
    )
    plan = (
        line_filter(df)._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEval" not in plan


def test_stream_matches_batch(spark, tmp_path):
    """line_filter is stateless — composes onto readStream unchanged."""
    rows = [
        (1, "a good sentence with enough words here.\nshort."),
        (2, "SHOUTY LINE FULL OF CAPITALS EVERYWHERE NOW.\n"
            "but this one is a calm ordinary sentence."),
        (3, "please enable javascript to continue browsing.\n"
            "the actual content of the page lives here."),
        (4, "one two three.\nfour five six.\nseven eight nine."),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    in_dir = str(tmp_path / "in")
    docs.repartition(2).write.parquet(in_dir)
    stream = spark.readStream.schema("doc_id bigint, text string").option(
        "maxFilesPerTrigger", 1
    ).parquet(in_dir)
    out = str(tmp_path / "out")
    q = (
        line_filter(stream)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {r.doc_id: r for r in spark.read.parquet(out).collect()}
    want = {r.doc_id: r for r in line_filter(docs).collect()}
    assert set(got) == set(want) == {1, 2, 3, 4}
    for k in want:
        for c in ("n_lines", "n_kept_lines", "clean_text",
                  "reject_reason", "keep"):
            assert got[k][c] == want[k][c], (k, c)


def test_normalize_text_invariants(spark):
    """Idempotence + cleanliness over an adversarial batch: a second
    normalize pass is a no-op, no typographic chars or doubled spaces
    survive, and ASCII prose passes through (modulo case)."""
    import random

    from grass_spark.operators.textstats import normalize_text

    rnd = random.Random(12)
    zoo = "“”„‘’–—… \x07\x1f\t\n"
    rows = [(0, ""), (1, "   "), (2, "Plain ASCII text stays put.")]
    for i in range(3, 40):
        n = rnd.randint(0, 60)
        rows.append((i, "".join(rnd.choice(zoo + "abcXYZ .") for _ in range(n))))
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    once = normalize_text(df).select("doc_id", F.col("norm_text").alias("text"))
    twice = normalize_text(once)
    for r in twice.collect():
        assert r.norm_text == r.text, r.doc_id  # idempotent
        for bad in "“”„‘’–—…\x07\x1f ":
            assert bad not in r.norm_text
        assert "  " not in r.norm_text
        assert r.norm_text == r.norm_text.strip()
    got = {r.doc_id: r.norm_text
           for r in normalize_text(df).collect()}
    assert got[2] == "plain ascii text stays put."
    assert got[0] == "" and got[1] == ""
