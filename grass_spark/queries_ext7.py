"""Seventh wave of driver-contract queries: SFT training-example
assembly over transcript turns (operators/sft.py) and the trigram
stupid-backoff LM (operators/lm.py).

The transcript turns frame is derived deterministically from the
``events`` table with engine-portable expressions (row_number turn
index, CASE role mapping, ``event_type || ' ' || props`` text) so the
DuckDB oracle can rebuild the identical lattice.

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import Window
from pyspark.sql import functions as F

from grass_spark.queries_ext import _t

EXT7_QUERIES: dict = {}
EXT7_ORACLES: dict = {}


_ROLE = (
    "CASE WHEN event_type IN ('click', 'view') THEN 'user' "
    "WHEN event_type IN ('purchase', 'signup') THEN 'assistant' "
    "ELSE 'tool' END"
)


def _turns(spark, sf_dir, *, corrupt: bool = False, order_by_event: bool = False):
    """Deterministic transcript turns from events (both-engine lattice).

    ``corrupt=True`` injects the malformations transcript_lint hunts:
    empty text every 97th event, a 1-hour timestamp rollback every
    101st, and (by the caller dropping every 113th row AFTER indexing)
    turn_idx gaps.
    """
    ev = _t(spark, sf_dir, "events")
    order = ["event_id"] if order_by_event else ["ts", "event_id"]
    w = Window.partitionBy("user_id").orderBy(*order)
    text = F.concat_ws(" ", F.col("event_type"), F.col("props"))
    ts = F.col("ts")
    if corrupt:
        text = F.when(F.col("event_id") % 97 == 0, F.lit("")).otherwise(text)
        ts = F.when(
            F.col("event_id") % 101 == 0,
            F.col("ts") - F.expr("INTERVAL 1 HOUR"),
        ).otherwise(F.col("ts"))
    return ev.select(
        F.col("user_id").alias("conv_id"),
        (F.row_number().over(w) - 1).alias("turn_idx"),
        F.expr(_ROLE).alias("role"),
        text.alias("text"),
        ts.alias("ts"),
        "event_id",
    )


_ORACLE_TURNS = """
  SELECT user_id AS conv_id,
         row_number() OVER (PARTITION BY user_id ORDER BY {order})
           - 1 AS turn_idx,
         {role} AS role,
         {text} AS text,
         {ts} AS ts,
         event_id
  FROM events
""".format
_PLAIN_TEXT = "event_type || ' ' || props"
_CORRUPT_TEXT = (
    "CASE WHEN event_id % 97 = 0 THEN '' ELSE event_type || ' ' || props END"
)
_CORRUPT_TS = (
    "CASE WHEN event_id % 101 = 0 THEN ts - INTERVAL 1 HOUR ELSE ts END"
)


# ---------------------------------------------------------------------
# SFT example assembly (operators/sft.py sft_examples) — render each
# conversation to one training document + assistant loss-mask spans.
# ---------------------------------------------------------------------


def q_sft_examples(spark, sf_dir):
    """One training example per conversation: rendered text (md5-gated),
    turn count, masked-char count, canonical "s-e,..." span string for
    the assistant turns."""
    from grass_spark.operators.sft import sft_examples

    t = _turns(spark, sf_dir)
    out = sft_examples(t, mask_roles=("assistant",))
    return out.select(
        "conv_id",
        F.md5("text").alias("text_md5"),
        "n_turns",
        "n_mask_chars",
        "mask_spans",
    )


ORACLE_SFT_EXAMPLES = f"""
WITH t AS ({_ORACLE_TURNS(order="ts, event_id", role=_ROLE, text=_PLAIN_TEXT, ts="ts")}),
p AS (
  SELECT conv_id, turn_idx, role, text,
         role || ': ' || text || chr(10) AS piece
  FROM t
), o AS (
  SELECT *,
         sum(len(piece)) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS cend
  FROM p
)
SELECT conv_id,
       md5(string_agg(piece, '' ORDER BY turn_idx)) AS text_md5,
       CAST(count(*) AS BIGINT) AS n_turns,
       CAST(coalesce(sum(len(text)) FILTER (WHERE role = 'assistant'), 0)
            AS BIGINT) AS n_mask_chars,
       coalesce(string_agg(
           CAST(cend - len(piece) + len(role) + 2 AS VARCHAR) || '-' ||
           CAST(cend - len(piece) + len(role) + 2 + len(text) AS VARCHAR),
           ',' ORDER BY turn_idx) FILTER (WHERE role = 'assistant'),
         '') AS mask_spans
FROM o GROUP BY conv_id
"""

EXT7_QUERIES["sft_examples"] = q_sft_examples
EXT7_ORACLES["sft_examples"] = ORACLE_SFT_EXAMPLES


# ---------------------------------------------------------------------
# Context-window tail truncation (operators/sft.py context_tail).
# ---------------------------------------------------------------------

_TAIL_BUDGET = 30


def q_context_tail(spark, sf_dir):
    """Maximal turn suffix per conversation within a 30-token budget
    (whitespace tokens; empty turns injected so 0-token rows appear)."""
    from grass_spark.operators.sft import context_tail

    t = _turns(spark, sf_dir, corrupt=True)
    out = context_tail(t, _TAIL_BUDGET)
    return out.select(
        "conv_id", F.col("turn_idx").cast("long").alias("turn_idx"),
        "n_tokens", "cum_from_end",
    )


ORACLE_CONTEXT_TAIL = f"""
WITH t AS ({_ORACLE_TURNS(order="ts, event_id", role=_ROLE, text=_CORRUPT_TEXT, ts="ts")}),
k AS (
  SELECT conv_id, turn_idx,
         CASE WHEN trim(text) = '' THEN 0
              ELSE len(str_split_regex(trim(text), '\\s+')) END AS n_tokens
  FROM t
), c AS (
  SELECT conv_id, turn_idx, n_tokens,
         sum(n_tokens) OVER (PARTITION BY conv_id ORDER BY turn_idx DESC)
           AS cum,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx DESC)
           AS rn
  FROM k
)
SELECT conv_id, turn_idx, CAST(n_tokens AS BIGINT) AS n_tokens,
       CAST(cum AS BIGINT) AS cum_from_end
FROM c WHERE cum <= {_TAIL_BUDGET} OR rn = 1
"""

EXT7_QUERIES["context_tail"] = q_context_tail
EXT7_ORACLES["context_tail"] = ORACLE_CONTEXT_TAIL


# ---------------------------------------------------------------------
# Transcript structural lint (operators/sft.py transcript_lint).
# ---------------------------------------------------------------------


def q_transcript_lint(spark, sf_dir):
    """Per-conversation hygiene report over a corrupted lattice: role
    repeats, timestamp rollbacks, empty turns, turn_idx gaps (every
    113th event dropped AFTER indexing), first-fail reject reason."""
    from grass_spark.operators.sft import transcript_lint

    t = _turns(spark, sf_dir, corrupt=True, order_by_event=True)
    t = t.filter(F.col("event_id") % 113 != 0)
    out = transcript_lint(t, first_role="user")
    return out.select(
        "conv_id", "n_turns", "n_role_repeats", "n_ts_regressions",
        "n_empty_turns", "first_role", "idx_contiguous",
        "reject_reason", "keep",
    )


ORACLE_TRANSCRIPT_LINT = f"""
WITH base AS ({_ORACLE_TURNS(order="event_id", role=_ROLE, text=_CORRUPT_TEXT, ts=_CORRUPT_TS)}),
t AS (SELECT * FROM base WHERE event_id % 113 <> 0),
l AS (
  SELECT conv_id, turn_idx, role, ts,
         CASE WHEN trim(text) = '' THEN 1 ELSE 0 END AS emp,
         lag(role) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_role,
         lag(ts) OVER (PARTITION BY conv_id ORDER BY turn_idx) AS prev_ts,
         row_number() OVER (PARTITION BY conv_id ORDER BY turn_idx) AS rn
  FROM t
), a AS (
  SELECT conv_id,
         CAST(count(*) AS BIGINT) AS n_turns,
         CAST(coalesce(sum(CASE WHEN role = prev_role THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_role_repeats,
         CAST(coalesce(sum(CASE WHEN ts < prev_ts THEN 1 ELSE 0 END), 0)
              AS BIGINT) AS n_ts_regressions,
         CAST(sum(emp) AS BIGINT) AS n_empty_turns,
         min(turn_idx) AS mi, max(turn_idx) AS ma,
         count(DISTINCT turn_idx) AS nd,
         max(CASE WHEN rn = 1 THEN role END) AS first_role
  FROM l GROUP BY conv_id
), f AS (
  SELECT *, (mi = 0 AND ma = n_turns - 1 AND nd = n_turns)
              AS idx_contiguous
  FROM a
)
SELECT conv_id, n_turns, n_role_repeats, n_ts_regressions, n_empty_turns,
       first_role, idx_contiguous,
       CASE WHEN NOT idx_contiguous THEN 'idx_gap'
            WHEN first_role <> 'user' THEN 'first_role'
            WHEN n_role_repeats > 0 THEN 'role_repeat'
            WHEN n_ts_regressions > 0 THEN 'ts_regression'
            WHEN n_empty_turns > 0 THEN 'empty_turn'
       END AS reject_reason,
       (CASE WHEN NOT idx_contiguous THEN 'idx_gap'
             WHEN first_role <> 'user' THEN 'first_role'
             WHEN n_role_repeats > 0 THEN 'role_repeat'
             WHEN n_ts_regressions > 0 THEN 'ts_regression'
             WHEN n_empty_turns > 0 THEN 'empty_turn'
        END) IS NULL AS keep
FROM f
"""

EXT7_QUERIES["transcript_lint"] = q_transcript_lint
EXT7_ORACLES["transcript_lint"] = ORACLE_TRANSCRIPT_LINT


# ---------------------------------------------------------------------
# Trigram stupid backoff (operators/lm.py stupid_backoff_score) —
# Brants et al. 2007's web-scale n-gram score, self-scored.
# ---------------------------------------------------------------------


def q_sb_perplexity(spark, sf_dir):
    """Per-doc mean -log2 stupid-backoff trigram score against the
    corpus's own counts; 5 equi-joins + one groupBy(doc), no window."""
    from grass_spark.operators.lm import stupid_backoff_score

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = stupid_backoff_score(d)
    return out.select(
        "doc_id", "n_trigrams",
        F.round("sb_logscore", 6).alias("sb_logscore"),
        F.round("sb_perplexity", 6).alias("sb_perplexity"),
    )


ORACLE_SB_PERPLEXITY = """
WITH w AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                      ' ') AS ws
  FROM documents WHERE trim(text) <> ''
), uni AS (
  SELECT wrd AS w, count(*) AS c1
  FROM (SELECT unnest(ws) AS wrd FROM w) GROUP BY 1
), pos2 AS (
  SELECT ws[g.i] AS w1, ws[g.i + 1] AS w2
  FROM w, unnest(generate_series(1, len(ws) - 1)) AS g(i)
  WHERE len(ws) >= 2
), big AS (
  SELECT w1, w2, count(*) AS c12 FROM pos2 GROUP BY 1, 2
), pos3 AS (
  SELECT doc_id, ws[g.i] AS w1, ws[g.i + 1] AS w2, ws[g.i + 2] AS w3
  FROM w, unnest(generate_series(1, len(ws) - 2)) AS g(i)
  WHERE len(ws) >= 3
), tri AS (
  SELECT w1, w2, w3, count(*) AS c123 FROM pos3 GROUP BY 1, 2, 3
), tot AS (
  SELECT CAST(count(*) AS DOUBLE) AS n
  FROM (SELECT unnest(ws) FROM w)
), sc AS (
  SELECT p.doc_id,
         -log2(CAST(CASE
            WHEN t.c123 IS NOT NULL
              THEN CAST(t.c123 AS DOUBLE) / b12.c12
            WHEN b23.c23 IS NOT NULL
              THEN CAST(0.4 AS DOUBLE) * b23.c23 / u2.c2
            ELSE CAST(0.4 AS DOUBLE) * CAST(0.4 AS DOUBLE)
                 * coalesce(u3.c3, 0) / tot.n
          END AS DOUBLE)) AS nls
  FROM pos3 p
  LEFT JOIN tri t USING (w1, w2, w3)
  LEFT JOIN big b12 USING (w1, w2)
  LEFT JOIN (SELECT w1 AS w2, w2 AS w3, c12 AS c23 FROM big) b23
    USING (w2, w3)
  LEFT JOIN (SELECT w AS w2, c1 AS c2 FROM uni) u2 USING (w2)
  LEFT JOIN (SELECT w AS w3, c1 AS c3 FROM uni) u3 USING (w3)
  CROSS JOIN tot
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_trigrams,
       round(avg(nls), 6) AS sb_logscore,
       round(pow(2.0, avg(nls)), 6) AS sb_perplexity
FROM sc GROUP BY doc_id
"""

EXT7_QUERIES["sb_perplexity"] = q_sb_perplexity
EXT7_ORACLES["sb_perplexity"] = ORACLE_SB_PERPLEXITY


# ---------------------------------------------------------------------
# SFT JSONL serialization (operators/sft.py sft_jsonl_lines) — gates
# the JSON escape/format parity of the training-shard line format.
# ---------------------------------------------------------------------


def q_sft_jsonl(spark, sf_dir):
    """One JSONL training line per conversation (conv_id, rendered
    text, mask metadata); md5-gated so the exact byte format — compact
    separators, \\n and quote escapes — matches the oracle."""
    from grass_spark.operators.sft import sft_examples, sft_jsonl_lines

    t = _turns(spark, sf_dir)
    ex = sft_examples(t, mask_roles=("assistant",))
    out = sft_jsonl_lines(ex)
    return out.select(
        "conv_id",
        F.length("line").alias("n_line_chars"),
        F.md5("line").alias("line_md5"),
    )


ORACLE_SFT_JSONL = f"""
WITH t AS ({_ORACLE_TURNS(order="ts, event_id", role=_ROLE, text=_PLAIN_TEXT, ts="ts")}),
p AS (
  SELECT conv_id, turn_idx, role, text,
         role || ': ' || text || chr(10) AS piece
  FROM t
), o AS (
  SELECT *,
         sum(len(piece)) OVER (PARTITION BY conv_id ORDER BY turn_idx)
           AS cend
  FROM p
), ex AS (
  SELECT conv_id,
         string_agg(piece, '' ORDER BY turn_idx) AS text,
         CAST(coalesce(sum(len(text)) FILTER (WHERE role = 'assistant'), 0)
              AS BIGINT) AS n_mask_chars,
         coalesce(string_agg(
             CAST(cend - len(piece) + len(role) + 2 AS VARCHAR) || '-' ||
             CAST(cend - len(piece) + len(role) + 2 + len(text) AS VARCHAR),
             ',' ORDER BY turn_idx) FILTER (WHERE role = 'assistant'),
           '') AS mask_spans
  FROM o GROUP BY conv_id
), lines AS (
  SELECT conv_id,
         to_json(struct_pack(
           conv_id := conv_id, text := text,
           n_mask_chars := n_mask_chars, mask_spans := mask_spans
         )) AS line
  FROM ex
)
SELECT conv_id, CAST(len(line) AS INT) AS n_line_chars,
       md5(line) AS line_md5
FROM lines
"""

EXT7_QUERIES["sft_jsonl"] = q_sft_jsonl
EXT7_ORACLES["sft_jsonl"] = ORACLE_SFT_JSONL
