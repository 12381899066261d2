"""SFT training-example assembly over transcript turns.

The engine's input domain (BASELINE.json ``input_hint``) is a table of
multi-turn conversation transcripts ``(conv_id, turn_idx, role, text,
tool, ts)``.  Instruction-tuning pipelines flatten each conversation
into ONE training document — the turns rendered in order with role
headers — plus a *loss mask*: the character spans of the rendered text
that belong to the roles the model should be trained to produce
(normally the assistant), so the trainer can zero the loss everywhere
else.  This module builds those examples, the context-window tail
truncation that precedes them, and the structural lint that gates
malformed conversations out of the training set.

Scale shape (10^12 turns):

* every window here partitions by ``conv_id`` — conversation length is
  domain-bounded (the same contract the rollup/gapfill tiers rely on),
  so no window partition can exceed one conversation; on the bucketed
  layout (operators/bucketed.py) HashPartitioning(conv_id) already
  satisfies the distribution and the whole assembly plans 0-Exchange;
* the per-conversation reduction is one ``groupBy(conv_id)`` with
  partial (map-side) ``collect_list`` of (idx, piece) structs — output
  rows are conversation-sized, never corpus-sized;
* everything is JVM column expressions — zero Python in the plan.

Reference analog: none in GRASS (transcript-domain addition); the
render-then-offset construction mirrors how t.rast.what renders
per-point series (python/grass/temporal/t.rast.what mapcalc listing),
re-expressed as offsets into one concatenated string.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _piece(role: Column, text: Column, header_sep: str, sep: str) -> Column:
    """One rendered turn: ``role || header_sep || text || sep``."""
    return F.concat(role, F.lit(header_sep), text, F.lit(sep))


def sft_examples(
    turns: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    mask_roles: tuple[str, ...] = ("assistant",),
    header_sep: str = ": ",
    sep: str = "\n",
) -> DataFrame:
    """One training example per conversation with loss-mask spans.

    Returns ``(conv_col, text, n_turns, n_mask_chars, mask_spans)``
    where ``text`` is the turns rendered in ``idx_col`` order as
    ``role || header_sep || turn_text || sep`` and ``mask_spans`` is a
    canonical string ``"s-e,s-e,..."`` of 0-based character intervals
    [s, e) covering exactly the *text portion* of every turn whose role
    is in ``mask_roles`` (role headers and separators stay unmasked).
    Null turn text renders as the empty string (span ``s-s``).
    """
    role = F.col(role_col)
    text = F.coalesce(F.col(text_col), F.lit(""))
    piece = _piece(role, text, header_sep, sep)
    w = Window.partitionBy(conv_col).orderBy(idx_col)
    d = (
        turns.select(
            conv_col,
            idx_col,
            role.alias("_role"),
            text.alias("_text"),
            piece.alias("_piece"),
        )
        .withColumn("_end", F.sum(F.length("_piece")).over(w))
        .withColumn("_start", F.col("_end") - F.length("_piece"))
        .withColumn(
            "_mask_s",
            F.col("_start") + F.length("_role") + F.lit(len(header_sep)),
        )
        .withColumn("_mask_e", F.col("_mask_s") + F.length("_text"))
    )
    masked = F.col("_role").isin(*mask_roles)
    span_str = F.concat(
        F.col("_mask_s").cast("string"), F.lit("-"), F.col("_mask_e").cast("string")
    )
    return (
        d.groupBy(conv_col)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col(idx_col).alias("i"), F.col("_piece").alias("p")))
                    ),
                    lambda x: x["p"],
                ),
                "",
            ).alias("text"),
            F.count(F.lit(1)).alias("n_turns"),
            F.coalesce(
                F.sum(F.when(masked, F.length("_text"))), F.lit(0)
            ).alias("n_mask_chars"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(
                                masked,
                                F.struct(F.col(idx_col).alias("i"), span_str.alias("s")),
                            )
                        )
                    ),
                    lambda x: x["s"],
                ),
                ",",
            ).alias("mask_spans"),
        )
    )


def context_tail(
    turns: DataFrame,
    budget: int,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    text_col: str = "text",
    keep_first_over: bool = True,
) -> DataFrame:
    """Context-window truncation: the maximal turn *suffix* per
    conversation whose cumulative whitespace-token count fits
    ``budget``.

    Mirrors inference-time context assembly (keep the most recent
    turns).  The last turn is always kept even if it alone exceeds the
    budget when ``keep_first_over`` (otherwise over-budget singleton
    conversations vanish).  Adds ``n_tokens`` (this turn) and
    ``cum_from_end`` (tokens from the conversation end through this
    turn, inclusive).
    """
    text = F.coalesce(F.col(text_col), F.lit(""))
    ntok = F.when(F.length(F.trim(text)) == 0, F.lit(0)).otherwise(
        F.size(F.split(F.trim(text), r"\s+"))
    )
    wd = Window.partitionBy(conv_col).orderBy(F.col(idx_col).desc())
    d = (
        turns.withColumn("n_tokens", ntok.cast("long"))
        .withColumn("cum_from_end", F.sum("n_tokens").over(wd))
        .withColumn("_rn_desc", F.row_number().over(wd))
    )
    keep = F.col("cum_from_end") <= F.lit(int(budget))
    if keep_first_over:
        keep = keep | (F.col("_rn_desc") == 1)
    return d.filter(keep).drop("_rn_desc")


def transcript_lint(
    turns: DataFrame,
    *,
    conv_col: str = "conv_id",
    idx_col: str = "turn_idx",
    role_col: str = "role",
    text_col: str = "text",
    ts_col: str = "ts",
    first_role: str | None = "user",
) -> DataFrame:
    """Structural hygiene report, one row per conversation.

    Flags the malformations that poison chat-format training data:
    consecutive same-role turns, timestamps that run backwards against
    the turn order, empty turns, a non-contiguous ``turn_idx`` lattice,
    and a wrong opening role.  ``reject_reason`` is a first-fail CASE
    chain (same contract as operators/quality.py); ``keep`` is the
    conjunction.
    """
    w = Window.partitionBy(conv_col).orderBy("_idx")
    text = F.coalesce(F.col(text_col), F.lit(""))
    d = (
        turns.select(
            conv_col,
            F.col(idx_col).alias("_idx"),
            F.col(role_col).alias("_role"),
            F.col(ts_col).alias("_ts"),
            (F.length(F.trim(text)) == 0).cast("int").alias("_empty"),
        )
        .withColumn("_prev_role", F.lag("_role").over(w))
        .withColumn("_prev_ts", F.lag("_ts").over(w))
        .withColumn("_rn", F.row_number().over(w))
    )
    agg = d.groupBy(conv_col).agg(
        F.count(F.lit(1)).alias("n_turns"),
        F.coalesce(
            F.sum((F.col("_role") == F.col("_prev_role")).cast("int")),
            F.lit(0),
        ).alias("n_role_repeats"),
        F.coalesce(
            F.sum((F.col("_ts") < F.col("_prev_ts")).cast("int")), F.lit(0)
        ).alias("n_ts_regressions"),
        F.sum("_empty").alias("n_empty_turns"),
        F.min("_idx").alias("_min_idx"),
        F.max("_idx").alias("_max_idx"),
        F.count_distinct("_idx").alias("_n_idx"),
        F.max(F.when(F.col("_rn") == 1, F.col("_role"))).alias("first_role"),
    )
    contiguous = (
        (F.col("_min_idx") == 0)
        & (F.col("_max_idx") == F.col("n_turns") - 1)
        & (F.col("_n_idx") == F.col("n_turns"))
    )
    agg = agg.withColumn("idx_contiguous", contiguous)
    reason = F.when(~F.col("idx_contiguous"), F.lit("idx_gap"))
    if first_role is not None:
        reason = reason.when(
            F.col("first_role") != F.lit(first_role), F.lit("first_role")
        )
    reason = (
        reason.when(F.col("n_role_repeats") > 0, F.lit("role_repeat"))
        .when(F.col("n_ts_regressions") > 0, F.lit("ts_regression"))
        .when(F.col("n_empty_turns") > 0, F.lit("empty_turn"))
        .otherwise(F.lit(None).cast("string"))
    )
    return (
        agg.withColumn("reject_reason", reason)
        .withColumn("keep", F.col("reject_reason").isNull())
        .drop("_min_idx", "_max_idx", "_n_idx")
    )


def sft_jsonl_lines(
    examples: DataFrame,
    *,
    conv_col: str = "conv_id",
    fields: tuple[str, ...] = ("text", "n_mask_chars", "mask_spans"),
) -> DataFrame:
    """Serialize :func:`sft_examples` output to training-shard JSONL.

    One compact JSON object per conversation (``conv_col`` first, then
    ``fields``, field order preserved) — the line format trainers
    stream.  Pure ``to_json`` projection (0 Exchange on top of the
    examples frame); compose with
    :func:`grass_spark.operators.export.write_shards` for the
    byte-stable sharded write at scale.
    """
    return examples.select(
        conv_col,
        F.to_json(F.struct(conv_col, *fields)).alias("line"),
    )
