"""Preference-pair assembly + epoch upsampling for training mixes.

Two post-hygiene stages a training-data pipeline runs between corpus
curation and the trainer:

* :func:`preference_pairs` — DPO/RLHF-style (chosen, rejected) pair
  assembly: given N scored completions per prompt, elect the best and
  worst completion per prompt and emit one preference pair when the
  score margin clears a threshold.  The reference has no analog (this
  is the transcript-domain training surface); the *shape* is the same
  first-occurrence-election problem as exact dedup
  (operators/dedup.py) and segment dedup (operators/segdedup.py:79):
  a single map-side-combinable ``groupBy`` — never a window over the
  bare prompt key, so a pathologically hot prompt (one prompt with
  10^6 sampled completions in a best-of-N sweep) is absorbed by
  partial aggregation instead of funnelling into one task.

* :func:`upsample_epochs` — mixture weights **above 1**: the
  LLaMA-style data recipe where a high-quality source is repeated
  ~w times per training run (w = 2.5 means every doc appears twice
  and a deterministic 50% hash-subset appears a third time).  This is
  the missing upper half of ``hash_sample`` (operators/sampling.py),
  whose rates cap at 1.  Output-proportional ``explode`` over a
  per-row ``sequence`` — zero shuffle, scan-stage, composes onto
  ``readStream`` unchanged.

Determinism contract (same as the sampling module): the fractional
epoch keeps a doc iff the portable md5-uniform hash of its id falls
below ``frac(w)`` — any engine reproduces the identical sample, and
the DuckDB oracle replays it bit-for-bit.

Scale shape (100 TB corpus):

* ``preference_pairs``: ONE shuffle on ``prompt_col`` with partial
  min/max(struct) combiners; the output is prompt-cardinality-sized.
* ``upsample_epochs``: no shuffle at all.  Weights arrive as a plan
  literal (dict) or a broadcast join (group-cardinality DataFrame);
  the explode multiplies rows by ~mean(w), never more than ceil(w).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grass_spark.operators.sampling import uniform_hash


def preference_pairs(
    df: DataFrame,
    *,
    prompt_col: str = "prompt_id",
    id_col: str = "doc_id",
    text_col: str = "text",
    score_col: str = "score",
    min_margin: float = 0.0,
) -> DataFrame:
    """Elect one (chosen, rejected) preference pair per prompt.

    chosen = completion with the lexicographically largest
    ``(round(score, 6), id)``; rejected = the smallest.  Ties on the
    rounded score break on the id (ids are unique per completion, so
    the election is total and deterministic in any engine).  Prompts
    with fewer than 2 completions, or whose margin
    ``round(chosen.s - rejected.s, 6)`` is below ``min_margin``, emit
    nothing (no self-pairs, no low-signal pairs).

    Scores round to 6 dp BEFORE the election so engines that disagree
    in the last ulp (distributed sum order, libm) elect the same pair;
    the margin rounds again after the subtraction.

    Plan: one ``groupBy(prompt)`` whose min/max(struct) aggregates are
    map-side combinable — a hot prompt with millions of completions is
    reduced inside each input partition first (pinned by
    ``tests/test_preference.py::test_preference_plan_partial_agg``).
    """
    s = F.round(F.col(score_col).cast("double"), 6)
    cand = F.struct(
        s.alias("s"),
        F.col(id_col).alias("id"),
        F.col(text_col).alias("text"),
    )
    agg = df.groupBy(prompt_col).agg(
        F.max(cand).alias("_c"),
        F.min(cand).alias("_r"),
        F.count(F.lit(1)).alias("n_completions"),
    )
    margin = F.round(F.col("_c.s") - F.col("_r.s"), 6)
    return (
        agg.select(
            prompt_col,
            F.col("_c.id").alias("chosen_id"),
            F.col("_c.text").alias("chosen_text"),
            F.col("_r.id").alias("rejected_id"),
            F.col("_r.text").alias("rejected_text"),
            margin.alias("margin"),
            "n_completions",
        )
        .where(
            (F.col("n_completions") >= 2)
            & (F.col("margin") >= F.lit(round(float(min_margin), 6)))
        )
    )


def upsample_epochs(
    df: DataFrame,
    weights,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    default_weight: float = 1.0,
    salt: str = "epoch",
) -> DataFrame:
    """Repeat each row ~weight times: ``epoch`` 0..ceil(w)-1 per row.

    ``weights`` is a ``{group: w}`` dict (becomes a plan-literal map)
    or a 2-column DataFrame ``(group_col, weight)`` (broadcast —
    group cardinality is sources/langs, always tiny).  Groups absent
    from the table take ``default_weight``.

    A row emits epochs ``0 .. floor(w)-1`` unconditionally, plus epoch
    ``floor(w)`` iff ``uniform_hash(id, salt) < round(w - floor(w),
    6)`` — so ``w = 2.5`` yields every doc twice and a deterministic,
    engine-portable half of the docs a third time.  ``w = 0`` drops
    the row (empty sequence); negative weights raise.

    Stateless scan-stage plan (explode + filter, no shuffle) —
    composes onto ``readStream`` unchanged.
    """
    if isinstance(weights, dict):
        for g, w in weights.items():
            if not math.isfinite(float(w)) or float(w) < 0:
                raise ValueError(f"weight for {g!r} must be finite >= 0")
        if weights:
            m = F.create_map(
                *[
                    lit
                    for g, w in weights.items()
                    for lit in (F.lit(g), F.lit(round(float(w), 6)))
                ]
            )
            wcol = F.coalesce(
                F.element_at(m, F.col(group_col).cast("string")),
                F.lit(round(float(default_weight), 6)),
            )
        else:
            wcol = F.lit(round(float(default_weight), 6))
        staged = df.withColumn("_w", wcol)
    else:
        wf = weights.select(
            F.col(group_col),
            F.round(F.col("weight").cast("double"), 6).alias("_w"),
        )
        staged = df.join(F.broadcast(wf), group_col, "left").withColumn(
            "_w",
            F.coalesce(F.col("_w"), F.lit(round(float(default_weight), 6))),
        )

    n_ep = F.ceil(F.col("_w")).cast("int")
    epochs = F.when(n_ep > 0, F.sequence(F.lit(0), n_ep - 1)).otherwise(
        F.array().cast("array<int>")
    )
    frac = F.round(F.col("_w") - F.floor(F.col("_w")), 6)
    out = (
        staged.withColumn("epoch", F.explode(epochs))
        .where(
            (F.col("epoch") < F.floor(F.col("_w")))
            | (uniform_hash(F.col(id_col), salt) < frac)
        )
        .drop("_w")
    )
    return out
