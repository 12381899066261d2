"""Sequence packing: concat-and-chunk documents into training examples.

Pre-training dataloaders concatenate documents (within a shard, in a
deterministic order) into one token stream and cut it into fixed-length
sequences; a document can straddle a sequence boundary.  This operator
computes that assignment declaratively: one row per (document,
sequence) overlap with the exact token span, so a downstream writer can
slice each doc's tokens into its sequences without ever materializing
the concatenated stream.

Scale shape (100 TB corpus): a prefix sum per group via a window — the
group is the PACKING SHARD (source file / day / language bucket), which
a real pipeline keeps bounded (tens of GB), so one shard = one window
partition parallelizes across shards.  The explode emits
``ceil(n_tokens / seq_len) + 1`` rows per doc — output-proportional,
no shuffle beyond the window's own.
"""

from __future__ import annotations

import warnings

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    docs: DataFrame,
    seq_len: int,
    *,
    group_col: str | None = None,
    order_col: str = "doc_id",
    id_col: str = "doc_id",
    tokens_col: str | Column = "n_tokens",
    drop_partial: bool = False,
) -> DataFrame:
    """Assign each document its (sequence, token-span) slots.

    Documents are ordered by ``order_col`` within each ``group_col``
    shard, concatenated, and cut every ``seq_len`` tokens.  Output: one
    row per (doc, sequence) overlap —

    * ``seq_id``        — 0-based sequence index within the group;
    * ``doc_tok_start`` / ``doc_tok_end`` — the [start, end) token
      range OF THE DOCUMENT that lands in this sequence;
    * ``seq_off``       — where that span starts INSIDE the sequence.

    Zero-token documents are dropped (they occupy no slot).  With
    ``drop_partial`` the trailing under-full sequence of each group is
    omitted (the usual "drop_last" training convention).
    """
    if seq_len <= 0:
        raise ValueError(f"seq_len must be positive, got {seq_len}")
    if group_col is None:
        # A global prefix sum is a SINGLE window partition: the whole
        # corpus serializes through one task.  Fine for a unit test or
        # a bounded shard, a stealth bottleneck at corpus scale — make
        # the caller own the choice.
        warnings.warn(
            "pack_sequences(group_col=None) computes a global prefix "
            "sum in ONE window partition — the entire input serializes "
            "through a single task.  Pass group_col (a bounded packing "
            "shard: source file / day / language bucket) for anything "
            "bigger than one shard.",
            stacklevel=2,
        )
    toks = (
        F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    ).cast("bigint")
    gcols = [group_col] if group_col else []
    part = Window.partitionBy(*gcols) if gcols else Window.partitionBy()
    w = part.orderBy(order_col).rowsBetween(Window.unboundedPreceding, 0)

    L = F.lit(int(seq_len)).cast("bigint")
    d = (
        docs.filter(toks > 0)
        .withColumn("_n", toks)
        .withColumn("_cum_end", F.sum("_n").over(w))
        .withColumn("_cum_start", F.col("_cum_end") - F.col("_n"))
    )
    if drop_partial:
        # same partitioning as the prefix-sum window — no extra shuffle
        d = d.withColumn("_total", F.max("_cum_end").over(part))
    out = (
        d.select(
            *gcols,
            F.col(id_col),
            F.col("_n").alias("n_tokens"),
            "_cum_start",
            *(["_total"] if drop_partial else []),
            F.explode(
                F.sequence(
                    F.floor(F.col("_cum_start") / L),
                    F.floor((F.col("_cum_end") - 1) / L),
                )
            ).alias("seq_id"),
        )
        .withColumn(
            "doc_tok_start",
            F.greatest(F.lit(0).cast("bigint"), F.col("seq_id") * L - F.col("_cum_start")),
        )
        .withColumn(
            "doc_tok_end",
            F.least(F.col("n_tokens"), (F.col("seq_id") + 1) * L - F.col("_cum_start")),
        )
        .withColumn(
            "seq_off",
            F.col("_cum_start") + F.col("doc_tok_start") - F.col("seq_id") * L,
        )
    )
    if drop_partial:
        out = out.filter(
            # a sequence is full iff the stream extends to its end
            (F.col("seq_id") + 1) * L <= F.col("_total")
        ).drop("_total")
    return out.drop("_cum_start")


def length_batches(
    docs: DataFrame,
    batch_size: int,
    *,
    group_col: str | None = None,
    id_col: str = "doc_id",
    tokens_col: str | Column = "n_tokens",
    drop_partial: bool = False,
) -> DataFrame:
    """Length-bucketed batch assembly — the PADDING dataloader's twin
    of :func:`pack_sequences` (which models the CONCATENATION one).

    SFT/reward-model training pads every sequence in a batch to the
    batch max; random batching wastes ~half the FLOPs on pad tokens.
    The standard fix is length bucketing: sort by length, cut into
    fixed-count batches, so near-equal lengths share a batch.  Output:
    one row per doc with

    * ``batch_idx`` — 0-based batch within the group (sorted by
      ``(n_tokens, id)`` ascending — deterministic in any engine);
    * ``padded_to`` — the batch's max token count (what every row
      pads to);
    * ``pad_waste`` — ``padded_to - n_tokens`` pad tokens this doc
      costs.

    ``drop_partial`` drops the trailing under-full batch per group.

    Scale shape: same contract as :func:`pack_sequences` — the group
    is a bounded packing shard and ``group_col=None`` warns (global
    single-partition sort).  The second window (batch max) partitions
    by ``(group, batch_idx)``: HashPartitioning(group) from the first
    window already satisfies that clustering, so it adds a sort but
    NO second Exchange (pinned by
    ``tests/test_preference.py::test_length_batches_single_exchange``).
    """
    if batch_size <= 0:
        raise ValueError(f"batch_size must be positive, got {batch_size}")
    if group_col is None:
        warnings.warn(
            "length_batches(group_col=None) sorts the whole input in "
            "ONE window partition.  Pass group_col (a bounded shard) "
            "for anything bigger than one shard.",
            stacklevel=2,
        )
    toks = (
        F.col(tokens_col) if isinstance(tokens_col, str) else tokens_col
    ).cast("bigint")
    gcols = [group_col] if group_col else []
    w1 = (Window.partitionBy(*gcols) if gcols else Window.partitionBy()).orderBy(
        toks.asc(), F.col(id_col).asc()
    )
    d = (
        docs.withColumn("_n", toks)
        .withColumn("_rn", F.row_number().over(w1) - 1)
        .withColumn(
            "batch_idx", F.floor(F.col("_rn") / F.lit(int(batch_size)))
        )
    )
    w2 = Window.partitionBy(*gcols, "batch_idx")
    d = d.withColumn("padded_to", F.max("_n").over(w2)).withColumn(
        "pad_waste", F.col("padded_to") - F.col("_n")
    )
    if drop_partial:
        d = d.withColumn("_bn", F.count(F.lit(1)).over(w2)).where(
            F.col("_bn") == batch_size
        ).drop("_bn")
    return d.drop("_rn", "_n")
