"""Training-export sharding: deterministic global shuffle + shard files.

The last stage of a training-data pipeline: the cleaned corpus must be
(a) randomly permuted — documents from one source must not arrive in
runs, or the loss curve sees correlated batches — and (b) split into a
fixed number of equal-ish shard files that data loaders stream
round-robin.  Both must be DETERMINISTIC (re-running the export
reproduces byte-identical shards) — so no ``rand()``: the permutation
key is the portable md5 hash of the document id
(:func:`grass_spark.operators.sampling.uniform_hash`), reproducible in
any engine and independent of partition layout.

Spark shapes (100 TB story):

* ``shard_id = floor(u * n_shards)`` is a map-side expression; the ONE
  shuffle in the whole export is the repartition on ``shard_id`` —
  exactly the data movement a sharded write requires, no more.
* in-shard order is ``sortWithinPartitions(u)`` — sort happens inside
  each shard task, no global sort, no range exchange.
* ``pos`` (position within shard) in :func:`shard_assignments` is a
  per-shard window over the same partitioning, so the rank costs no
  extra exchange after the repartition.
* hash-permutation keeps shard sizes balanced (binomial around
  N/n_shards) without a count or a global pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from grass_spark.operators.sampling import uniform_hash


def shard_assignments(
    df: DataFrame,
    n_shards: int,
    *,
    id_col: str = "doc_id",
    salt: str = "export",
) -> DataFrame:
    """Label every row with its shard and its position within the shard.

    Adds ``shard_id`` (0..n_shards-1) and ``pos`` (0-based rank of the
    row inside its shard under the permutation order).  The permutation
    key is ``uniform_hash(id, salt)`` with the id itself as a total
    tie-break, so the assignment is a pure function of (id, salt,
    n_shards) — stable across runs, engines, and partition layouts.

    NOTE the ``pos`` rank is a per-shard window — one sort task per
    shard (~corpus/n_shards rows each).  That is fine for auditing /
    oracle parity at moderate scale; the actual 100-TB export path is
    :func:`write_shards`, which never ranks (``sortWithinPartitions``
    inside the shard write task) — don't feed this function a full
    corpus just to get positions.
    """
    u = uniform_hash(F.col(id_col), salt)
    out = df.withColumn("_u", u).withColumn(
        "shard_id", F.floor(F.col("_u") * n_shards).cast("int")
    )
    w = Window.partitionBy("shard_id").orderBy(
        F.col("_u"), F.col(id_col)
    )
    return (
        out.withColumn("pos", F.row_number().over(w) - F.lit(1))
        .drop("_u")
    )


def split_assignments(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    id_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test split labels.

    ``fractions`` maps split name -> fraction; they must sum to ~1.
    The id's uniform hash falls into cumulative ranges in the given
    insertion order, so every row gets exactly one label, assignment is
    a pure function of (id, salt, fractions), and disjointness /
    coverage hold by construction — no rand(), no global pass, no
    shuffle (the label is a scan-stage CASE chain).
    """
    total = sum(fractions.values())
    if not 0.999 <= total <= 1.001:
        raise ValueError(f"fractions must sum to 1, got {total}")
    u = uniform_hash(F.col(id_col), salt)
    expr = None
    hi = 0.0
    names = list(fractions)
    for name in names[:-1]:
        hi += fractions[name]
        cond = u < F.lit(hi)
        expr = F.when(cond, name) if expr is None else expr.when(cond, name)
    last = F.lit(names[-1])
    expr = last if expr is None else expr.otherwise(last)
    return df.withColumn("split", expr)


def write_shards(
    df: DataFrame,
    path: str,
    n_shards: int,
    *,
    id_col: str = "doc_id",
    salt: str = "export",
    format: str = "parquet",
    order_col: str | None = None,
) -> None:
    """Write the permuted corpus as ``n_shards`` shard directories.

    One repartition on ``shard_id`` (the only shuffle), in-partition
    sort by the permutation key, ``partitionBy(shard_id)`` layout so a
    loader opens ``shard_id=K/`` directly.  Deterministic: re-running
    produces the same rows in the same order per shard.

    ``order_col`` switches the IN-SHARD order from the hash permutation
    to CURRICULUM order (ascending ``order_col`` — e.g. a difficulty or
    perplexity score — with the permutation key as the tie-break, so
    equal-score rows still interleave deterministically).  Shard
    MEMBERSHIP stays the pure (id, salt, n_shards) hash either way: a
    loader reading shards round-robin sees every shard sweep
    easy-to-hard while each shard remains an unbiased corpus sample.

    The in-partition sort leads with ``shard_id``: a dynamic
    ``partitionBy`` write REQUIRES the data sorted by the partition
    column, and if the incoming ordering doesn't satisfy that,
    FileFormatWriter inserts its own sort — which both double-sorts
    and only preserves the ``_u`` permutation order if that planner
    sort happens to be stable (not guaranteed once spill-merge kicks
    in).  Prefixing shard_id makes our sort satisfy the writer's
    required ordering, so no extra sort is inserted and the in-shard
    ``(_u, id)`` order is the one on disk.
    """
    u = uniform_hash(F.col(id_col), salt)
    in_shard = (["_u", id_col] if order_col is None
                else [order_col, "_u", id_col])
    out = (
        df.withColumn("_u", u)
        .withColumn("shard_id", F.floor(F.col("_u") * n_shards).cast("int"))
        .repartition(n_shards, F.col("shard_id"))
        .sortWithinPartitions("shard_id", *in_shard)
        .drop("_u")
    )
    (
        out.write.mode("overwrite")
        .partitionBy("shard_id")
        .format(format)
        .save(path)
    )


def shard_manifest(
    df: DataFrame,
    n_shards: int,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    salt: str = "export",
) -> DataFrame:
    """Per-shard data-card row: ``n_docs``, ``n_chars``, optional
    ``n_tokens``, id range, and an ORDER-INDEPENDENT content
    fingerprint — the manifest a 100-TB export publishes next to the
    shards so a consumer (or a re-run) can verify integrity without
    re-reading row order.

    The fingerprint sums ``uint32(md5(id ':' md5(text)))`` over the
    shard's rows: commutative (no dependence on task order), map-side
    combinable, engine-portable (exact integer arithmetic; DuckDB twin
    sums the same uint32).  A corrupted/dropped/duplicated row moves
    the sum with probability ~1-2^-32.  Headroom: 2^32 per row keeps
    the sum under int64 up to ~2·10^9 rows per shard.

    One map-side-combined groupBy on ``shard_id`` (bounded output =
    ``n_shards`` rows); the corpus shuffles only the partial
    aggregates.  Uses the same (id, salt, n_shards) assignment as
    :func:`write_shards`, so the manifest describes those shards.
    """
    u = uniform_hash(F.col(id_col), salt)
    row_fp = F.conv(
        F.substring(
            F.md5(F.concat_ws(":", F.col(id_col).cast("string"),
                              F.md5(F.col(text_col)))),
            1, 8,
        ),
        16, 10,
    ).cast("bigint")
    staged = df.withColumn(
        "shard_id", F.floor(u * n_shards).cast("int")
    )
    aggs = [
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.length(F.col(text_col))).cast("bigint").alias("n_chars"),
        F.min(id_col).alias("min_id"),
        F.max(id_col).alias("max_id"),
        F.sum(row_fp).alias("fingerprint"),
    ]
    if tokens_col is not None:
        aggs.insert(2, F.sum(F.col(tokens_col)).cast("bigint").alias("n_tokens"))
    return staged.groupBy("shard_id").agg(*aggs)


def grouped_splits(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    group_col: str,
    salt: str = "split",
) -> DataFrame:
    """Leakage-safe split labels: the split is a pure function of the
    GROUP key, so every row of a group lands in the same split.

    Plain per-id splitting leaks whenever related rows (near-dup
    documents, turns of one conversation, sessions of one user)
    straddle train and validation — the model "generalizes" to rows it
    effectively saw.  Hashing the group key instead makes co-assignment
    structural.  Same scan-stage CASE chain as
    :func:`split_assignments`; zero shuffle, zero rand().
    """
    return split_assignments(df, fractions, id_col=group_col, salt=salt)


def content_splits(
    df: DataFrame,
    fractions: dict[str, float],
    *,
    text_col: str = "text",
    salt: str = "split",
) -> DataFrame:
    """Exact-duplicate-safe splits: the group key is the md5 of the
    NORMALIZED text (the exact-dedup content hash), so byte-identical
    and whitespace/case-variant copies always co-assign — the most
    common train/test leak.  Adds ``content_key`` and ``split``.

    Near-duplicate leakage needs a cluster id from the near-dedup
    family fed through :func:`grouped_splits` instead.
    """
    from grass_spark.operators.dedup import normalize_text

    d = df.withColumn(
        "content_key", F.md5(normalize_text(F.col(text_col)))
    )
    return grouped_splits(
        d, fractions, group_col="content_key", salt=salt
    )
