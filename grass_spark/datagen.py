"""Deterministic synthetic transcript table (BASELINE.json input_hint).

Schema: ``conv_id:string, turn_idx:int32, role:string, text:string,
tool:string, ts:timestamp`` — the engine's primary input (FIXTURES.md F0).

Synthesis is purely expression-based: ``spark.range`` over conversations,
conversation sizes from a closed-form Zipf-ish law, ``explode(sequence)``
to turns, and xxhash64-derived pseudo-randomness.  Deterministic for a
given (n_convs, seed) at any parallelism and any partition count — no
RNG state, no driver-side loops, so the same generator runs unchanged
at 10¹²-turn scale on a real cluster.

Skew is built in (F5): conversation 0 is a hot conversation holding a
large share of all turns; remaining sizes decay by rank — exercising
the salting/AQE skew path the north rule requires.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLES = ("user", "assistant", "system", "tool")
TOOLS = ("search", "browser", "python", "bash", "editor")

T0 = "2024-01-01 00:00:00"


def conv_sizes_expr(n_convs: int, avg_turns: int, hot_share: float) -> F.Column:
    """Turns per conversation: conv 0 gets ``hot_share`` of the total,
    the rest follow a 1/rank^0.5 decay normalized to the remainder.
    Closed-form per conversation — no global pass needed."""
    total = n_convs * avg_turns
    hot = int(total * hot_share)
    # sum over k=1..n of k^-0.5 ≈ 2 sqrt(n); scale so the tail sums to ~(total - hot)
    tail_scale = (total - hot) / (2.0 * (n_convs**0.5))
    k = F.col("conv_rank")
    return (
        F.when(k == 0, F.lit(hot))
        .otherwise(F.greatest(F.lit(1), F.floor(F.lit(tail_scale) * F.pow(k.cast("double"), -0.5)).cast("long")))
    )


def synth_transcripts(
    spark: SparkSession,
    n_convs: int = 1000,
    avg_turns: int = 40,
    seed: int = 42,
    hot_share: float = 0.05,
    base_gap_s: int = 30,
    partitions: int | None = None,
) -> DataFrame:
    """Build the transcript DataFrame.

    ``ts`` is strictly monotone non-decreasing per conv_id: each turn
    advances by ``base_gap_s`` plus a hash jitter < base_gap_s.
    ``text`` is deterministic pseudo-text whose length varies by turn
    (the metric the rollup tiers aggregate).
    """
    convs = spark.range(n_convs).withColumnRenamed("id", "conv_rank")
    if partitions:
        convs = convs.repartition(partitions)
    convs = convs.withColumn("n_turns", conv_sizes_expr(n_convs, avg_turns, hot_share))

    h = lambda *cols: F.abs(F.xxhash64(F.lit(seed), *cols))  # noqa: E731

    df = (
        convs.withColumn("turn_idx", F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)))
        .withColumn("conv_id", F.concat(F.lit("conv-"), F.format_string("%08d", "conv_rank")))
        # conversation start spread over ~30 days after T0
        .withColumn(
            "_conv_start",
            F.lit(T0).cast("timestamp")
            + F.make_dt_interval(F.lit(0), F.lit(0), F.lit(0), (h(F.col("conv_rank")) % (30 * 86400)).cast("double")),
        )
        .withColumn(
            "ts",
            F.col("_conv_start")
            + F.make_dt_interval(
                F.lit(0), F.lit(0), F.lit(0),
                (
                    F.col("turn_idx") * base_gap_s
                    + (h(F.col("conv_rank"), F.col("turn_idx")) % base_gap_s)
                ).cast("double"),
            ),
        )
        .withColumn(
            "role",
            F.when(F.col("turn_idx") == 0, F.lit("system"))
            .when(h(F.col("conv_rank"), F.col("turn_idx"), F.lit(1)) % 11 == 0, F.lit("tool"))
            .when(F.col("turn_idx") % 2 == 1, F.lit("user"))
            .otherwise(F.lit("assistant")),
        )
        .withColumn(
            "tool",
            F.when(
                (F.col("role").isin("tool", "assistant"))
                & (h(F.col("conv_rank"), F.col("turn_idx"), F.lit(2)) % 3 == 0),
                F.element_at(
                    F.array(*[F.lit(t) for t in TOOLS]),
                    (h(F.col("conv_rank"), F.col("turn_idx"), F.lit(3)) % len(TOOLS) + 1).cast("int"),
                ),
            ),
        )
        .withColumn(
            "text",
            F.concat(
                F.col("role"),
                F.lit(" turn "),
                F.col("turn_idx").cast("string"),
                F.lit(" of "),
                F.col("conv_id"),
                F.lit(": "),
                F.repeat(
                    F.lit("lorem ipsum dolor sit amet "),
                    (h(F.col("conv_rank"), F.col("turn_idx"), F.lit(4)) % 20).cast("int"),
                ),
            ),
        )
        .select(
            "conv_id",
            F.col("turn_idx").cast("int").alias("turn_idx"),
            "role",
            "text",
            "tool",
            "ts",
        )
    )
    return df


def synth_documents(
    spark: SparkSession,
    n_docs: int = 100_000,
    seed: int = 7,
    dup_frac: float = 0.3,
    cluster_size: int = 3,
    n_words: int = 40,
    vocab: int = 5000,
    boiler_every: int = 50,
) -> DataFrame:
    """Deterministic document corpus with known near-duplicate
    structure — the dedup-stack stress input (scripts/scale_soak.py).

    * the first ``dup_frac`` share of doc ids form near-dup clusters of
      ``cluster_size``: copies share their base's words with ONE word
      perturbed (word-3-gram Jaccard ≈ 0.85 for ``n_words=40``, above
      the 0.8 keep threshold);
    * every ``boiler_every``-th remaining doc carries the SAME
      boilerplate text — a pathological hot LSH bucket that must hit
      ``_cap_buckets`` instead of a quadratic pair join;
    * everything else is unique pseudo-text.

    Purely expression-based and seed-deterministic at any parallelism,
    like :func:`synth_transcripts`.  ``true_cluster`` carries the
    ground truth (drop it before feeding ``near_dedup``).
    """
    n_dup = (int(n_docs * dup_frac) // cluster_size) * cluster_size
    h = lambda *cols: F.abs(F.xxhash64(F.lit(seed), *cols))  # noqa: E731

    d = spark.range(n_docs).withColumnRenamed("id", "doc_id")
    is_dup = F.col("doc_id") < n_dup
    is_boiler = ~is_dup & (F.col("doc_id") % boiler_every == 0)
    base = (
        F.when(is_boiler, F.lit(-1).cast("long"))
        .when(is_dup, F.col("doc_id") - F.col("doc_id") % cluster_size)
        .otherwise(F.col("doc_id"))
    )
    d = d.withColumn("true_cluster", base)
    is_copy = is_dup & (F.col("doc_id") != F.col("true_cluster"))
    perturb_pos = (h(F.lit(1), F.col("doc_id")) % n_words).cast("int")
    d = d.withColumn("_copy", is_copy).withColumn("_pp", perturb_pos)
    words = F.transform(
        F.sequence(F.lit(0), F.lit(n_words - 1)),
        lambda j: F.when(
            F.col("_copy") & (j == F.col("_pp")),
            F.concat(F.lit("x"), (h(F.lit(2), F.col("doc_id"), j) % vocab).cast("string")),
        ).otherwise(
            F.concat(F.lit("w"), (h(F.col("true_cluster"), j) % vocab).cast("string"))
        ),
    )
    return d.select(
        "doc_id", "true_cluster", F.concat_ws(" ", words).alias("text")
    )


def write_transcripts(
    spark: SparkSession,
    path: str,
    n_convs: int = 1000,
    avg_turns: int = 40,
    seed: int = 42,
    **kw,
) -> None:
    """Materialize to parquet, range-clustered by ts within files via a
    (salted conv hash, ts) sort — the layout the north rule asks for.
    Iceberg is the production target; parquet is the sandbox fallback
    (no Iceberg runtime in this container)."""
    df = synth_transcripts(spark, n_convs=n_convs, avg_turns=avg_turns, seed=seed, **kw)
    (
        df.repartition(F.pmod(F.xxhash64("conv_id"), F.lit(32)))
        .sortWithinPartitions("conv_id", "turn_idx")
        .write.mode("overwrite")
        .parquet(path)
    )


def synth_embeddings(
    spark: SparkSession,
    n_vecs: int = 100_000,
    dims: int = 64,
    dup_stride: int = 10,
    n_dups: int = 2,
    eps: float = 0.01,
    seed: int = 7,
) -> DataFrame:
    """Deterministic embedding corpus with planted near-duplicates —
    the semantic-dedup stress input (scripts/scale_soak.py).

    Every ``dup_stride``-th id is a group head; the next ``n_dups`` ids
    carry the head's vector plus ``eps``-scaled noise (cosine >> 0.99);
    all other ids are independent pseudo-random vectors (near-orthogonal
    in ``dims`` dimensions — |cos| ~ 1/sqrt(dims)).  ``true_head``
    carries the ground truth (-1 for non-duplicates).  Purely
    expression-based and deterministic at any parallelism.
    """
    df = spark.range(n_vecs).select(F.col("id").alias("vec_id"))
    is_dup = (F.col("vec_id") % dup_stride) <= n_dups
    base = F.when(
        is_dup, F.col("vec_id") - (F.col("vec_id") % dup_stride)
    ).otherwise(F.col("vec_id"))
    df = df.withColumn("_base", base)
    idx = F.sequence(F.lit(0), F.lit(dims - 1))

    def _u(key, j, salt):
        h = F.xxhash64(
            F.concat_ws(":", key.cast("string"), j.cast("string"),
                        F.lit(f"{salt}{seed}"))
        )
        return (F.pmod(h, F.lit(1000003)) / 1000003.0) - 0.5

    vec = F.transform(
        idx,
        lambda j: (_u(F.col("_base"), j, "b")
                   + F.lit(eps) * _u(F.col("vec_id"), j, "n")).cast("float"),
    )
    return df.select(
        "vec_id",
        vec.alias("embedding"),
        F.when(
            is_dup & (F.col("vec_id") % dup_stride > 0), F.col("_base")
        ).otherwise(F.lit(-1)).cast("long").alias("true_head"),
    )
