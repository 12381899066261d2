"""Rank fusion and retrieval evaluation — the glue a hybrid search
stack needs on top of its individual rankers (BM25 in
``operators/search.py``, vector top-k in ``operators/similarity.py``):
reciprocal-rank fusion to combine heterogeneous rankings, and NDCG@k
to score any ranking against graded relevance.

Scale shapes:

* :func:`rrf_fuse` consumes RANKINGS — frames that are already
  top-``m``-per-query bounded by their producers — so every per-query
  frame it touches holds at most ``len(rankings) * m`` rows by
  contract.  The union + groupBy is map-side combinable; the final
  per-query window orders a candidate set whose size is independent
  of corpus size.  Nothing here ever sees the corpus.
* :func:`ndcg_at_k` is a pure aggregation over a top-k ranking joined
  with its relevance labels: one combinable groupBy(query), the IDCG
  series folds a <= k-element ``sequence`` per query row.

Cross-engine parity: RRF contributions ``1 / (k + rank)`` are exact
IEEE divisions of integers (bit-identical in Spark and DuckDB); the
per-candidate sum spans <= len(rankings) doubles and rounds to 6 dp
before ranking.  DCG discounts use ``log2`` in both engines with the
sum rounded AFTER aggregation; ranks order on the ROUNDED score with
an id tie-break (the hard-negatives lesson: near-ties are where
fusion candidates live).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["rrf_fuse", "ndcg_at_k", "rbo_overlap", "rbo_tail_weights"]


def rrf_fuse(
    rankings: list[DataFrame],
    *,
    q_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k_rrf: int = 60,
    top_k: int = 10,
) -> DataFrame:
    """Reciprocal-rank fusion of ``rankings`` (Cormack et al.'s
    ``score = sum_lists 1 / (k + rank)``, k = 60 by convention).

    Each input frame holds (``q_col``, ``id_col``, ``rank_col``) rows
    for the SAME query-id space — one frame per retrieval signal
    (lexical, dense, recency...).  A candidate absent from a list
    simply contributes nothing for that list; RRF needs no score
    calibration across signals, which is exactly why hybrid stacks
    use it.

    Returns (q, id, n_lists, best_rank, rrf_score, rank) with rank
    1..``top_k`` per query ordered by (rrf_score desc, id asc).
    ``rrf_score`` rounds to 6 dp BEFORE ranking (cross-engine tie
    discipline); ``n_lists`` counts the lists that returned the
    candidate, ``best_rank`` its best single-list rank.

    The final window partitions on the bare query id — safe HERE
    because inputs are top-m rankings by contract, so a query's
    candidate set is <= ``len(rankings) * m`` rows, never
    corpus-sized (contrast ``similarity._topk_per_query``, which
    ranks corpus-scale scores and must shard).
    """
    if not rankings:
        raise ValueError("rrf_fuse: need at least one ranking")
    if k_rrf < 1 or top_k < 1:
        raise ValueError("rrf_fuse: k_rrf and top_k must be >= 1")
    parts = [
        r.select(
            F.col(q_col).alias("_q"),
            F.col(id_col).alias("_i"),
            F.col(rank_col).cast("long").alias("_r"),
        )
        for r in rankings
    ]
    u = parts[0]
    for p in parts[1:]:
        u = u.unionAll(p)
    contrib = F.lit(1.0) / (F.lit(float(k_rrf)) + F.col("_r").cast("double"))
    fused = (
        u.select("_q", "_i", "_r", contrib.alias("_c"))
        .groupBy("_q", "_i")
        .agg(
            F.count(F.lit(1)).alias("n_lists"),
            F.min("_r").alias("best_rank"),
            F.round(F.sum("_c"), 6).alias("rrf_score"),
        )
    )
    w = Window.partitionBy("_q").orderBy(
        F.desc("rrf_score"), F.asc("_i")
    )
    return (
        fused.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(top_k))
        .select(
            F.col("_q").alias(q_col),
            F.col("_i").alias(id_col),
            "n_lists",
            "best_rank",
            "rrf_score",
            "rank",
        )
    )


def ndcg_at_k(
    ranked: DataFrame,
    totals: DataFrame,
    *,
    q_col: str = "q_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    n_rel_col: str = "n_rel",
    k: int = 10,
) -> DataFrame:
    """NDCG@``k`` per query over a top-k ``ranked`` frame.

    ``ranked`` holds (``q_col``, ``rank_col`` 1-based, ``rel_col``
    integer gain >= 0); ``totals`` holds one (``q_col``,
    ``n_rel_col``) row per query = the number of relevant items in
    the WHOLE corpus (the part the ranking alone cannot know — the
    ideal ranking needs it).  Binary relevance is the common case but
    any integer gain works; DCG uses the classic ``rel / log2(rank
    + 1)`` discount.

    Returns (q, n_rel, rel_at_k, dcg, idcg, ndcg) — ndcg NULL when
    the corpus holds no relevant item (0/0 is undefined, not 0; a
    mean over queries should skip those).  IDCG folds a
    ``sequence(1, least(k, n_rel))`` — <= k elements per query row,
    never data-scale; guarded because ``sequence(1, 0)`` yields a
    DESCENDING [1, 0] in Spark rather than an empty array.
    """
    if k < 1:
        raise ValueError("ndcg_at_k: k must be >= 1")
    gain = F.col(rel_col).cast("double")
    disc = F.log2(F.col(rank_col).cast("double") + F.lit(1.0))
    per_q = (
        ranked.filter(F.col(rank_col) <= int(k))
        .groupBy(q_col)
        .agg(
            F.sum(F.col(rel_col).cast("long")).alias("rel_at_k"),
            F.round(F.sum(gain / disc), 6).alias("dcg"),
        )
    )
    m = F.least(F.lit(int(k)).cast("long"), F.col(n_rel_col).cast("long"))
    idcg = F.when(
        m >= 1,
        F.round(
            F.aggregate(
                F.sequence(F.lit(1).cast("long"), m),
                F.lit(0.0),
                lambda acc, i: acc
                + F.lit(1.0) / F.log2(i.cast("double") + F.lit(1.0)),
            ),
            6,
        ),
    )
    # broadcast the AGGREGATE (non-preserved) side: a hint on the
    # preserved side of a left join is dead (build-left unsupported —
    # the DSIR lesson); per_q is one row per query, always small.
    joined = totals.select(
        F.col(q_col), F.col(n_rel_col).cast("long").alias("n_rel")
    ).join(F.broadcast(per_q), q_col, "left")
    return joined.select(
        q_col,
        "n_rel",
        F.coalesce("rel_at_k", F.lit(0).cast("long")).alias("rel_at_k"),
        F.coalesce("dcg", F.lit(0.0)).alias("dcg"),
        idcg.alias("idcg"),
        F.when(
            idcg.isNotNull(),
            F.round(
                F.coalesce(F.col("dcg"), F.lit(0.0)) / idcg, 6
            ),
        ).alias("ndcg"),
    )


def mrr_ap_at_k(
    ranked: DataFrame,
    totals: DataFrame,
    *,
    q_col: str = "q_id",
    rank_col: str = "rank",
    rel_col: str = "rel",
    n_rel_col: str = "n_rel",
    k: int = 10,
) -> DataFrame:
    """Reciprocal rank and average precision at ``k`` per query.

    Same input contract as :func:`ndcg_at_k` (top-k ``ranked`` frame +
    corpus-wide relevant counts in ``totals``), binary relevance:
    ``rel_col > 0`` is a hit.  Returns (q, n_rel, rel_at_k, rr, ap) —
    ``rr = 1/first_hit_rank`` (0.0 when the top-k holds no hit),
    ``ap = (sum over hit positions of precision@rank) / min(k, n_rel)``
    (the TREC AP@k convention); both NULL when the corpus holds no
    relevant item at all.  The precision prefix-count window partitions
    by query over <= k rows — bounded by contract, never data-scale.
    The hit-position sum rounds to 6 dp before the final division
    (the NDCG discipline: <= k exact-integer ratios per query).
    """
    if k < 1:
        raise ValueError("mrr_ap_at_k: k must be >= 1")
    hit = F.when(F.col(rel_col).cast("long") > 0, 1).otherwise(0)
    w = Window.partitionBy(q_col).orderBy(rank_col)
    cum = (
        ranked.filter(F.col(rank_col) <= int(k))
        .withColumn("_h", hit)
        .withColumn("_cr", F.sum("_h").over(w))
    )
    per_q = cum.groupBy(q_col).agg(
        F.sum("_h").alias("rel_at_k"),
        F.min(F.when(F.col("_h") == 1, F.col(rank_col))).alias("_fr"),
        F.round(
            F.sum(
                F.when(
                    F.col("_h") == 1,
                    F.col("_cr").cast("double")
                    / F.col(rank_col).cast("double"),
                )
            ),
            6,
        ).alias("_apnum"),
    )
    joined = totals.select(
        F.col(q_col), F.col(n_rel_col).cast("long").alias("n_rel")
    ).join(F.broadcast(per_q), q_col, "left")
    has_rel = F.col("n_rel") > 0
    return joined.select(
        q_col,
        "n_rel",
        F.coalesce("rel_at_k", F.lit(0).cast("long")).alias("rel_at_k"),
        F.when(
            has_rel,
            F.coalesce(
                F.round(F.lit(1.0) / F.col("_fr").cast("double"), 6),
                F.lit(0.0),
            ),
        ).alias("rr"),
        F.when(
            has_rel,
            F.round(
                F.coalesce("_apnum", F.lit(0.0))
                / F.least(
                    F.lit(int(k)).cast("long"), F.col("n_rel")
                ).cast("double"),
                6,
            ),
        ).alias("ap"),
    )


def rbo_tail_weights(k: int, p: float) -> list[float]:
    """``T[m] = sum_{d=m..k} p^(d-1) / d`` for m = 1..k — the total
    RBO weight an item earns when it enters both prefixes at depth
    ``m``.  Computed DRIVER-SIDE in exact python floats and shipped
    as plan literals, so no runtime ``pow`` can diverge across
    engines (the multi_touch lesson, taken one step further)."""
    terms = [p ** (d - 1) / d for d in range(1, k + 1)]
    out = []
    acc = 0.0
    for m in range(k, 0, -1):
        acc += terms[m - 1]
        out.append(acc)
    return out[::-1]


def rbo_overlap(
    a: DataFrame,
    b: DataFrame,
    *,
    q_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
    k: int = 10,
    p: float = 0.9,
) -> DataFrame:
    """Rank-biased overlap (Webber et al.) between two top-``k``
    rankings, truncated at depth ``k`` (no extrapolation): ``RBO =
    (1-p) * sum_{d=1..k} p^(d-1) * |A_d ∩ B_d| / d``.  The agreement
    measure a hybrid stack uses to decide whether two rankers are
    redundant or complementary (an RRF input that always agrees adds
    nothing).

    Identity used: an item with ranks ``ra`` in A and ``rb`` in B
    (both <= k) joins every prefix intersection from depth
    ``max(ra, rb)`` on, so it contributes the precomputed tail weight
    ``T[max(ra, rb)]`` — one broadcast-size literal array lookup per
    COMMON item instead of a k-way prefix explode.  Per query the
    work is an equi-join of two <= k-row lists and one combinable
    aggregate; queries in either input with no overlap report 0.

    Returns (q, overlap_at_k, rbo) — rbo in [0, 1], 6-dp rounded.
    """
    if k < 1:
        raise ValueError("rbo_overlap: k must be >= 1")
    if not (0.0 < p < 1.0):
        raise ValueError("rbo_overlap: p must be in (0, 1)")
    tw = rbo_tail_weights(k, p)
    t_arr = F.array(*[F.lit(float(x)) for x in tw])
    sa = a.filter(F.col(rank_col) <= k).select(
        F.col(q_col).alias("_q"),
        F.col(id_col).alias("_i"),
        F.col(rank_col).cast("int").alias("_ra"),
    )
    sb = b.filter(F.col(rank_col) <= k).select(
        F.col(q_col).alias("_q"),
        F.col(id_col).alias("_i"),
        F.col(rank_col).cast("int").alias("_rb"),
    )
    common = sa.join(sb, ["_q", "_i"]).select(
        "_q",
        F.element_at(t_arr, F.greatest("_ra", "_rb")).alias("_t"),
    )
    per_q = common.groupBy("_q").agg(
        F.count(F.lit(1)).alias("overlap_at_k"),
        F.round(F.lit(1.0 - p) * F.sum("_t"), 6).alias("rbo"),
    )
    qs = (
        sa.select("_q").unionAll(sb.select("_q")).distinct()
    )
    return (
        qs.join(F.broadcast(per_q), "_q", "left")
        .select(
            F.col("_q").alias(q_col),
            F.coalesce("overlap_at_k", F.lit(0).cast("long")).alias(
                "overlap_at_k"
            ),
            F.coalesce("rbo", F.lit(0.0)).alias("rbo"),
        )
    )
