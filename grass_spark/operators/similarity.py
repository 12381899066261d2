"""Similarity search over embedding columns (``array<float>``).

* :func:`cosine_topk` — brute-force exact top-k: broadcast the query
  set, cross join, JVM-side dot product (``zip_with`` + ``aggregate``
  higher-order functions — no UDF), window rank.  The baseline: exact,
  one pass over the corpus, scales linearly with |corpus|x|queries|.
* :func:`hyperplane_lsh_buckets` / :func:`lsh_topk` — the scale path:
  random-hyperplane (SRP) buckets; candidates = same bucket in any of
  ``n_tables`` tables, then exact cosine only on candidates.  Planes
  are deterministic (seeded numpy) and shipped as literal arrays, so
  bucketing is a pure column expression.
* :func:`embedding_neardup` — near-duplicate pairs (cosine >= threshold)
  via the LSH buckets, the embedding leg of the dedup suite.

At 100 TB the corpus never collects: bucketing is map-side, the only
shuffles are the bucket equi-join and the final top-k window, and the
broadcast side is just the query batch / plane matrix.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from grass_spark.functions.litexpr import darr, dlit, dot_sql


def _as_double(c) -> Column:
    return F.transform(c, lambda x: x.cast("double"))


def dot(a, b) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )


def l2norm(c) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(c, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
    ))


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str | None = None,
    q_vec_col: str | None = None,
    salts: int = 16,
) -> DataFrame:
    """Exact top-k neighbors per query (query side broadcast)."""
    q_id_col = q_id_col or id_col
    q_vec_col = q_vec_col or vec_col
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("_e")
    )
    q = queries.select(
        F.col(q_id_col).alias("q_id"), _as_double(q_vec_col).alias("_qe")
    )
    pairs = F.broadcast(q).crossJoin(c).filter(F.col("neighbor_id") != F.col("q_id"))
    sim = dot("_qe", "_e") / (l2norm("_qe") * l2norm("_e"))
    return _topk_per_query(
        pairs.select("q_id", "neighbor_id", sim.alias("cosine")), k, salts
    )


def _topk_per_query(scored: DataFrame, k: int, salts: int = 16) -> DataFrame:
    """Exact top-``k`` per ``q_id`` over (q_id, neighbor_id, cosine)
    rows — TWO-STAGE: a window over ``(q_id, shard-of-neighbor)``
    keeps a local top-``k`` (each task sees ~|corpus|/salts rows per
    query), then the final window ranks only the ``<= salts*k``
    survivors.  A bare ``partitionBy(q_id)`` window would funnel every
    scored corpus row for one query into ONE task — |corpus| rows per
    task at brute-force scale.  Stage 1 is exact-superset for the
    total order (cosine DESC, neighbor ASC), so the composition equals
    the single-window answer bit-for-bit (same machinery as
    operators/caps.py; pinned by tests/test_operators_ext.py)."""
    shard = F.pmod(F.xxhash64("neighbor_id"), F.lit(salts)).cast("int")
    local = Window.partitionBy("q_id", "_s").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    final = Window.partitionBy("q_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("_s", shard)
        .withColumn("_rn", F.row_number().over(local))
        .filter(F.col("_rn") <= k)
        .withColumn("rank", F.row_number().over(final))
        .filter(F.col("rank") <= k)
        .drop("_s", "_rn")
    )


def hard_negatives(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    q_id_col: str | None = None,
    q_vec_col: str | None = None,
    q_label_col: str | None = None,
    salts: int = 16,
) -> DataFrame:
    """Contrastive hard-negative mining: for each query, the ``k``
    most-cosine-similar corpus vectors whose ``label_col`` DIFFERS
    from the query's — the near-the-boundary negatives a contrastive
    or reranker trainer wants (DPR / Contriever recipe: negatives that
    look like positives).

    Ranks on the 6-dp-ROUNDED cosine (ties -> smallest neighbor id):
    JVM vs libm fused-multiply differences flip unrounded ranks at
    near-ties, and a near-tie is exactly where hard negatives live.
    Output: (q_id, rank, neighbor_id, label, cosine).

    Scale shape: query side broadcast (the query set is the small side
    by contract), label exclusion is a scan-stage predicate BEFORE any
    ranking work, and top-k runs the two-stage sharded selection
    (:func:`_topk_per_query`) — no per-query single-task window.  For
    corpora past brute-force reach, mine within IVF probe cells first
    (:func:`ivf_topk`) and re-rank exactly.
    """
    q_id_col = q_id_col or id_col
    q_vec_col = q_vec_col or vec_col
    q_label_col = q_label_col or label_col
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(vec_col).alias("_e"),
        F.col(label_col).alias("label"),
    )
    q = queries.select(
        F.col(q_id_col).alias("q_id"),
        _as_double(q_vec_col).alias("_qe"),
        F.col(q_label_col).alias("_ql"),
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("label") != F.col("_ql"))
    )
    sim = F.round(dot("_qe", "_e") / (l2norm("_qe") * l2norm("_e")), 6)
    topk = _topk_per_query(
        pairs.select("q_id", "neighbor_id", "label", sim.alias("cosine")),
        k, salts,
    )
    return topk.select("q_id", "rank", "neighbor_id", "label", "cosine")


def mrl_rerank(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    trunc_dims: int,
    shortlist: int = 50,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    q_id_col: str | None = None,
    q_vec_col: str | None = None,
    salts: int = 16,
) -> DataFrame:
    """Matryoshka coarse-to-fine retrieval: shortlist ``shortlist``
    candidates per query by cosine over the FIRST ``trunc_dims``
    dimensions (MRL-style truncated embeddings are trained so prefixes
    stay meaningful), then re-rank the shortlist EXACTLY on the full
    vector and keep top ``k``.

    Returns (q_id, rank, neighbor_id, cosine, cosine_trunc) — rank by
    (full cosine desc, neighbor asc), both cosines 6-dp rounded BEFORE
    their respective rankings (cross-engine tie discipline; the
    shortlist membership itself must be deterministic or the re-rank
    input differs between engines).

    Scale shape: stage 1 scores ``trunc_dims``-element folds instead
    of full-width ones (the arithmetic saving is the point of MRL) and
    selects via the two-stage sharded top-m (:func:`_topk_per_query`);
    stage 2 touches only |queries| * shortlist rows — it fetches full
    vectors by joining the shortlist back to the corpus with the
    SHORTLIST as the broadcast build side, so the corpus is probed,
    never shuffled.  The final window orders <= ``shortlist`` rows per
    query.  Unlike PQ/IVF this is a lossy-then-exact cascade with no
    trained artifact — the candidate-covers-truth caveat of
    ``operators/pq.py`` applies identically: guarantee recall by
    sizing ``shortlist``, verified against brute force in tests.
    """
    if trunc_dims < 1:
        raise ValueError("mrl_rerank: trunc_dims must be >= 1")
    if shortlist < k:
        raise ValueError("mrl_rerank: shortlist must be >= k")
    q_id_col = q_id_col or id_col
    q_vec_col = q_vec_col or vec_col
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("_e")
    ).localCheckpoint(eager=False)  # scored in stage 1 AND probed in
    # stage 2 — two consumers of one scan (the bm25 census lesson)
    q = queries.select(
        F.col(q_id_col).alias("q_id"), _as_double(q_vec_col).alias("_qe")
    ).localCheckpoint(eager=False)
    ct = F.slice("_e", 1, int(trunc_dims))
    qt = F.slice("_qe", 1, int(trunc_dims))
    pairs = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select(
            "q_id",
            "neighbor_id",
            F.round(
                dot(qt, ct) / (l2norm(qt) * l2norm(ct)), 6
            ).alias("cosine"),
        )
    )
    short = _topk_per_query(pairs, int(shortlist), salts).select(
        "q_id", "neighbor_id", F.col("cosine").alias("cosine_trunc")
    )
    # full-vector re-rank: shortlist (|q| * shortlist rows) is the
    # broadcast build side against the corpus probe + the query side
    refetched = F.broadcast(short).join(c, "neighbor_id").join(
        F.broadcast(q), "q_id"
    )
    full = F.round(
        dot("_qe", "_e") / (l2norm("_qe") * l2norm("_e")), 6
    )
    w = Window.partitionBy("q_id").orderBy(
        F.desc("cosine"), F.asc("neighbor_id")
    )
    return (
        refetched.select(
            "q_id", "neighbor_id", "cosine_trunc", full.alias("cosine")
        )
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= int(k))
        .select("q_id", "rank", "neighbor_id", "cosine", "cosine_trunc")
    )


def _planes(dims: int, n_planes: int, seed: int) -> list[list[float]]:
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n_planes, dims)).tolist()


def hyperplane_lsh_buckets(
    df: DataFrame,
    dims: int,
    *,
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 3,
    seed: int = 1234,
) -> DataFrame:
    """Add (table_idx, bucket) — sign pattern of ``n_planes`` random
    hyperplanes per table.  Output has one row per (input row, table)."""
    out = None
    e = _as_double(vec_col)
    for t in range(n_tables):
        planes = _planes(dims, n_planes, seed + t)
        bucket = F.lit(0).cast("long")
        for p, plane in enumerate(planes):
            lit_plane = F.array(*[F.lit(float(x)) for x in plane])
            bit = (dot(e, lit_plane) > 0).cast("long")
            bucket = bucket.bitwiseOR(F.shiftleft(bit, p))
        part = df.withColumn("table_idx", F.lit(t)).withColumn("bucket", bucket)
        out = part if out is None else out.unionByName(part)
    return out


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    dims: int,
    k: int = 10,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 12,
    n_tables: int = 3,
    seed: int = 1234,
) -> DataFrame:
    """Approximate top-k: exact cosine over same-bucket candidates only."""
    cb = hyperplane_lsh_buckets(
        corpus, dims, vec_col=vec_col, n_planes=n_planes, n_tables=n_tables, seed=seed
    ).select(
        F.col(id_col).alias("neighbor_id"),
        _as_double(vec_col).alias("_e"),
        "table_idx", "bucket",
    )
    qb = hyperplane_lsh_buckets(
        queries, dims, vec_col=vec_col, n_planes=n_planes, n_tables=n_tables, seed=seed
    ).select(
        F.col(id_col).alias("q_id"),
        _as_double(vec_col).alias("_qe"),
        "table_idx", "bucket",
    )
    cand = (
        F.broadcast(qb).join(cb, on=["table_idx", "bucket"])
        .filter(F.col("neighbor_id") != F.col("q_id"))
        .select("q_id", "_qe", "neighbor_id", "_e")
        .distinct()
    )
    sim = dot("_qe", "_e") / (l2norm("_qe") * l2norm("_e"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.select("q_id", "neighbor_id", sim.alias("cosine"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def embedding_neardup(
    df: DataFrame,
    dims: int,
    threshold: float = 0.95,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_planes: int = 14,
    n_tables: int = 4,
    seed: int = 99,
) -> DataFrame:
    """Near-duplicate pairs (cosine >= threshold) via SRP-LSH buckets."""
    b = hyperplane_lsh_buckets(
        df, dims, vec_col=vec_col, n_planes=n_planes, n_tables=n_tables, seed=seed
    ).select(
        F.col(id_col).alias("id"), _as_double(vec_col).alias("e"),
        "table_idx", "bucket",
    )
    a = b.select(
        F.col("id").alias("id_a"), F.col("e").alias("e_a"), "table_idx", "bucket"
    )
    c = b.select(
        F.col("id").alias("id_b"), F.col("e").alias("e_b"), "table_idx", "bucket"
    )
    pairs = (
        a.join(c, on=["table_idx", "bucket"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", "e_a", "e_b")
        .distinct()
    )
    sim = dot("e_a", "e_b") / (l2norm("e_a") * l2norm("e_b"))
    return pairs.select("id_a", "id_b", sim.alias("cosine")).filter(
        F.col("cosine") >= threshold
    )


# ---------------------------------------------------------------------
# IVF (inverted-file) ANN — coarse k-means quantizer + cell probe
# ---------------------------------------------------------------------


def train_ivf_centroids(
    df: DataFrame,
    dims: int,
    n_centroids: int = 16,
    *,
    vec_col: str = "embedding",
    sample: int = 2048,
    iters: int = 10,
    seed: int = 7,
) -> list[list[float]]:
    """Train the coarse quantizer: numpy k-means on a driver-side
    sample (the sample is tiny and bounded; the corpus never collects).
    Deterministic for a given seed — the sample is the ``sample``
    smallest rows by ``xxhash64(vector, seed)``, which is invariant
    under partition layout (a bare ``limit()`` is not: it takes
    whichever rows arrive first)."""
    rows = (
        df.select(vec_col)
        .orderBy(F.xxhash64(F.col(vec_col), F.lit(seed)))
        .limit(sample)
        .collect()
    )
    x = np.array([list(r[0]) for r in rows], dtype=np.float64)
    rng = np.random.default_rng(seed)
    cents = x[rng.choice(len(x), size=min(n_centroids, len(x)), replace=False)]
    for _ in range(iters):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d.argmin(axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = x[m].mean(axis=0)
    return cents.tolist()


def _cell_scored_sql(vec: str, centroids: list[list[float]],
                     idx_field: str, neg: bool) -> str:
    """SQL text of the (score, ±ordinal) struct array over centroid
    literals — one F.expr parse instead of O(k*dims) py4j calls (see
    functions/litexpr.py; same tree as the Column builder it
    replaces)."""
    parts = []
    for i, c in enumerate(centroids):
        half_norm = sum(v * v for v in c) / 2.0
        parts.append(
            f"named_struct('s', {dot_sql(vec, darr(c))} - "
            f"{dlit(half_norm)}, '{idx_field}', {-i if neg else i})"
        )
    return "array(" + ", ".join(parts) + ")"


def _cell_of(vec: str, centroids: list[list[float]]) -> Column:
    """argmin distance over centroid literals == argmax(dot - |c|^2/2);
    pure column arithmetic, broadcast-free (literals travel in the
    plan).  ``vec`` is the NAME of the vector column."""
    arr = _cell_scored_sql(vec, centroids, "ni", neg=True)
    return F.expr(f"CAST(-(array_max({arr}).ni) AS INT)")


def _top_cells(vec: str, centroids: list[list[float]],
               nprobe: int) -> Column:
    """Array of the nprobe best cell ids for a query vector column
    named ``vec``."""
    arr = _cell_scored_sql(vec, centroids, "i", neg=False)
    return F.expr(
        f"transform(slice(reverse(array_sort({arr})), 1, {int(nprobe)}), "
        "s -> s.i)"
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids: list[list[float]],
    k: int = 10,
    nprobe: int = 3,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """IVF search: corpus rows live in their nearest-centroid cell
    (equi-join key — one shuffle on a small int); each query probes its
    ``nprobe`` best cells and ranks exact cosine within candidates."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), _as_double(vec_col).alias("_e")
    ).withColumn("cell", _cell_of("_e", centroids))
    q = queries.select(
        F.col(id_col).alias("q_id"), _as_double(vec_col).alias("_qe")
    ).withColumn(
        "cell", F.explode(_top_cells("_qe", centroids, nprobe))
    )
    cand = (
        F.broadcast(q).join(c, on="cell")
        .filter(F.col("neighbor_id") != F.col("q_id"))
    )
    sim = dot("_qe", "_e") / (l2norm("_qe") * l2norm("_e"))
    w = Window.partitionBy("q_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.select("q_id", "neighbor_id", sim.alias("cosine"))
        .distinct()
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )
