"""Record linkage: blocked fuzzy self-matching on a name/string key
(classic blocking + exact Levenshtein verification — Fellegi-Sunter
style candidate generation without the probabilistic model).

Reference analog: the reference's sample/category matching utilities
(``lib/stats`` cross-tab kernels); the Spark-first shape is a
block-key equi-join, never a cross join.

Scale shape: candidates are pairs agreeing on a deterministic block
key (e.g. a name prefix, a phonetic code, a length band) — the join
is an equi-join on that key, so work is sum of block^2, not corpus^2.
Recall is governed by the block choice (a true match split across
blocks is missed — the standard blocking tradeoff; run multiple
passes with different keys for higher recall).  Verification is
JVM-side ``levenshtein`` (identical classic DP metric in DuckDB).
An optional fail-fast guard bounds the hottest block so a degenerate
key (constant prefix) raises instead of silently planning a
quadratic join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from grass_spark.operators.parallel import spread


def blocked_fuzzy_pairs(
    df: DataFrame,
    *,
    id_col: str,
    name_col: str,
    block: Column | int,
    max_dist: int = 1,
    max_block: int | None = None,
) -> DataFrame:
    """All pairs ``(id_a, id_b, dist)`` with the same block key and
    ``levenshtein(name_a, name_b) <= max_dist`` (``id_a < id_b``).

    ``block`` is either a Column expression over ``df``'s columns or
    an int N meaning "first N characters of name".  ``max_block``
    (optional) raises if any block exceeds that many rows — one extra
    bounded aggregate over the block census, fail-fast by contract
    (mirrors dedup_clusters' raise-don't-warn discipline).
    """
    if max_dist < 0:
        raise ValueError("blocked_fuzzy_pairs: max_dist must be >= 0")
    # Prefix blocking (int block): every pair in a block shares the
    # block key as an exact string prefix, and unit-cost Levenshtein is
    # invariant under common-prefix removal (lev(p+u, p+v) == lev(u, v)
    # — the classic trim step of production edit-distance kernels), so
    # the DP only needs the suffixes.  Combined with the bounded-band
    # kernel below this turns an O(|name|^2) DP per candidate pair into
    # O(|suffix| * max_dist).
    prefix_blocked = isinstance(block, int)
    bk = F.substring(F.col(name_col), 1, block) if prefix_blocked else block
    nm = (
        F.col(name_col).substr(F.lit(block + 1), F.length(name_col))
        if prefix_blocked
        else F.col(name_col)
    )
    # the pair verification streams the probe side through the block
    # hash relation — spread it so a single-row-group input doesn't
    # serialize every candidate pair onto one task
    base = spread(
        df.select(
            F.col(id_col).alias("_id"),
            nm.alias("_nm"),
            bk.alias("_bk"),
        ).where(F.col("_bk").isNotNull())
    )

    if max_block is not None:
        hot = (
            base.groupBy("_bk")
            .agg(F.count(F.lit(1)).alias("_c"))
            .agg(F.max("_c").alias("_mx"))
            .collect()[0]["_mx"]
        )
        if hot is not None and hot > max_block:
            raise ValueError(
                f"blocked_fuzzy_pairs: hottest block has {hot} rows "
                f"(> max_block={max_block}) — the self-join would be "
                "quadratic in it; choose a finer block key"
            )

    a = base.select(
        F.col("_bk"),
        F.col("_id").alias("id_a"),
        F.col("_nm").alias("_nma"),
    )
    b = base.select(
        F.col("_bk"),
        F.col("_id").alias("id_b"),
        F.col("_nm").alias("_nmb"),
    )
    # Bounded-band kernel: levenshtein(a, b, threshold) runs the banded
    # DP (O(len * threshold)) and returns -1 when the distance exceeds
    # the threshold, the true distance otherwise — so `>= 0` is exactly
    # the `dist <= max_dist` predicate and the surviving values are the
    # exact distances.
    dist = F.levenshtein("_nma", "_nmb", int(max_dist))
    # presentation order is the CALLER's concern (r05 VERDICT #7) —
    # the operator emits the pair set unsorted
    return (
        a.join(b, "_bk")
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dist.alias("dist"))
        .where(F.col("dist") >= 0)
    )
