"""Exact set-similarity self-join (Jaccard >= threshold) with prefix
filtering (Bayardo et al., WWW'07 "Scaling Up All Pairs Similarity
Search"; Chaudhuri et al. ICDE'06 SSJoin) — the EXACT counterpart of
the MinHash/LSH approximate path in :mod:`operators.dedup`.

Reference analog: the reference's sample-matching / overlap kernels
(``lib/stats`` cross-tabulation family) — this is the set-overlap
flavour re-expressed as a bounded-candidate distributed join.

Scale shape
-----------
The naive all-pairs join is quadratic; prefix filtering makes the
candidate stage output-bounded while staying EXACT (no false
negatives):

* tokens order by GLOBAL rarity ``(freq, tok)`` — but no global rank
  window is ever built: each doc sorts its OWN bounded token array by
  a joined-in frequency, so ordering cost is per-row, not corpus-wide.
* a pair with Jaccard >= t must share a token inside both docs'
  (|x| - ceil(t*|x|) + 1)-token prefixes (standard prefix-filter
  lemma); we take ``|x| - floor(t*|x|) + 1`` so double rounding in
  ``t*|x|`` can only WIDEN the prefix — extra candidates are culled by
  exact verification, never the reverse.
* candidates come from equi-joining prefix tokens only — the rarest
  tokens of each doc — so bucket sizes are governed by the tail of the
  token-frequency distribution, not the corpus size.
* verification is one ``array_intersect`` per candidate pair over the
  two bounded token arrays (JVM-side, no Python).

The token frame feeds two consumers (frequency census + re-join) and
the per-doc set frame feeds three (prefix explode + both verify
joins) — each goes through the size-gated ``stage_checkpoint`` (the
multi-consumer-census discipline at soak scale; at MB-scale inputs
the checkpoint job costs more than the recompute it saves — measured
r06, OPTIMIZATION_r06.md).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from grass_spark.operators.parallel import spread, stage_checkpoint


def setsim_pairs(
    df: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    tokens_col: str | None = None,
    threshold: float = 0.8,
    checkpoint: bool = True,
) -> DataFrame:
    """All pairs ``(id_a, id_b, n_inter, n_union, jaccard)`` with
    whitespace-token-set Jaccard >= ``threshold`` (``id_a < id_b``).

    EXACT: prefix filtering only prunes candidates that provably
    cannot reach the threshold; the emitted jaccard is
    ``round(|A∩B| / |A∪B|, 6)`` from exact integer set sizes (the
    threshold compare runs on the UNROUNDED quotient — identical
    doubles from identical integers in any engine).

    ``tokens_col`` (optional) names a pre-computed ``array<string>``
    column of set elements — e.g. word n-gram shingles from
    :func:`operators.dedup.shingles_of_words` — used INSTEAD of
    whitespace-splitting ``text_col``.  Duplicate elements are
    deduped either way (set semantics).

    ``checkpoint=False`` keeps the plan inspectable for tests.
    """
    if not 0.0 < threshold <= 1.0:
        raise ValueError("setsim_pairs: threshold must be in (0, 1]")

    elems = (
        F.col(tokens_col)
        if tokens_col is not None
        else F.filter(F.split(F.col(text_col), " "), lambda x: x != "")
    )
    # hashed-token scale path (PLANS.md round-5 note, now implemented):
    # the census, rarity sort and prefix candidate join all run on the
    # xxhash64 of the token — int64 keys instead of ~25 B shingle
    # strings, cutting those shuffles' bytes and making the candidate
    # equi-join an integer probe.  EXACTNESS IS PRESERVED: the prefix
    # lemma holds for ANY consistent global total order (here
    # (freq, hash, tok) — still total thanks to the string tiebreak),
    # a 64-bit collision merely merges two census counts / prefix
    # buckets, which can only ADD candidates, and verification below
    # still intersects the ORIGINAL string arrays.
    toks = spread(df).select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(elems)).alias("_tok"),
    ).withColumn("_h", F.xxhash64("_tok"))
    if checkpoint:
        toks = stage_checkpoint(toks)  # census + re-join

    freq = toks.groupBy("_h").agg(F.count(F.lit(1)).alias("_cnt"))

    # per-doc token array sorted rarest-first by the global
    # (freq, hash, tok) total order — sort_array on the struct is
    # lexicographic; `_pref` keeps only the hashes of the prefix slots
    sets = (
        toks.join(freq, "_h")
        .groupBy("_id")
        .agg(
            F.sort_array(
                F.collect_list(F.struct("_cnt", "_h", "_tok"))
            ).alias("_st")
        )
        .select(
            "_id",
            F.transform("_st", lambda s: s["_tok"]).alias("_toks"),
            F.transform("_st", lambda s: s["_h"]).alias("_hs"),
        )
        .select("_id", "_toks", "_hs", F.size("_toks").alias("_n"))
    )
    if checkpoint:
        sets = stage_checkpoint(sets)  # prefix + 2 verifies

    # conservative prefix: n - floor(t*n) + 1 >= n - ceil(t*n) + 1
    plen = F.greatest(
        F.lit(1),
        (F.col("_n") - F.floor(F.lit(float(threshold)) * F.col("_n"))
         + F.lit(1)).cast("int"),
    )
    pref = sets.select(
        "_id", F.explode(F.slice("_hs", F.lit(1), plen)).alias("_ph")
    )

    cand = (
        pref.alias("a")
        .join(pref.alias("b"), "_ph")
        .where(F.col("a._id") < F.col("b._id"))
        .select(
            F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b")
        )
        .distinct()
    )

    sa = sets.select(
        F.col("_id").alias("id_a"),
        F.col("_toks").alias("_ta"),
        F.col("_n").alias("_na"),
    )
    sb = sets.select(
        F.col("_id").alias("id_b"),
        F.col("_toks").alias("_tb"),
        F.col("_n").alias("_nb"),
    )
    inter = F.size(F.array_intersect("_ta", "_tb"))
    union = F.col("_na") + F.col("_nb") - inter
    jac = inter.cast("double") / union.cast("double")
    return (
        cand.join(sa, "id_a")
        .join(sb, "id_b")
        .where(jac >= F.lit(float(threshold)))
        .select(
            "id_a",
            "id_b",
            inter.cast("long").alias("n_inter"),
            union.cast("long").alias("n_union"),
            F.round(jac, 6).alias("jaccard"),
        )
        .orderBy("id_a", "id_b")
    )
