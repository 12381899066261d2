"""Deterministic corpus sampling + mixture targeting.

Training-data pipelines downsample sources/languages to hit a target
mixture.  Random sampling is not reproducible across runs or engines;
the standard fix is HASH sampling: a document is kept iff a uniform
deterministic hash of its id falls below the group's keep rate.  The
hash here is the first 8 hex digits of md5 (portable — any engine
reproduces the exact same sample; DuckDB oracle-gated).

Scale shape (100 TB corpus):

* ``hash_sample`` with a dict of rates is a pure column filter — no
  shuffle at all, evaluated in the scan's codegen stage;
* with a rates *DataFrame* (e.g. ``mixture_rates`` output, which is
  group-cardinality tiny) the rates side is **broadcast**, so the
  corpus still never shuffles;
* ``mixture_rates`` is one map-side-combined ``groupBy`` over the
  group column (bounded cardinality) — driver-safe by construction.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def uniform_hash(id_col: Column, salt: str = "") -> Column:
    """Deterministic uniform double in [0, 1) from ``md5(id ":" salt)``.

    First 8 hex digits as a uint32 over 2^32 — exact in a double, and
    bit-identical in any engine with md5 (the DuckDB twin is
    ``CAST('0x' || substr(md5(id || ':' || salt), 1, 8) AS UBIGINT) /
    4294967296.0``).
    """
    h = F.md5(F.concat_ws(":", id_col.cast("string"), F.lit(salt)))
    return (
        F.conv(F.substring(h, 1, 8), 16, 10).cast("double") / F.lit(2.0**32)
    )


def temperature_rates(
    df: DataFrame,
    alpha: float,
    budget_tokens: int,
    *,
    group_col: str = "lang",
    weight_col: str | Column = "n_tokens",
) -> DataFrame:
    """Per-group keep rates for a TEMPERATURE-flattened mixture —
    the multilingual sampling rule (XLM-R / mT5 style):
    ``share_g ∝ tokens_g^alpha``.  ``alpha=1`` reproduces natural
    proportions, ``alpha -> 0`` approaches uniform across groups —
    low-resource groups are up-weighted without hand-written targets.

    Same output schema and downstream contract as
    :func:`mixture_rates` (feed :func:`hash_sample`); rates are
    up-capped at 1 (no up-sampling).  The share rounds to 6 dp before
    the rate arithmetic: ``pow`` is libm (last-ulp engine drift) but
    everything after the round is exact IEEE, so any engine reproduces
    the identical sample.  The group frame is group-cardinality-sized;
    the 1-row total broadcasts.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    g = (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(w).cast("bigint").alias("tokens"),
        )
        .withColumn(
            "_p", F.pow(F.col("tokens").cast("double"), F.lit(float(alpha)))
        )
    )
    tot = g.agg(F.sum("_p").alias("_t"))
    return (
        g.crossJoin(F.broadcast(tot))
        .withColumn("target_share", F.round(F.col("_p") / F.col("_t"), 6))
        .withColumn(
            "keep_rate",
            F.least(
                F.lit(1.0),
                F.col("target_share") * F.lit(float(budget_tokens))
                / F.col("tokens"),
            ),
        )
        .select(group_col, "n_docs", "tokens", "target_share", "keep_rate")
    )


def hash_sample(
    df: DataFrame,
    rates: float | dict[str, float] | DataFrame,
    *,
    id_col: str = "doc_id",
    group_col: str = "lang",
    salt: str = "",
    rate_col: str = "keep_rate",
) -> DataFrame:
    """Keep rows whose uniform hash < the (per-group) keep rate.

    ``rates`` may be a global float, a ``{group value: rate}`` dict
    (groups absent from the dict are DROPPED — rate 0), or a tiny
    (group, rate) DataFrame such as :func:`mixture_rates` output
    (broadcast-joined; absent groups drop).  Passes all input columns
    through unchanged.
    """
    u = uniform_hash(F.col(id_col), salt)
    if isinstance(rates, DataFrame):
        rdf = rates.select(group_col, F.col(rate_col).alias("_rate"))
        return (
            df.join(F.broadcast(rdf), group_col)
            .filter(u < F.col("_rate"))
            .drop("_rate")
            .select(*df.columns)
        )
    if isinstance(rates, dict):
        expr = F.lit(0.0)
        for g, r in rates.items():
            expr = F.when(F.col(group_col) == g, F.lit(float(r))).otherwise(expr)
        return df.filter(u < expr)
    return df.filter(u < F.lit(float(rates)))


def mixture_rates(
    df: DataFrame,
    targets: dict[str, float],
    budget_tokens: int,
    *,
    group_col: str = "lang",
    weight_col: str | Column = "n_tokens",
) -> DataFrame:
    """Per-group keep rates that realize a target mixture in expectation.

    ``targets`` maps group values to token SHARES of a ``budget_tokens``
    output corpus; each group's rate is ``min(1, share * budget /
    group_tokens)`` (a group smaller than its allocation is kept whole
    — the classic up-capped allocation; no up-sampling).  Returns one
    tiny row per group: ``(group, n_docs, tokens, target_share,
    keep_rate)``.
    """
    w = F.col(weight_col) if isinstance(weight_col, str) else weight_col
    share = F.lit(0.0)
    for g, s in targets.items():
        share = F.when(F.col(group_col) == g, F.lit(float(s))).otherwise(share)
    return (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(w).cast("bigint").alias("tokens"),
        )
        .withColumn("target_share", share)
        .withColumn(
            "keep_rate",
            F.least(
                F.lit(1.0),
                F.col("target_share") * F.lit(float(budget_tokens))
                / F.col("tokens"),
            ),
        )
    )


def weighted_sample(
    df: DataFrame,
    k: int,
    *,
    weight_col: str,
    id_col: str = "doc_id",
    group_col: str | None = None,
    salt: str = "ws",
    salts: int = 16,
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: the
    Efraimidis–Spirakis exponential race — row i draws key
    ``-ln(u_i) / w_i`` (an Exp(w_i) arrival time from the portable
    md5 uniform) and the ``k`` SMALLEST keys per group win.  Inclusion
    probability is proportional to weight, the sample is reproducible
    across runs AND engines (same md5 uniforms), and no sequential
    pass is needed — the race is embarrassingly parallel, which is
    why it is THE distributed weighted-sampling recipe.

    ``group_col=None`` samples globally (the whole corpus is one
    "group" — safe: selection runs the salted two-stage superset
    machinery of ``operators/caps.py``, so no single task ever ranks
    more than ~n/salts rows).  Rows with NULL or non-positive weight
    never win (an Exp(w<=0) arrival never fires).

    Keys rank ROUNDED to 9 dp with the id tie-break: ln() can differ
    in the last ulp across engines (libm vs JVM), and an unrounded
    order flips near-ties; 9 dp keeps ~1e-9 discrimination, far finer
    than sampling semantics need.  The uniform shifts by +0.5/2^32 so
    ln never sees 0 (the DSIR Gumbel convention).
    """
    from grass_spark.operators.caps import _skew_safe_top

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    gcol = group_col or "_g_all"
    base = df if group_col is not None else df.withColumn(gcol, F.lit(0))
    u = uniform_hash(F.col(id_col), salt) + F.lit(0.5 / 2.0**32)
    key = F.round(
        -F.log(u) / F.col(weight_col).cast("double"), 9
    )
    staged = base.filter(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).withColumn("_ekey", key)
    cold, kept_hot = _skew_safe_top(
        staged, k, gcol, id_col,
        [F.col("_ekey").asc(), F.col(id_col).asc()], salt, salts,
    )
    out_cols = list(df.columns)  # "_g_all" is synthetic, never in df
    return cold.select(*out_cols).unionByName(kept_hot.select(*out_cols))


def ess_report(
    df: DataFrame,
    *,
    group_col: str,
    weight_col: str,
) -> DataFrame:
    """Effective sample size under importance weights, per group:
    ``ess = (sum w)^2 / sum w^2`` (Kish) — how many equal-weight
    samples the weighted set is actually worth; ``ess_ratio = ess/n``
    near 1 means benign weights, near 0 means a few rows dominate
    (the DSIR resampling failure mode this report guards).

    Weights reduce to exact integer cents; both power sums run in
    DECIMAL(38,0) and ``ess`` is one mirrored double expression —
    bit-identical across engines after round(., 6).  One map-side
    combinable ``groupBy``; non-positive / NULL weights are excluded
    and counted.
    """
    pos = F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    c = F.round(F.col(weight_col).cast("double") * F.lit(100.0)).cast(
        "decimal(19,0)"
    )
    agg = df.groupBy(F.col(group_col).alias("group")).agg(
        F.sum(F.when(pos, 1).otherwise(0)).alias("n"),
        F.sum(F.when(~pos, 1).otherwise(0)).alias("n_excluded"),
        F.sum(F.when(pos, c)).alias("_s1"),
        F.sum(F.when(pos, c * c)).alias("_s2"),
    )
    ess = (F.col("_s1") * F.col("_s1")).cast("double") / F.col(
        "_s2"
    ).cast("double")
    return agg.select(
        "group",
        "n",
        "n_excluded",
        F.when(F.col("n") > 0, F.round(ess, 6)).alias("ess"),
        F.when(
            F.col("n") > 0,
            F.round(ess / F.col("n").cast("double"), 6),
        ).alias("ess_ratio"),
    ).orderBy("group")


def clip_report(
    df: DataFrame,
    *,
    weight_col: str,
    clip_prob: float = 0.99,
) -> DataFrame:
    """One-row weight-clipping diagnostic: the ESS gain from clipping
    importance weights at their ``clip_prob`` quantile — ``(n,
    clip_threshold, frac_clipped, ess_raw, ess_clipped)``.  The
    standard pre-flight before any weighted resample: if clipping at
    p99 multiplies ESS, the tail is noise, not signal.

    The threshold is the exact type-7 quantile of the ROUNDED cent
    weights, rounded again before the clip compare (the
    perplexity_buckets cut discipline); clipped weights stay exact
    integers (``least(c, round(thr))``), so both ESS values compose
    from DECIMAL(38,0) power sums.
    """
    if not 0.0 < clip_prob < 1.0:
        raise ValueError("clip_report: clip_prob must be in (0, 1)")
    c = F.round(F.col(weight_col).cast("double") * F.lit(100.0)).cast(
        "long"
    )
    base = df.where(
        F.col(weight_col).isNotNull() & (F.col(weight_col) > 0)
    ).select(c.alias("_c"))
    thr = base.agg(
        F.round(F.percentile("_c", F.lit(float(clip_prob))), 6).alias(
            "_thr"
        )
    )
    cl = F.least(
        F.col("_c"), F.round(F.col("_thr")).cast("long")
    ).cast("decimal(19,0)")
    raw = F.col("_c").cast("decimal(19,0)")
    agg = base.crossJoin(F.broadcast(thr)).agg(
        F.count(F.lit(1)).alias("n"),
        F.max("_thr").alias("_t"),
        F.sum(
            F.when(F.col("_c").cast("double") > F.col("_thr"), 1)
            .otherwise(0)
        ).alias("_ncl"),
        F.sum(raw).alias("_s1"),
        F.sum(raw * raw).alias("_s2"),
        F.sum(cl).alias("_c1"),
        F.sum(cl * cl).alias("_c2"),
    )
    ess = lambda s1, s2: (  # noqa: E731
        (F.col(s1) * F.col(s1)).cast("double") / F.col(s2).cast("double")
    )
    return agg.select(
        "n",
        F.round(F.col("_t") / F.lit(100.0), 6).alias("clip_threshold"),
        F.when(
            F.col("n") > 0,
            F.round(
                F.col("_ncl").cast("double") / F.col("n").cast("double"), 6
            ),
        ).alias("frac_clipped"),
        F.when(F.col("n") > 0, F.round(ess("_s1", "_s2"), 6)).alias(
            "ess_raw"
        ),
        F.when(F.col("n") > 0, F.round(ess("_c1", "_c2"), 6)).alias(
            "ess_clipped"
        ),
    )
