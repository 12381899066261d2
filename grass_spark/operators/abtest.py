"""A/B experiment analysis over the events stream: deterministic
hash-bucket assignment, per-user conversion, and a pooled
two-proportion z statistic.

Reference analog: the reference's univariate statistics kernels
(``lib/stats``, t-value in the regression kernel family,
``r.series`` method tables) — this is the experimentation-flavoured
version of the same "compare two populations" question.

Scale shape: everything is partial-aggregatable.  Assignment is a
scan-stage md5 projection (the portable-uniform-hash recipe shared
with mixture sampling); per-user conversion is one
``groupBy(user).max`` (map-side combinable — a bot user's 10^8 events
reduce inside their input partitions); the experiment summary is a
single global aggregate of conditional integer sums.  Two exchanges
total, both post-partial; no window, no array, no Python.

The z statistic composes from EXACT integer counts in a fixed
floating-point order, so Spark and DuckDB produce bit-identical
doubles (the established integer-power-sum discipline — never use
built-in variance/stddev across engines).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def assign_variant(
    user: Column | str,
    *,
    salt: str = "ab",
    treat_frac: float = 0.5,
) -> Column:
    """Deterministic sticky assignment: 'B' (treatment) for the
    ``treat_frac`` of users whose portable md5-uniform falls below the
    threshold, else 'A'.  Same recipe as mixture sampling: first 8 md5
    hex digits as uint32 / 2^32 — exact in a double, identical in
    DuckDB via ``CAST('0x' || substr(md5(..), 1, 8) AS UBIGINT)``.
    """
    if not 0.0 < treat_frac < 1.0:
        raise ValueError("assign_variant: treat_frac must be in (0, 1)")
    u = F.conv(
        F.substring(F.md5(F.concat_ws(":", F.lit(salt),
                                      F.col(user) if isinstance(user, str)
                                      else user)), 1, 8),
        16, 10,
    ).cast("double") / F.lit(float(2 ** 32))
    return F.when(u < F.lit(float(treat_frac)), F.lit("B")).otherwise(
        F.lit("A")
    )


def ab_test(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    convert_type: str = "purchase",
    salt: str = "ab",
    treat_frac: float = 0.5,
) -> DataFrame:
    """One-row experiment summary: per-variant user/conversion counts,
    conversion rates, absolute lift (B - A), and the pooled
    two-proportion z statistic (NULL when either arm is empty or the
    pooled variance is zero).  Doubles rounded to 6 dp.
    """
    per_user = (
        df.select(
            F.col(user_col).alias("_u"),
            (F.col(type_col) == convert_type).cast("int").alias("_c"),
        )
        .groupBy("_u")
        .agg(F.max("_c").alias("_conv"))
        .withColumn(
            "_v", assign_variant("_u", salt=salt, treat_frac=treat_frac)
        )
    )
    agg = per_user.agg(
        F.sum(F.when(F.col("_v") == "A", 1).otherwise(0)).alias("n_a"),
        F.sum(F.when(F.col("_v") == "B", 1).otherwise(0)).alias("n_b"),
        F.sum(F.when(F.col("_v") == "A", F.col("_conv")).otherwise(0))
        .alias("conv_a"),
        F.sum(F.when(F.col("_v") == "B", F.col("_conv")).otherwise(0))
        .alias("conv_b"),
    )
    # fixed-order float composition from exact integer counts
    p_a = F.col("conv_a").cast("double") / F.col("n_a")
    p_b = F.col("conv_b").cast("double") / F.col("n_b")
    pool = (F.col("conv_a") + F.col("conv_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    se2 = pool * (F.lit(1.0) - pool) * (
        F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b")
    )
    z = F.when(
        (F.col("n_a") > 0) & (F.col("n_b") > 0) & (se2 > 0),
        F.round((p_b - p_a) / F.sqrt(se2), 6),
    )
    return agg.select(
        "n_a", "n_b", "conv_a", "conv_b",
        F.when(F.col("n_a") > 0, F.round(p_a, 6)).alias("rate_a"),
        F.when(F.col("n_b") > 0, F.round(p_b, 6)).alias("rate_b"),
        F.when(
            (F.col("n_a") > 0) & (F.col("n_b") > 0), F.round(p_b - p_a, 6)
        ).alias("lift"),
        z.alias("z"),
    )


def did_estimate(
    df: DataFrame,
    *,
    group_col: str,
    period_col: str,
    value_col: str = "value",
    treat: str = "treat",
    pre: str = "pre",
) -> DataFrame:
    """One-row difference-in-differences point estimate:
    ``(n_treat_pre, n_treat_post, n_ctrl_pre, n_ctrl_post,
    mean_treat_pre, mean_treat_post, mean_ctrl_pre, mean_ctrl_post,
    did)`` — ``did = (T_post - T_pre) - (C_post - C_pre)``.

    ``group_col`` / ``period_col`` are binary string columns
    (``treat`` / ``pre`` name the treated group and pre period; every
    other value is control / post).  One global aggregate of
    conditional exact-integer cent sums — the abtest scale shape;
    means are mirrored single-cast double expressions, round 6, NULL
    on an empty cell (did NULL if any cell is empty).
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    dec = cents.cast("decimal(38,0)")
    is_t = F.col(group_col) == treat
    is_pre = F.col(period_col) == pre
    cells = {
        "tp": is_t & ~is_pre,
        "tq": is_t & is_pre,
        "cp": ~is_t & ~is_pre,
        "cq": ~is_t & is_pre,
    }
    aggs = []
    for tag, cond in cells.items():
        aggs.append(F.sum(F.when(cond, 1).otherwise(0)).alias(f"_n{tag}"))
        aggs.append(
            F.sum(F.when(cond, dec).otherwise(F.lit(0).cast("decimal(38,0)")))
            .alias(f"_s{tag}")
        )
    one = df.where(F.col(value_col).isNotNull()).agg(*aggs)

    def mean(tag):
        return F.when(
            F.col(f"_n{tag}") > 0,
            F.col(f"_s{tag}").cast("double")
            / (F.col(f"_n{tag}").cast("double") * F.lit(100.0)),
        )

    m_tp, m_tq, m_cp, m_cq = mean("tp"), mean("tq"), mean("cp"), mean("cq")
    return one.select(
        F.col("_ntq").alias("n_treat_pre"),
        F.col("_ntp").alias("n_treat_post"),
        F.col("_ncq").alias("n_ctrl_pre"),
        F.col("_ncp").alias("n_ctrl_post"),
        F.round(m_tq, 6).alias("mean_treat_pre"),
        F.round(m_tp, 6).alias("mean_treat_post"),
        F.round(m_cq, 6).alias("mean_ctrl_pre"),
        F.round(m_cp, 6).alias("mean_ctrl_post"),
        F.round((m_tp - m_tq) - (m_cp - m_cq), 6).alias("did"),
    )


def cuped_means(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    group_col: str,
    period_col: str,
    value_col: str = "value",
    pre: str = "pre",
) -> DataFrame:
    """CUPED variance-reduced per-variant means (Deng et al. 2013):
    per user, X = pre-period value sum (0 when absent) and Y =
    post-period sum; ``theta = cov(X, Y) / var(X)`` (population, from
    exact integer power sums, 6-dp rounded); the adjusted metric is
    ``Y - theta * (X - mean(X))``.  Returns one row per variant:
    ``(variant, n_users, mean_post, mean_post_adj, theta)``.

    A user's variant is taken as the max group label over their rows
    (assignment is per-user by construction — document upstream).
    Because theta and mean(X) are scalars, the per-variant adjusted
    mean decomposes as ``mean(Y) - theta * (mean(X) - mean(X)_global)``
    — so every emitted mean composes from EXACT decimal cent sums in a
    fixed float order (never ``avg`` over per-user doubles, whose
    distributed sum order diverges across engines).  Scale shape: one
    per-user conditional-sum groupBy (map-side combinable), one 1-row
    power-sum aggregate, one per-variant aggregate of the same census
    (checkpointed — two consumers), a 1-row broadcast cross join.
    theta is NULL (and adj = raw) when var(X) is 0.
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    is_pre = F.col(period_col) == pre
    per_user = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(user_col).alias("_u"))
        .agg(
            F.max(group_col).alias("_g"),
            F.sum(F.when(is_pre, cents).otherwise(F.lit(0)))
            .cast("decimal(38,0)").alias("_x"),
            F.sum(F.when(~is_pre, cents).otherwise(F.lit(0)))
            .cast("decimal(38,0)").alias("_y"),
        )
        .localCheckpoint(eager=False)  # power sums + variant agg
    )
    pw = per_user.agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_x").alias("_sx"),
        F.sum("_y").alias("_sy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
        F.sum(F.col("_x") * F.col("_y")).alias("_sxy"),
    )
    n = F.col("_n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    cov = n * F.col("_sxy").cast("double") - sx * sy
    varx = n * F.col("_sxx").cast("double") - sx * sx
    params = pw.select(
        F.when(varx > 0, F.round(cov / varx, 6)).alias("theta"),
        # global mean of X in dollars, mirrored single division
        F.round(sx / (n * F.lit(100.0)), 6).alias("_mx"),
    )
    per_variant = per_user.groupBy(F.col("_g").alias("variant")).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("_x").alias("_gx"),
        F.sum("_y").alias("_gy"),
    )
    staged = per_variant.crossJoin(F.broadcast(params))
    ng = F.col("n_users").cast("double") * F.lit(100.0)
    my = F.col("_gy").cast("double") / ng
    mxg = F.col("_gx").cast("double") / ng
    adj = F.when(
        F.col("theta").isNotNull(),
        my - F.col("theta") * (mxg - F.col("_mx")),
    ).otherwise(my)
    return staged.select(
        "variant",
        "n_users",
        F.round(my, 6).alias("mean_post"),
        F.round(adj, 6).alias("mean_post_adj"),
        "theta",
    ).orderBy("variant")


def stratified_ate(
    df: DataFrame,
    *,
    stratum_col: str,
    group_col: str,
    value_col: str = "value",
    treat: str = "treat",
    checkpoint: bool = True,
) -> DataFrame:
    """Post-stratified average-treatment-effect estimate: within each
    stratum the treated-vs-control mean difference, combined with
    stratum-size weights — the standard covariate adjustment when
    assignment is (or should be) independent of the stratum.

    Returns one row ``(n_strata_used, n_treat, n_ctrl, ate,
    diff_unadj)``: only strata with BOTH arms contribute to ``ate``
    (weights renormalise over contributing strata, the complete-case
    post-stratification convention); ``diff_unadj`` is the plain
    all-rows mean difference for comparison.  NULL ``ate`` when no
    stratum holds both arms, NULL ``diff_unadj`` when an arm is empty.

    Scale shape: ONE corpus-sized stage — the map-side-combinable
    ``groupBy(stratum)`` of conditional exact-cent sums (the abtest
    discipline); the census result is stratum-cardinality-sized and is
    lazily checkpointed for its two aggregate consumers.  Per-stratum
    diffs are mirrored single-cast double expressions over exact
    integers; the weighted terms round to 6 dp before the (tiny,
    strata-count-bounded) final sum — the NDCG small-term-sum
    discipline.
    """
    cents = F.round(F.col(value_col) * 100).cast("long")
    dec = cents.cast("decimal(38,0)")
    is_t = F.col(group_col) == treat
    zero = F.lit(0).cast("decimal(38,0)")
    cen = (
        df.where(F.col(value_col).isNotNull())
        .groupBy(F.col(stratum_col).alias("_st"))
        .agg(
            F.sum(F.when(is_t, 1).otherwise(0)).alias("_nt"),
            F.sum(F.when(is_t, dec).otherwise(zero)).alias("_vt"),
            F.sum(F.when(~is_t, 1).otherwise(0)).alias("_nc"),
            F.sum(F.when(~is_t, dec).otherwise(zero)).alias("_vc"),
        )
    )
    if checkpoint:
        cen = cen.localCheckpoint(eager=False)  # used-strata + unadj aggs

    diff = (
        F.col("_vt").cast("double")
        / (F.col("_nt").cast("double") * F.lit(100.0))
        - F.col("_vc").cast("double")
        / (F.col("_nc").cast("double") * F.lit(100.0))
    )
    term = F.round(
        (F.col("_nt") + F.col("_nc")).cast("double") * F.round(diff, 6), 6
    )
    used = (
        cen.where((F.col("_nt") > 0) & (F.col("_nc") > 0))
        .agg(
            F.count(F.lit(1)).alias("n_strata_used"),
            F.sum("_nt").alias("n_treat"),
            F.sum("_nc").alias("n_ctrl"),
            F.sum(term).alias("_tsum"),
        )
    )
    unadj = cen.agg(
        F.sum("_nt").alias("_ant"),
        F.sum("_vt").alias("_avt"),
        F.sum("_nc").alias("_anc"),
        F.sum("_vc").alias("_avc"),
    )
    udiff = F.when(
        (F.col("_ant") > 0) & (F.col("_anc") > 0),
        F.col("_avt").cast("double")
        / (F.col("_ant").cast("double") * F.lit(100.0))
        - F.col("_avc").cast("double")
        / (F.col("_anc").cast("double") * F.lit(100.0)),
    )
    return used.crossJoin(F.broadcast(unadj)).select(
        "n_strata_used",
        F.coalesce("n_treat", F.lit(0).cast("long")).alias("n_treat"),
        F.coalesce("n_ctrl", F.lit(0).cast("long")).alias("n_ctrl"),
        F.when(
            F.col("n_strata_used") > 0,
            F.round(
                F.col("_tsum")
                / (F.col("n_treat") + F.col("n_ctrl")).cast("double"),
                6,
            ),
        ).alias("ate"),
        F.round(udiff, 6).alias("diff_unadj"),
    )


#: z for a 95% two-sided interval, as a FIXED 6-dp literal — a runtime
#: inverse-normal would differ across engines; the constant ships in
#: both the plan and the oracle SQL verbatim.
_WILSON_Z = 1.959964


def conversion_ci(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    type_col: str = "event_type",
    convert_type: str = "purchase",
    salt: str = "ab",
    treat_frac: float = 0.5,
    z: float = _WILSON_Z,
) -> DataFrame:
    """Per-variant conversion rate with a Wilson score interval —
    the binomial CI that behaves at small n and extreme rates (never
    leaves [0, 1], never collapses to a point at 0/n), one row per
    variant: ``(variant, n_users, n_conv, rate, ci_lo, ci_hi)``.

    Same per-user conversion census + deterministic md5 assignment as
    :func:`ab_test` (one corpus-sized map-side-combinable groupBy);
    the interval is one fixed double expression over the exact integer
    counts with ``z`` a plan literal, so Spark and a SQL replay agree
    bit-for-bit after ``round(., 6)``.  NULL bounds on an empty arm.
    """
    per_user = (
        df.select(
            F.col(user_col).alias("_u"),
            (F.col(type_col) == convert_type).cast("int").alias("_c"),
        )
        .groupBy("_u")
        .agg(F.max("_c").alias("_conv"))
        .withColumn(
            "_v", assign_variant("_u", salt=salt, treat_frac=treat_frac)
        )
    )
    cen = per_user.groupBy(F.col("_v").alias("variant")).agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("_conv").alias("n_conv"),
    )
    zz = F.lit(float(z))
    n = F.col("n_users").cast("double")
    p = F.col("n_conv").cast("double") / n
    denom = F.lit(1.0) + zz * zz / n
    center = (p + zz * zz / (F.lit(2.0) * n)) / denom
    half = (
        zz
        * F.sqrt(
            p * (F.lit(1.0) - p) / n
            + zz * zz / (F.lit(4.0) * n * n)
        )
        / denom
    )
    ok = F.col("n_users") > 0
    return cen.select(
        "variant",
        "n_users",
        "n_conv",
        F.when(ok, F.round(p, 6)).alias("rate"),
        F.when(ok, F.round(center - half, 6)).alias("ci_lo"),
        F.when(ok, F.round(center + half, 6)).alias("ci_hi"),
    ).orderBy("variant")


def quantile_effects(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str = "value",
    treat: str = "treat",
    probs: tuple = (0.1, 0.25, 0.5, 0.75, 0.9),
) -> DataFrame:
    """Quantile treatment effects: the treated-vs-control difference
    at each requested quantile — where in the distribution the effect
    lives (a mean shift at the p90 only is invisible to
    :func:`ab_test`'s averages).

    Returns one row per prob: ``(p, q_treat, q_ctrl, qte)``; NULL
    columns for an empty arm.  Quantiles are exact Hyndman-Fan type 7
    over the 6-dp-ROUNDED values (== DuckDB ``quantile_cont`` over the
    same rounding — unrounded inputs flip interpolation across
    engines), rounded again on output; the per-arm aggregation buffers
    one arm's value multiset (the documented ~10^8-per-group exact-
    percentile bound).
    """
    if not probs:
        raise ValueError("quantile_effects: probs must be non-empty")
    pr = [float(p) for p in probs]
    if not all(0.0 <= p <= 1.0 for p in pr):
        raise ValueError("quantile_effects: probs must be in [0, 1]")
    base = df.where(F.col(value_col).isNotNull()).select(
        (F.col(group_col) == treat).alias("_t"),
        F.round(F.col(value_col).cast("double"), 6).alias("_v"),
    )
    per_arm = base.groupBy("_t").agg(
        F.transform(
            F.percentile("_v", F.array(*[F.lit(p) for p in pr])),
            lambda q: F.round(q, 6),
        ).alias("_qs")
    )
    spine = per_arm.sparkSession.createDataFrame(
        [(i + 1, p) for i, p in enumerate(pr)], "i int, p double"
    )
    x = (
        spine.crossJoin(F.broadcast(per_arm))
        .groupBy("i", "p")
        .agg(
            F.max(
                F.when(F.col("_t"), F.element_at("_qs", F.col("i")))
            ).alias("q_treat"),
            F.max(
                F.when(~F.col("_t"), F.element_at("_qs", F.col("i")))
            ).alias("q_ctrl"),
        )
    )
    return x.select(
        "p",
        "q_treat",
        "q_ctrl",
        F.round(F.col("q_treat") - F.col("q_ctrl"), 6).alias("qte"),
    ).orderBy("p")
