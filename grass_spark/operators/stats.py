"""Classical statistical tests, census-exact: chi-square independence
between two categorical columns and the Mann-Whitney U (Wilcoxon
rank-sum) two-sample location test.

These round out the monitoring/test family — ab_test (two-proportion
z), ks_test (distribution shape), rate/seasonal anomalies — with (a)
"are these two dimensions associated" and (b) a nonparametric "did
the metric shift" that heavy tails can't fool.

Scale shape: both tests reduce the input in ONE map-side-combinable
census groupBy; every later step runs on category-grid or
distinct-value rows.  The chi-square grid is |A|×|B| (bounded by
category cardinalities — the event_transitions argument); the
Mann-Whitney rank walk is a cumulative window over the distinct-value
census (the ks_test argument).

Cross-engine parity: all counts, rank sums and tie sums stay EXACT
integers (rank sums via the doubled-rank identity 2·rank = 2·cum_prev
+ cnt + 1, so tied average ranks never leave the integers; DECIMAL(38)
for the cubes), cast to double once into a mirrored final expression;
sqrt is IEEE-exact.  No transcendentals anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from grass_spark.operators.prefix import exclusive_prefix_sums


def spearman_corr(
    df: DataFrame, col_x: str, col_y: str
) -> DataFrame:
    """One-row Spearman rank correlation between two numeric columns:
    ``(n, rho)``.

    Tie-averaged ranks via the doubled-rank identity (2·rank =
    2·cum_prev + cnt + 1 — exact integers, see :func:`mann_whitney`);
    rho is Pearson over the doubled ranks (the doubling cancels).
    Power sums stay exact DECIMAL(38,0) and cast to double ONCE into a
    mirrored final expression — bit-identical across engines and
    shuffle orders.  Rows where either column is NULL are excluded.

    Scale shape: two distinct-value censuses (map-side combinable),
    two census-bounded cumulative windows, two equi-joins of the rank
    tables back onto the pair frame, one scalar aggregate.  The corpus
    shuffles twice (once per rank join) — never sorts globally.
    """
    base = (
        df.select(F.col(col_x).alias("_x"), F.col(col_y).alias("_y"))
        .where(F.col("_x").isNotNull() & F.col("_y").isNotNull())
        .localCheckpoint(eager=False)  # feeds 2 censuses + the joins
    )

    def _ranks(col: str, out: str) -> DataFrame:
        # exclusive prefix sums via bucketed stitch — a census over a
        # CONTINUOUS column is corpus-sized, so a bare orderBy window
        # would Exchange SinglePartition the whole census
        cen = base.groupBy(col).agg(F.count(F.lit(1)).alias("_c"))
        p = exclusive_prefix_sums(cen, col, ["_c"])
        return p.select(
            col,
            (
                F.lit(2) * F.col("_prev__c") + F.col("_c") + F.lit(1)
            ).alias(out),
        )

    rx = _ranks("_x", "_r2x")
    ry = _ranks("_y", "_r2y")
    ranked = base.join(rx, "_x").join(ry, "_y")
    dec = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    sums = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("_r2x")).alias("_sx"),
        F.sum(dec("_r2y")).alias("_sy"),
        F.sum(dec("_r2x") * dec("_r2x")).alias("_sxx"),
        F.sum(dec("_r2y") * dec("_r2y")).alias("_syy"),
        F.sum(dec("_r2x") * dec("_r2y")).alias("_sxy"),
    )
    n = F.col("n").cast("double")
    sx = F.col("_sx").cast("double")
    sy = F.col("_sy").cast("double")
    cov = n * F.col("_sxy").cast("double") - sx * sy
    vx = n * F.col("_sxx").cast("double") - sx * sx
    vy = n * F.col("_syy").cast("double") - sy * sy
    return sums.select(
        "n",
        F.when(
            (vx > 0) & (vy > 0), F.round(cov / F.sqrt(vx * vy), 6)
        ).alias("rho"),
    )


def benford_digits(
    df: DataFrame, *, value_col: str = "value"
) -> DataFrame:
    """First-significant-digit distribution vs Benford's law — the
    fabricated-numbers QC screen.  Returns one row per digit 1-9:
    ``(digit, n, p_obs, p_benford, abs_dev)``.

    Values go through exact integer cents (``round(|v|*100)`` — the
    rfm_segments convention) so the leading digit comes from an
    INTEGER's string rendering, which is portable across engines
    (double rendering is not).  Zero/NULL values are excluded.
    ``p_benford = log10(1 + 1/d)`` rounds to 6 dp — the nine constants
    sit far from any rounding boundary.  ONE map-side-combinable
    groupBy on a 9-value key; everything after is 9 rows.
    """
    cents = F.round(F.abs(F.col(value_col)) * 100).cast("long")
    digits = (
        df.where(F.col(value_col).isNotNull())
        .select(cents.alias("_cents"))
        .where(F.col("_cents") > 0)
        .select(
            F.substring(F.col("_cents").cast("string"), 1, 1)
            .cast("int")
            .alias("digit")
        )
    )
    cen = digits.groupBy("digit").agg(F.count(F.lit(1)).alias("n"))
    tot_w = Window.partitionBy()
    p_obs = F.round(
        F.col("n").cast("double") / F.sum("n").over(tot_w).cast("double"),
        6,
    )
    p_ben = F.round(
        F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit").cast("double")), 6
    )
    return (
        cen.select(
            "digit",
            "n",
            p_obs.alias("p_obs"),
            p_ben.alias("p_benford"),
        )
        .withColumn(
            "abs_dev",
            F.round(F.abs(F.col("p_obs") - F.col("p_benford")), 6),
        )
        .orderBy("digit")
    )


def chi_square(
    df: DataFrame, col_a: str, col_b: str
) -> DataFrame:
    """One-row chi-square independence test between two categorical
    columns: (n, card_a, card_b, dof, chi2, cramers_v).

    The statistic sums over the FULL |A|×|B| grid (zero-observed cells
    contribute their expectation).  ``cramers_v = sqrt(chi2 / (n *
    (min(card)-1)))``; NULL when either cardinality is 1 (dof 0).
    Null category values are excluded (document upstream).
    """
    cen = (
        df.select(
            F.col(col_a).alias("_a"), F.col(col_b).alias("_b")
        )
        .where(F.col("_a").isNotNull() & F.col("_b").isNotNull())
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).alias("_o"))
        .localCheckpoint(eager=False)  # feeds margins + grid join
    )
    ma = cen.groupBy("_a").agg(F.sum("_o").alias("_na"))
    mb = cen.groupBy("_b").agg(F.sum("_o").alias("_nb"))
    tot = cen.agg(
        F.sum("_o").alias("_n"),
        F.count(F.lit(1)).alias("_cells_obs"),
    )
    grid = (
        ma.crossJoin(mb)
        .join(cen, ["_a", "_b"], "left")
        .select(
            "_a",
            "_b",
            "_na",
            "_nb",
            F.coalesce("_o", F.lit(0)).alias("_o"),
        )
        .crossJoin(F.broadcast(tot))
    )
    e = (
        F.col("_na").cast("double") * F.col("_nb").cast("double")
    ) / F.col("_n").cast("double")
    term = F.round(
        (F.col("_o").cast("double") - e) * (F.col("_o").cast("double") - e)
        / e,
        6,
    )
    agg = grid.agg(
        F.max("_n").alias("n"),
        F.count_distinct("_a").alias("card_a"),
        F.count_distinct("_b").alias("card_b"),
        F.round(F.sum(term), 6).alias("chi2"),
    )
    min1 = F.least(F.col("card_a"), F.col("card_b")) - 1
    return agg.select(
        "n",
        "card_a",
        "card_b",
        ((F.col("card_a") - 1) * (F.col("card_b") - 1)).alias("dof"),
        "chi2",
        F.when(
            min1 > 0,
            F.round(
                F.sqrt(
                    F.col("chi2")
                    / (F.col("n").cast("double") * min1.cast("double"))
                ),
                6,
            ),
        ).alias("cramers_v"),
    )


def mann_whitney(
    a: DataFrame, b: DataFrame, *, value_col: str = "value"
) -> DataFrame:
    """One-row Mann-Whitney U test: (n_a, n_b, u_a, u_b, z).

    ``u_a`` counts (a, b) pairs where a beats b (ties half) — computed
    via tie-averaged rank sums kept as EXACT doubled integers.  ``z``
    uses the normal approximation with the tie-corrected variance (no
    continuity correction); NULL when the variance is 0 (all values
    identical).  Null values are excluded.
    """
    ca = (
        a.select(F.col(value_col).alias("_v"))
        .where(F.col("_v").isNotNull())
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_ca"))
    )
    cb = (
        b.select(F.col(value_col).alias("_v"))
        .where(F.col("_v").isNotNull())
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_cb"))
    )
    j = ca.join(cb, "_v", "full_outer").select(
        "_v",
        F.coalesce("_ca", F.lit(0)).alias("_ca"),
        F.coalesce("_cb", F.lit(0)).alias("_cb"),
    ).withColumn("_t", F.col("_ca") + F.col("_cb"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    # bucketed exclusive prefix sums — never a single-task census sort
    # (operators/prefix.py; a continuous value column makes the union
    # census corpus-sized)
    staged = exclusive_prefix_sums(j, "_v", ["_t"]).withColumnRenamed(
        "_prev__t", "_prev"
    )
    # doubled tie-averaged rank: 2*rank(v) = 2*prev + t + 1 (integer)
    r2 = dec(F.lit(2) * F.col("_prev") + F.col("_t") + F.lit(1))
    agg = staged.agg(
        F.sum("_ca").alias("n_a"),
        F.sum("_cb").alias("n_b"),
        F.sum(dec(F.col("_ca")) * r2).alias("_r2a"),  # 2 * rank-sum of a
        F.sum(
            dec(F.col("_t")) * dec(F.col("_t")) * dec(F.col("_t"))
            - dec(F.col("_t"))
        ).alias("_ties"),
    )
    na = F.col("n_a").cast("decimal(38,0)")
    nb = F.col("n_b").cast("decimal(38,0)")
    # 2*U_a = 2*R_a - n_a*(n_a+1); exact decimals until ONE cast
    u2a = F.col("_r2a") - na * (na + F.lit(1))
    u2b = F.lit(2).cast("decimal(38,0)") * na * nb - u2a
    staged2 = agg.select(
        "n_a",
        "n_b",
        u2a.alias("_u2a"),
        u2b.alias("_u2b"),
        "_ties",
    )
    na_d = F.col("n_a").cast("double")
    nb_d = F.col("n_b").cast("double")
    n_d = na_d + nb_d
    var = (na_d * nb_d / F.lit(12.0)) * (
        (n_d + F.lit(1.0))
        - F.col("_ties").cast("double") / (n_d * (n_d - F.lit(1.0)))
    )
    num = F.col("_u2a").cast("double") - na_d * nb_d  # 2*(U_a - mu)
    return staged2.select(
        "n_a",
        "n_b",
        (F.col("_u2a").cast("double") / F.lit(2.0)).alias("u_a"),
        (F.col("_u2b").cast("double") / F.lit(2.0)).alias("u_b"),
        F.when(
            F.round(var, 6) > 0,
            F.round(num / (F.lit(2.0) * F.sqrt(var)), 6),
        ).alias("z"),
    )


def geometric_means(
    df: DataFrame,
    *,
    group_col: str,
    value_col: str = "value",
) -> DataFrame:
    """Per-group geometric and arithmetic means of a positive measure:
    ``(group, n_pos, n_excluded, geo_mean, arith_mean)`` — the
    multiplicative average that a skewed positive metric (latency,
    price, gap) actually wants.

    Non-positive / NULL values are excluded (ln undefined) and counted
    in ``n_excluded``.  Cross-engine parity: each row's ``ln`` rounds
    to 6 dp BEFORE the sum (the entropy per-term discipline), the mean
    rounds before ``exp`` (the classify sigmoid-the-rounded-score
    rule), and the result rounds again — JVM vs libm transcendentals
    differ in the last ulp on anything unrounded.  ``arith_mean``
    composes from the exact-cent sum.  One map-side-combinable
    ``groupBy``; nothing else touches the corpus.
    """
    pos = F.col(value_col).isNotNull() & (F.col(value_col) > 0)
    cents = F.round(F.col(value_col).cast("double") * F.lit(100.0)).cast(
        "decimal(38,0)"
    )
    lnr = F.round(F.log(F.col(value_col).cast("double")), 6)
    agg = df.groupBy(F.col(group_col).alias("group")).agg(
        F.sum(F.when(pos, 1).otherwise(0)).alias("n_pos"),
        F.sum(F.when(~pos | F.col(value_col).isNull(), 1).otherwise(0))
        .alias("n_excluded"),
        F.sum(F.when(pos, lnr)).alias("_sln"),
        F.sum(F.when(pos, cents)).alias("_sc"),
    )
    mean_ln = F.round(F.col("_sln") / F.col("n_pos").cast("double"), 6)
    return agg.select(
        "group",
        "n_pos",
        "n_excluded",
        F.when(
            F.col("n_pos") > 0, F.round(F.exp(mean_ln), 6)
        ).alias("geo_mean"),
        F.when(
            F.col("n_pos") > 0,
            F.round(
                F.col("_sc").cast("double")
                / (F.col("n_pos").cast("double") * F.lit(100.0)),
                6,
            ),
        ).alias("arith_mean"),
    ).orderBy("group")


def hill_tail_index(
    df: DataFrame,
    *,
    value_col: str,
    id_col: str,
    k: int = 100,
) -> DataFrame:
    """Hill estimator of the power-law tail index over the top ``k``
    order statistics: ``hill = mean(ln(x_(i) / x_(k+1)))`` for the k
    largest values, ``alpha = 1 / hill`` — how heavy the value tail is
    (alpha ~ 1-2: very heavy; alpha > 3: light).

    One row: ``(k, x_threshold, hill, alpha)`` — NULL when fewer than
    ``k + 1`` positive values exist or the top ``k + 1`` are all equal
    (``hill = 0``, the index diverges).

    Scale shape: the ONLY corpus-sized stage is a
    ``TakeOrderedAndProject`` top-(k+1) (per-partition heaps, no full
    sort — the heavy_hitters shape) with a deterministic
    ``(value DESC, id ASC)`` tie order; everything after runs on
    ``k + 1`` rows.  Log ratios round to 6 dp per term (the
    transcendental discipline).
    """
    if k < 2:
        raise ValueError("hill_tail_index: k must be >= 2")
    top = (
        df.where(F.col(value_col) > 0)
        .select(
            F.col(value_col).cast("double").alias("_v"),
            F.col(id_col).alias("_id"),
        )
        .orderBy(F.desc("_v"), F.asc("_id"))
        .limit(int(k) + 1)
    )
    w = Window.orderBy(F.desc("_v"), F.asc("_id"))
    ranked = top.withColumn("_rn", F.row_number().over(w))
    thr = ranked.where(F.col("_rn") == int(k) + 1).select(
        F.col("_v").alias("_xk")
    )
    terms = (
        ranked.where(F.col("_rn") <= int(k))
        .crossJoin(F.broadcast(thr))
        .select(F.round(F.log(F.col("_v") / F.col("_xk")), 6).alias("_t"),
                "_xk")
    )
    agg = terms.agg(
        F.count(F.lit(1)).alias("_n"),
        F.round(F.sum("_t") / F.lit(float(k)), 6).alias("_hill"),
        F.max("_xk").alias("_xkv"),
    )
    return agg.select(
        F.when(F.col("_n") == int(k), F.lit(int(k))).alias("k"),
        F.when(F.col("_n") == int(k), F.round(F.col("_xkv"), 6))
        .alias("x_threshold"),
        F.when(F.col("_n") == int(k), F.col("_hill")).alias("hill"),
        F.when(
            (F.col("_n") == int(k)) & (F.col("_hill") > 0),
            F.round(F.lit(1.0) / F.col("_hill"), 6),
        ).alias("alpha"),
    )
