"""Classifier evaluation over corpus-scale scored frames: exact AUC,
calibration bins, and a precision/recall threshold sweep — the
evaluation leg of the quality-classifier loop
(``operators/classify.py`` trains and scores; these grade the scores
against labels before a filtering threshold ships).

Scale shapes:

* :func:`auc_eval` uses the rank-sum identity ``AUC = U_pos /
  (n_pos * n_neg)`` and rides the Mann-Whitney census machinery
  (``operators/stats.py``): a value census with bucketed distributed
  prefix sums — never a corpus-sized single-task ranking, exact
  doubled-integer rank sums in DECIMAL(38,0), ties averaged.  One
  double cast at the very end.
* :func:`calibration_bins` is one map-side-combinable groupBy over
  <= ``n_bins`` integer bucket keys.
* :func:`pr_thresholds` is ONE pass: per-threshold TP/FP counts are
  conditional aggregates in a single combinable agg (never an
  explode of the corpus by |thresholds|); the per-threshold rows are
  exploded from the 1-row result.

Cross-engine parity: counts are exact integers; every emitted double
is a rounded ratio of exact integers (or a 6-dp-rounded mean of
[0,1]-bounded scores, far below the large-sum round-off ceiling).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["auc_eval", "calibration_bins", "pr_thresholds",
           "confusion_matrix", "class_metrics"]


def auc_eval(
    df: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """One-row exact ROC-AUC: (n_pos, n_neg, auc, z).

    ``AUC = P(score_pos > score_neg) + P(tie)/2`` — computed from
    tie-averaged rank sums (the Mann-Whitney U identity), so heavy
    score ties (quantized model outputs) are handled exactly, not by
    sampling.  ``z`` is the tie-corrected Mann-Whitney normal
    deviate of the same comparison (NULL when variance is 0); ``auc``
    is NULL when either class is empty.  Rows with NULL score or
    label are excluded.
    """
    from grass_spark.operators.stats import mann_whitney

    base = (
        df.select(
            F.col(score_col).alias("_s"),
            F.col(label_col).cast("int").alias("_y"),
        )
        .where(F.col("_s").isNotNull() & F.col("_y").isNotNull())
        .localCheckpoint(eager=False)  # split into two class frames —
        # two consumers of one scan (the bm25 census lesson)
    )
    pos = base.where(F.col("_y") == 1).select(F.col("_s").alias("value"))
    neg = base.where(F.col("_y") == 0).select(F.col("_s").alias("value"))
    mw = mann_whitney(pos, neg, value_col="value")
    denom = F.col("n_a").cast("double") * F.col("n_b").cast("double")
    return mw.select(
        F.col("n_a").alias("n_pos"),
        F.col("n_b").alias("n_neg"),
        F.when(denom > 0, F.round(F.col("u_a") / denom, 6)).alias("auc"),
        "z",
    )


def calibration_bins(
    df: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Reliability-diagram table over [0, 1] scores: per equal-width
    bin, (bin, n, n_pos, mean_score, frac_pos).  A calibrated
    classifier has ``mean_score ~ frac_pos`` per row; the gap is what
    a temperature rescale fixes.  Scores outside [0, 1] raise at
    runtime via the bin-range guard being strict — callers clamp
    first if needed; score exactly 1.0 lands in the top bin.
    """
    if n_bins < 2:
        raise ValueError("calibration_bins: n_bins must be >= 2")
    s = F.col(score_col).cast("double")
    b = F.least(
        F.floor(s * n_bins).cast("int"), F.lit(int(n_bins) - 1)
    )
    return (
        df.where(s.isNotNull() & F.col(label_col).isNotNull())
        .select(
            b.alias("bin"),
            s.alias("_s"),
            F.col(label_col).cast("long").alias("_y"),
        )
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("_y").alias("n_pos"),
            F.round(F.avg("_s"), 6).alias("mean_score"),
            F.round(
                F.sum("_y").cast("double")
                / F.count(F.lit(1)).cast("double"),
                6,
            ).alias("frac_pos"),
        )
    )


def pr_thresholds(
    df: DataFrame,
    thresholds: list[float],
    *,
    score_col: str = "score",
    label_col: str = "label",
) -> DataFrame:
    """Precision / recall / F1 at each threshold (predict positive
    when ``score >= t``): one row per threshold with (threshold, tp,
    fp, fn, precision, recall, f1).  Precision is NULL when nothing
    is predicted positive; recall NULL when no positives exist.

    The sweep is ONE corpus pass: TP/FP per threshold are conditional
    sums inside a single aggregate (|thresholds| is operator-bounded,
    each adds two combinable counters), then the 1-row result explodes
    into per-threshold rows — the corpus is never multiplied.
    """
    if not thresholds:
        raise ValueError("pr_thresholds: thresholds must be non-empty")
    s = F.col(score_col).cast("double")
    y = F.col(label_col).cast("long")
    aggs = [F.sum(y).alias("_npos")]
    for i, t in enumerate(thresholds):
        hit = s >= F.lit(float(t))
        aggs.append(F.sum(F.when(hit, y).otherwise(0)).alias(f"_tp{i}"))
        aggs.append(
            F.sum(F.when(hit, 1 - y).otherwise(0)).alias(f"_fp{i}")
        )
    one = (
        df.where(s.isNotNull() & F.col(label_col).isNotNull())
        .agg(*aggs)
    )
    rows = F.explode(
        F.array(
            *[
                F.struct(
                    F.lit(float(t)).alias("threshold"),
                    F.col(f"_tp{i}").alias("tp"),
                    F.col(f"_fp{i}").alias("fp"),
                    (F.col("_npos") - F.col(f"_tp{i}")).alias("fn"),
                )
                for i, t in enumerate(thresholds)
            ]
        )
    )
    ex = one.select(rows.alias("_r")).select("_r.*")
    tp_d = F.col("tp").cast("double")
    prec = F.when(
        F.col("tp") + F.col("fp") > 0,
        F.round(tp_d / (tp_d + F.col("fp").cast("double")), 6),
    )
    rec = F.when(
        F.col("tp") + F.col("fn") > 0,
        F.round(tp_d / (tp_d + F.col("fn").cast("double")), 6),
    )
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & (prec + rec > 0),
        F.round(F.lit(2.0) * prec * rec / (prec + rec), 6),
    )
    return ex.select(
        "threshold", "tp", "fp", "fn",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
    )


def confusion_matrix(
    df, *, actual_col: str = "actual", pred_col: str = "predicted"
):
    """Observed multiclass confusion census: ``(actual, predicted,
    n)`` — ONE map-side-combinable groupBy on a |classes|² -bounded
    key grid.  Rows with a NULL on either side are excluded (document
    upstream; a NULL prediction is a pipeline bug, not a class)."""
    return (
        df.select(
            F.col(actual_col).alias("actual"),
            F.col(pred_col).alias("predicted"),
        )
        .where(
            F.col("actual").isNotNull() & F.col("predicted").isNotNull()
        )
        .groupBy("actual", "predicted")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def class_metrics(
    df, *, actual_col: str = "actual", pred_col: str = "predicted"
):
    """Per-class one-vs-rest metrics over the confusion census:
    ``(class, n_actual, n_predicted, tp, precision, recall, f1)`` for
    every class appearing on EITHER side.  precision/recall are NULL
    on a 0 denominator; f1 composes from the ROUNDED precision/recall
    (the pr_thresholds convention) and is NULL when both are 0/NULL.

    Scale shape: everything after the confusion census runs on
    |classes|-bounded frames.
    """
    cen = confusion_matrix(
        df, actual_col=actual_col, pred_col=pred_col
    ).localCheckpoint(eager=False)  # 3 consumers
    by_a = cen.groupBy(F.col("actual").alias("class")).agg(
        F.sum("n").alias("n_actual")
    )
    by_p = cen.groupBy(F.col("predicted").alias("class")).agg(
        F.sum("n").alias("n_predicted")
    )
    tp = (
        cen.where(F.col("actual") == F.col("predicted"))
        .select(F.col("actual").alias("class"), F.col("n").alias("tp"))
    )
    base = (
        by_a.join(by_p, "class", "full_outer")
        .join(tp, "class", "left")
        .select(
            "class",
            F.coalesce("n_actual", F.lit(0)).alias("n_actual"),
            F.coalesce("n_predicted", F.lit(0)).alias("n_predicted"),
            F.coalesce("tp", F.lit(0)).alias("tp"),
        )
    )
    tp_d = F.col("tp").cast("double")
    prec = F.when(
        F.col("n_predicted") > 0,
        F.round(tp_d / F.col("n_predicted").cast("double"), 6),
    )
    rec = F.when(
        F.col("n_actual") > 0,
        F.round(tp_d / F.col("n_actual").cast("double"), 6),
    )
    f1 = F.when(
        prec.isNotNull() & rec.isNotNull() & (prec + rec > 0),
        F.round(F.lit(2.0) * prec * rec / (prec + rec), 6),
    )
    return base.select(
        "class", "n_actual", "n_predicted", "tp",
        prec.alias("precision"), rec.alias("recall"), f1.alias("f1"),
    )


def gains_table(
    scored: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "label",
    n_buckets: int = 10,
    checkpoint: bool = True,
) -> DataFrame:
    """Cumulative-gains / lift table: bucket rows into score quantile
    bands and report, from the TOP band down, how much of the positive
    class each cumulative slice captures and its lift over the base
    rate — the classic campaign-targeting diagnostic.

    Bands come from exact ``percentile`` thresholds (Hyndman-Fan
    type 7 == DuckDB ``quantile_cont``) over the 6-dp-ROUNDED score
    (the perplexity_buckets discipline: thresholds round again before
    the band compare, so a last-ulp score difference cannot flip a
    band).  Band 1 = highest scores.  Ties share a band by value, so
    band sizes need not be equal — the table reports actual ``n`` per
    band.

    Scale shape: one corpus-sized aggregate for the thresholds (the
    percentile buffer is the ~10^8-row per-group bound documented on
    perplexity_buckets), one scan-stage band assignment against the
    broadcast 1-row threshold array, one map-side-combinable
    ``groupBy(band)``; the cumulative window runs over <= n_buckets
    census rows.  Capture and lift compose from exact integer counts
    in DECIMAL(38): one double cast each, bit-identical across
    engines after ``round(., 6)``.
    """
    if n_buckets < 2:
        raise ValueError("gains_table: n_buckets must be >= 2")
    base = scored.select(
        F.round(F.col(score_col).cast("double"), 6).alias("_sc"),
        F.when(F.col(label_col).cast("long") > 0, 1)
        .otherwise(0)
        .alias("_pos"),
    ).where(F.col("_sc").isNotNull())
    if checkpoint:
        base = base.localCheckpoint(eager=False)  # thresholds + bands

    fracs = [i / n_buckets for i in range(1, n_buckets)]
    thr = base.agg(
        F.transform(
            F.percentile("_sc", F.array(*[F.lit(f) for f in fracs])),
            lambda t: F.round(t, 6),
        ).alias("_thr")
    )
    # band from the top: n_buckets - (# thresholds strictly below sc)
    banded = base.crossJoin(F.broadcast(thr)).select(
        (
            F.lit(int(n_buckets))
            - F.aggregate(
                "_thr",
                F.lit(0),
                lambda acc, t: acc
                + F.when(F.col("_sc") > t, 1).otherwise(0),
            )
        ).alias("band"),
        "_pos",
    )
    cen = banded.groupBy("band").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_pos").alias("n_pos"),
    )
    from pyspark.sql import Window

    w = Window.orderBy("band").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    tot = Window.rowsBetween(
        Window.unboundedPreceding, Window.unboundedFollowing
    )
    cum = cen.select(
        "band",
        "n",
        "n_pos",
        F.sum("n").over(w).alias("_cn"),
        F.sum("n_pos").over(w).alias("_cp"),
        F.sum("n").over(tot).alias("_tn"),
        F.sum("n_pos").over(tot).alias("_tp"),
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    rate = F.col("n_pos").cast("double") / F.col("n").cast("double")
    capture = F.when(
        F.col("_tp") > 0,
        F.col("_cp").cast("double") / F.col("_tp").cast("double"),
    )
    lift = F.when(
        (F.col("_tp") > 0) & (F.col("_cn") > 0),
        (dec("_cp") * dec("_tn")).cast("double")
        / (dec("_cn") * dec("_tp")).cast("double"),
    )
    return cum.select(
        "band",
        "n",
        "n_pos",
        F.round(rate, 6).alias("pos_rate"),
        F.round(capture, 6).alias("cum_capture"),
        F.round(lift, 6).alias("cum_lift"),
    ).orderBy("band")


def brier_score(
    scored: DataFrame,
    *,
    prob_col: str = "prob",
    label_col: str = "label",
) -> DataFrame:
    """One-row probabilistic-forecast quality: ``(n, n_pos, base_rate,
    brier, brier_base, skill)`` — ``brier = mean((p - y)^2)``,
    ``brier_base = base_rate * (1 - base_rate)`` (the always-predict-
    the-base-rate reference, exact from integer counts), ``skill =
    1 - brier / brier_base`` (NULL when the reference is zero — a
    single-class label column).

    One map-side-combinable global aggregate.  The squared-error sum
    runs unrounded (terms are <= 1; the final round-6 absorbs
    cross-engine sum-order ulps — the NDCG sum discipline); the
    baseline composes exactly from DECIMAL counts.
    """
    y = F.when(F.col(label_col).cast("long") > 0, 1).otherwise(0)
    p = F.col(prob_col).cast("double")
    err = (p - y.cast("double")) * (p - y.cast("double"))
    agg = scored.where(p.isNotNull()).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(y).alias("n_pos"),
        F.sum(err).alias("_se"),
    )
    dec = lambda c: F.col(c).cast("decimal(19,0)")  # noqa: E731
    base = (
        (dec("n_pos") * (dec("n") - dec("n_pos"))).cast("double")
        / (F.col("n").cast("double") * F.col("n").cast("double"))
    )
    brier = F.round(F.col("_se") / F.col("n").cast("double"), 6)
    base_r = F.round(base, 6)
    return agg.select(
        "n",
        "n_pos",
        F.round(
            F.col("n_pos").cast("double") / F.col("n").cast("double"), 6
        ).alias("base_rate"),
        brier.alias("brier"),
        base_r.alias("brier_base"),
        F.when(
            base_r > 0, F.round(F.lit(1.0) - brier / base_r, 6)
        ).alias("skill"),
    )


def ece_score(
    df: DataFrame,
    *,
    score_col: str = "score",
    label_col: str = "label",
    n_bins: int = 10,
) -> DataFrame:
    """Expected / maximum calibration error — the one-number summary
    of :func:`calibration_bins`: ``ece = sum_b (n_b / n) *
    |frac_pos_b - mean_score_b|``, ``mce = max_b |...|``.  One row:
    ``(n, n_bins_used, ece, mce)``.

    Reuses the calibration census (per-bin values already rounded to
    6 dp there, so the gaps are deterministic); the weighted terms
    round before the bins-count-bounded sum (the stratified-ATE
    small-term discipline).
    """
    bins = calibration_bins(
        df, score_col=score_col, label_col=label_col, n_bins=n_bins
    )
    gap = F.abs(F.col("frac_pos") - F.col("mean_score"))
    term = F.round(F.col("n").cast("double") * gap, 6)
    agg = bins.agg(
        F.sum("n").alias("n"),
        F.count(F.lit(1)).alias("n_bins_used"),
        F.sum(term).alias("_tsum"),
        F.max(F.round(gap, 6)).alias("_mce"),
    )
    return agg.select(
        "n",
        "n_bins_used",
        F.round(F.col("_tsum") / F.col("n").cast("double"), 6).alias("ece"),
        F.col("_mce").alias("mce"),
    )
