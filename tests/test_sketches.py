"""Mergeable-sketch tier path (operators/sketches.py): rank-error
bounds vs the EXACT kernels, merge-associativity, and the opt-in
RollupPipeline(sketches=True) wiring (round-3 VERDICT item #7).

The contract under test: estimates from MERGED sketches respect the
published DataSketches bounds — KLL k=200 ~1.65 % two-sided normalized
rank error (plus the 1/n rank granularity of tiny groups), HLL lg_k=12
~1.6 % RSE — and the sketch stream length ``n`` is exact.  Estimates
are never parity substitutes for the exact kernels (APPROX_KERNELS
rule); comparisons here are in RANK space, per the project contract.
"""

from __future__ import annotations

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.sketches import (
    sketch_from_raw,
    sketch_from_tier,
    sketch_stats,
)

ORIGIN = datetime(2024, 1, 1)
KLL_EPS = 0.0165  # k=200, two-sided, 99 % confidence
HLL_EPS = 0.05    # lg_k=12 RSE ~1.6 %; 3 sigma


def _raw(spark, n=120_000, groups=6):
    return (
        spark.range(n)
        .withColumn("user_id", (F.col("id") % groups).cast("string"))
        .withColumn("ts", F.timestamp_seconds(F.lit(1704067200) + F.col("id") * 2))
        .withColumn(
            "value", (F.hash(F.col("id") * 2654435761) % 100000).cast("double")
        )
        .drop("id")
        .cache()
    )


def _exact_day(raw):
    return raw.groupBy(
        "user_id", F.date_trunc("day", "ts").alias("bucket_start")
    ).agg(
        F.count("value").alias("cnt"),
        F.count_distinct("value").alias("nd"),
        F.sort_array(F.collect_list("value")).alias("vals"),
    )


def _interval_rank_err(est_col: str, q: float):
    """Distance from q to the estimate's rank INTERVAL
    [count_lt, count_le] / n — the tie-robust rank error: an element
    whose duplicate mass spans q has error 0, exactly like an exact
    order-statistic would (ties make point ranks jump by the tie
    mass, which is a data property, not sketch error)."""
    lt = F.size(F.filter("vals", lambda v: v < F.col(est_col))) / F.col("cnt")
    le = F.size(F.filter("vals", lambda v: v <= F.col(est_col))) / F.col("cnt")
    return F.greatest(F.lit(0.0), lt - F.lit(q), F.lit(q) - le)


def _rank_errors(est, exact, qs):
    """max interval rank error over all groups, per quantile name."""
    j = est.join(exact, ["user_id", "bucket_start"])
    worst = {}
    for name, q in qs.items():
        r = j.select(
            _interval_rank_err(f"approx_{name}", q).alias("err")
        ).agg(F.max("err")).collect()[0][0]
        worst[name] = r
    return worst


QS = {"quart1": 0.25, "median": 0.5, "quart3": 0.75, "perc90": 0.90}


def test_merged_cascade_rank_error_within_bound(spark):
    """minute -> hour -> day by sketch MERGE: every quantile estimate of
    every (user, day) group stays within the KLL rank bound of the
    exact kernel's value, and n is exact."""
    raw = _raw(spark)
    mins = sketch_from_raw(raw, "1 minute", ORIGIN, ["user_id"])
    hours = sketch_from_tier(mins, "1 hour", ORIGIN, ["user_id"])
    days = sketch_from_tier(hours, "1 day", ORIGIN, ["user_id"])
    st = sketch_stats(days, QS)
    exact = _exact_day(raw)

    j = st.join(exact, ["user_id", "bucket_start"])
    assert j.filter(F.col("n") != F.col("cnt")).count() == 0  # n EXACT
    worst = _rank_errors(st, exact, QS)
    for name, err in worst.items():
        assert err <= KLL_EPS, f"{name}: rank error {err}"
    # HLL distinct within relative bound
    hll_worst = j.select(
        F.max(F.abs(F.col("approx_diversity") / F.col("nd") - 1)).alias("e")
    ).collect()[0][0]
    assert hll_worst <= HLL_EPS


def test_merge_equals_direct_sketch_n(spark):
    """Merging minute sketches into a day must see exactly the rows a
    direct day sketch sees (associativity anchor: n identical; both
    estimates then carry the same bound)."""
    raw = _raw(spark, n=40_000, groups=3)
    merged = sketch_stats(
        sketch_from_tier(
            sketch_from_raw(raw, "1 minute", ORIGIN, ["user_id"]),
            "1 day", ORIGIN, ["user_id"],
        ),
        QS,
    ).select("user_id", "bucket_start", F.col("n").alias("n_merged"))
    direct = sketch_stats(
        sketch_from_raw(raw, "1 day", ORIGIN, ["user_id"]), QS
    ).select("user_id", "bucket_start", F.col("n").alias("n_direct"))
    j = merged.join(direct, ["user_id", "bucket_start"], "full")
    assert j.filter(
        F.col("n_merged").isNull() | F.col("n_direct").isNull()
        | (F.col("n_merged") != F.col("n_direct"))
    ).count() == 0


def test_pipeline_sketch_tiers_fold_by_merge(spark, tmp_path):
    """RollupPipeline(sketches=True): every tier carries the sketch
    columns, upper tiers folded them by MERGE (n at day level equals
    len_cnt, proving no row was lost tier-to-tier), and
    read_tier_approx's day-level length quantiles respect the rank
    bound vs the exact kernel over raw."""
    from grass_spark.datagen import synth_transcripts
    from grass_spark.operators.rollup import RollupPipeline

    raw = synth_transcripts(spark, n_convs=40, avg_turns=30, seed=3).cache()
    pipe = RollupPipeline(str(tmp_path / "tiers"), sketches=True)
    pipe.run(raw)

    for name in ("t1m", "t1h", "t1d"):
        cols = pipe._read_tier_frame(spark, name).columns
        assert "len_kll" in cols and "txt_hll" in cols, name

    st = pipe.read_tier_approx(spark, "t1d", {"median": 0.5})
    assert st.filter(F.col("n") != F.col("len_cnt")).count() == 0

    exact = (
        raw.withColumn("value", F.length("text").cast("double"))
        .groupBy("conv_id", F.date_trunc("day", "ts").alias("bucket_start"))
        .agg(
            F.count("value").alias("cnt"),
            F.sort_array(F.collect_list("value")).alias("vals"),
        )
    )
    st_r = st.withColumnRenamed("bucket_start", "bs")
    st2 = st_r.join(
        exact,
        (st_r.conv_id == exact.conv_id) & (st_r.bs == exact.bucket_start),
    )
    worst = st2.select(
        _interval_rank_err("approx_median", 0.5).alias("err")
    ).agg(F.max("err")).collect()[0][0]
    assert worst <= KLL_EPS, worst


def test_plain_pipeline_has_no_sketch_columns(spark, tmp_path):
    from grass_spark.datagen import synth_transcripts
    from grass_spark.operators.rollup import RollupPipeline

    raw = synth_transcripts(spark, n_convs=5, avg_turns=5, seed=3)
    pipe = RollupPipeline(str(tmp_path / "tiers"))
    pipe.run(raw)
    assert "len_kll" not in pipe._read_tier_frame(spark, "t1m").columns
    with pytest.raises(ValueError, match="no sketches"):
        pipe.read_tier_approx(spark, "t1d")


def test_sketches_incompatible_with_block_store(tmp_path):
    from grass_spark.operators.rollup import RollupPipeline

    with pytest.raises(ValueError, match="incompatible"):
        RollupPipeline(str(tmp_path / "x"), sketches=True, compress=True)
