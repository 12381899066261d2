"""RollupPipeline layout="bucketed": the pipeline natively writes the
composed partitionBy(d) + bucketBy(N, conv_id) layout (round-2 VERDICT
item #1) — day pruning for resume AND shuffle-free per-conversation
plans from the same pipeline-written tables.

Incremental day overwrite cannot go through the writer (OSS Spark's
insertInto rejects bucketBy), so changed days are staged into a twin
bucketed table and their day directories swapped — the parquet analog of
Iceberg overwritePartitions.  These tests pin: result parity with the
plain layout, both resume modes, the 0-Exchange plan contract on
PIPELINE-written (not hand-written) tiers, cross-session catalog
re-attach, and the bucket-count mismatch guard.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from grass_spark.datagen import synth_transcripts
from grass_spark.operators.rollup import RollupPipeline, rollup_from_tier
from grass_spark.functions.granularity import adjust_datetime_to_granularity


def _raw(spark, n_convs=30, avg_turns=25):
    return synth_transcripts(spark, n_convs=n_convs, avg_turns=avg_turns, seed=7).cache()


def _n_exchanges(df) -> int:
    return df._jdf.queryExecution().executedPlan().toString().count("Exchange")


def test_bucketed_matches_plain(spark, tmp_path):
    raw = _raw(spark)
    plain = RollupPipeline(str(tmp_path / "plain"))
    plain.run(raw, input_fingerprint="fp")
    buck = RollupPipeline(str(tmp_path / "buck"), layout="bucketed", buckets=8)
    buck.run(raw, input_fingerprint="fp")
    for name in ("t1m", "t1h", "t1d"):
        a = plain.read_tier(spark, name).drop("d")
        b = buck.read_tier(spark, name).drop("d")
        cols = sorted(a.columns)
        a, b = a.select(*cols), b.select(*cols)
        assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0, name


def test_bucketed_cascade_zero_exchange(spark, tmp_path):
    """The upper-tier re-aggregation over a PIPELINE-written bucketed
    tier plans with zero Exchange — the contract operators/bucketed.py
    proves on hand-written tables, now on the flagship pipeline."""
    raw = _raw(spark)
    pipe = RollupPipeline(str(tmp_path / "tiers"), layout="bucketed", buckets=8)
    pipe.run(raw, input_fingerprint="fp")
    t0 = raw.agg(F.min("ts")).collect()[0][0]
    lower = pipe._read_tier_frame(spark, "t1m")
    agg = rollup_from_tier(
        lower, "1 hour", adjust_datetime_to_granularity(t0, "1 hour"), ["conv_id"]
    )
    assert _n_exchanges(agg) == 0
    # per-conversation window over a pipeline tier: also shuffle-free
    from pyspark.sql import Window

    w = Window.partitionBy("conv_id").orderBy("bucket_start")
    windowed = lower.withColumn("run", F.sum("turn_cnt").over(w))
    assert _n_exchanges(windowed) == 0


def test_bucketed_resume_skips_done_days(spark, tmp_path):
    raw = _raw(spark)
    base = str(tmp_path / "tiers")
    RollupPipeline(base, layout="bucketed", buckets=8).run(raw, input_fingerprint="fp")
    second = RollupPipeline(base, layout="bucketed", buckets=8).run(
        raw, input_fingerprint="fp"
    )
    for r in second:
        assert r.days_written == [], f"tier {r.name} recomputed {r.days_written}"


def test_bucketed_incremental_append_and_backfill(spark, tmp_path):
    raw = _raw(spark)
    base = str(tmp_path / "tiers")
    RollupPipeline(base, layout="bucketed", buckets=8).run(raw, incremental=True)

    # append new days: only those days written at tier 0
    shifted = raw.withColumn("ts", F.col("ts") + F.expr("INTERVAL 90 DAYS"))
    full = raw.unionByName(shifted)
    results = RollupPipeline(base, layout="bucketed", buckets=8).run(
        full, incremental=True
    )
    by = {r.name: r for r in results}
    orig_days = {
        str(r["d"]) for r in raw.select(
            F.date_format("ts", "yyyy-MM-dd").alias("d")).distinct().collect()
    }
    assert not (set(by["t1m"].days_written) & orig_days)
    assert by["t1m"].days_written
    pipe = RollupPipeline(base, layout="bucketed", buckets=8)
    assert (
        pipe.read_tier(spark, "t1d").agg(F.sum("turn_cnt")).collect()[0][0]
        == full.count()
    )

    # backfill an existing day: exactly that day re-swapped
    target_day = sorted(orig_days)[0]
    extra = full.filter(F.date_format("ts", "yyyy-MM-dd") == target_day).limit(5)
    fuller = full.unionByName(extra)
    results2 = RollupPipeline(base, layout="bucketed", buckets=8).run(
        fuller, incremental=True
    )
    by2 = {r.name: r for r in results2}
    assert by2["t1m"].days_written == [target_day]
    assert (
        pipe.read_tier(spark, "t1d").agg(F.sum("turn_cnt")).collect()[0][0]
        == fuller.count()
    )


def test_bucketed_reattach_after_catalog_loss(spark, tmp_path):
    """Tier FILES survive a session restart; the in-memory catalog does
    not.  A fresh pipeline over the same base_dir must re-attach the
    table metadata and keep the 0-Exchange contract."""
    raw = _raw(spark)
    base = str(tmp_path / "tiers")
    pipe = RollupPipeline(base, layout="bucketed", buckets=8)
    pipe.run(raw, input_fingerprint="fp")
    total = pipe.read_tier(spark, "t1d").agg(F.sum("turn_cnt")).collect()[0][0]

    # simulate a new session: drop every catalog entry (external tables
    # keep their files)
    for name in ("t1m", "t1h", "t1d"):
        spark.sql(f"DROP TABLE IF EXISTS {pipe._table_name(name)}")

    pipe2 = RollupPipeline(base, layout="bucketed", buckets=8)
    t1m = pipe2._read_tier_frame(spark, "t1m")
    agg = t1m.groupBy("conv_id", "bucket_start").agg(F.sum("turn_cnt"))
    assert _n_exchanges(agg) == 0
    assert (
        pipe2.read_tier(spark, "t1d").agg(F.sum("turn_cnt")).collect()[0][0]
        == total
    )
    # and resume still recognizes everything as done
    third = pipe2.run(raw, input_fingerprint="fp")
    assert all(r.days_written == [] for r in third)


def test_pre_pin_store_rejects_bucketed_claim(spark, tmp_path):
    """A tier store written before the layout pin existed (plain files,
    no _layout.json) must refuse a 'bucketed' re-open — adopting the
    claim would plan shuffle-free over non-bucketed files."""
    raw = _raw(spark, n_convs=5, avg_turns=5)
    base = str(tmp_path / "tiers")
    RollupPipeline(base).run(raw)
    os.remove(os.path.join(base, "_layout.json"))  # simulate pre-pin
    with pytest.raises(ValueError, match="predates the layout pin"):
        RollupPipeline(base, layout="bucketed", buckets=8)
    # a plain re-open of the same store is fine (legacy stores ARE plain)
    RollupPipeline(base)


def test_layout_pin_rejects_mismatch(spark, tmp_path):
    raw = _raw(spark, n_convs=5, avg_turns=5)
    base = str(tmp_path / "tiers")
    RollupPipeline(base, layout="bucketed", buckets=8).run(raw)
    with pytest.raises(ValueError, match="layout"):
        RollupPipeline(base, layout="bucketed", buckets=16)
    with pytest.raises(ValueError, match="layout"):
        RollupPipeline(base, layout="plain")


def test_per_tier_bucket_counts(spark, tmp_path):
    """buckets may be a per-tier dict — upper tiers hold far fewer rows
    and want smaller counts (measured write premium, BASELINE.md)."""
    raw = _raw(spark)
    base = str(tmp_path / "tiers")
    counts = {"t1m": 8, "t1h": 4, "t1d": 2}
    pipe = RollupPipeline(base, layout="bucketed", buckets=counts)
    pipe.run(raw, input_fingerprint="fp")
    for name, nb in counts.items():
        root = pipe.tier_path(name)
        for part in os.listdir(root):
            if part.startswith("d="):
                files = [f for f in os.listdir(os.path.join(root, part))
                         if f.endswith(".parquet")]
                assert len(files) <= nb, f"{name}/{part}"
        # per-tier aggs stay 0-Exchange at each count
        lower = pipe._read_tier_frame(spark, name)
        agg = lower.groupBy("conv_id", "bucket_start").agg(F.sum("turn_cnt"))
        assert _n_exchanges(agg) == 0, name
    # resume still clean
    second = RollupPipeline(base, layout="bucketed", buckets=counts).run(
        raw, input_fingerprint="fp"
    )
    assert all(r.days_written == [] for r in second)


def test_bucketed_file_count_is_buckets_per_day(spark, tmp_path):
    """The pre-write repartition aligns tasks with the bucket spec, so
    each (day, bucket) pair gets exactly one file — never
    tasks × buckets × days."""
    raw = _raw(spark)
    base = str(tmp_path / "tiers")
    pipe = RollupPipeline(base, layout="bucketed", buckets=4)
    pipe.run(raw)
    root = pipe.tier_path("t1m")
    for part in os.listdir(root):
        if not part.startswith("d="):
            continue
        files = [f for f in os.listdir(os.path.join(root, part))
                 if f.endswith(".parquet")]
        assert len(files) <= 4, f"{part}: {len(files)} files"


# ---------------------------------------------------------------- crash swap
def _days_of(raw):
    return sorted(
        str(r["d"]) for r in raw.select(
            F.date_format("ts", "yyyy-MM-dd").alias("d")).distinct().collect()
    )


def _backfill(raw, day, n=5):
    extra = raw.filter(F.date_format("ts", "yyyy-MM-dd") == day).limit(n)
    return raw.unionByName(extra)


def test_swap_crash_between_aside_and_movein_recovers(spark, tmp_path, monkeypatch):
    """Inject a crash AFTER the old day is moved aside but BEFORE the
    staged day moves in (the round-3 VERDICT swap-window nit).  Readers
    must never see a half-swapped partition, and a resume run must
    restore the day."""
    import shutil

    raw = _raw(spark)
    base = str(tmp_path / "tiers")
    RollupPipeline(base, layout="bucketed", buckets=4).run(raw, incremental=True)
    day = _days_of(raw)[0]
    fuller = _backfill(raw, day).cache()

    real_move = shutil.move

    def crashing_move(src, dst):
        raise RuntimeError("injected crash between aside and move-in")

    monkeypatch.setattr(shutil, "move", crashing_move)
    with pytest.raises(RuntimeError, match="injected crash"):
        RollupPipeline(base, layout="bucketed", buckets=4).run(
            fuller, incremental=True
        )
    monkeypatch.setattr(shutil, "move", real_move)

    pipe = RollupPipeline(base, layout="bucketed", buckets=4)
    root = pipe.tier_path("t1m")
    # old day preserved in the hidden aside; no visible half-swapped dir
    assert os.path.isdir(os.path.join(root, f".d={day}.old"))
    assert not os.path.isdir(os.path.join(root, f"d={day}"))
    visible = spark.read.parquet(root).select(
        F.col("d").cast("string")).distinct().collect()
    days_seen = {r["d"] for r in visible}
    assert day not in days_seen and not any(d.endswith(".old") for d in days_seen)

    # resume restores the day and the cascade reconciles end-to-end
    RollupPipeline(base, layout="bucketed", buckets=4).run(
        fuller, incremental=True
    )
    assert (
        pipe.read_tier(spark, "t1d").agg(F.sum("turn_cnt")).collect()[0][0]
        == fuller.count()
    )
    assert not any(e.endswith(".old") for e in os.listdir(root))
    fuller.unpersist()


def test_swap_crash_after_movein_keeps_new_day(spark, tmp_path, monkeypatch):
    """Crash AFTER the staged day moved in but BEFORE the aside is
    deleted: readers see exactly the new day once; the leftover aside is
    garbage-collected by the next run's sweep."""
    import shutil

    raw = _raw(spark)
    base = str(tmp_path / "tiers")
    RollupPipeline(base, layout="bucketed", buckets=4).run(raw, incremental=True)
    day = _days_of(raw)[0]
    fuller = _backfill(raw, day).cache()

    real_rmtree = shutil.rmtree

    def crashing_rmtree(p, *a, **kw):
        if str(p).endswith(".old"):
            raise RuntimeError("injected crash before aside delete")
        return real_rmtree(p, *a, **kw)

    monkeypatch.setattr(shutil, "rmtree", crashing_rmtree)
    with pytest.raises(RuntimeError, match="injected crash"):
        RollupPipeline(base, layout="bucketed", buckets=4).run(
            fuller, incremental=True
        )
    monkeypatch.setattr(shutil, "rmtree", real_rmtree)

    pipe = RollupPipeline(base, layout="bucketed", buckets=4)
    root = pipe.tier_path("t1m")
    # new day is visible exactly once (no duplication from the aside)
    day_rows = spark.read.parquet(root).filter(
        F.col("d").cast("string") == day
    )
    expect = fuller.filter(F.date_format("ts", "yyyy-MM-dd") == day).count()
    assert day_rows.agg(F.sum("turn_cnt")).collect()[0][0] == expect
    # recovery run reconciles and sweeps the aside
    RollupPipeline(base, layout="bucketed", buckets=4).run(
        fuller, incremental=True
    )
    assert not any(e.endswith(".old") for e in os.listdir(root))
    assert (
        pipe.read_tier(spark, "t1d").agg(F.sum("turn_cnt")).collect()[0][0]
        == fuller.count()
    )
    fuller.unpersist()


def test_swap_sweep_restores_orphaned_aside(spark, tmp_path):
    """An aside whose original day dir is MISSING (crash between aside
    and move-in) is RESTORED by the next swap's sweep, not deleted —
    old data survives even if that day isn't re-staged."""
    import shutil

    raw = _raw(spark)
    base = str(tmp_path / "tiers")
    RollupPipeline(base, layout="bucketed", buckets=4).run(raw, incremental=True)
    pipe = RollupPipeline(base, layout="bucketed", buckets=4)
    root = pipe.tier_path("t1m")
    days = _days_of(raw)
    victim, other = days[0], days[1]
    before = spark.read.parquet(root).filter(
        F.col("d").cast("string") == victim).agg(
        F.sum("turn_cnt")).collect()[0][0]
    # simulate the crash window by hand on `victim`
    os.rename(os.path.join(root, f"d={victim}"),
              os.path.join(root, f".d={victim}.old"))
    # trigger a swap that stages a DIFFERENT day only
    fuller = _backfill(raw, other)
    RollupPipeline(base, layout="bucketed", buckets=4).run(
        fuller, incremental=True
    )
    after = spark.read.parquet(root).filter(
        F.col("d").cast("string") == victim).agg(
        F.sum("turn_cnt")).collect()[0][0]
    assert after == before
    assert not os.path.isdir(os.path.join(root, f".d={victim}.old"))


def test_layout_pin_repins_when_store_empty(spark, tmp_path):
    """A pin written by a constructed-but-never-run pipeline (ADVICE
    rollup.py:204) must not permanently lock an empty store."""
    base = str(tmp_path / "tiers")
    RollupPipeline(base, layout="bucketed", buckets=8)  # never run
    RollupPipeline(base, layout="bucketed", buckets=16)  # re-pin ok: no data
    pipe = RollupPipeline(base)  # plain re-pin ok too
    pipe.run(_raw(spark, n_convs=5, avg_turns=5))
    with pytest.raises(ValueError, match="layout"):
        RollupPipeline(base, layout="bucketed", buckets=8)  # now locked


def test_read_tier_schema_identical_across_layouts(spark, tmp_path):
    """read_tier must expose the SAME schema (incl. d: string) in both
    layouts (ADVICE rollup.py:270)."""
    raw = _raw(spark, n_convs=10, avg_turns=10)
    plain = RollupPipeline(str(tmp_path / "p"))
    plain.run(raw)
    buck = RollupPipeline(str(tmp_path / "b"), layout="bucketed", buckets=4)
    buck.run(raw)
    for name in ("t1m", "t1h", "t1d"):
        a, b = plain.read_tier(spark, name), buck.read_tier(spark, name)
        assert dict(a.dtypes) == dict(b.dtypes), name
        assert dict(a.dtypes)["d"] == "string", name
