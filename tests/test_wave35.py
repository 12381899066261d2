"""Wave-35 operators: sweep-line interval concurrency (sweep.py) and
prefix-sum compaction planning (compaction.py)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from grass_spark.operators.compaction import compaction_plan
from grass_spark.operators.sweep import concurrency_sweep


def _iv(spark, rows):
    return spark.createDataFrame(rows, "s date, e date")


D = dt.date


def _brute_peaks(rows):
    """Day-resolution brute force: count active intervals per day."""
    days = sorted({d for r in rows for d in r if d is not None})
    out = {}
    for day in days:
        active = sum(1 for s, e in rows if s is not None and e is not None
                     and s <= day < e)
        out[day] = active
    return out


def test_sweep_matches_bruteforce_day_counts(spark):
    rows = [
        (D(2024, 1, 1), D(2024, 1, 5)),
        (D(2024, 1, 2), D(2024, 1, 3)),
        (D(2024, 1, 2), D(2024, 1, 8)),
        (D(2024, 1, 5), D(2024, 1, 6)),  # starts the day #1 ends
        (D(2024, 1, 5), D(2024, 1, 5)),  # empty interval [d, d)
    ]
    out = {r.day: r for r in concurrency_sweep(
        _iv(spark, rows), start_col="s", end_col="e").collect()}
    brute = _brute_peaks(rows)
    for day, r in out.items():
        # active_end == number active during [day, next_day)
        assert r.active_end == brute[day], day
        assert r.peak == max(r.carry_in, r.active_end)
        assert r.carry_in == r.active_end - (r.n_start - r.n_end)
    # half-open: on Jan 5 interval #1 has ended, #4 is active
    assert out[D(2024, 1, 5)].active_end == 2  # intervals 3 and 4
    # empty interval contributes +1 and -1 on the same day, net 0
    assert out[D(2024, 1, 5)].n_start == 2
    assert out[D(2024, 1, 5)].n_end == 2


def test_sweep_peak_includes_carry_in_dip(spark):
    # day 2: two intervals end, none start -> peak there is the carry
    rows = [
        (D(2024, 1, 1), D(2024, 1, 2)),
        (D(2024, 1, 1), D(2024, 1, 2)),
    ]
    out = {r.day: r for r in concurrency_sweep(
        _iv(spark, rows), start_col="s", end_col="e").collect()}
    r = out[D(2024, 1, 2)]
    assert r.carry_in == 2 and r.active_end == 0 and r.peak == 2


def test_sweep_null_bounds_dropped(spark):
    rows = [(D(2024, 1, 1), D(2024, 1, 3)), (None, D(2024, 1, 2)),
            (D(2024, 1, 1), None)]
    out = concurrency_sweep(
        _iv(spark, rows), start_col="s", end_col="e").collect()
    # NULL start keeps its end event and vice versa? No: the select
    # emits both rows but the null DAY rows drop; the non-null halves
    # still sweep (an unbounded interval's known boundary counts).
    days = {r.day for r in out}
    assert days == {D(2024, 1, 1), D(2024, 1, 2), D(2024, 1, 3)}


# --------------------------------------------------------- compaction
def _files(spark, rows):
    return spark.createDataFrame(rows, "p string, f string, b long")


def test_compaction_groups_by_prefix_sum(spark):
    rows = [
        ("m1", "f1", 40), ("m1", "f2", 40), ("m1", "f3", 40),
        ("m1", "f4", 40), ("m1", "f5", 40),
        ("m2", "f1", 250),  # oversized file -> own group
        ("m2", "f2", 10),
    ]
    out = compaction_plan(
        _files(spark, rows), partition_col="p", file_col="f",
        size_col="b", target_bytes=100,
    ).collect()
    by = {(r.partition, r.grp): r for r in out}
    # m1: cum_before = 0,40,80,120,160 -> grp 0,0,0,1,1
    assert by[("m1", 0)].n_files == 3 and by[("m1", 0)].grp_bytes == 120
    assert by[("m1", 1)].n_files == 2 and by[("m1", 1)].grp_bytes == 80
    assert by[("m1", 0)].first_file == "f1"
    assert by[("m1", 0)].last_file == "f3"
    # m2: f1 at cum 0 -> grp 0; f2 at cum 250 -> grp 2
    assert by[("m2", 0)].n_files == 1 and by[("m2", 0)].grp_bytes == 250
    assert by[("m2", 2)].n_files == 1 and by[("m2", 2)].grp_bytes == 10


def test_compaction_group_bytes_bounded(spark):
    # no group whose files are each < target exceeds 2*target
    rows = [("p", f"f{i:03d}", 30 + (i * 17) % 70) for i in range(60)]
    out = compaction_plan(
        _files(spark, rows), partition_col="p", file_col="f",
        size_col="b", target_bytes=100,
    ).collect()
    assert all(r.grp_bytes < 200 for r in out)
    assert sum(r.grp_bytes for r in out) == sum(b for _, _, b in rows)
    assert sum(r.n_files for r in out) == 60
    # group ids are the prefix-sum chunks: monotone in file order
    grps = sorted(out, key=lambda r: r.grp)
    assert all(
        grps[i].last_file <= grps[i + 1].first_file
        for i in range(len(grps) - 1)
    )


def test_compaction_target_validation(spark):
    df = _files(spark, [("p", "f", 1)])
    with pytest.raises(ValueError, match="target_bytes"):
        compaction_plan(df, partition_col="p", file_col="f",
                        size_col="b", target_bytes=0)
