"""Catalog surface: t.register / t.info / t.rast.list analogs.

Goldens mirror ``temporal/t.rast.aggregate/testsuite/
test_aggregation_absolute.py:26-127``: 7 maps at 14-day intervals from
2001-01-15 12:05:45 — t.info must report start 2001-01-15 12:05:45,
granularity '1209600 seconds' (the reference's own unit selection for
starts with non-zero seconds), interval map_time.
"""

from __future__ import annotations

import json
from datetime import datetime

import pytest
from pyspark.sql import functions as F

from grass_spark.catalog import (
    TierCatalog,
    dataset_info,
    list_maps,
    register_maps,
)

START = datetime(2001, 1, 15, 12, 5, 45)


@pytest.fixture()
def maps7(spark):
    df = spark.createDataFrame(
        [(f"a{i+1}", float((i + 1) * 100) if i < 6 else None) for i in range(7)],
        "map_id string, v double",
    )
    return register_maps(df, start=START, increment="14 days", interval=True)


def test_register_increment_interval(spark, maps7):
    rows = {r["map_id"]: r for r in maps7.collect()}
    assert rows["a1"]["start_time"] == START
    assert rows["a2"]["start_time"] == datetime(2001, 1, 29, 12, 5, 45)
    assert rows["a1"]["end_time"] == rows["a2"]["start_time"]
    assert rows["a7"]["start_time"] == datetime(2001, 4, 9, 12, 5, 45)


def test_register_monthly_calendar(spark):
    df = spark.createDataFrame([(f"m{i}",) for i in range(4)], ["map_id"])
    out = register_maps(
        df, start=datetime(2001, 1, 1), increment="1 month", interval=True
    )
    rows = sorted(out.collect(), key=lambda r: r["start_time"])
    assert [r["start_time"].month for r in rows] == [1, 2, 3, 4]
    assert rows[0]["end_time"] == datetime(2001, 2, 1)


def test_register_per_row_times(spark):
    df = spark.createDataFrame(
        [("x", datetime(2020, 5, 1)), ("y", datetime(2020, 6, 1))],
        ["map_id", "t"],
    )
    out = register_maps(df, ts_col="t")
    assert {r["start_time"] for r in out.collect()} == {
        datetime(2020, 5, 1), datetime(2020, 6, 1)
    }
    assert all(r["end_time"] is None for r in out.collect())


def test_info_golden(spark, maps7):
    info = dataset_info(maps7, "A", value_min_col="v", value_max_col="v")
    assert info.start_time == START
    assert info.end_time == datetime(2001, 4, 23, 12, 5, 45)
    # GRASS reports this in seconds (= 14 days): the non-zero seconds
    # field of the start time selects 'second' as the smallest observed
    # unit (temporal_granularity.py:339-529 + compute_datetime_delta's
    # mixed-unit accumulation) — verified against the reference algorithm.
    assert info.granularity == "1209600 seconds"
    assert info.map_time == "interval"
    assert info.number_of_maps == 7
    assert info.min_min == 100.0 and info.max_max == 600.0


def test_info_point_maps(spark):
    df = spark.createDataFrame(
        [("x", datetime(2001, 1, 1)), ("y", datetime(2001, 1, 2))],
        ["map_id", "t"],
    )
    info = dataset_info(register_maps(df, ts_col="t"), "P")
    assert info.map_time == "point"
    assert info.granularity == "1 day"


def test_list_maps_where_order_columns(spark, maps7):
    out = list_maps(
        maps7,
        columns=["map_id", "start_time"],
        where="start_time >= '2001-03-01'",
        order="start_time",
    )
    ids = [r["map_id"] for r in out.collect()]
    assert ids == ["a5", "a6", "a7"]


def test_list_maps_formats(spark, maps7):
    js = list_maps(maps7, columns=["map_id"], order="map_id", fmt="json")
    assert [d["map_id"] for d in json.loads(js)] == [f"a{i+1}" for i in range(7)]
    csv = list_maps(maps7, columns=["map_id"], order="map_id", fmt="csv")
    assert csv.splitlines()[0] == "map_id" and csv.splitlines()[1] == "a1"
    plain = list_maps(maps7, columns=["map_id", "v"], order="map_id", fmt="plain")
    assert plain.splitlines()[0] == "a1|100.0"


def test_tier_catalog_roundtrip(spark, tmp_path):
    cat = TierCatalog(str(tmp_path / "cat"))
    cat.create("t1h", "1 hour", source="raw", aggregation=["count", "sum"],
               command="test")
    assert cat.tiers()["t1h"]["granularity"] == "1 hour"
    df = spark.createDataFrame(
        [("c", datetime(2024, 1, 1, h), 1.0) for h in range(3)],
        ["conv_id", "bucket_start", "v"],
    )
    df.write.parquet(cat.path("t1h"))
    info = cat.info(spark, "t1h", value_min_col="v")
    assert info.number_of_maps == 3
    assert info.granularity == "1 hour"


def test_export_import_roundtrip(spark, tmp_path, maps7):
    from grass_spark.catalog import export_dataset, import_dataset

    p = str(tmp_path / "archive")
    export_dataset(maps7, p, name="A", value_min_col="v", value_max_col="v")
    back, meta = import_dataset(spark, p)
    assert back.count() == 7
    assert meta["name"] == "A"
    assert meta["granularity"] == "1209600 seconds"
    assert meta["map_time"] == "interval"
    assert meta["start_time"].startswith("2001-01-15T12:05:45")
    # data equality
    assert maps7.exceptAll(back).count() == 0


def test_import_schema_mismatch_rejected(spark, tmp_path, maps7):
    import json as _json
    from grass_spark.catalog import export_dataset, import_dataset

    p = str(tmp_path / "archive2")
    export_dataset(maps7, p, name="A")
    mp = f"{p}/metadata.json"
    meta = _json.load(open(mp))
    meta["schema"]["fields"] = meta["schema"]["fields"][:-1]
    _json.dump(meta, open(mp, "w"))
    with pytest.raises(ValueError, match="schema mismatch"):
        import_dataset(spark, p)
