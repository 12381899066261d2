"""Topology-driven sampling & aggregation over irregular granules.

The general case the bucket-projection fast path can't handle: granules
come from *another dataset* (``t.rast.aggregate.ds``,
``temporal/t.rast.aggregate.ds/t.rast.aggregate.ds.py:146-170``) or the
caller wants arbitrary Allen relations (``t.sample`` /
``sample_by_dataset``, ``abstract_space_time_dataset.py:627-850``).

The reference builds an R*-tree over one side and probes the other
(``spatio_temporal_relationships.py:496-587``).  Spark-first: the
granule side is small (thousands of rows — it's a calendar), so we
**broadcast** it and range-join with the exact Allen predicates; no
shuffle of the big side at all, and Catalyst turns the broadcast range
join into a BroadcastNestedLoopJoin whose inner loop is the R-tree
probe's moral equivalent.  At 100 TB the big side streams through
map tasks once.

``resample_by_granularity`` additionally applies the reference's
relation priority EQUAL > DURING > OVERLAPS > OVERLAPPED > CONTAINS
(``abstract_space_time_dataset.py:1380-1399``) when several maps hit
one granule.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from grass_spark.functions import relations as rel
from grass_spark.functions.kernels import agg_exprs

#: resample relation priority — abstract_space_time_dataset.py:1380
RESAMPLE_PRIORITY = ("equal", "during", "overlaps", "overlapped", "contains")


def _granule_side(granules: DataFrame, start_col: str, end_col: str) -> DataFrame:
    return F.broadcast(
        granules.select(
            F.col(start_col).cast("timestamp").alias("_g_start"),
            F.col(end_col).cast("timestamp").alias("_g_end"),
        ).distinct()
    )


def sample_by_dataset(
    maps: DataFrame,
    granules: DataFrame,
    relations: list[str],
    *,
    map_start: str = "ts",
    map_end: str | None = None,
    granule_start: str = "bucket_start",
    granule_end: str = "bucket_end",
) -> DataFrame:
    """``t.sample``: tag every map row with the granule(s) it relates to
    by any of ``relations`` (map side = A, granule side = B, matching
    the reference's sample semantics).  Rows matching no granule are
    dropped (the reference emits empty sample lists for those granules;
    use a right join downstream if gaps must be visible)."""
    g = _granule_side(granules, granule_start, granule_end)
    a_e = F.col(map_end) if map_end else F.lit(None).cast("timestamp")
    cond = rel.any_relation(
        relations, F.col(map_start), a_e, F.col("_g_start"), F.col("_g_end")
    )
    return (
        maps.join(g, on=cond, how="inner")
        .withColumnRenamed("_g_start", "granule_start")
        .withColumnRenamed("_g_end", "granule_end")
    )


def aggregate_by_dataset(
    maps: DataFrame,
    granules: DataFrame,
    methods: list[str],
    *,
    keys: list[str] | None = None,
    value_col: str = "value",
    idx_col: str | None = None,
    sampling: list[str] | None = None,
    map_start: str = "ts",
    map_end: str | None = None,
    granule_start: str = "bucket_start",
    granule_end: str = "bucket_end",
    quantile: float | None = None,
) -> DataFrame:
    """``t.rast.aggregate.ds``: r.series kernels per granule of another
    dataset.  Default sampling = contains (granule contains map), like
    ``t.rast.aggregate.ds.py`` option default."""
    keys = ["conv_id"] if keys is None else list(keys)
    sampling = ["contains"] if sampling is None else list(sampling)
    g = _granule_side(granules, granule_start, granule_end)
    a_e = F.col(map_end) if map_end else F.lit(None).cast("timestamp")
    # sampling names granule-relative relations (granule CONTAINS map):
    # granule is A in the predicate, map is B
    cond = rel.any_relation(
        sampling, F.col("_g_start"), F.col("_g_end"), F.col(map_start), a_e
    )
    joined = maps.join(g, on=cond, how="inner")
    aggs = agg_exprs(methods, value_col, idx_col=idx_col, quantile=quantile)
    return (
        joined.groupBy(*keys, "_g_start", "_g_end")
        .agg(*aggs)
        .withColumnRenamed("_g_start", "granule_start")
        .withColumnRenamed("_g_end", "granule_end")
    )


def resample_by_granularity(
    maps: DataFrame,
    granules: DataFrame,
    *,
    map_id: str = "map_id",
    map_start: str = "ts",
    map_end: str | None = None,
    granule_start: str = "bucket_start",
    granule_end: str = "bucket_end",
) -> DataFrame:
    """``resample_maplist_by_granularity``: per granule pick ONE map by
    relation priority EQUAL > DURING > OVERLAPS > OVERLAPPED > CONTAINS;
    ties inside a class -> earliest map start (the reference walks maps
    in start order and keeps the first hit); granules with no map are
    kept with a NULL map (gap objects, id None)."""
    g = granules.select(
        F.col(granule_start).cast("timestamp").alias("granule_start"),
        F.col(granule_end).cast("timestamp").alias("granule_end"),
    ).distinct()
    a_s, a_e = F.col(map_start), (F.col(map_end) if map_end else F.lit(None).cast("timestamp"))
    b_s, b_e = F.col("granule_start"), F.col("granule_end")

    prio = F.lit(None).cast("int")
    for i, name in reversed(list(enumerate(RESAMPLE_PRIORITY))):
        prio = F.when(rel.RELATIONS[name](a_s, a_e, b_s, b_e), F.lit(i)).otherwise(prio)

    cond = rel.any_relation(list(RESAMPLE_PRIORITY), a_s, a_e, b_s, b_e)
    joined = F.broadcast(g).join(maps, on=cond, how="left").withColumn("_prio", prio)
    best = F.min_by(
        F.struct(F.col(map_id).alias("map_id"), a_s.alias("map_start")),
        F.struct(F.col("_prio"), a_s),
    )
    return (
        joined.groupBy("granule_start", "granule_end")
        .agg(best.alias("_best"))
        .select(
            "granule_start", "granule_end",
            F.col("_best.map_id").alias("map_id"),
            F.col("_best.map_start").alias("map_start"),
        )
    )


def topology_census(
    df: DataFrame,
    *,
    start_col: str = "ts",
    end_col: str | None = None,
    id_col: str | None = None,
    keys: list[str] | None = None,
    band_seconds: int = 86400,
) -> DataFrame:
    """``t.topology``: count Allen relations over ordered pairs of
    extents (abstract_space_time_dataset.py:536-554).

    The reference builds relations through an R*-tree probe
    (``spatio_temporal_relationships.py:496-587``): each map's
    [start, end] box is searched against the tree, so only pairs whose
    extents *intersect or touch* ever get a relation — strictly
    disjoint pairs are never recorded.  This operator reproduces that
    bound distributively: extents are exploded into the ``band_seconds``
    buckets they cover, candidates come from a bucket **equi-join**
    (never a cross join), duplicates from multi-bucket overlap are
    deduped, and strictly-disjoint same-bucket pairs are dropped —
    exactly the R*-tree's candidate set.  ``keys`` adds an extra
    equality to the join (the reference's one-dataset bound).

    Scale shape: explode factor is ceil(extent/band) per row (pick a
    band at least the typical extent length), one shuffle for the
    bucket join, one for the pair dedup.  No CartesianProduct at any
    size — enforced by a plan-contract test.
    """
    keys = list(keys or [])
    width = F.lit(band_seconds * 1_000_000)
    s = F.col(start_col).cast("timestamp")
    e = (F.col(end_col) if end_col else F.col(start_col)).cast("timestamp")
    a = df.select(
        *keys,
        s.alias("a_s"),
        (F.col(end_col).cast("timestamp") if end_col else F.lit(None).cast("timestamp")).alias("a_e"),
        *([F.col(id_col).alias("a_id")] if id_col else [F.monotonically_increasing_id().alias("a_id")]),
        F.explode(
            F.sequence(
                F.floor(F.unix_micros(s) / width),
                F.floor(F.unix_micros(F.coalesce(e, s)) / width),
            )
        ).alias("band"),
    )
    b = a.select(
        *[F.col(k).alias(f"b_{k}") for k in keys],
        F.col("a_s").alias("b_s"), F.col("a_e").alias("b_e"),
        F.col("a_id").alias("b_id"), F.col("band").alias("b_band"),
    )
    cond = F.col("band") == F.col("b_band")
    for k in keys:
        cond = cond & (F.col(k) == F.col(f"b_{k}"))
    pairs = (
        a.join(b, on=cond, how="inner")
        .filter(F.col("a_id") != F.col("b_id"))
        .select("a_id", "b_id", "a_s", "a_e", "b_s", "b_e")
        .distinct()
    )
    return (
        pairs.select(rel.relation_name("a_s", "a_e", "b_s", "b_e").alias("relation"))
        .filter(~F.col("relation").isin("before", "after"))
        .groupBy("relation")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
