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
    max_pairs_filter: str | None = None,
) -> DataFrame:
    """``t.topology``: count Allen relations over all ordered pairs of
    extents (abstract_space_time_dataset.py:536-554).  Self range join —
    quadratic by definition, so callers at scale pass
    ``max_pairs_filter`` (e.g. a key equality) to bound the pair space
    the way the reference bounds it to one dataset."""
    a = df.select(
        F.col(start_col).alias("a_s"),
        (F.col(end_col) if end_col else F.lit(None).cast("timestamp")).alias("a_e"),
        *( [F.col(id_col).alias("a_id")] if id_col else [F.monotonically_increasing_id().alias("a_id")] ),
    )
    b = a.select(
        F.col("a_s").alias("b_s"), F.col("a_e").alias("b_e"), F.col("a_id").alias("b_id")
    )
    pairs = a.crossJoin(b).filter(F.col("a_id") != F.col("b_id"))
    if max_pairs_filter:
        pairs = pairs.filter(F.expr(max_pairs_filter))
    return (
        pairs.select(rel.relation_name("a_s", "a_e", "b_s", "b_e").alias("relation"))
        .groupBy("relation")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
