"""Cascading retention-tier rollups — the engine's continuous aggregates.

The reference's STRDS + ``t.rast.aggregate`` pair (SURVEY §2.3) becomes a
three-tier cascade over the transcript table:

    raw turns  ->  1-minute tier  ->  1-hour tier  ->  1-day tier

Each tier holds, per (conv_id, bucket): turn counts, per-role activity,
tool-call activity, and text-length statistics — the transcript
translation of GRASS's per-granule r.series rollup (SURVEY §1.6).

Spark-first decisions, justified at 100 TB:

* **Algebraic cascade.** count/sum/min/max re-aggregate exactly from
  the tier below (hour from minute, day from hour), so the raw table is
  scanned ONCE; upper tiers read ~1/60th and ~1/1440th of the data.
  avg is derived (sum/count), never stored pre-divided.  Holistic
  kernels (median/quantile/mode/diversity) are NOT cascadable —
  :func:`grass_spark.operators.aggregate.aggregate` computes them from
  raw where needed (the reference recomputes from source maps too).
* **One shuffle per tier.** groupBy(conv_id, bucket) is the only
  shuffle; Spark's partial aggregation (map-side combine) absorbs
  hot-conversation skew because the grouping key includes the bucket —
  a conversation with 10^9 turns spreads over ~10^6 minute buckets.
  For the write, rows are explicitly repartitioned by
  (day, salted hash(conv_id)) so no single output task owns a hot day.
* **Idempotent, resumable writes.** Output is parquet partitioned by
  bucket day; dynamic partition overwrite + the checkpoint manifest
  (:mod:`grass_spark.manifest`) make mid-tier resume a pure diff of
  target days vs completed days.  Iceberg is the production target
  (same write shape: ``overwritePartitions``); parquet is the sandbox
  fallback — no Iceberg runtime in this container.

Reference parity anchors: granule alignment `t.rast.aggregate.py:152-185`,
NULL handling `lib/stats/c_ave.c:14-15`, metadata/lineage
`strds_metadata_table.sql:8-27`.
"""

from __future__ import annotations

import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from grass_spark.functions.granularity import (
    adjust_datetime_to_granularity,
    bucket_end_col,
    bucket_start_col,
)
from grass_spark.manifest import CheckpointManifest, PartitionEntry, TierRecord

ROLES = ("user", "assistant", "system", "tool")

#: tier name -> granularity, in cascade order
DEFAULT_TIERS = (("t1m", "1 minute"), ("t1h", "1 hour"), ("t1d", "1 day"))


def _role_count(role: str):
    return F.sum(F.when(F.col("role") == role, 1).otherwise(0)).alias(f"n_{role}")


def rollup_from_raw(
    df: DataFrame, granularity: str, origin, keys: list[str],
    sketches: bool = False,
) -> DataFrame:
    """First tier: aggregate raw turns into buckets.

    All metrics are algebraic so upper tiers can re-aggregate exactly.
    ``len_*`` skip NULL text like every GRASS kernel skips NULL cells.

    ``sketches=True`` additionally carries two mergeable DataSketches
    per bucket (operators/sketches.py): a KLL quantile sketch over turn
    length and an HLL distinct sketch over turn text — so upper tiers
    can answer approximate HOLISTIC stats (len quantiles, distinct
    messages) by sketch merge instead of a raw re-scan.  Opt-in, never
    a parity substitute for the exact kernels.
    """
    length = F.length("text")
    bucketed = df.withColumn("bucket_start", bucket_start_col("ts", granularity, origin))
    extra = []
    if sketches:
        from grass_spark.operators.sketches import DEFAULT_K, DEFAULT_LG_K

        extra = [
            F.kll_sketch_agg_double(
                length.cast("double"), F.lit(DEFAULT_K)
            ).alias("len_kll"),
            F.hll_sketch_agg(F.col("text"), F.lit(DEFAULT_LG_K)).alias("txt_hll"),
        ]
    return bucketed.groupBy(*keys, "bucket_start").agg(
        F.count(F.lit(1)).alias("turn_cnt"),
        *[_role_count(r) for r in ROLES],
        F.count("tool").alias("tool_calls"),
        F.count(length).alias("len_cnt"),
        F.sum(length).alias("len_sum"),
        F.min(length).alias("len_min"),
        F.max(length).alias("len_max"),
        *extra,
    )


def rollup_from_tier(lower: DataFrame, granularity: str, origin, keys: list[str]) -> DataFrame:
    """Re-aggregate an existing tier into coarser buckets (exact for all
    algebraic metrics — this is what makes the cascade read 1/60th of
    the data instead of rescanning raw).  Sketch columns, when the
    lower tier carries them, fold by MERGE — the holistic-stat analog
    of the same property."""
    bucketed = lower.withColumn(
        "bucket_start", bucket_start_col(F.col("bucket_start"), granularity, origin)
    )
    extra = []
    if "len_kll" in lower.columns:
        extra = [
            F.kll_merge_agg_double("len_kll").alias("len_kll"),
            F.hll_union_agg("txt_hll", True).alias("txt_hll"),
        ]
    return bucketed.groupBy(*keys, "bucket_start").agg(
        F.sum("turn_cnt").alias("turn_cnt"),
        *[F.sum(f"n_{r}").alias(f"n_{r}") for r in ROLES],
        F.sum("tool_calls").alias("tool_calls"),
        F.sum("len_cnt").alias("len_cnt"),
        F.sum("len_sum").alias("len_sum"),
        F.min("len_min").alias("len_min"),
        F.max("len_max").alias("len_max"),
        *extra,
    )


def with_derived(df: DataFrame, granularity: str) -> DataFrame:
    """Derived (non-stored) metrics: avg text length + bucket_end."""
    return df.withColumn(
        "len_avg", F.col("len_sum") / F.nullif(F.col("len_cnt"), F.lit(0))
    ).withColumn("bucket_end", bucket_end_col(F.col("bucket_start"), granularity))


def _collapse_day_ranges(days: set[str]) -> list[tuple[str, str]]:
    """Collapse 'yyyy-MM-dd' strings into [start_day, end_day_exclusive)
    ranges of consecutive days (resume typically skips one big prefix)."""
    from datetime import date, timedelta

    if not days:
        return []
    ds = sorted(date.fromisoformat(d) for d in days)
    out: list[tuple[str, str]] = []
    lo = prev = ds[0]
    for d in ds[1:]:
        if d == prev + timedelta(days=1):
            prev = d
            continue
        out.append((lo.isoformat(), (prev + timedelta(days=1)).isoformat()))
        lo = prev = d
    out.append((lo.isoformat(), (prev + timedelta(days=1)).isoformat()))
    return out


def _ts_not_in_days(ts_col: str, days: set[str]):
    """Predicate excluding rows whose ts falls on any done day, built as
    plain timestamp-range comparisons so parquet row-group min/max stats
    (and Iceberg partition transforms) can skip data — an expression
    like date_format(ts) IN (...) cannot be pushed down."""
    cond = F.lit(True)
    for lo, hi in _collapse_day_ranges(days):
        in_range = (F.col(ts_col) >= F.lit(f"{lo} 00:00:00").cast("timestamp")) & (
            F.col(ts_col) < F.lit(f"{hi} 00:00:00").cast("timestamp")
        )
        cond = cond & ~in_range
    return cond


@dataclass
class TierResult:
    name: str
    granularity: str
    path: str
    days_written: list[str]
    rows_out: int
    duration_s: float


class RollupPipeline:
    """Materialize the tier cascade with manifest-backed resume.

    ``base_dir`` holds one parquet dataset per tier plus
    ``manifest.json``.  ``run()`` may be interrupted at any point and
    re-invoked: completed (tier, day) partitions are skipped, partial
    partitions are overwritten idempotently.
    """

    #: integer metric columns carried by every tier (compressible)
    INT_METRICS = ("turn_cnt", *[f"n_{r}" for r in ROLES], "tool_calls",
                   "len_cnt", "len_sum", "len_min", "len_max")

    def __init__(
        self,
        base_dir: str,
        tiers: tuple[tuple[str, str], ...] = DEFAULT_TIERS,
        keys: list[str] | None = None,
        write_salt: int = 4,
        compress: bool = False,
        compress_tiers: tuple[str, ...] | None = None,
        layout: str = "plain",
        buckets: int | dict[str, int] = 64,
        min_bucket_day_rows: int = 4096,
        sketches: bool = False,
    ):
        if layout not in ("plain", "bucketed", "auto"):
            raise ValueError(
                f"layout must be 'plain', 'bucketed' or 'auto', got {layout!r}"
            )
        self.base_dir = base_dir
        self.tiers = tiers
        self.keys = ["conv_id"] if keys is None else list(keys)
        self.write_salt = write_salt
        self.layout = layout
        # auto-layout density threshold: raw rows per (day, tier-0
        # bucket) below which the bucketed publish premium (measured
        # 1.4-2.1x on day-sparse shapes, BASELINE.md "Layout write-cost
        # comparison") is not repaid — the adversarial 10^8-turn shape
        # sits at ~220 rows/bucket-day (plain wins), the dense bench
        # shape at ~6k (bucketed wins); 4096 splits the measured configs
        self.min_bucket_day_rows = min_bucket_day_rows
        # opt-in mergeable-sketch tier path (operators/sketches.py):
        # tiers additionally carry KLL(len)/HLL(text) sketches so
        # approximate holistic stats fold tier-to-tier by merge instead
        # of re-scanning raw.  Incompatible with the block store (the
        # Gorilla codec covers INT_METRICS only).
        self.sketches = sketches
        if sketches and compress:
            raise ValueError(
                "sketches=True is incompatible with compress=True: the "
                "block store round-trips INT_METRICS only and would "
                "drop the sketch columns"
            )
        # per-tier bucket counts: upper tiers hold ~1/60th and ~1/1440th
        # of the rows, so one shared count explodes their (day, bucket)
        # file product on day-sparse data (measured 2x write premium at
        # 10^8 turns, BASELINE.md "Layout write-cost comparison").  Keep
        # counts power-of-two multiples of each other and enable
        # spark.sql.bucketing.coalesceBucketsInJoin.enabled if you need
        # cross-tier co-located joins with differing counts.
        self.buckets = buckets
        self.compress = compress
        # block stores only pay where groups are dense: the finest tier
        # compresses 5.8x, but a day tier's (conv, block) groups hold a
        # handful of points and the per-block headers EXCEED the data
        # (measured ratio 0.55) — so default to tier 0 only
        self.compress_tiers = (
            compress_tiers if compress_tiers is not None
            else (tiers[0][0],)
        )
        os.makedirs(base_dir, exist_ok=True)
        self.manifest = CheckpointManifest(os.path.join(base_dir, "manifest.json"))
        self._check_layout_pin()

    def tier_path(self, name: str) -> str:
        return os.path.join(self.base_dir, name)

    # -------------------------------------------------- bucketed layout
    def _check_layout_pin(self) -> None:
        """Pin (layout, buckets) on first use.  Files written with a
        different bucket count hash rows into DIFFERENT buckets — a
        mismatched re-open would silently produce wrong shuffle-free
        results, so it's a hard error, not a warning."""
        import json

        pin_path = os.path.join(self.base_dir, "_layout.json")
        has_tier_data = any(
            os.path.isdir(os.path.join(self.base_dir, name))
            for name, _ in self.tiers
        )
        if self.layout == "auto":
            if os.path.exists(pin_path):
                # an existing store's layout is a fact, not a choice —
                # adopt the pin (re-deciding would mix layouts)
                with open(pin_path) as f:
                    prior = json.load(f)
                self.layout = prior["layout"]
                if "buckets" in prior:
                    self.buckets = prior["buckets"]
                return
            if not has_tier_data:
                return  # defer: run() resolves from measured day density
            self.layout = "plain"  # legacy pre-pin files are plain
        pin = {"layout": self.layout}
        if self.layout == "bucketed":
            pin["buckets"] = self.buckets
        if os.path.exists(pin_path):
            with open(pin_path) as f:
                prior = json.load(f)
            if prior == pin:
                return
            if not has_tier_data:
                # a pin with no tier files behind it (constructed-but-
                # never-run pipeline, or a first run that crashed before
                # any write) constrains nothing — re-pin
                with open(pin_path, "w") as f:
                    json.dump(pin, f)
                return
            raise ValueError(
                f"tier store at {self.base_dir} was written with "
                f"{prior}; re-open with the same layout/buckets "
                f"(got {pin}) or use a fresh base_dir"
            )
        # no pin: a pre-pin store (tier dirs already on disk) can only
        # be the plain layout — adopting a 'bucketed' claim for files
        # that were never bucket-hashed would plan shuffle-free over
        # mis-clustered data (silently wrong results)
        if has_tier_data and self.layout == "bucketed":
            raise ValueError(
                f"tier store at {self.base_dir} predates the layout pin "
                "and its files are not bucketed; re-open with "
                "layout='plain' or publish into a fresh base_dir"
            )
        with open(pin_path, "w") as f:
            json.dump(pin, f)

    def _resolve_auto_layout(self, day_counts: dict[str, int]) -> None:
        """Pick plain vs bucketed from MEASURED day density (the rule
        BASELINE.md's write-cost matrix derives): the bucketed publish
        pays a 1.4-2.1x write premium when (day, bucket) files are tiny
        — day-sparse shapes route to plain; dense conversation-keyed
        days repay the premium with 0-Exchange reads.  The decision is
        pinned (a store never mixes layouts) and recorded in the
        manifest with its evidence."""
        vals = sorted(day_counts.values())
        median_day_rows = vals[len(vals) // 2]
        nb = self._buckets_for(self.tiers[0][0])
        dense = median_day_rows >= self.min_bucket_day_rows * nb
        self.layout = "bucketed" if dense else "plain"
        self._check_layout_pin()
        self.manifest.set_meta("layout_decision", {
            "layout": self.layout,
            "median_day_rows": int(median_day_rows),
            "n_days": len(vals),
            "buckets_t0": nb,
            "threshold_rows_per_bucket_day": self.min_bucket_day_rows,
        })

    def _buckets_for(self, name: str) -> int:
        if isinstance(self.buckets, dict):
            try:
                return int(self.buckets[name])
            except KeyError:
                raise ValueError(
                    f"buckets dict has no entry for tier {name!r}"
                ) from None
        return int(self.buckets)

    def _table_name(self, name: str) -> str:
        import hashlib

        h = hashlib.md5(os.path.abspath(self.base_dir).encode()).hexdigest()[:8]
        return f"rollup_{h}_{name}"

    def _attach_bucketed(self, spark: SparkSession, name: str) -> str:
        """Ensure the catalog entry for an on-disk bucketed tier exists
        (the in-memory catalog is session-scoped; tier FILES survive a
        restart, the table metadata does not).  Idempotent."""
        table = self._table_name(name)
        if not spark.catalog.tableExists(table):
            path = self.tier_path(name)
            schema = spark.read.parquet(path).drop("d").schema
            cols = ", ".join(
                f"`{f.name}` {f.dataType.simpleString()}" for f in schema.fields
            )
            ck = ", ".join(f"`{k}`" for k in self.keys)
            spark.sql(
                f"CREATE TABLE {table} ({cols}, d string) USING PARQUET "
                f"PARTITIONED BY (d) CLUSTERED BY ({ck}) "
                f"SORTED BY ({ck}, `bucket_start`) INTO {self._buckets_for(name)} BUCKETS "
                f"LOCATION '{path}'"
            )
            spark.catalog.recoverPartitions(table)
        return table

    def _read_tier_frame(self, spark: SparkSession, name: str) -> DataFrame:
        """Raw tier scan (no derived cols).  In the bucketed layout this
        MUST go through the catalog table — a path read would drop the
        bucket spec and re-introduce the cascade shuffles."""
        if self.layout == "bucketed":
            return spark.table(self._attach_bucketed(spark, name))
        # partition-type inference would surface d as DATE here while the
        # bucketed catalog table declares d STRING — cast so both layouts
        # expose the identical schema (predicates on cast(d) still prune:
        # they only involve the partition column)
        return spark.read.parquet(self.tier_path(name)).withColumn(
            "d", F.col("d").cast("string")
        )

    def read_tier(self, spark: SparkSession, name: str) -> DataFrame:
        gran = dict(self.tiers)[name]
        return with_derived(self._read_tier_frame(spark, name), gran)

    def read_tier_approx(
        self, spark: SparkSession, name: str,
        quantiles: dict[str, float] | None = None,
    ) -> DataFrame:
        """Approximate holistic stats of a sketch-carrying tier
        (``sketches=True`` pipelines): per-bucket approx turn-length
        quantiles + distinct-message estimate, straight from the stored
        sketches — no raw re-scan.  Never a parity substitute for the
        exact kernels (rank-error bounds pinned in
        tests/test_sketches.py)."""
        tier = self._read_tier_frame(spark, name)
        if "len_kll" not in tier.columns:
            raise ValueError(
                f"tier {name!r} carries no sketches; build the store "
                "with RollupPipeline(sketches=True)"
            )
        from grass_spark.operators.sketches import sketch_stats

        return sketch_stats(
            tier, quantiles, kll_col="len_kll", hll_col="txt_hll"
        )

    def read_tier_from_blocks(self, spark: SparkSession, name: str) -> DataFrame:
        """Decode a tier back from its compressed block store (bit-exact
        inverse of the codec; see operators/blocks.py)."""
        from grass_spark.operators.blocks import decompress_blocks

        blocks = spark.read.parquet(self.tier_path(name) + "_blocks")
        out = decompress_blocks(
            blocks, keys=self.keys, ts_col="bucket_start",
            int_cols=list(self.INT_METRICS),
        )
        # int metrics decode as double (NULL-capable); tiers are non-null
        for m in self.INT_METRICS:
            out = out.withColumn(m, F.col(m).cast("long"))
        return out

    def _write_blocks(self, spark: SparkSession, name: str) -> dict:
        """Materialize the tier's Gorilla block store (delta-of-delta
        timestamps + delta ints inside Arrow pandas UDFs) and return the
        codec metrics (ratio recorded per tier in the manifest)."""
        from grass_spark.operators.blocks import compress_blocks, compression_report

        tier = spark.read.parquet(self.tier_path(name))
        blocks = compress_blocks(
            tier, keys=self.keys, ts_col="bucket_start",
            int_cols=list(self.INT_METRICS), block="month",
        )
        bpath = self.tier_path(name) + "_blocks"
        blocks.write.mode("overwrite").parquet(bpath)
        rep = compression_report(spark.read.parquet(bpath)).collect()[0]
        return {
            "n_blocks": int(rep["n_blocks"]), "n_points": int(rep["n_points"]),
            "raw_bytes": int(rep["raw_bytes"]), "comp_bytes": int(rep["comp_bytes"]),
            "ratio": float(rep["ratio"]),
        }

    # ------------------------------------------------------------------
    def run(
        self,
        raw: DataFrame,
        input_fingerprint: str = "",
        resume: bool = True,
        incremental: bool = False,
    ) -> list[TierResult]:
        """Materialize all tiers.

        ``incremental=True`` enables content-based resume for appends
        (the reference's ``update_from_registered_maps`` role): a day
        counts as done when its RAW ROW COUNT matches the manifest's
        recorded ``rows_in``, regardless of fingerprint — so appending
        new days (or backfilling an old one) recomputes exactly the
        changed days plus their upper-tier dependents.  Assumes
        append-only raw data (counts identify content).
        """
        spark = raw.sparkSession
        spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")

        t0 = raw.agg(F.min("ts").alias("s")).collect()[0]["s"]
        if t0 is None:
            raise ValueError("empty raw input")

        # one cheap aggregate: raw rows per day (stored as rows_in
        # lineage; drives incremental dirty-day detection)
        raw_day_counts = {
            str(r["d"]): int(r["n"])
            for r in raw.groupBy(
                F.date_format("ts", "yyyy-MM-dd").alias("d")
            ).agg(F.count(F.lit(1)).alias("n")).collect()
        }

        if self.layout == "auto":
            self._resolve_auto_layout(raw_day_counts)

        results: list[TierResult] = []
        lower: DataFrame | None = None
        lower_days: set[str] | None = None  # days (re)written in the lower tier
        for i, (name, gran) in enumerate(self.tiers):
            origin = adjust_datetime_to_granularity(t0, gran)
            src = "raw" if i == 0 else self.tiers[i - 1][0]
            self.manifest.register_tier(
                name,
                TierRecord(
                    granularity=gran,
                    source=src,
                    aggregation=["count", "sum", "min", "max"],
                    command=f"rollup(tier={name}, gran={gran!r}, keys={self.keys}, src={src})",
                ),
            )
            done_now: set[str] = set()
            if resume and incremental and i == 0:
                recorded = self.manifest.rows_in_map(name)
                done_now = {
                    d for d, n in recorded.items()
                    if raw_day_counts.get(d) == n
                }
            elif resume and incremental:
                done_now = self.manifest.done_parts(name, None)
            elif resume:
                done_now = self.manifest.done_parts(name, input_fingerprint or None)
            if resume and lower_days is not None:
                done_now -= lower_days
            if i == 0:
                src = raw
                if done_now:
                    # pushable ts-range prefilter: row-group stats /
                    # Iceberg day() partitions skip done days at the scan
                    src = src.filter(_ts_not_in_days("ts", done_now))
                tiered = rollup_from_raw(
                    src, gran, origin, self.keys, sketches=self.sketches
                )
            else:
                src = lower
                if done_now:
                    # d is the lower tier's PARTITION column -> real
                    # partition pruning, not just a row filter
                    src = src.filter(~F.col("d").isin(sorted(done_now)))
                tiered = rollup_from_tier(src, gran, origin, self.keys)

            res = self._write_tier(
                spark, tiered, name, gran,
                input_fingerprint=input_fingerprint,
                done=done_now if resume else set(),
                rows_in_map=raw_day_counts if i == 0 else None,
                n_days=len(raw_day_counts),
            )
            results.append(res)
            if self.compress and name in self.compress_tiers and res.days_written:
                codec = self._write_blocks(spark, name)
                rec = self.manifest.tiers()[name]
                self.manifest.register_tier(
                    name,
                    TierRecord(
                        granularity=rec["granularity"], source=rec["source"],
                        aggregation=rec["aggregation"],
                        command=rec["command"] + f" | blocks(ratio={codec['ratio']})",
                    ),
                )
            lower = self._read_tier_frame(spark, name)
            lower_days = set(res.days_written)
        return results

    # ------------------------------------------------------------------
    def _write_tier_bucketed(
        self, spark: SparkSession, tiered: DataFrame, name: str,
        n_days: int | None = None,
    ) -> None:
        """Publish one tier in the composed partitionBy(d) +
        bucketBy(buckets, keys) layout — day pruning AND shuffle-free
        per-conversation plans from the SAME table.

        OSS Spark's ``insertInto`` rejects ``bucketBy`` (PLANS.md
        "Bucketed tier storage"), so incremental day overwrite cannot go
        through the writer.  Instead changed days are written to a
        STAGING table with the identical bucket spec and their day
        directories are swapped into the main table's location, then the
        catalog is refreshed — the parquet-sandbox analog of Iceberg's
        ``overwritePartitions`` commit (operators/iceberg.py holds the
        production mapping).  Bucket file names carry the bucket id, so
        a moved file keeps its bucket assignment.
        """
        import shutil

        path = self.tier_path(name)
        # Route rows by (day, writer-bucket-id): a (day, bucket) group
        # never splits across tasks (F.hash IS the writer's murmur3
        # bucket hash), so each task writes one file per group it holds
        # — total files stay days × buckets either way, but parallelism
        # follows the data instead of the bucket count.  At cluster
        # scale this is the standard dynamic-partition write shape
        # (one ~128-512 MB file per task); one-task-per-bucket (the
        # first cut) serialized every day's file behind one task.  The
        # task count is capped: an uncapped days×buckets product
        # schedules hundreds of thousands of near-empty tasks on a
        # small box (measured 65k-task pathology; the launch overhead
        # eats the parallelism win).  4096 is a deliberate FLOOR, not a
        # parallelism-relative value — tasks below ~4k are cheap on the
        # measured hardware and the floor keeps per-task file batches
        # small so a hot day still spreads; 64×parallelism takes over
        # on big sessions.
        nb = self._buckets_for(name)
        bucket_id = F.pmod(F.hash(*self.keys), F.lit(nb))
        par = spark.sparkContext.defaultParallelism
        cap = max(4096, 64 * par)
        n_tasks = min(n_days * nb, cap) if n_days else nb
        out = tiered.repartition(n_tasks, F.col("d"), bucket_id)
        fresh = not os.path.isdir(path)
        if fresh:
            table = self._table_name(name)
            spark.sql(f"DROP TABLE IF EXISTS {table}")
            (
                out.write.mode("overwrite").format("parquet")
                .bucketBy(nb, *self.keys)
                .sortBy(*self.keys, "bucket_start")
                .partitionBy("d").option("path", path)
                .saveAsTable(table)
            )
            return
        stg_path, stg_table = path + "_stg", self._table_name(name) + "_stg"
        shutil.rmtree(stg_path, ignore_errors=True)
        spark.sql(f"DROP TABLE IF EXISTS {stg_table}")
        (
            out.write.mode("overwrite").format("parquet")
            .bucketBy(nb, *self.keys)
            .sortBy(*self.keys, "bucket_start")
            .partitionBy("d").option("path", stg_path)
            .saveAsTable(stg_table)
        )
        staged = [
            e for e in os.listdir(stg_path) if e.startswith("d=")
        ] if os.path.isdir(stg_path) else []
        # Crash-consistent swap: old day -> hidden aside dir (leading
        # dot: invisible to Spark's file listing / partition discovery),
        # staged day in, THEN delete the aside.  A crash at any point
        # leaves either the old day, the aside (restored below), or the
        # new day — never a half-swapped directory a reader could see.
        # Leftover asides from a prior crash: restore when the original
        # day dir is missing (crash fell between aside and move-in —
        # the restore stands even if this run doesn't re-stage that
        # day), else the move-in completed and the aside is garbage.
        for e in os.listdir(path):
            if e.startswith(".d=") and e.endswith(".old"):
                orig = os.path.join(path, e[1:-len(".old")])
                if not os.path.isdir(orig):
                    os.rename(os.path.join(path, e), orig)
                else:
                    shutil.rmtree(os.path.join(path, e), ignore_errors=True)
        for part in staged:
            dst = os.path.join(path, part)
            aside = os.path.join(path, f".{part}.old")
            if os.path.isdir(dst):
                os.rename(dst, aside)
            shutil.move(os.path.join(stg_path, part), dst)
            shutil.rmtree(aside, ignore_errors=True)
        spark.sql(f"DROP TABLE IF EXISTS {stg_table}")
        shutil.rmtree(stg_path, ignore_errors=True)
        table = self._attach_bucketed(spark, name)
        spark.sql(f"REFRESH TABLE {table}")
        spark.catalog.recoverPartitions(table)

    # ------------------------------------------------------------------
    def _write_tier(
        self,
        spark: SparkSession,
        tiered: DataFrame,
        name: str,
        gran: str,
        input_fingerprint: str,
        done: set[str],
        rows_in_map: dict[str, int] | None,
        n_days: int | None = None,
    ) -> TierResult:
        """Write one tier partitioned by bucket day, skipping ``done``
        days (already excluded upstream; the filter here is the safety
        net that keeps the write idempotent even if a caller passes an
        unfiltered frame)."""
        path = self.tier_path(name)
        tiered = tiered.withColumn("d", F.date_format("bucket_start", "yyyy-MM-dd"))

        if done:
            tiered = tiered.filter(~F.col("d").isin(sorted(done)))

        start = time.time()
        if self.layout == "bucketed":
            self._write_tier_bucketed(spark, tiered, name, n_days=n_days)
        else:
            # spread each day over `write_salt` tasks so a hot day/conv
            # doesn't serialize the write; sort by (conv_id, bucket) for
            # range-clustered files (predicate-prunable on both).
            out = (
                tiered.repartition(
                    F.col("d"), F.pmod(F.xxhash64(*self.keys), F.lit(self.write_salt))
                )
                .sortWithinPartitions(*self.keys, "bucket_start")
            )
            out.write.mode("overwrite").partitionBy("d").parquet(path)
        duration = time.time() - start

        # per-partition metrics from the files just written (metadata-only
        # count: parquet footers, no data scan)
        written = spark.read.parquet(path).withColumn("d", F.col("d").cast("string"))
        if done:
            written = written.filter(~F.col("d").isin(sorted(done)))
        per_day = {
            r["d"]: r["n"]
            for r in written.groupBy("d").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        entries = []
        for day, n in sorted(per_day.items()):
            day_dir = os.path.join(path, f"d={day}")
            files = [
                os.path.join(day_dir, f)
                for f in os.listdir(day_dir)
                if f.endswith(".parquet")
            ] if os.path.isdir(day_dir) else []
            entries.append(
                PartitionEntry(
                    tier=name,
                    part=day,
                    rows_in=int((rows_in_map or {}).get(day, 0)),
                    rows_out=int(n),
                    bytes_out=sum(os.path.getsize(f) for f in files),
                    n_files=len(files),
                    duration_s=round(duration, 3),
                    input_fingerprint=input_fingerprint,
                )
            )
        if entries:
            self.manifest.record_many(entries)
        return TierResult(
            name=name,
            granularity=gran,
            path=path,
            days_written=sorted(per_day),
            rows_out=int(sum(per_day.values())),
            duration_s=duration,
        )
