"""As-of (point-in-time) join: match each left row to the nearest
right row at-or-before (backward) / at-or-after (forward) its
timestamp, per key.

Reference analog: the reference's sampling machinery maps each granule
to the maps whose extent covers it with a topology priority
(``t.sample`` / sample_by_dataset, ``python/grass/temporal/
temporal_granularity.py`` + sampling in ``temporal_algebra.py``); an
as-of join is the instant-data version of the same "which observation
governs this moment" question, and the standard operator every
timeseries store (kdb, QuestDB, Pandas ``merge_asof``) ships.

Spark has no built-in as-of join; the naive encodings are either a
range join (quadratic blow-up under AQE-less planning) or a
``last_value`` window over the bare key — which single-tasks a hot
key.  This implementation uses the same exact bucket decomposition as
:mod:`grass_spark.operators.transitions`:

* union-tag left and right rows, bucket by ``date_trunc(bucket, ts)``;
* WITHIN a ``(key, bucket)`` window, a running ``last(payload,
  ignorenulls)`` resolves matches whose governing right row is in the
  same bucket — sort partitions are bounded by per-key-per-bucket
  volume;
* ACROSS buckets, the governing row is the latest right row of an
  EARLIER bucket: per ``(key, bucket)`` the final right payload is a
  map-side-combinable ``max(struct(ts, tie, payload))`` aggregate, and
  a calendar-bounded per-key window carries it forward (one row per
  active bucket per key, regardless of row volume).

The decomposition is exact for any bucket granularity because bucket
boundaries respect timestamp order; a hotter key just needs a finer
``bucket``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F
from pyspark.sql import types as T

_BUCKETS = ("day", "hour", "minute")
_BUCKET_SECONDS = {"day": 86400, "hour": 3600, "minute": 60}


def asof_join(
    left: DataFrame,
    right: DataFrame,
    *,
    on: str | list[str] | tuple[str, ...],
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: list[str] | tuple[str, ...] | None = None,
    suffix: str = "_r",
    direction: str = "backward",
    tolerance_seconds: int | None = None,
    tie_col: str | None = None,
    bucket: str = "day",
    checkpoint: bool = True,
) -> DataFrame:
    """Left as-of join: every left row, plus the matching right row's
    ``right_ts`` (as ``{right_ts}{suffix}``) and ``right_cols`` (each
    as ``{col}{suffix}``), NULL where no right row qualifies.

    ``direction="backward"`` matches the greatest ``right_ts <=
    left_ts``; ``"forward"`` the smallest ``right_ts >= left_ts``
    (both boundary-inclusive, DuckDB/Pandas ``merge_asof`` semantics).
    ``tolerance_seconds`` voids matches farther than the tolerance.

    Ties — several right rows at the winning timestamp — resolve to
    the greatest (backward) / smallest (forward) ``tie_col``; without a
    ``tie_col`` the right side must be unique per ``(on, right_ts)``
    or the matched payload among tied rows is undefined.

    ``checkpoint`` (default) cuts the windowed frame's two-consumer
    re-execution with a lazy ``localCheckpoint``; pass ``False`` for
    plan inspection of the raw lineage.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("asof_join: direction must be backward|forward")
    if bucket not in _BUCKETS:
        raise ValueError(f"asof_join: bucket must be one of {_BUCKETS}")
    keys = [on] if isinstance(on, str) else list(on)
    if right_cols is None:
        right_cols = [
            c for c in right.columns if c not in (*keys, right_ts)
        ]
    back = direction == "backward"

    tie = F.col(tie_col) if tie_col is not None else F.lit(0)
    payload = F.struct(
        F.col(right_ts).alias("_mts"),
        *[F.col(c).alias(c) for c in right_cols],
    )
    # multi-column keys pack into one struct (join/partition/group on
    # "_k" behaves like the multi-column equi-key: null members drop)
    key_struct = F.struct(*[F.col(k) for k in keys])
    r = right.select(
        key_struct.alias("_k"),
        F.col(right_ts).alias("_t"),
        # right sorts BEFORE left at equal ts going backward (<= match),
        # AFTER going forward — so the frame boundary includes it.
        F.lit(0 if back else 1).alias("_rsort"),
        tie.alias("_tie"),
        payload.alias("_p"),
        F.lit(None).cast(
            T.StructType(
                [T.StructField(f.name, f.dataType) for f in left.schema]
            )
        ).alias("_lrow"),
    )
    lrow = F.struct(*[F.col(c) for c in left.columns])
    l = left.select(
        key_struct.alias("_k"),
        F.col(left_ts).alias("_t"),
        F.lit(1 if back else 0).alias("_rsort"),
        F.lit(None).cast(r.schema["_tie"].dataType).alias("_tie"),
        F.lit(None).cast(r.schema["_p"].dataType).alias("_p"),
        lrow.alias("_lrow"),
    )
    # integer bucket id (micros div width): the decomposition is exact
    # for any monotone bucketing, and an 8-byte int sorts/shuffles
    # cheaper than a truncated TIMESTAMP (bandwidth-bound sort; PLANS.md)
    width = _BUCKET_SECONDS[bucket] * 1_000_000
    tagged = l.unionByName(r).withColumn(
        "_b", F.expr(f"unix_micros(CAST(_t AS TIMESTAMP)) div {width}")
    )

    # (a) governing right row within the same (key, bucket), plus a
    # bucket-edge flag — SAME window spec, so one WindowExec and ONE
    # full-frame sort total.  The bucket's extreme right payload IS the
    # running value at its last (backward) / first (forward) row, so no
    # per-bucket struct election is needed (min/max over STRUCT falls
    # back to SortAggregate = a second hidden full sort; PLANS.md).
    w_in = Window.partitionBy("_k", "_b").orderBy("_t", "_rsort", "_tie")
    if back:
        within = F.last("_p", ignorenulls=True).over(
            w_in.rowsBetween(Window.unboundedPreceding, 0)
        )
        edge = F.lead("_t").over(w_in).isNull()  # last row of bucket
    else:
        within = F.first("_p", ignorenulls=True).over(
            w_in.rowsBetween(0, Window.unboundedFollowing)
        )
        edge = F.lag("_t").over(w_in).isNull()  # first row of bucket
    win = tagged.withColumn("_m_in", within).withColumn("_edge", edge)
    if checkpoint:
        win = win.localCheckpoint(eager=False)

    # (b) carry across buckets over the one-row-per-active-bucket frame
    # (calendar-bounded per key regardless of volume).
    w_seq = Window.partitionBy("_k").orderBy("_b")
    if back:
        carry = F.last("_ext", ignorenulls=True).over(
            w_seq.rowsBetween(Window.unboundedPreceding, -1)
        )
    else:
        carry = F.first("_ext", ignorenulls=True).over(
            w_seq.rowsBetween(1, Window.unboundedFollowing)
        )
    carries = (
        win.where(F.col("_edge"))
        .select("_k", "_b", F.col("_m_in").alias("_ext"))
        .select("_k", "_b", carry.alias("_m_carry"))
    )

    joined = (
        win.where(F.col("_lrow").isNotNull())
        .join(carries, ["_k", "_b"], "left")
        .withColumn("_m", F.coalesce("_m_in", "_m_carry"))
    )
    if tolerance_seconds is not None:
        # interval arithmetic compares exact integer micros (works for
        # TIMESTAMP and TIMESTAMP_NTZ; a cast-to-double-seconds lag can
        # flip at the boundary in the last ulp)
        tol = F.expr(f"INTERVAL {int(tolerance_seconds)} SECOND")
        ok = (
            F.col("_m._mts") >= F.col("_t") - tol
            if back
            else F.col("_m._mts") <= F.col("_t") + tol
        )
        joined = joined.withColumn("_m", F.when(ok, F.col("_m")))

    out_cols = [F.col(f"_lrow.`{c}`").alias(c) for c in left.columns]
    out_cols.append(F.col("_m._mts").alias(f"{right_ts}{suffix}"))
    out_cols.extend(
        F.col(f"_m.`{c}`").alias(f"{c}{suffix}") for c in right_cols
    )
    return joined.select(*out_cols)


#: per-row grid chunk — bounds the sequence() array any single row
#: materializes (a key spanning years at a fine step would otherwise
#: build one multi-MB array in a single task)
_GRID_BLOCK = 4096


def resample_locf(
    df: DataFrame,
    *,
    step_seconds: int,
    on: str | list[str] | tuple[str, ...] = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    tie_col: str | None = None,
    max_staleness_seconds: int | None = None,
    bucket: str = "day",
    grid_col: str = "gts",
) -> DataFrame:
    """Resample an irregular event series onto a regular time grid with
    last-observation-carried-forward.

    Reference analog: ``t.rast.aggregate``'s granule lattice +
    sample_by_dataset's "which map governs this granule" resolution
    (``python/grass/temporal/temporal_granularity.py``) applied to
    instant observations — the LOCF resample every timeseries store
    ships (kdb ``aj`` on a grid, QuestDB ``SAMPLE BY ... FILL(PREV)``).

    Grid points are the multiples of ``step_seconds`` (epoch-aligned in
    NAIVE timestamp space — tz-free for TIMESTAMP_NTZ inputs) covering
    each key's ``[min(ts), max(ts)]`` span.  Each grid point carries the
    governing observation's timestamp (``{ts_col}_r``) and value
    (``{value_col}_r``); ``max_staleness_seconds`` voids observations
    older than the bound (NULL, like a gap).  Ties at one timestamp
    resolve to the greatest ``tie_col`` (see :func:`asof_join`).

    Scale shape: the span census is one map-side-combinable groupBy;
    the grid is output-proportional (span/step rows per key), generated
    in <= ``_GRID_BLOCK``-element chunks so no single row materializes
    an unbounded array; the LOCF itself is :func:`asof_join`'s bucket
    decomposition (bounded sort partitions, calendar-bounded carry).
    Timestamps must be >= epoch (integer ``div`` is used for the grid
    index; both engines truncate toward zero on positives).
    """
    if step_seconds <= 0:
        raise ValueError("resample_locf: step_seconds must be positive")
    keys = [on] if isinstance(on, str) else list(on)
    step_us = int(step_seconds) * 1_000_000
    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"CAST(`{ts_col}` AS TIMESTAMP_NTZ))"
    )
    spans = df.groupBy(*keys).agg(
        F.min(us).alias("_lo"), F.max(us).alias("_hi")
    )
    klo = F.expr(f"(_lo + {step_us - 1}) div {step_us}")
    khi = F.expr(f"_hi div {step_us}")
    blocks = (
        spans.select(*keys, klo.alias("_klo"), khi.alias("_khi"))
        .where(F.col("_klo") <= F.col("_khi"))
        .select(
            *keys, "_klo", "_khi",
            F.explode(
                F.sequence(
                    F.expr(f"_klo div {_GRID_BLOCK}"),
                    F.expr(f"_khi div {_GRID_BLOCK}"),
                )
            ).alias("_blk"),
        )
    )
    grid = blocks.select(
        *keys,
        F.explode(
            F.sequence(
                F.greatest(F.col("_klo"), F.col("_blk") * _GRID_BLOCK),
                F.least(
                    F.col("_khi"), (F.col("_blk") + 1) * _GRID_BLOCK - 1
                ),
            )
        ).alias("_gk"),
    ).select(
        *keys,
        F.expr(
            f"timestampadd(MICROSECOND, _gk * {step_us}, "
            "TIMESTAMP_NTZ '1970-01-01 00:00:00')"
        ).alias(grid_col),
    )
    return asof_join(
        grid,
        df.select(*keys, ts_col, value_col,
                  *([tie_col] if tie_col else [])),
        on=keys,
        left_ts=grid_col,
        right_ts=ts_col,
        right_cols=[value_col],
        tie_col=tie_col,
        tolerance_seconds=max_staleness_seconds,
        direction="backward",
        bucket=bucket,
    )
