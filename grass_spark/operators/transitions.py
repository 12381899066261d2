"""Event-sequence analytics: Markov transition matrices and trailing-
window rate anomalies over the ``events`` table.

Reference analog: the reference's t.rast.accdetect / accumulate family
asks "what happens NEXT in this series" per cell
(``temporal/t.rast.accdetect``); a transition matrix is the same
consecutive-step question asked across event types per user, and rate
anomalies are the temporal-neighbourhood deviation question
(``r.series`` stddev kernels over a rolling window,
``raster/r.series/main.c``) asked over per-user daily activity.

Scale notes (the whole point of the shapes here):

* :func:`event_transitions` needs GLOBAL per-user event ordering, but
  never sorts a whole user in one task.  Consecutive pairs decompose
  exactly into (a) pairs WITHIN a time bucket — a ``lead()`` window
  partitioned by ``(user, bucket)``, so the sort partition is bounded
  by per-user-per-bucket volume, not per-user volume — plus (b) pairs
  that CROSS a bucket boundary: the last event of a bucket pairs with
  the first event of the user's next active bucket.  First/last per
  bucket is a map-side-combinable ``min/max(struct(ts, id, type))``
  aggregate (a 10^8-event bot day is absorbed by partial aggregation),
  and the stitch ``lag()`` runs over the per-bucket frame — one row per
  ACTIVE bucket per user, bounded by calendar span regardless of event
  volume.  A hotter stream just needs a finer ``bucket`` ("hour",
  "minute"); the decomposition is exact for any granularity because
  bucket boundaries respect the (ts, id) event order.
* :func:`rate_anomalies` groups on ``(user, day)`` FIRST (the hot user
  spreads across days; partial aggregation absorbs volume map-side),
  then windows over the per-user-day frame — the second exchange moves
  only calendar-bounded rows.  Do NOT "optimize" this into a single
  ``repartition(user)`` pass: that shuffles raw event volume onto the
  bare user key and re-creates the hot-key funnel.
* z-scores compose from EXACT integer power sums (``sum``, ``sum of
  squares``, ``count`` over the trailing range window) — integer sums
  are order-independent, so the derived doubles are bit-identical
  across engines and across shuffle orders; ``stddev`` built-ins are
  not (distributed moment updates differ in the last ulp).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window, functions as F

_BUCKETS = ("day", "hour", "minute")
_BUCKET_SECONDS = {"day": 86400, "hour": 3600, "minute": 60}

#: transition matrices / paths only make sense over small type
#: vocabularies; the dictionary-encode pass collects the distinct
#: types and guards against misuse on a high-cardinality column
_MAX_TYPES = 65_535


def _bucket_idx(ts_col: str, bucket: str) -> Column:
    """Integer bucket id (micros div bucket-width).  The decomposition
    is exact for ANY monotone bucketing, so the exact boundary placement
    is irrelevant — an 8-byte int sorts/shuffles cheaper than the
    truncated TIMESTAMP it replaces (the window sort is
    memory-bandwidth-bound; see PLANS.md)."""
    width = _BUCKET_SECONDS[bucket] * 1_000_000
    return F.expr(
        f"unix_micros(CAST(`{ts_col}` AS TIMESTAMP)) div {width}"
    )


def _type_codes(df: DataFrame, type_col: str) -> list:
    """Distinct type vocabulary, sorted for determinism.  One extra
    column-pruned scan (dictionary-encoded parquet column: cheap) that
    buys a ~2x smaller window-sort payload — measured 32.1 -> 13.6 s on
    the 24M-event leg (PLANS.md)."""
    vals = [
        r[0]
        for r in df.select(type_col).distinct().limit(_MAX_TYPES + 1)
        .collect()
    ]
    if len(vals) > _MAX_TYPES:
        raise ValueError(
            f"event type vocabulary exceeds {_MAX_TYPES}; "
            "pass encode_types=False"
        )
    return sorted(vals, key=lambda v: (v is None, v))


def event_transitions(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    bucket: str = "day",
    encode_types: bool = True,
    checkpoint: bool = True,
) -> DataFrame:
    """Markov transition matrix over consecutive events per user.

    Events are ordered per user by ``(ts, id)`` (the id breaks exact
    timestamp ties deterministically); every consecutive pair
    contributes one ``from_type -> to_type`` observation.  Returns
    ``(from_type, to_type, n, p)`` where ``p = n / sum(n per
    from_type)`` rounded to 6 dp.

    ``bucket`` bounds the window-sort partition at per-user-per-bucket
    volume (see module docstring for the exact boundary-stitch
    decomposition); results are identical for any granularity.
    ``encode_types`` (default) dictionary-encodes the type strings to
    small ints before the window sort — the sort is bandwidth-bound
    and the measured win is ~2.4x (PLANS.md); disabled automatically
    when the vocabulary contains NULL.

    ONE full-frame sort total: the same window pass emits the lead
    pairs AND flags each bucket's first/last row (lag/lead nulls in
    the same window spec — one WindowExec), so the boundary-stitch
    election aggregates over <= 2 rows per bucket instead of the raw
    frame (min/max over STRUCT falls back to SortAggregate — on the
    raw frame that was a SECOND hidden full sort; PLANS.md).
    ``checkpoint`` (default) cuts the two-consumer re-execution with a
    lazy localCheckpoint; pass ``False`` for plan inspection.
    """
    if bucket not in _BUCKETS:
        raise ValueError(f"event_transitions: bucket must be one of {_BUCKETS}")

    types: list = []
    if encode_types:
        types = _type_codes(df, type_col)
        encode_types = None not in types

    et: Column = F.col(type_col)
    if encode_types:
        enc = F.create_map(
            *[x for t, i in ((t, i) for i, t in enumerate(types))
              for x in (F.lit(t), F.lit(i))]
        )
        et = enc[F.col(type_col)].cast("int")

    base = df.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        et.alias("_et"),
    ).withColumn("_b", _bucket_idx("_ts", bucket))

    # ONE window pass: lead pairs + first/last-of-bucket flags (same
    # partition/order spec -> a single WindowExec, a single full sort).
    w_in = Window.partitionBy("_u", "_b").orderBy("_ts", "_id")
    win = base.select(
        "_u", "_b", "_et",
        F.lead("_et").over(w_in).alias("_nxt"),
        F.lag("_et").over(w_in).isNull().alias("_is_first"),
    )
    if checkpoint:
        win = win.localCheckpoint(eager=False)

    # (a) pairs within a bucket
    within = win.where(F.col("_nxt").isNotNull()).select(
        F.col("_et").alias("from_type"), F.col("_nxt").alias("to_type")
    )

    # (b) pairs across bucket boundaries: last-of-bucket -> first-of-
    # next active bucket.  The edge frame is <= 2 rows per bucket, so
    # the struct election (SortAggregate) runs over a calendar-bounded
    # input, and the lag window sees one row per active bucket per user.
    edges = win.where(F.col("_is_first") | F.col("_nxt").isNull())
    ends = edges.groupBy("_u", "_b").agg(
        F.min(F.when(F.col("_is_first"), F.col("_et"))).alias("_first_et"),
        F.max(
            F.when(F.col("_nxt").isNull(), F.col("_et"))
        ).alias("_last_et"),
    )
    w_seq = Window.partitionBy("_u").orderBy("_b")
    across = (
        ends.withColumn("_prev_last", F.lag("_last_et").over(w_seq))
        .where(F.col("_prev_last").isNotNull())
        .select(
            F.col("_prev_last").alias("from_type"),
            F.col("_first_et").alias("to_type"),
        )
    )

    matrix = (
        within.unionByName(across)
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    # |types|^2 rows at most — the normalising window is trivially small.
    w_from = Window.partitionBy("from_type")
    dec_f, dec_t = F.col("from_type"), F.col("to_type")
    if encode_types:
        arr = F.array(*[F.lit(t) for t in types])
        dec_f = F.element_at(arr, F.col("from_type") + 1)
        dec_t = F.element_at(arr, F.col("to_type") + 1)
    return matrix.select(
        dec_f.alias("from_type"),
        dec_t.alias("to_type"),
        "n",
        F.round(F.col("n") / F.sum("n").over(w_from), 6).alias("p"),
    )


def event_ngrams(
    df: DataFrame,
    n: int = 3,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    bucket: str = "day",
    encode_types: bool = True,
    checkpoint: bool = True,
) -> DataFrame:
    """Consecutive event-type n-gram ("path") counts per user.

    Generalizes :func:`event_transitions` (n=2) to arbitrary path
    length: every window of ``n`` consecutive events (global per-user
    ``(ts, id)`` order) contributes one ``(g1, .., gn)`` observation.
    Returns ``(g1..gn, n_paths)``.

    Scale shape: n-grams fully inside a time bucket come from a lead
    chain over the within-``(user, bucket)`` window (sort partitions
    bounded by per-user-per-bucket volume).  N-grams SPANNING a bucket
    boundary use at most ``n-1`` events from any one bucket, and those
    events are necessarily among the bucket's first/last ``n-1`` rows —
    so they are recovered exactly from an "edge rows" frame of at most
    ``2(n-1)`` rows per active bucket (calendar-bounded), where a lead
    chain stitches across buckets and per-row ``(bucket, rank, count)``
    metadata validates that each link is truly consecutive in the full
    frame (same bucket and rank+1, or last-of-bucket to
    first-of-next-active-bucket).  Grams entirely inside one bucket are
    excluded from the edge pass (``b_first == b_last``), so nothing is
    double-counted.
    """
    if n < 2:
        raise ValueError("event_ngrams: n must be >= 2")
    if bucket not in _BUCKETS:
        raise ValueError(f"event_ngrams: bucket must be one of {_BUCKETS}")

    types: list = []
    if encode_types:
        types = _type_codes(df, type_col)
        encode_types = None not in types
    et: Column = F.col(type_col)
    if encode_types:
        enc = F.create_map(
            *[x for t, i in ((t, i) for i, t in enumerate(types))
              for x in (F.lit(t), F.lit(i))]
        )
        et = enc[F.col(type_col)].cast("int")

    base = df.select(
        F.col(user_col).alias("_u"),
        F.col(ts_col).alias("_ts"),
        F.col(id_col).alias("_id"),
        et.alias("_et"),
    ).withColumn("_b", _bucket_idx("_ts", bucket))

    gcols = [f"g{i + 1}" for i in range(n)]

    # ONE window pass: the lead chain, row_number, and the full-frame
    # count share the (user, bucket) partitioning — one exchange, one
    # sort (the count's WindowExec has no ordering requirement and
    # reuses the sorted child).  Both consumers read the checkpoint.
    w_in = Window.partitionBy("_u", "_b").orderBy("_ts", "_id")
    w_cnt = Window.partitionBy("_u", "_b")
    win = base.select(
        "_u", "_b", "_ts", "_id", "_et",
        *[F.lead("_et", i).over(w_in).alias(f"_l{i}") for i in range(1, n)],
        F.row_number().over(w_in).alias("_rn"),
        F.count(F.lit(1)).over(w_cnt).alias("_cnt"),
    )
    if checkpoint:
        win = win.localCheckpoint(eager=False)

    # (a) n-grams fully inside a bucket
    within = win.where(F.col(f"_l{n - 1}").isNotNull()).select(
        F.col("_et").alias(gcols[0]),
        *[F.col(f"_l{i}").alias(gcols[i]) for i in range(1, n)],
    )

    # (b) spanning n-grams from the edge frame (first/last n-1 rows per
    # bucket, <= 2(n-1) rows per active bucket — calendar-bounded)
    edge = win.where(
        (F.col("_rn") <= n - 1) | (F.col("_rn") > F.col("_cnt") - (n - 1))
    ).select(
        "_u", "_ts", "_id",
        F.struct("_b", "_rn", "_cnt", "_et").alias("_s0"),
    )
    w_seq = Window.partitionBy("_u").orderBy("_ts", "_id")
    for i in range(1, n):
        edge = edge.withColumn(f"_s{i}", F.lead("_s0", i).over(w_seq))
    link_ok = F.lit(True)
    for i in range(1, n):
        a, b = F.col(f"_s{i - 1}"), F.col(f"_s{i}")
        link_ok = link_ok & (
            ((b["_b"] == a["_b"]) & (b["_rn"] == a["_rn"] + 1))
            | ((b["_b"] != a["_b"]) & (a["_rn"] == a["_cnt"])
               & (b["_rn"] == 1))
        )
    spans = F.col(f"_s{n - 1}")["_b"] != F.col("_s0")["_b"]
    across = (
        edge.where(F.col(f"_s{n - 1}").isNotNull() & link_ok & spans)
        .select(*[
            F.col(f"_s{i}")["_et"].alias(gcols[i]) for i in range(n)
        ])
    )

    out = (
        within.unionByName(across)
        .groupBy(*gcols)
        .agg(F.count(F.lit(1)).alias("n_paths"))
    )
    if encode_types:
        arr = F.array(*[F.lit(t) for t in types])
        out = out.select(
            *[F.element_at(arr, F.col(g) + 1).alias(g) for g in gcols],
            "n_paths",
        )
    return out


def sessionize_events(
    df: DataFrame,
    timeout_s: int,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    bucket: str = "day",
    checkpoint: bool = True,
) -> DataFrame:
    """Inactivity-gap sessionization for UNBOUNDED per-user event
    streams (0-based ``session_idx`` + ``session_id`` per user).

    :func:`grass_spark.operators.sessionize.sessionize` windows the
    bare key — fine for conversations (naturally bounded), a hot-key
    funnel for users (a bot's entire history lands in one sort task).
    This variant applies the bucket decomposition: the boundary flag
    (gap strictly greater than ``timeout_s``) resolves within the
    ``(user, bucket)`` window for non-first rows; each bucket's FIRST
    row compares against the previous active bucket's ``max(ts)``
    (calendar-bounded carry window); and the running boundary count =
    carried per-bucket offset + the bucket-first flag + the
    within-bucket cumulative sum.  Exact for any bucket granularity.

    The windowed frame feeds BOTH the output join and the per-bucket
    totals (the flag sum needs intra-bucket order, so it cannot be a
    combinable aggregate on the raw frame); ``checkpoint=True``
    (default) cuts the multi-consumer re-execution with a lazy
    ``localCheckpoint`` — the funnel/prepare_corpus pattern; pass
    ``False`` for plan inspection of the raw lineage.
    """
    if timeout_s <= 0:
        raise ValueError("sessionize_events: timeout_s must be positive")
    if bucket not in _BUCKETS:
        raise ValueError(f"sessionize_events: bucket must be one of {_BUCKETS}")

    tol = F.expr(f"INTERVAL {int(timeout_s)} SECOND")
    base = df.withColumn("_b", _bucket_idx(ts_col, bucket))

    w_in = Window.partitionBy(user_col, "_b").orderBy(ts_col, id_col)
    prev = F.lag(ts_col).over(w_in)
    # interval comparison = exact integer micros (no double-seconds lag)
    gap_flag = F.when(
        prev.isNotNull() & (F.col(ts_col) > prev + tol), 1
    ).otherwise(0)
    cum_in = F.sum(gap_flag).over(
        w_in.rowsBetween(Window.unboundedPreceding, 0)
    )
    flagged = base.withColumn("_cum_in", cum_in)
    if checkpoint:
        flagged = flagged.localCheckpoint(eager=False)

    w_seq = Window.partitionBy(user_col).orderBy("_b")
    bucket_first_flag = F.when(
        F.lag("_last_ts").over(w_seq).isNull()
        | (F.col("_first_ts") > F.lag("_last_ts").over(w_seq) + tol),
        1,
    ).otherwise(0)
    bucket_totals = (
        flagged.groupBy(user_col, "_b")
        .agg(
            F.max("_cum_in").alias("_n_flags"),
            F.min(ts_col).alias("_first_ts"),
            F.max(ts_col).alias("_last_ts"),
        )
        .withColumn("_f", bucket_first_flag)
        .withColumn(
            "_off",
            F.coalesce(
                F.sum(F.col("_n_flags") + F.col("_f")).over(
                    w_seq.rowsBetween(Window.unboundedPreceding, -1)
                ),
                F.lit(0),
            ),
        )
        .select(user_col, "_b", "_f", "_off")
    )

    out = flagged.join(bucket_totals, [user_col, "_b"]).withColumn(
        "session_idx",
        (F.col("_off") + F.col("_f") + F.col("_cum_in") - 1).cast("long"),
    )
    sid = F.concat_ws(
        "#", F.col(user_col).cast("string"),
        F.col("session_idx").cast("string"),
    )
    return out.withColumn("session_id", sid).drop("_b", "_cum_in", "_f", "_off")


def rate_anomalies(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    trailing_days: int = 7,
    min_days: int = 3,
) -> DataFrame:
    """Per-(user, day) activity z-score vs the user's trailing window.

    ``z = (n_events - mean_prev) / stddev_pop_prev`` over the
    ``trailing_days`` days strictly before the row's day (range frame
    on the day NUMBER, so calendar gaps are honoured — a 7-day trail
    sees at most 7 calendar days, not 7 rows).  ``z`` is NULL when
    fewer than ``min_days`` prior active days exist in the window or
    when the prior counts have zero variance.  Returns ``(user_col,
    day, n_events, n_prev, z)`` with ``z`` rounded to 6 dp.
    """
    if trailing_days < 1:
        raise ValueError("rate_anomalies: trailing_days must be >= 1")
    if min_days < 1:
        raise ValueError("rate_anomalies: min_days must be >= 1")

    daily = (
        df.select(
            F.col(user_col).alias("_u"),
            F.to_date(F.date_trunc("day", F.col(ts_col))).alias("day"),
        )
        .groupBy("_u", "day")
        .agg(F.count(F.lit(1)).alias("n_events"))
        .withColumn("_dn", F.datediff("day", F.lit("1970-01-01")))
    )

    w = (
        Window.partitionBy("_u")
        .orderBy("_dn")
        .rangeBetween(-int(trailing_days), -1)
    )
    s1 = F.sum("n_events").over(w)
    s2 = F.sum(F.col("n_events") * F.col("n_events")).over(w)
    m = F.count("n_events").over(w)

    mean = s1.cast("double") / m
    var = s2.cast("double") / m - mean * mean
    z = F.when(
        (m >= min_days) & (var > 0),
        F.round((F.col("n_events") - mean) / F.sqrt(var), 6),
    )
    return daily.select(
        F.col("_u").alias(user_col),
        "day",
        "n_events",
        F.coalesce(m, F.lit(0)).cast("int").alias("n_prev"),
        z.alias("z"),
    )


def interevent_stats(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    bucket: str = "day",
) -> DataFrame:
    """Inter-event gap statistics per user: gap count, mean / population
    stddev / min / max gap (seconds), and the coefficient of variation
    (burstiness: cv >> 1 = bursty, ~1 = Poisson, << 1 = regular).

    Reference analog: ``t.rast.list method=delta`` / deltagaps —
    consecutive-extent distances over a time series (``python/grass/
    temporal/list_stds.py``) — lifted to per-key event streams.

    The multiset of consecutive gaps is invariant under tie-order
    permutation (equal timestamps contribute the same zero gaps), so
    results are deterministic even with duplicate timestamps.

    Scale shape: the same exact bucket decomposition as
    :func:`event_transitions` — within-bucket gaps come from one
    bounded-partition window (sort keys are 8-byte micros), cross-bucket
    gaps from per-bucket plain ``min``/``max`` timestamps (map-side
    combinable) stitched by a calendar-bounded per-user window.  All
    statistics compose from EXACT integer power sums (bigint sum,
    DECIMAL(38) sum of squares — squared micro-gaps overflow bigint) so
    the only floating-point ops are a fixed expression over exact
    integers, bit-identical across engines (see rate_anomalies).
    """
    if bucket not in _BUCKETS:
        raise ValueError(f"interevent_stats: bucket must be one of {_BUCKETS}")

    us = F.expr(
        "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', "
        f"CAST(`{ts_col}` AS TIMESTAMP_NTZ))"
    )
    base = df.select(
        F.col(user_col).alias("_u"),
        us.alias("_us"),
        F.col(id_col).alias("_id"),
    ).withColumn("_b", F.expr(
        f"_us div {_BUCKET_SECONDS[bucket] * 1_000_000}"
    ))

    # (a) within-bucket gaps: one bounded-partition window
    w_in = Window.partitionBy("_u", "_b").orderBy("_us", "_id")
    within = (
        base.withColumn("_nxt", F.lead("_us").over(w_in))
        .where(F.col("_nxt").isNotNull())
        .select("_u", (F.col("_nxt") - F.col("_us")).alias("_g"))
    )

    # (b) cross-bucket gaps: per-bucket first/last micros are plain
    # combinable min/max; the lag window sees one row per active bucket
    ends = base.groupBy("_u", "_b").agg(
        F.min("_us").alias("_first"), F.max("_us").alias("_last")
    )
    w_seq = Window.partitionBy("_u").orderBy("_b")
    across = (
        ends.withColumn("_nxt_first", F.lead("_first").over(w_seq))
        .where(F.col("_nxt_first").isNotNull())
        .select("_u", (F.col("_nxt_first") - F.col("_last")).alias("_g"))
    )

    gaps = within.unionByName(across)
    dec = F.col("_g").cast("decimal(19,0)")
    stats = gaps.groupBy("_u").agg(
        F.count(F.lit(1)).alias("_n"),
        F.sum("_g").alias("_s1"),
        F.sum(dec * dec).alias("_s2"),
        F.min("_g").alias("_gmin"),
        F.max("_g").alias("_gmax"),
    )
    counts = base.groupBy("_u").agg(F.count(F.lit(1)).alias("n_events"))

    # fixed double expression over exact integers: deterministic
    mean = F.col("_s1").cast("double") / (F.col("_n") * F.lit(1000000.0))
    var = (
        F.col("_s2").cast("double") / (F.col("_n") * F.lit(1e12))
        - mean * mean
    )
    std = F.sqrt(F.greatest(F.round(var, 6), F.lit(0.0)))
    out = counts.join(stats, "_u", "left").select(
        F.col("_u").alias(user_col),
        "n_events",
        F.coalesce("_n", F.lit(0)).alias("n_gaps"),
        F.round(mean, 6).alias("mean_gap_s"),
        # greatest(NULL, 0.0) ignores the NULL in both engines — gate
        # explicitly so gap-less users read NULL, not 0.0
        F.when(F.col("_s2").isNotNull(), F.round(std, 6))
        .alias("std_gap_s"),
        F.when(
            F.round(mean, 6) > 0, F.round(std / F.round(mean, 6), 6)
        ).alias("cv_gap"),
        F.round(F.col("_gmin") / F.lit(1000000.0), 6).alias("min_gap_s"),
        F.round(F.col("_gmax") / F.lit(1000000.0), 6).alias("max_gap_s"),
    )
    return out


def transition_entropy(
    df: DataFrame,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    bucket: str = "day",
) -> DataFrame:
    """Per-state conditional entropy of the next-event distribution:
    how predictable is what follows each event type.

    Composes :func:`event_transitions` (same exact global-order
    decomposition) and reduces each ``from_type``'s transition counts
    to ``(from_type, n_obs, n_next_types, entropy, entropy_norm)``:
    ``entropy = -sum p ln p`` in nats over ``p = n / n_obs`` via the
    census identity ``ln(n_obs) - sum(n ln n) / n_obs`` (each
    ``n ln n`` term 6-dp rounded before the sum — the source_entropy
    portability discipline), ``entropy_norm`` divides by
    ``ln(n_next_types)`` (NULL for a single successor type — a fully
    deterministic state).
    """
    m = event_transitions(
        df,
        user_col=user_col,
        ts_col=ts_col,
        type_col=type_col,
        id_col=id_col,
        bucket=bucket,
    )
    agg = m.groupBy("from_type").agg(
        F.sum("n").alias("n_obs"),
        F.count(F.lit(1)).alias("n_next_types"),
        F.sum(
            F.round(
                F.col("n").cast("double") * F.log(F.col("n").cast("double")),
                6,
            )
        ).alias("_snln"),
    )
    nd = F.col("n_obs").cast("double")
    h = F.round(F.log(nd) - F.col("_snln") / nd, 6)
    return agg.select(
        "from_type",
        "n_obs",
        "n_next_types",
        h.alias("entropy"),
        F.when(
            F.col("n_next_types") > 1,
            F.round(h / F.log(F.col("n_next_types").cast("double")), 6),
        ).alias("entropy_norm"),
    ).orderBy("from_type")


def session_summary(
    df: DataFrame,
    timeout_s: int,
    *,
    user_col: str = "user_id",
    ts_col: str = "ts",
    id_col: str = "event_id",
    bucket: str = "day",
) -> DataFrame:
    """One-row engagement summary over :func:`sessionize_events`
    sessions: ``(n_sessions, n_users, n_events, bounce_sessions,
    bounce_rate, mean_depth, p50_depth, p95_depth)`` — a bounce is a
    single-event session; depth quantiles are exact Hyndman-Fan
    type 7 over the per-session depth multiset (== DuckDB
    ``quantile_cont``; the percentile buffer holds one value per
    SESSION — the documented ~10^8-per-group bound applies to the
    session count, not events).

    Scale shape: sessionization is the bucket-decomposed variant
    (bounded windows + calendar-bounded carry — never a bare per-user
    full-history sort); depths are one further map-side-combinable
    ``groupBy(user, session_idx)``; the summary is a single global
    aggregate.  ``bounce_rate`` and ``mean_depth`` are single double
    expressions over exact integers, round 6.
    """
    s = sessionize_events(
        df, timeout_s, user_col=user_col, ts_col=ts_col,
        id_col=id_col, bucket=bucket,
    )
    dep = (
        s.groupBy(F.col(user_col).alias("_u"), "session_idx")
        .agg(F.count(F.lit(1)).alias("_d"))
        # two consumers (count summary + percentile agg) — without the
        # checkpoint the whole sessionize window/join subtree runs twice
        .localCheckpoint(eager=False)
    )
    return dep.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.countDistinct("_u").alias("n_users"),
        F.sum("_d").alias("n_events"),
        F.sum(F.when(F.col("_d") == 1, 1).otherwise(0))
        .alias("bounce_sessions"),
    ).select(
        "n_sessions",
        "n_users",
        "n_events",
        "bounce_sessions",
        F.round(
            F.col("bounce_sessions").cast("double")
            / F.col("n_sessions").cast("double"),
            6,
        ).alias("bounce_rate"),
        F.round(
            F.col("n_events").cast("double")
            / F.col("n_sessions").cast("double"),
            6,
        ).alias("mean_depth"),
    ).crossJoin(
        F.broadcast(
            dep.agg(
                F.round(F.percentile("_d", F.lit(0.5)), 6)
                .alias("p50_depth"),
                F.round(F.percentile("_d", F.lit(0.95)), 6)
                .alias("p95_depth"),
            )
        )
    )


def next_event_top(
    df: DataFrame,
    *,
    k: int = 3,
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
    id_col: str = "event_id",
    bucket: str = "day",
) -> DataFrame:
    """Top-``k`` most likely next events per state: the
    :func:`event_transitions` census ranked within each ``from_type``
    by ``(n DESC, to_type ASC)`` — the lookup table a "predict the
    next action" feature actually ships.

    Returns ``(from_type, rank, to_type, n, p)``.  The ranking window
    partitions the transition CENSUS (type-cardinality-squared rows),
    never the corpus — all corpus-scale work happens inside the
    event_transitions bucket-stitch decomposition.
    """
    if k < 1:
        raise ValueError("next_event_top: k must be >= 1")
    m = event_transitions(
        df, user_col=user_col, ts_col=ts_col,
        type_col=type_col, id_col=id_col, bucket=bucket,
    )
    w = Window.partitionBy("from_type").orderBy(
        F.desc("n"), F.asc("to_type")
    )
    return (
        m.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= int(k))
        .select("from_type", "rank", "to_type", "n", "p")
        .orderBy("from_type", "rank")
    )
