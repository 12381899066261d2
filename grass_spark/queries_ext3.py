"""Third wave of driver-contract queries: the operators that round 1
left unit-only now get full Spark-vs-DuckDB oracle gates — t.shift,
relative-time aggregation, t.sample granule tagging, the banded
t.topology census, exact n-gram Jaccard verification over LSH
candidates, a DuckDB-portable SimHash, ``group=`` granule listing, the
algebra's relation-parameterized select, and ``merge()``.

Merged into the main registries by :mod:`grass_spark.queries`.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from grass_spark.queries_ext import N_BANDS, N_SIG, _SQL_SHINGLES, _sig_df, _t

EXT3_QUERIES: dict = {}
EXT3_ORACLES: dict = {}


def _usec(c, s):
    """c + s seconds, microsecond-exact (no calendar arithmetic).
    Casts TIMESTAMP_NTZ parquet columns to session-UTC TIMESTAMP first
    (unix_micros rejects NTZ; session tz is pinned to UTC)."""
    return F.timestamp_micros(F.unix_micros(c.cast("timestamp")) + int(s) * 1_000_000)


# ---------------------------------------------------------------------
# t.shift (SURVEY §2.5 — abstract_space_time_dataset.py:1953-2097)
# ---------------------------------------------------------------------


def q_shift_extents(spark, sf_dir):
    """t.shift by a fixed granularity: every extent's start AND end move
    by 26 hours; NULL ends stay NULL (instant maps stay instants)."""
    from grass_spark.operators.timeshift import shift

    ev = _t(spark, sf_dir, "events").select(
        "event_id",
        F.col("ts").alias("start_time"),
        # interval maps for even ids, instants (NULL end) for odd ids
        F.when(F.col("event_id") % 2 == 0, _usec(F.col("ts"), 1800))
        .alias("end_time"),
    )
    return shift(ev, "26 hours")


ORACLE_SHIFT_EXTENTS = """
SELECT event_id,
       ts + INTERVAL 26 HOUR AS start_time,
       CASE WHEN event_id % 2 = 0
            THEN ts + INTERVAL '1800 seconds' + INTERVAL 26 HOUR
       END AS end_time
FROM events
"""

EXT3_QUERIES["shift_extents"] = q_shift_extents
EXT3_ORACLES["shift_extents"] = ORACLE_SHIFT_EXTENTS


# ---------------------------------------------------------------------
# relative-time aggregation (SURVEY §1.4 — integer time + unit;
# map_tables_template.sql:28-34)
# ---------------------------------------------------------------------


def q_agg_relative(spark, sf_dir):
    """Relative-time aggregation: time is a plain integer (seconds id),
    granularity 604800 relative units, origin 0 — bucketing is integer
    floor division, no calendar arithmetic."""
    from grass_spark.operators.aggregate import aggregate_relative

    ev = _t(spark, sf_dir, "events").withColumn(
        "rel_t", F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / 1_000_000).cast("long")
    )
    out = aggregate_relative(
        ev, 604800, ["average", "count", "sum"],
        keys=["user_id"], ts_col="rel_t", origin=0,
    )
    return out.select(
        "user_id", "bucket_start", "bucket_end",
        F.round("average", 6).alias("avg_v"),
        F.col("count").alias("cnt_v"),
        F.round("sum", 6).alias("sum_v"),
    )


ORACLE_AGG_RELATIVE = """
WITH e AS (
  SELECT user_id,
         CAST(floor(epoch(ts)) AS BIGINT) AS rel_t,
         value AS v
  FROM events
)
SELECT user_id,
       CAST(floor(rel_t / 604800) * 604800 AS BIGINT) AS bucket_start,
       CAST(floor(rel_t / 604800) * 604800 + 604800 AS BIGINT) AS bucket_end,
       round(avg(v), 6) AS avg_v,
       CAST(count(v) AS BIGINT) AS cnt_v,
       round(sum(v), 6) AS sum_v
FROM e GROUP BY 1, 2, 3
"""

EXT3_QUERIES["agg_relative"] = q_agg_relative
EXT3_ORACLES["agg_relative"] = ORACLE_AGG_RELATIVE


# ---------------------------------------------------------------------
# t.sample — tag maps with the granules they fall in (SURVEY §2.5)
# ---------------------------------------------------------------------


def q_sample_granules(spark, sf_dir):
    """t.sample: every event (point-type map) tagged with the 6-hour
    granule of a sampler dataset (granules derived from purchase
    activity) via the ``start`` method — the reference uses start-time
    sampling for point maps (abstract_space_time_dataset.py:673-675)."""
    from grass_spark.operators.sample import sample_by_dataset

    ev = _t(spark, sf_dir, "events")
    g6 = F.timestamp_micros(
        F.floor(F.unix_micros(F.col("ts").cast("timestamp")) / (21600 * 1_000_000)).cast("long")
        * (21600 * 1_000_000)
    )
    granules = (
        ev.filter(F.col("event_type") == "purchase")
        .select(g6.alias("bucket_start"))
        .distinct()
        .withColumn("bucket_end", _usec(F.col("bucket_start"), 21600))
    )
    out = sample_by_dataset(ev, granules, ["start"], map_start="ts")
    return out.select("event_id", "granule_start", "granule_end")


ORACLE_SAMPLE_GRANULES = """
WITH g AS (
  SELECT DISTINCT
         make_timestamp(CAST(floor(epoch(ts) / 21600) * 21600 * 1000000
                             AS BIGINT)) AS gs
  FROM events WHERE event_type = 'purchase'
)
SELECT e.event_id,
       g.gs AS granule_start,
       g.gs + to_seconds(CAST(21600 AS BIGINT)) AS granule_end
FROM events e
JOIN g ON e.ts >= g.gs AND e.ts < g.gs + to_seconds(CAST(21600 AS BIGINT))
"""

EXT3_QUERIES["sample_granules"] = q_sample_granules
EXT3_ORACLES["sample_granules"] = ORACLE_SAMPLE_GRANULES


# ---------------------------------------------------------------------
# t.topology census (SURVEY §2.5) — banded equi-join, R*-tree-faithful
# ---------------------------------------------------------------------


def q_topology_census(spark, sf_dir):
    """t.topology counts over ordered pairs of extents that intersect
    or touch (the R*-tree candidate bound) — users <= 15, extent length
    = max(1, round(value)) seconds.  Counts are the builder's per-map
    list sums: a starts/finishes pair also increments during, a
    started/finished pair also increments contains
    (set_temporal_relationship, spatio_temporal_relationships.py:
    608-672; summed by count_temporal_topology_relationships)."""
    from grass_spark.operators.sample import topology_census

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("user_id") <= 15)
        .select(
            "event_id",
            F.col("ts"),
            F.timestamp_micros(
                F.unix_micros(F.col("ts").cast("timestamp"))
                + F.greatest(F.lit(1.0), F.round("value", 0)).cast("long")
                * 1_000_000
            ).alias("end_t"),
        )
    )
    return topology_census(
        ev, start_col="ts", end_col="end_t", id_col="event_id",
        band_seconds=3600,
    )


# Interval-only CASE chain in the reference dispatcher's priority order
# (temporal_extent.py:903-968; instant branches vanish — every extent
# here has a non-NULL end).  before/after can't occur: the join bound
# (a_e >= b_s AND b_e >= a_s) IS the census's "intersect or touch" rule.
ORACLE_TOPOLOGY_CENSUS = """
WITH e AS (
  SELECT event_id AS id, ts AS s,
         ts + to_seconds(CAST(greatest(1.0, round(value, 0)) AS BIGINT)) AS en
  FROM events WHERE user_id <= 15
), p AS (
  SELECT a.s AS a_s, a.en AS a_e, b.s AS b_s, b.en AS b_e
  FROM e a JOIN e b
    ON a.id <> b.id AND a.en >= b.s AND b.en >= a.s
), r AS (
  SELECT CASE
    WHEN a_s = b_s AND a_e = b_e THEN 'equal'
    WHEN a_s > b_s AND a_e < b_e THEN 'during'
    WHEN b_s > a_s AND b_e < a_e THEN 'contains'
    WHEN a_s < b_s AND a_e < b_e AND a_e > b_s THEN 'overlaps'
    WHEN b_s < a_s AND b_e < a_e AND b_e > a_s THEN 'overlapped'
    WHEN a_s > b_e THEN 'after'
    WHEN a_e < b_s THEN 'before'
    WHEN a_s = b_s AND a_e < b_e THEN 'starts'
    WHEN a_e = b_e AND a_s > b_s THEN 'finishes'
    WHEN a_s = b_s AND b_e < a_e THEN 'started'
    WHEN a_e = b_e AND b_s > a_s THEN 'finished'
    WHEN a_s = b_e THEN 'follows'
    WHEN a_e = b_s THEN 'precedes'
  END AS relation
  FROM p
)
SELECT relation, CAST(count(*) AS BIGINT) AS cnt
FROM (
  SELECT relation FROM r
  UNION ALL
  SELECT 'during' FROM r WHERE relation IN ('starts', 'finishes')
  UNION ALL
  SELECT 'contains' FROM r WHERE relation IN ('started', 'finished')
)
WHERE relation NOT IN ('before', 'after')
GROUP BY relation
"""

EXT3_QUERIES["topology_census"] = q_topology_census
EXT3_ORACLES["topology_census"] = ORACLE_TOPOLOGY_CENSUS


# ---------------------------------------------------------------------
# exact n-gram Jaccard verification over the md5-LSH candidate pairs
# (the verify pass of near_dedup — fully portable: DuckDB runs the
# identical shingle/minhash/band algorithm).  The candidate chain is
# shared between jaccard_verify and near_dedup_keep — one place for the
# signature/band algorithm in Spark AND in SQL.
# ---------------------------------------------------------------------


def _md5_cands(sh):
    """Banded md5-LSH candidate pairs from a prepared (doc_id, sh_arr)
    frame.  Signatures use the per-row fold (`_sig_df`'s 0-Exchange
    shape — identical values to a shuffled min() aggregate, PLANS.md
    "Signature-path fold"); the fold output is checkpointed so the band
    self-join doesn't recompute it per side."""
    nz = sh.where(F.size("sh_arr") > 0)

    def _slot(i: int):
        # NB: a 2-arg lambda would make F.transform pass the ARRAY
        # INDEX as the second argument — bind the slot via closure
        suffix = F.lit(f"#{i}")
        return F.array_min(
            F.transform(F.col("sh_arr"), lambda s: F.md5(F.concat(s, suffix)))
        ).alias(f"h{i}")

    sig = nz.select("doc_id", *[_slot(i) for i in range(N_SIG)]).localCheckpoint()
    bands = F.array(*[
        F.md5(F.concat(F.col(f"h{2*b}"), F.col(f"h{2*b+1}")))
        for b in range(N_BANDS)
    ])
    banded = sig.select("doc_id", F.posexplode(bands).alias("band_idx", "bh"))
    a = banded.select(F.col("doc_id").alias("id_a"), "band_idx", "bh")
    b = banded.select(F.col("doc_id").alias("id_b"), "band_idx", "bh")
    return (
        a.join(b, on=["band_idx", "bh"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )


_SQL_SIG2 = (
    "sig2 AS (SELECT doc_id, ["
    + ", ".join(f"min(md5(s || '#{i}'))" for i in range(N_SIG))
    + "] AS sig FROM sh GROUP BY doc_id)"
)

#: shared oracle chain: band buckets -> candidate pairs -> shingle sets
_SQL_CANDS = f"""{_SQL_SIG2},
band AS (
  SELECT doc_id,
         unnest(generate_series(0, {N_BANDS - 1})) AS band_idx,
         unnest(list_transform(generate_series(0, {N_BANDS - 1}),
                b -> md5(sig[2*b + 1] || sig[2*b + 2]))) AS bh
  FROM sig2
), cands AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM band a JOIN band b USING (band_idx, bh)
  WHERE a.doc_id < b.doc_id
), sets AS (
  SELECT doc_id, list_distinct(list(s)) AS ls FROM sh GROUP BY doc_id
)"""


def q_jaccard_verify(spark, sf_dir):
    """Exact word-3-gram Jaccard for every banded-LSH candidate pair."""
    from grass_spark.operators.dedup import ngram_jaccard_pairs, with_shingles

    d = _t(spark, sf_dir, "documents")
    # one shingle build for the whole query: the md5 signature path and
    # the exact-verify joins both read this checkpointed frame
    sh = with_shingles(d, "text", 3).select("doc_id", "sh_arr").localCheckpoint()
    out = ngram_jaccard_pairs(d, _md5_cands(sh), shingle_n=3, shingles=sh)
    return out.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


ORACLE_JACCARD_VERIFY = f"""
WITH {_SQL_SHINGLES},
{_SQL_CANDS}
SELECT c.id_a, c.id_b,
       round(CAST(len(list_intersect(sa.ls, sb.ls)) AS DOUBLE)
             / (len(sa.ls) + len(sb.ls) - len(list_intersect(sa.ls, sb.ls))),
             6) AS jaccard
FROM cands c
JOIN sets sa ON sa.doc_id = c.id_a
JOIN sets sb ON sb.doc_id = c.id_b
"""

EXT3_QUERIES["jaccard_verify"] = q_jaccard_verify
EXT3_ORACLES["jaccard_verify"] = ORACLE_JACCARD_VERIFY


# ---------------------------------------------------------------------
# portable SimHash (Charikar bit-majority) — md5-substring 60-bit hash
# so the DuckDB oracle computes the identical fingerprint
# ---------------------------------------------------------------------

_SIMHASH_BITS = 60


def q_simhash_portable(spark, sf_dir):
    """60-bit SimHash per document over word-3-gram shingles; the token
    hash is the low 60 bits of md5 (hex substring), reproducible in any
    engine — the xxhash64 fast path is exercised by the unit suite."""
    from grass_spark.operators.dedup import simhash

    d = _t(spark, sf_dir, "documents")
    md5_60 = lambda c: F.conv(F.substring(F.md5(c), 18, 15), 16, 10).cast("long")  # noqa: E731
    return simhash(
        d, shingle_n=3, hash_fn=md5_60, n_bits=_SIMHASH_BITS
    )


def _simhash_oracle() -> str:
    sums = ",\n         ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS sb{b}"
        for b in range(_SIMHASH_BITS)
    )
    fp = " + ".join(
        f"(CASE WHEN sb{b} > 0 THEN (CAST(1 AS BIGINT) << {b}) ELSE CAST(0 AS BIGINT) END)"
        for b in range(_SIMHASH_BITS)
    )
    return f"""
WITH {_SQL_SHINGLES},
hs AS (
  SELECT doc_id, CAST(concat('0x', substr(md5(s), 18, 15)) AS BIGINT) AS h
  FROM sh
), bits AS (
  SELECT doc_id,
         {sums}
  FROM hs GROUP BY doc_id
)
SELECT doc_id, {fp} AS simhash
FROM bits
"""


EXT3_QUERIES["simhash_portable"] = q_simhash_portable
EXT3_ORACLES["simhash_portable"] = _simhash_oracle()


# ---------------------------------------------------------------------
# group= granule grouping (SURVEY §2.6 —
# abstract_space_time_dataset.py:1889-1904 group_concat branch)
# ---------------------------------------------------------------------


def q_group_granules(spark, sf_dir):
    """t.rast.list group=day: one row per day with the comma-joined
    purchase event ids, ordered by (start time, id-string)."""
    from grass_spark.catalog import group_maps

    ev = (
        _t(spark, sf_dir, "events")
        .filter(F.col("event_type") == "purchase")
        .withColumn("day", F.date_trunc("day", F.col("ts")))
    )
    out = group_maps(ev, "day", columns=["event_id"], order_col="ts")
    return out.select(F.col("day").alias("bucket"), F.col("event_id").alias("ids"))


ORACLE_GROUP_GRANULES = """
SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
       string_agg(CAST(event_id AS VARCHAR), ','
                  ORDER BY ts, CAST(event_id AS VARCHAR)) AS ids
FROM events WHERE event_type = 'purchase'
GROUP BY 1
"""

EXT3_QUERIES["group_granules"] = q_group_granules
EXT3_ORACLES["group_granules"] = ORACLE_GROUP_GRANULES


# ---------------------------------------------------------------------
# algebra relation-parameterized select: A {:,during} B (SURVEY §2.7 —
# temporal_algebra.py select evaluation; strict `during`)
# ---------------------------------------------------------------------


def q_algebra_select(spark, sf_dir):
    """Keep hourly granules inside a high-activity day (daily sum >
    300): ``A {:,during} B`` through the algebra front-end — a
    left-semi relation join on the builder-widened during list (the
    day's first and last hours count), keys equi-joined."""
    from grass_spark.algebra import TemporalAlgebra

    ev = _t(spark, sf_dir, "events")
    hourly = (
        ev.groupBy("user_id", F.date_trunc("hour", "ts").alias("bucket_start"))
        .agg(F.avg("value").alias("value"))
        .withColumn("bucket_end", _usec(F.col("bucket_start"), 3600))
    )
    daily = (
        ev.groupBy("user_id", F.date_trunc("day", "ts").alias("bucket_start"))
        .agg(F.sum("value").alias("value"))
        .filter(F.col("value") > 300)
        .withColumn("bucket_end", _usec(F.col("bucket_start"), 86400))
    )
    alg = TemporalAlgebra(keys=["user_id"])
    out = alg.eval("A {:,during} B", {"A": hourly, "B": daily})
    return out.select(
        "user_id",
        F.col("bucket_start").alias("bucket"),
        F.round("value", 6).alias("value"),
    )


# builder-widened `during` (spatio_temporal_relationships.py:608-672):
# the 00:00 hour (`starts`) and 23:00 hour (`finishes`) of a qualifying
# day are IN the builder's DURING list, so the algebra keeps them —
# verified against the reference's own suite (A {:,during} C keeps the
# map that merely starts C; unittests_temporal_algebra.py:185-205).
ORACLE_ALGEBRA_SELECT = """
WITH h AS (
  SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bs,
         avg(value) AS v
  FROM events GROUP BY 1, 2
), d AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bs
  FROM events GROUP BY 1, 2 HAVING sum(value) > 300
)
SELECT h.user_id, h.bs AS bucket, round(h.v, 6) AS value
FROM h
WHERE EXISTS (
  SELECT 1 FROM d
  WHERE d.user_id = h.user_id
    AND h.bs >= d.bs
    AND h.bs + INTERVAL 1 HOUR <= d.bs + INTERVAL 1 DAY
)
"""

EXT3_QUERIES["algebra_select"] = q_algebra_select
EXT3_ORACLES["algebra_select"] = ORACLE_ALGEBRA_SELECT


# ---------------------------------------------------------------------
# algebra merge(A, B) — dataset union (temporal_algebra.py:2651-2709)
# ---------------------------------------------------------------------


def q_merge_extract(spark, sf_dir):
    """merge() of two extracted datasets (click-day and purchase-day
    averages) — the t.merge analog; map lists are disjoint by
    construction so the union is the reference's registered-maps set."""
    from grass_spark.algebra import TemporalAlgebra

    ev = _t(spark, sf_dir, "events")

    def _daily(etype):
        return (
            ev.filter(F.col("event_type") == etype)
            .groupBy("user_id", F.date_trunc("day", "ts").alias("bucket_start"))
            .agg(F.avg("value").alias("value"))
        )

    alg = TemporalAlgebra(keys=["user_id"], end_col=None)
    out = alg.eval("merge(A, B)", {"A": _daily("click"), "B": _daily("purchase")})
    return out.select(
        "user_id",
        F.col("bucket_start").alias("bucket"),
        F.round("value", 6).alias("value"),
    )


ORACLE_MERGE_EXTRACT = """
SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
       round(avg(value), 6) AS value
FROM events WHERE event_type = 'click' GROUP BY 1, 2
UNION ALL
SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
       round(avg(value), 6) AS value
FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
"""

EXT3_QUERIES["merge_extract"] = q_merge_extract
EXT3_ORACLES["merge_extract"] = ORACLE_MERGE_EXTRACT


# ---------------------------------------------------------------------
# t.rast.algebra raster conditional — the build_condition_cmd_list
# r.mapcalc pipeline (temporal_raster_base_algebra.py:641-747)
# ---------------------------------------------------------------------


def q_algebra_condition(spark, sf_dir):
    """``if({contains}, B > 50, A, A * 2)`` with the raster flavor:
    hourly averages (A) keep their value on days whose daily average
    (B) exceeds 50 and double otherwise.  Conclusions merge by EQUAL
    (A with A*2 — same extents), then each hour pairs its widened-contains
    day granule (boundary hours included: started/finished fold into
    contains, spatio_temporal_relationships.py:608-672) and takes the
    per-pair mapcalc value."""
    from grass_spark.algebra import TemporalAlgebra

    ev = _t(spark, sf_dir, "events")
    hour = (
        ev.groupBy(
            "user_id", F.date_trunc("hour", "ts").alias("bucket_start")
        )
        .agg(F.avg("value").alias("value"))
        .withColumn("bucket_end", _usec(F.col("bucket_start"), 3600))
    )
    day = (
        ev.groupBy(
            "user_id", F.date_trunc("day", "ts").alias("bucket_start")
        )
        .agg(F.avg("value").alias("value"))
        .withColumn("bucket_end", _usec(F.col("bucket_start"), 86400))
    )
    alg = TemporalAlgebra(keys=["user_id"], flavor="raster")
    out = alg.eval("if({contains}, B > 50, A, A * 2)", {"A": hour, "B": day})
    return out.select(
        "user_id",
        F.col("bucket_start").alias("bucket"),
        F.round("value", 6).alias("value"),
    )


# widened contains of a 1-hour granule in its 1-day granule is the
# plain range containment (equality of extents is impossible)
ORACLE_ALGEBRA_CONDITION = """
WITH h AS (
  SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
         avg(value) AS hv
  FROM events GROUP BY 1, 2
), d AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS ds,
         avg(value) AS dv
  FROM events GROUP BY 1, 2
)
SELECT h.user_id, h.bucket,
       round(CASE WHEN d.dv > 50 THEN h.hv ELSE h.hv * 2 END, 6) AS value
FROM h JOIN d
  ON d.user_id = h.user_id
 AND h.bucket >= d.ds
 AND h.bucket + INTERVAL 1 HOUR <= d.ds + INTERVAL 1 DAY
"""

EXT3_QUERIES["algebra_condition"] = q_algebra_condition
EXT3_ORACLES["algebra_condition"] = ORACLE_ALGEBRA_CONDITION


# ---------------------------------------------------------------------
# t.rast.algebra -g — common-granularity mode (setup_common_granularity,
# temporal_algebra.py:853-976)
# ---------------------------------------------------------------------


def q_algebra_gran(spark, sf_dir):
    """``A : B`` in granularity mode: hourly click averages (granularity
    1 hour) selected against daily purchase activity (granularity
    1 day).  The common granularity is 1 hour, so each purchase day
    splits into 24 hourly granules and the select keeps every click
    hour inside a day with purchases."""
    from grass_spark.algebra import TemporalAlgebra

    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("bucket_start"))
        .agg(F.avg("value").alias("value"))
        .withColumn("bucket_end", _usec(F.col("bucket_start"), 3600))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("bucket_start"))
        .agg(F.avg("value").alias("value"))
        .withColumn("bucket_end", _usec(F.col("bucket_start"), 86400))
    )
    alg = TemporalAlgebra(keys=["user_id"])
    out = alg.eval_gran("A : B", {"A": clicks, "B": purchases})
    return out.select(
        "user_id",
        F.col("bucket_start").alias("bucket"),
        F.round("value", 6).alias("value"),
    )


ORACLE_ALGEBRA_GRAN = """
WITH a AS (
  SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
         round(avg(value), 6) AS value
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
), b AS (
  SELECT DISTINCT user_id,
         CAST(date_trunc('day', ts) AS TIMESTAMP) AS ds
  FROM events WHERE event_type = 'purchase'
)
SELECT a.user_id, a.bucket, a.value
FROM a
WHERE EXISTS (
  SELECT 1 FROM b
  WHERE b.user_id = a.user_id
    AND CAST(date_trunc('day', a.bucket) AS TIMESTAMP) = b.ds
)
"""

EXT3_QUERIES["algebra_gran"] = q_algebra_gran
EXT3_ORACLES["algebra_gran"] = ORACLE_ALGEBRA_GRAN


def q_algebra_gran_cond(spark, sf_dir):
    """``if(B > 50, A - 1, A + 1)`` in granularity mode, raster flavor
    (the unittests_temporal_raster_algebra_grs.py test_4 shape): each
    purchase day splits into 24 hourly granules; the value-bearing
    condition pairs EQUAL with the merged conclusions and every click
    hour inside a purchase day gets a-1 or a+1 by the day's average."""
    from grass_spark.algebra import TemporalAlgebra

    ev = _t(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", F.date_trunc("hour", "ts").alias("bucket_start"))
        .agg(F.avg("value").alias("value"))
        .withColumn("bucket_end", _usec(F.col("bucket_start"), 3600))
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", F.date_trunc("day", "ts").alias("bucket_start"))
        .agg(F.avg("value").alias("value"))
        .withColumn("bucket_end", _usec(F.col("bucket_start"), 86400))
    )
    alg = TemporalAlgebra(keys=["user_id"], flavor="raster")
    out = alg.eval_gran(
        "if(B > 50.0, A - 1.0, A + 1.0)", {"A": clicks, "B": purchases}
    )
    return out.select(
        "user_id",
        F.col("bucket_start").alias("bucket"),
        F.round("value", 6).alias("value"),
    )


ORACLE_ALGEBRA_GRAN_COND = """
WITH a AS (
  SELECT user_id, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS bucket,
         avg(value) AS value
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
), b AS (
  SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS ds,
         avg(value) AS value
  FROM events WHERE event_type = 'purchase' GROUP BY 1, 2
)
SELECT a.user_id, a.bucket,
       round(CASE WHEN b.value > 50.0 THEN a.value - 1.0
                  ELSE a.value + 1.0 END, 6) AS value
FROM a
JOIN b ON b.user_id = a.user_id
      AND CAST(date_trunc('day', a.bucket) AS TIMESTAMP) = b.ds
"""

EXT3_QUERIES["algebra_gran_cond"] = q_algebra_gran_cond
EXT3_ORACLES["algebra_gran_cond"] = ORACLE_ALGEBRA_GRAN_COND


# ---------------------------------------------------------------------
# near_dedup end-to-end — the flagship training-data pipeline as a
# driver query, HASH-GATED (round-2 VERDICT item #3): candidate
# generation uses the md5-portable signature path (DuckDB reproduces
# it bit-for-bit) and the iterative Spark connected components are
# checked against a DuckDB WITH RECURSIVE reachability oracle.  The
# engine's xxhash near_dedup() fast path keeps its own unit coverage.
# ---------------------------------------------------------------------


def q_near_dedup_keep(spark, sf_dir):
    """md5-LSH -> exact-Jaccard verify (>= 0.8) -> connected components
    (min-label + pointer doubling) -> keep decisions for EVERY document
    (keep = smallest id per duplicate cluster; singletons keep
    themselves).  Deterministic output."""
    from grass_spark.operators.dedup import (
        dedup_clusters,
        ngram_jaccard_pairs,
        with_shingles,
    )

    d = _t(spark, sf_dir, "documents")
    sh = with_shingles(d, "text", 3).select("doc_id", "sh_arr").localCheckpoint()
    verified = ngram_jaccard_pairs(
        d, _md5_cands(sh), shingle_n=3, shingles=sh
    ).filter(F.col("jaccard") >= 0.8)
    clusters = dedup_clusters(verified)
    labeled = d.select("doc_id").join(
        clusters.withColumnRenamed("id", "doc_id"), on="doc_id", how="left"
    ).withColumn("cluster_id", F.coalesce(F.col("cluster_id"), F.col("doc_id")))
    return labeled.select(
        "doc_id",
        F.col("cluster_id").cast("long").alias("cluster_id"),
        (F.col("doc_id") == F.col("cluster_id")).alias("keep"),
    ).orderBy("doc_id")


# DuckDB twin: identical md5 signature/band/verify chain, then
# connected components as a recursive reachability closure — cluster_id
# = min id reachable over verified edges.  Candidate sets are LSH-capped
# upstream in spirit, but at sf<=0.01 the raw closure is tiny.
ORACLE_NEAR_DEDUP_KEEP = f"""
WITH RECURSIVE {_SQL_SHINGLES},
{_SQL_CANDS}, verified AS (
  SELECT c.id_a, c.id_b
  FROM cands c
  JOIN sets sa ON sa.doc_id = c.id_a
  JOIN sets sb ON sb.doc_id = c.id_b
  WHERE CAST(len(list_intersect(sa.ls, sb.ls)) AS DOUBLE)
        / (len(sa.ls) + len(sb.ls) - len(list_intersect(sa.ls, sb.ls)))
        >= 0.8
), edges AS (
  SELECT id_a AS s, id_b AS d FROM verified
  UNION
  SELECT id_b AS s, id_a AS d FROM verified
), reach AS (
  SELECT s AS id, s AS r FROM edges
  UNION
  SELECT e.s AS id, reach.r AS r
  FROM edges e JOIN reach ON e.d = reach.id
), clusters AS (
  SELECT id, min(r) AS cluster_id FROM reach GROUP BY id
)
SELECT d.doc_id,
       CAST(coalesce(c.cluster_id, d.doc_id) AS BIGINT) AS cluster_id,
       d.doc_id = coalesce(c.cluster_id, d.doc_id) AS keep
FROM documents d
LEFT JOIN clusters c ON c.id = d.doc_id
ORDER BY d.doc_id
"""

EXT3_QUERIES["near_dedup_keep"] = q_near_dedup_keep
EXT3_ORACLES["near_dedup_keep"] = ORACLE_NEAR_DEDUP_KEEP


# ---------------------------------------------------------------------
# Mergeable-sketch tier cascade (opt-in approx holistic path —
# operators/sketches.py; round-3 VERDICT item #7)
# ---------------------------------------------------------------------


def q_sketch_cascade_day(spark, sf_dir):
    """Approximate day-level holistic stats from MERGED minute-tier
    sketches (KLL quantiles + HLL distinct) — never re-scanning raw for
    the estimates.  KLL compaction is randomized, so raw estimates are
    not bit-stable; what IS deterministic is the CONTRACT: the sketch
    stream length ``n`` is exact, and the estimates respect their rank
    and relative-error bounds.  The query therefore emits ``n`` plus
    per-group bound booleans (rank of the median/p90 estimate within
    0.03 + 1/n of its target; HLL within 5 %) — the DuckDB twin emits
    the exact counts with TRUE constants, so any bound violation
    hash-fails the gate.  tests/test_sketches.py pins tighter bounds.
    """
    from datetime import datetime

    from grass_spark.operators.sketches import (
        sketch_from_raw, sketch_from_tier, sketch_stats,
    )

    epoch = datetime(1970, 1, 1)
    ev = _t(spark, sf_dir, "events").select("user_id", "ts", "value")
    mins = sketch_from_raw(ev, "1 minute", epoch, ["user_id"])
    days = sketch_from_tier(mins, "1 day", epoch, ["user_id"])
    st = sketch_stats(days, {"median": 0.5, "perc90": 0.9})

    raw = ev.select(
        "user_id",
        F.date_trunc("day", F.col("ts").cast("timestamp")).alias("bucket_start"),
        "value",
    )
    j = raw.join(st, ["user_id", "bucket_start"])

    def _rk(est, cmp):
        return (F.sum(cmp(F.col("value"), F.col(est)).cast("long"))
                / F.count("value"))

    g = j.groupBy("user_id", "bucket_start").agg(
        F.count("value").alias("cnt"),
        _rk("approx_median", lambda v, e: v < e).alias("med_lt"),
        _rk("approx_median", lambda v, e: v <= e).alias("med_le"),
        _rk("approx_perc90", lambda v, e: v < e).alias("p90_lt"),
        _rk("approx_perc90", lambda v, e: v <= e).alias("p90_le"),
        F.count_distinct("value").alias("nd"),
        F.first("approx_diversity").alias("adiv"),
        F.first("n").alias("sk_n"),
    )
    # tie-robust rank error: distance from q to the estimate's rank
    # interval [count_lt, count_le]/n (an element whose duplicate mass
    # spans q is exactly right; point ranks jump by the tie mass)
    eps = F.lit(0.03) + F.lit(1.0) / F.col("cnt")

    def _ok(lt, le, q):
        err = F.greatest(F.lit(0.0), F.col(lt) - F.lit(q),
                         F.lit(q) - F.col(le))
        return err <= eps

    return g.select(
        "user_id",
        F.col("bucket_start").alias("bucket"),
        F.col("sk_n").cast("long").alias("n"),
        _ok("med_lt", "med_le", 0.5).alias("median_rank_ok"),
        _ok("p90_lt", "p90_le", 0.9).alias("p90_rank_ok"),
        (F.abs(F.col("adiv") / F.col("nd") - 1.0) <= 0.05).alias("diversity_ok"),
    )


ORACLE_SKETCH_CASCADE_DAY = """
SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS bucket,
       CAST(count(value) AS BIGINT) AS n,
       TRUE AS median_rank_ok, TRUE AS p90_rank_ok, TRUE AS diversity_ok
FROM events
GROUP BY 1, 2
"""

EXT3_QUERIES["sketch_cascade_day"] = q_sketch_cascade_day
EXT3_ORACLES["sketch_cascade_day"] = ORACLE_SKETCH_CASCADE_DAY


# ---------------------------------------------------------------------
# Corpus heavy-hitters (operators/heavyhitters.py) — boilerplate
# detection: top-k word trigrams by document frequency
# ---------------------------------------------------------------------


def q_heavy_hitters(spark, sf_dir):
    """Top-20 word trigrams by document frequency over the documents
    corpus — the boilerplate-detection heavy-hitters query.  Plan
    shape: partial-agg groupBy + TakeOrderedAndProject (per-partition
    top-k, no global sort); ties broken by gram ascending so the k-cut
    is deterministic and hash-gateable."""
    from grass_spark.operators.heavyhitters import ngram_heavy_hitters

    docs = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = ngram_heavy_hitters(docs, n=3, k=20)
    return out.select("gram", F.col("doc_freq").cast("long").alias("doc_freq"))


ORACLE_HEAVY_HITTERS = f"""
WITH {_SQL_SHINGLES}
SELECT s AS gram, CAST(count(*) AS BIGINT) AS doc_freq
FROM sh
GROUP BY s
ORDER BY doc_freq DESC, gram ASC
LIMIT 20
"""

EXT3_QUERIES["heavy_hitters"] = q_heavy_hitters
EXT3_ORACLES["heavy_hitters"] = ORACLE_HEAVY_HITTERS


# ---------------------------------------------------------------------
# Benchmark decontamination (operators/decontaminate.py) — the 13-gram
# overlap rule: flag and drop training docs sharing a word 13-gram
# with a held-out benchmark split
# ---------------------------------------------------------------------

#: deterministic benchmark split: every 10th doc_id is "the eval suite"
_SQL_SH13 = """
  nrm AS (
    SELECT doc_id, regexp_replace(lower(trim(text)), '\\s+', ' ', 'g') AS t
    FROM documents
  ), w13 AS (
    SELECT doc_id, string_split(t, ' ') AS ws FROM nrm
  ), sh13 AS (
    SELECT doc_id,
           CAST(greatest(len(ws) - 12, 1) AS BIGINT) AS n_shingles,
           CAST(g.i - 1 AS BIGINT) AS idx,
           array_to_string(ws[g.i:g.i+12], ' ') AS s
    FROM w13, unnest(generate_series(1, greatest(len(ws) - 12, 1))) AS g(i)
  ),
  bench13 AS (
    SELECT DISTINCT doc_id AS bench_id, s FROM sh13 WHERE doc_id % 10 = 0
  ),
  corpus13 AS (
    SELECT doc_id, n_shingles, idx, s FROM sh13 WHERE doc_id % 10 <> 0
  )
"""


def _bench_split(spark, sf_dir):
    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return (
        d.filter(F.col("doc_id") % 10 != 0),
        d.filter(F.col("doc_id") % 10 == 0),
    )


def q_contamination(spark, sf_dir):
    """Per-document benchmark-contamination report (13-gram overlap).

    Plan shape: corpus shingles are a map-side explode; the benchmark
    shingle set is broadcast (eval-suite-sized), so the probe is a BHJ
    and the only corpus-keyed shuffle is the per-doc report groupBy
    over *hit rows only*."""
    from grass_spark.operators.decontaminate import contamination_report

    corpus, bench = _bench_split(spark, sf_dir)
    rep = contamination_report(corpus, bench, n=13)
    return rep.select(
        "doc_id", "n_shingles", "n_hit_shingles", "n_bench_docs",
        F.round("contamination", 6).alias("contamination"),
    )


ORACLE_CONTAMINATION = f"""
WITH {_SQL_SH13}
SELECT c.doc_id, c.n_shingles,
       CAST(count(DISTINCT c.idx) AS BIGINT) AS n_hit_shingles,
       CAST(count(DISTINCT b.bench_id) AS BIGINT) AS n_bench_docs,
       round(CAST(count(DISTINCT c.idx) AS DOUBLE) / c.n_shingles, 6)
         AS contamination
FROM corpus13 c JOIN bench13 b USING (s)
GROUP BY c.doc_id, c.n_shingles
"""

EXT3_QUERIES["contamination"] = q_contamination
EXT3_ORACLES["contamination"] = ORACLE_CONTAMINATION


def q_decontaminate_keep(spark, sf_dir):
    """Surviving doc_ids after dropping benchmark-contaminated docs —
    the end-to-end ``decontaminate`` anti-join (corpus never shuffles:
    flagged ids broadcast into a left-anti BHJ)."""
    from grass_spark.operators.decontaminate import decontaminate

    corpus, bench = _bench_split(spark, sf_dir)
    return decontaminate(corpus, bench, n=13).select("doc_id")


ORACLE_DECONTAMINATE_KEEP = f"""
WITH {_SQL_SH13}
SELECT doc_id FROM documents WHERE doc_id % 10 <> 0
  AND doc_id NOT IN (
    SELECT DISTINCT c.doc_id FROM corpus13 c JOIN bench13 b USING (s)
  )
"""

EXT3_QUERIES["decontaminate_keep"] = q_decontaminate_keep
EXT3_ORACLES["decontaminate_keep"] = ORACLE_DECONTAMINATE_KEEP


# ---------------------------------------------------------------------
# Segment-level dedup (operators/segdedup.py) — CCNet-style span dedup:
# keep the corpus-wide first occurrence of every 10-word chunk
# ---------------------------------------------------------------------


def q_chunk_dedup(spark, sf_dir):
    """Per-document segment-dedup report: non-overlapping 10-word
    chunks, corpus-wide first occurrence (by doc_id, position) kept,
    cleaned text reconstructed in order."""
    from grass_spark.operators.segdedup import dedup_segments, segments_by_words

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    return dedup_segments(segments_by_words(d, "text", 10)).select(
        "doc_id", "n_segments", "n_kept", "dedup_text"
    )


ORACLE_CHUNK_DEDUP = """
WITH sel AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                      ' ') AS ws
  FROM documents
), chunks AS (
  SELECT doc_id, CAST((g.s - 1) // 10 AS BIGINT) AS seg_idx,
         array_to_string(ws[g.s:g.s+9], ' ') AS seg
  FROM sel, unnest(generate_series(1, len(ws), 10)) AS g(s)
), nz AS (
  SELECT * FROM chunks WHERE seg <> ''
), rn AS (
  SELECT *, row_number() OVER (PARTITION BY seg ORDER BY doc_id, seg_idx)
           AS rn
  FROM nz
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_segments,
       CAST(sum(CASE WHEN rn = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       coalesce(string_agg(CASE WHEN rn = 1 THEN seg END, ' '
                           ORDER BY seg_idx), '') AS dedup_text
FROM rn GROUP BY doc_id
"""

EXT3_QUERIES["chunk_dedup"] = q_chunk_dedup
EXT3_ORACLES["chunk_dedup"] = ORACLE_CHUNK_DEDUP


# ---------------------------------------------------------------------
# Sequence packing (operators/pack.py) — concat-and-chunk documents
# into fixed 256-token training sequences, per-language shards
# ---------------------------------------------------------------------


def q_pack_sequences(spark, sf_dir):
    """One row per (doc, sequence) overlap: language-sharded streams,
    docs ordered by doc_id, cut every 256 whitespace tokens."""
    from grass_spark.operators.dedup import normalize_text
    from grass_spark.operators.pack import pack_sequences

    d = _t(spark, sf_dir, "documents").select(
        "lang",
        "doc_id",
        F.size(F.split(normalize_text(F.col("text")), " "))
        .cast("bigint")
        .alias("n_tokens"),
    )
    return pack_sequences(d, 256, group_col="lang").select(
        "lang", "seq_id", "doc_id", "n_tokens",
        "doc_tok_start", "doc_tok_end", "seq_off",
    )


ORACLE_PACK_SEQUENCES = """
WITH toks AS (
  SELECT lang, doc_id,
         CAST(len(string_split(regexp_replace(lower(trim(text)), '\\s+',
                                              ' ', 'g'), ' '))
              AS BIGINT) AS n_tokens
  FROM documents
), cum AS (
  SELECT lang, doc_id, n_tokens,
         CAST(sum(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                  ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS cum_end
  FROM toks WHERE n_tokens > 0
), spans AS (
  SELECT *, cum_end - n_tokens AS cum_start FROM cum
)
SELECT lang, CAST(g.s AS BIGINT) AS seq_id, doc_id, n_tokens,
       CAST(greatest(0, g.s * 256 - cum_start) AS BIGINT)
         AS doc_tok_start,
       CAST(least(n_tokens, (g.s + 1) * 256 - cum_start) AS BIGINT)
         AS doc_tok_end,
       CAST(cum_start + greatest(0, g.s * 256 - cum_start) - g.s * 256
            AS BIGINT) AS seq_off
FROM spans,
     unnest(generate_series(cum_start // 256, (cum_end - 1) // 256))
       AS g(s)
"""

EXT3_QUERIES["pack_sequences"] = q_pack_sequences
EXT3_ORACLES["pack_sequences"] = ORACLE_PACK_SEQUENCES


# ---------------------------------------------------------------------
# Corpus mixture + deterministic hash sampling (operators/sampling.py)
# ---------------------------------------------------------------------

#: target language mixture for the sampling queries (token shares of a
#: 20k-char output budget, weighted by the n_chars column)
_MIX_TARGETS = {"en": 0.3, "de": 0.2, "es": 0.2, "fr": 0.15, "zh": 0.15}
_MIX_BUDGET = 20000

_SQL_MIX_SHARE = (
    "CAST(CASE lang WHEN 'en' THEN 0.3 WHEN 'de' THEN 0.2 "
    "WHEN 'es' THEN 0.2 WHEN 'fr' THEN 0.15 WHEN 'zh' THEN 0.15 "
    "ELSE 0.0 END AS DOUBLE)"
)


def q_corpus_mixture(spark, sf_dir):
    """Per-language keep rates realizing the target mixture: rate =
    min(1, share * budget / group_chars)."""
    from grass_spark.operators.sampling import mixture_rates

    d = _t(spark, sf_dir, "documents").select("lang", "n_chars")
    return mixture_rates(
        d, _MIX_TARGETS, _MIX_BUDGET, weight_col="n_chars"
    ).select(
        "lang", "n_docs", "tokens", "target_share",
        F.round("keep_rate", 6).alias("keep_rate"),
    )


ORACLE_CORPUS_MIXTURE = f"""
SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
       CAST(sum(n_chars) AS BIGINT) AS tokens,
       {_SQL_MIX_SHARE} AS target_share,
       round(least(1.0, {_SQL_MIX_SHARE} * {_MIX_BUDGET}
                        / CAST(sum(n_chars) AS BIGINT)), 6) AS keep_rate
FROM documents GROUP BY lang
"""

EXT3_QUERIES["corpus_mixture"] = q_corpus_mixture
EXT3_ORACLES["corpus_mixture"] = ORACLE_CORPUS_MIXTURE


def q_mixture_sample(spark, sf_dir):
    """End-to-end mixture sampling: the tiny mixture_rates frame
    broadcasts into a deterministic md5-hash filter — the corpus side
    never shuffles, and any engine reproduces the same sample."""
    from grass_spark.operators.sampling import hash_sample, mixture_rates

    d = _t(spark, sf_dir, "documents").select("doc_id", "lang", "n_chars")
    rates = mixture_rates(d, _MIX_TARGETS, _MIX_BUDGET, weight_col="n_chars")
    return hash_sample(d, rates, salt="mix1").select("doc_id", "lang")


ORACLE_MIXTURE_SAMPLE = f"""
WITH r AS (
  SELECT lang,
         least(1.0, {_SQL_MIX_SHARE} * {_MIX_BUDGET}
                    / CAST(sum(n_chars) AS BIGINT)) AS keep_rate
  FROM documents GROUP BY lang
)
SELECT d.doc_id, d.lang
FROM documents d JOIN r USING (lang)
WHERE CAST(('0x' || substr(md5(d.doc_id || ':mix1'), 1, 8)) AS UBIGINT)
      / 4294967296.0 < r.keep_rate
"""

EXT3_QUERIES["mixture_sample"] = q_mixture_sample
EXT3_ORACLES["mixture_sample"] = ORACLE_MIXTURE_SAMPLE


# ---------------------------------------------------------------------
# PII redaction (operators/redact.py) — documents enriched with
# deterministic synthetic PII (both engines build the same strings), so
# the regex rules are exercised for real on every row
# ---------------------------------------------------------------------

_SQL_PII_ENRICH = """
  SELECT doc_id,
         text || ' contact user' || doc_id || '@mail.example.com'
              || ' from 10.0.' || (doc_id % 256) || '.1'
              || CASE WHEN doc_id % 3 = 0
                      THEN ' ssn '
                           || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0')
                           || '-'
                           || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
                           || '-'
                           || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                      ELSE '' END
              || CASE WHEN doc_id % 5 = 0
                      THEN ' call +1 (415) 555-0199' ELSE '' END AS text
  FROM documents
"""


def _pii_enrich(d):
    did = F.col("doc_id")
    return d.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), did.cast("string"),
            F.lit("@mail.example.com"),
            F.lit(" from 10.0."), (did % 256).cast("string"), F.lit(".1"),
            F.when(
                did % 3 == 0,
                F.concat(
                    F.lit(" ssn "),
                    F.lpad((did % 1000).cast("string"), 3, "0"), F.lit("-"),
                    F.lpad((did % 100).cast("string"), 2, "0"), F.lit("-"),
                    F.lpad((did % 10000).cast("string"), 4, "0"),
                ),
            ).otherwise(F.lit("")),
            F.when(did % 5 == 0, F.lit(" call +1 (415) 555-0199"))
            .otherwise(F.lit("")),
        ).alias("text"),
    )


def q_pii_redact(spark, sf_dir):
    """Typed PII scrubbing: per-rule match counts + the redacted text.
    Pure regexp column expressions — zero shuffles, zero UDFs."""
    from grass_spark.operators.redact import redact

    d = _pii_enrich(_t(spark, sf_dir, "documents"))
    out = redact(d)
    return out.select(
        "doc_id", "n_email", "n_ipv4", "n_ssn", "n_digits", "text"
    )


def _oracle_pii_redact() -> str:
    """Build the DuckDB twin FROM the same PII_RULES table the engine
    uses — one source of truth for the patterns."""
    from grass_spark.operators.redact import PII_RULES

    sql = f"WITH s0 AS (\n{_SQL_PII_ENRICH}\n)"
    prev, counts = "s0", []
    for i, (kind, pat, token) in enumerate(PII_RULES, start=1):
        counts.append(f"n_{kind}")
        keep = ", ".join(counts[:-1])
        keep = keep + ", " if keep else ""
        sql += (
            f", s{i} AS (\n"
            f"  SELECT doc_id, {keep}"
            f"CAST(len(regexp_extract_all(text, '{pat}')) AS BIGINT)"
            f" AS n_{kind},\n"
            f"         regexp_replace(text, '{pat}', '{token}', 'g') AS text\n"
            f"  FROM {prev}\n)"
        )
        prev = f"s{i}"
    return (
        sql
        + f"\nSELECT doc_id, {', '.join(counts)}, text FROM {prev}"
    )


EXT3_QUERIES["pii_redact"] = q_pii_redact
EXT3_ORACLES["pii_redact"] = _oracle_pii_redact()


# ---------------------------------------------------------------------
# Repetition quality signals (operators/repetition.py) — the Gopher /
# MassiveText repetition-fraction filters
# ---------------------------------------------------------------------


def q_repetition(spark, sf_dir):
    """Per-doc word repetition, top-2-gram share, duplicated-5-gram
    share — the standard low-quality-document signals."""
    from grass_spark.operators.repetition import repetition_stats

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    r = repetition_stats(d, top_n=2, dup_n=5)
    return r.select(
        "doc_id", "n_words",
        F.round("word_rep_frac", 6).alias("word_rep_frac"),
        F.round("top2_frac", 6).alias("top2_frac"),
        F.round("dup5_frac", 6).alias("dup5_frac"),
    )


ORACLE_REPETITION = """
WITH w AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                      ' ') AS ws
  FROM documents
), base AS (
  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_words,
         round(1.0 - len(list_distinct(ws)) / CAST(len(ws) AS DOUBLE), 6)
           AS word_rep_frac
  FROM w
), g2 AS (
  SELECT doc_id, array_to_string(ws[g.i:g.i+1], ' ') AS g
  FROM w, unnest(generate_series(1, len(ws) - 1)) AS g(i)
  WHERE len(ws) >= 2
), a2 AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS total, max(c) AS top
  FROM (SELECT doc_id, g, count(*) AS c FROM g2 GROUP BY doc_id, g)
  GROUP BY doc_id
), g5 AS (
  SELECT doc_id, array_to_string(ws[g.i:g.i+4], ' ') AS g
  FROM w, unnest(generate_series(1, len(ws) - 4)) AS g(i)
  WHERE len(ws) >= 5
), a5 AS (
  SELECT doc_id, CAST(sum(c) AS BIGINT) AS total,
         CAST(sum(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dup
  FROM (SELECT doc_id, g, count(*) AS c FROM g5 GROUP BY doc_id, g)
  GROUP BY doc_id
)
SELECT b.doc_id, b.n_words, b.word_rep_frac,
       round(coalesce(a2.top / CAST(a2.total AS DOUBLE), 0.0), 6)
         AS top2_frac,
       round(coalesce(a5.dup / CAST(a5.total AS DOUBLE), 0.0), 6)
         AS dup5_frac
FROM base b
LEFT JOIN a2 USING (doc_id)
LEFT JOIN a5 USING (doc_id)
"""

EXT3_QUERIES["repetition_stats"] = q_repetition
EXT3_ORACLES["repetition_stats"] = ORACLE_REPETITION


# ---------------------------------------------------------------------
# N-gram LM perplexity (operators/lm.py) — the CCNet quality filter:
# self-scored add-0.5 bigram model over the documents corpus
# ---------------------------------------------------------------------


def q_lm_perplexity(spark, sf_dir):
    """Per-doc bigram cross-entropy + perplexity against the corpus's
    own bigram statistics (outlier detection mode).  Model = two count
    frames + a 1-row broadcast vocab; scoring = two equi-joins and one
    groupBy(doc)."""
    from grass_spark.operators.lm import lm_score

    d = _t(spark, sf_dir, "documents").select("doc_id", "text")
    out = lm_score(d)
    return out.select(
        "doc_id", "n_bigrams",
        F.round("logprob", 6).alias("logprob"),
        F.round("perplexity", 6).alias("perplexity"),
    )


ORACLE_LM_PERPLEXITY = """
WITH w AS (
  SELECT doc_id,
         string_split(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'),
                      ' ') AS ws
  FROM documents
), pos AS (
  SELECT doc_id, ws[g.i] AS w1, ws[g.i + 1] AS w2
  FROM w, unnest(generate_series(1, len(ws) - 1)) AS g(i)
  WHERE len(ws) >= 2
), big AS (
  SELECT w1, w2, CAST(count(*) AS DOUBLE) AS c12 FROM pos GROUP BY w1, w2
), uni AS (
  SELECT w1, CAST(sum(c12) AS DOUBLE) AS c1 FROM big GROUP BY w1
), voc AS (
  SELECT CAST(count(DISTINCT wrd) AS DOUBLE) AS v
  FROM (SELECT unnest(ws) AS wrd FROM w)
), sc AS (
  SELECT p.doc_id,
         -log2((coalesce(b.c12, 0) + 0.5)
               / (coalesce(u.c1, 0) + 0.5 * voc.v)) AS nlp
  FROM pos p
  LEFT JOIN big b USING (w1, w2)
  LEFT JOIN uni u USING (w1)
  CROSS JOIN voc
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       round(avg(nlp), 6) AS logprob,
       round(pow(2.0, avg(nlp)), 6) AS perplexity
FROM sc GROUP BY doc_id
"""

EXT3_QUERIES["lm_perplexity"] = q_lm_perplexity
EXT3_ORACLES["lm_perplexity"] = ORACLE_LM_PERPLEXITY
