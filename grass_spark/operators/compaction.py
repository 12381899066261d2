"""Small-file compaction planning: assign per-partition file censuses
to sequential merge groups targeting a byte budget (the lakehouse
OPTIMIZE / bin-packing maintenance pass, planned declaratively).

Reference analog: the reference's map-catalog maintenance utilities
(t.support / storage registration) — here re-expressed as the layout
planner a 100 TB table actually needs.

Scale shape
-----------
Greedy first-fit bin packing is inherently sequential; the
distributed-scan equivalent used here is PREFIX-SUM CHUNKING: files
order deterministically within their partition, and a file whose
cumulative-bytes-before is ``c`` lands in group ``floor(c / target)``.
Properties: deterministic, one window pass, every group's byte total
is < 2*target (a group is closed by the first file crossing its
boundary), and an oversized file occupies its own group(s') id range
naturally.  It differs from greedy packing only in that a boundary
crossing "wastes" the remainder — the standard trade accepted by
distributed chunkers.

The window runs per PARTITION KEY over the per-file census — bounded
by files-per-partition, not rows — and the census itself is the only
corpus-sized aggregate (map-side combinable groupBy).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def compaction_plan(
    files: DataFrame,
    *,
    partition_col: str,
    file_col: str,
    size_col: str,
    target_bytes: int,
) -> DataFrame:
    """Merge-group plan over a file census.

    ``files`` has one row per file: its partition key, a file
    identifier that defines the deterministic within-partition order,
    and its size in bytes.  Returns one row per merge group:
    ``(partition, grp, n_files, grp_bytes, first_file, last_file)``
    ordered by ``(partition, grp)``.
    """
    if target_bytes <= 0:
        raise ValueError("compaction_plan: target_bytes must be > 0")
    w = (
        Window.partitionBy(partition_col)
        .orderBy(file_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum_before: Column = F.coalesce(
        F.sum(size_col).over(w), F.lit(0).cast("long")
    )
    # integer `div`, never floor(double quotient) — a double can round
    # up across an integer boundary and flip a group id (the
    # m4_downsample lesson)
    staged = files.select(
        F.col(partition_col).alias("partition"),
        F.col(file_col).alias("_f"),
        F.col(size_col).cast("long").alias("_sz"),
        cum_before.alias("_cb"),
    ).select(
        "partition",
        "_f",
        "_sz",
        F.expr(f"_cb div CAST({int(target_bytes)} AS BIGINT)").alias("grp"),
    )
    return (
        staged.groupBy("partition", "grp")
        .agg(
            F.count(F.lit(1)).alias("n_files"),
            F.sum("_sz").alias("grp_bytes"),
            F.min("_f").alias("first_file"),
            F.max("_f").alias("last_file"),
        )
        .orderBy("partition", "grp")
    )
