"""Per-group document caps — skew-safe exact top-``cap`` per key.

Web-corpus pipelines bound any single source's contribution (RefinedWeb
caps URLs per domain; Gopher/MassiveText cap documents per host) so one
crawler-friendly site cannot dominate the mixture.  The selection must
be deterministic (same corpus -> same kept set on any engine), which
rules out ``sample()``: we keep the ``cap`` smallest by a portable
uniform hash of the document id (md5-derived, see
:func:`grass_spark.operators.sampling.uniform_hash`), tie-broken by id.

Scale shape (100 TB corpus, 10^9 docs, hot hosts with 10^8 docs):

* the naive plan — ``row_number() OVER (PARTITION BY source ORDER BY
  u)`` — funnels every row of a hot source into ONE task, the exact
  skew this engine's segment-dedup round already hit and fixed;
* here the corpus takes ONE map-side-combined ``groupBy(group)`` count,
  and the (tiny) set of groups *over* the cap is **broadcast** back;
* rows in under-cap groups keep immediately — no ordering work at all
  (at a meaningful cap that is almost the whole corpus);
* hot-group rows are selected in two bounded stages: a salted window
  over ``(group, shard)`` (each partition ~ n_group/salts rows) keeps a
  local top-``cap``, then a final window over ``group`` ranks only the
  ``<= salts * cap`` survivors per group.  Stage 1 is exact-superset:
  every row in a group's global top-``cap`` is also in the top-``cap``
  of its own shard, so the composition equals the single-window answer
  bit-for-bit (pinned by tests against the brute window).

Reference analog: none in GRASS — this is the training-corpus
source-balancing stage (RefinedWeb §3.1 / MassiveText repetition caps)
expressed Spark-first.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from grass_spark.operators.sampling import uniform_hash


def cap_per_group(
    df: DataFrame,
    cap: int,
    *,
    group_col: str = "source",
    id_col: str = "doc_id",
    salt: str = "",
    salts: int = 16,
    keep_hash: bool = False,
) -> DataFrame:
    """Keep at most ``cap`` rows per ``group_col`` value.

    Kept rows are the ``cap`` smallest by ``(uniform_hash(id, salt),
    id)`` within each group — the deterministic, engine-portable
    analog of "random cap per domain".  Input columns pass through
    unchanged (plus ``_u`` when ``keep_hash=True``).

    ``salts`` bounds stage-1 window partitions to ~``n_group/salts``
    rows; size it so that fits one task comfortably (at 10^8-row hot
    hosts and 4M-row task budgets, ``salts=32``).  Exactness does not
    depend on ``salts``.
    """
    if cap < 1:
        raise ValueError(f"cap must be >= 1, got {cap}")
    if salts < 1:
        raise ValueError(f"salts must be >= 1, got {salts}")

    staged = df.withColumn("_u", uniform_hash(F.col(id_col), salt))

    # Tiny frame: only groups that actually exceed the cap.  The
    # census scan is column-pruned to the group column; checkpointing
    # stops the two broadcast joins below from each re-running it.
    hot = (
        staged.groupBy(group_col)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > cap)
        .select(group_col)
        .localCheckpoint(eager=False)
    )

    # Under-cap groups keep everything — the corpus-sized frame takes
    # one broadcast anti-join and never shuffles.
    cold = staged.join(F.broadcast(hot), group_col, "left_anti")

    hot_rows = staged.join(F.broadcast(hot), group_col, "left_semi")
    shard = F.floor(
        uniform_hash(F.col(id_col), salt + "#shard") * F.lit(float(salts))
    ).cast("int")
    local = Window.partitionBy(group_col, "_s").orderBy("_u", id_col)
    final = Window.partitionBy(group_col).orderBy("_u", id_col)
    kept_hot = (
        hot_rows.withColumn("_s", shard)
        .withColumn("_rn", F.row_number().over(local))
        .filter(F.col("_rn") <= cap)
        .withColumn("_rn", F.row_number().over(final))
        .filter(F.col("_rn") <= cap)
        .drop("_s", "_rn")
    )

    out_cols = list(df.columns) + (["_u"] if keep_hash else [])
    return cold.select(*out_cols).unionByName(kept_hot.select(*out_cols))


def group_histogram(
    df: DataFrame,
    *,
    group_col: str = "source",
    weight_col: str | None = None,
) -> DataFrame:
    """Per-group doc (and optional token) totals — the audit companion
    to :func:`cap_per_group` (one map-side-combined groupBy)."""
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    if weight_col is not None:
        aggs.append(F.sum(F.col(weight_col)).cast("bigint").alias("tokens"))
    return df.groupBy(group_col).agg(*aggs)
