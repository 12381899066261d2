"""Generic skew-safe equi-join — the hybrid broadcast/shuffle routing
a 100-TB fact⋈dim join needs when a handful of keys carry a large
fraction of the fact table.

A plain shuffle join on a skewed key sends every fact row of a hot key
to ONE reducer (the boilerplate-segment / hot-conversation failure mode
this engine has hit repeatedly).  AQE's skew-join mitigation splits
oversized partitions at runtime, but only after the shuffle files
exist; this operator removes the hot keys from the shuffle entirely:

* ONE map-side-combinable census ``groupBy(key).count()`` over the
  fact side finds keys above ``hot_threshold`` — a tiny frame
  (checkpointed: it feeds THREE consumers — the multi-consumer census
  lesson);
* cold fact rows take a broadcast ANTI-join against the hot-key list
  and then the normal shuffle join (uniform by construction — every
  remaining key is under the threshold);
* hot fact rows join the (bounded: |hot keys| × dim multiplicity)
  hot slice of the dim side via BROADCAST — the fact side never
  moves at all for exactly the rows that would have single-tasked.

The result is bit-identical to the plain join for inner and left joins
(every fact row routes to exactly one branch; dim matching is
unchanged).  ``right``/``full`` are rejected — the dim side's unmatched
rows would need a third branch; use the plain join for those.

Reference analog: none in GRASS (single-node engines don't shuffle);
this is the distributed-plan primitive the north star's "AQE skew-join
handling" line names, made explicit and testable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["skew_join"]


def skew_join(
    fact: DataFrame,
    dim: DataFrame,
    on: str | list[str],
    *,
    how: str = "inner",
    hot_threshold: int = 100_000,
) -> DataFrame:
    """Equi-join ``fact ⋈ dim`` on ``on`` with hot fact keys routed
    through a broadcast of the dim side's hot slice.  Exact: returns
    the same rows as ``fact.join(dim, on, how)`` for ``how`` in
    ``('inner', 'left')``.

    ``hot_threshold`` is the fact-rows-per-key census cutoff; size it
    near the rows-per-task you want the shuffle join's reducers to see
    (the AQE advisory partition size / row width).  The broadcast is
    bounded by ``n_hot_keys × dim rows per key`` — by construction
    n_hot is at most ``|fact| / hot_threshold``.
    """
    if how not in ("inner", "left"):
        raise ValueError(
            f"skew_join: how must be 'inner' or 'left', got {how!r}"
        )
    if hot_threshold < 1:
        raise ValueError("skew_join: hot_threshold must be >= 1")
    keys = [on] if isinstance(on, str) else list(on)

    hot = (
        fact.groupBy(*keys)
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") > hot_threshold)
        .select(*keys)
        .localCheckpoint(eager=False)  # 3 consumers below
    )

    cold = fact.join(F.broadcast(hot), keys, "left_anti").join(
        dim, keys, how
    )
    dim_hot = dim.join(F.broadcast(hot), keys, "left_semi")
    hot_rows = fact.join(F.broadcast(hot), keys, "left_semi").join(
        F.broadcast(dim_hot), keys, how
    )
    return cold.unionByName(hot_rows)
