"""Bounded-iteration PageRank over an edge list — the classic
iterative distributed computation, expressed as DataFrame joins with
the engine's established iterative-loop discipline.

Each iteration is ONE equi-join of the rank frame onto the edge list
(shuffle on src) plus ONE map-side-combinable ``groupBy(dst)`` — a hot
in-degree node (every graph has them) is absorbed by partial
aggregation, never windowed.  Ranks are ``localCheckpoint``-ed every
round (the dedup_clusters lineage lesson: without it round k re-executes
rounds 1..k-1 per action) and iterations are FIXED (``iterations=``),
so the plan size is bounded and runs are deterministic.

Cross-engine parity: ranks round to 12 dp after every update — rank
mass is <= 1 so a 12-dp round absorbs distributed-sum-order ulps
(the |x| < ~2e3 bound) while keeping ~6 significant digits at
n = 10^6 nodes; the oracle unrolls the SAME fixed iterations as CTEs
with the SAME per-round rounding, so the engines stay in lockstep
instead of compounding last-ulp drift.

Contract: every node must have at least one OUT-edge (feed an
undirected graph as both directions and this holds by construction);
``pagerank`` raises on dangling nodes rather than silently leaking
rank mass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["pagerank"]


def pagerank(
    edges: DataFrame,
    *,
    src_col: str = "src",
    dst_col: str = "dst",
    iterations: int = 8,
    damping: float = 0.85,
) -> DataFrame:
    """Rank every node of the edge list: ``(node, rank)`` with
    ``rank = (1-d)/n + d * sum_in(rank/outdeg)`` iterated
    ``iterations`` times from the uniform start, 12-dp rounded per
    round.  Duplicate edges count double (weight by multiplicity) —
    dedup upstream if that is not wanted."""
    if iterations < 1:
        raise ValueError("pagerank: iterations must be >= 1")
    if not (0.0 < damping < 1.0):
        raise ValueError("pagerank: damping must be in (0, 1)")
    e = edges.select(
        F.col(src_col).alias("_s"), F.col(dst_col).alias("_d")
    ).localCheckpoint(eager=False)  # joined every round
    deg = e.groupBy("_s").agg(F.count(F.lit(1)).alias("_deg"))
    # NOTE (r06 anti-finding): persist()-ing nodes/ed to preserve their
    # HashPartitioning across rounds was MEASURED SLOWER here — the
    # cached plan pins the pre-AQE partition count, so every tiny
    # per-round stage runs at full width instead of AQE-coalesced;
    # the checkpointed frames let AQE size each round.  Don't retry.
    nodes = (
        e.select(F.col("_s").alias("_node"))
        .unionAll(e.select(F.col("_d").alias("_node")))
        .distinct()
        .localCheckpoint(eager=False)  # teleport base every round
    )
    dangling = nodes.join(
        deg, nodes["_node"] == deg["_s"], "left_anti"
    )
    if dangling.limit(1).count() > 0:
        raise ValueError(
            "pagerank: dangling node(s) without out-edges — feed an "
            "undirected graph as both directions or drop sinks"
        )
    ed = e.join(deg, "_s").localCheckpoint(eager=False)

    n1 = nodes.agg(F.count(F.lit(1)).alias("_n"))
    ranks = nodes.crossJoin(F.broadcast(n1)).select(
        "_node",
        F.round(F.lit(1.0) / F.col("_n").cast("double"), 12).alias("_p"),
    ).localCheckpoint(eager=False)

    for _ in range(iterations):
        contrib = (
            ed.join(ranks, ed["_s"] == ranks["_node"])
            .select(
                "_d",
                (F.col("_p") / F.col("_deg").cast("double")).alias("_c"),
            )
            .groupBy("_d")
            .agg(F.sum("_c").alias("_in"))
        )
        ranks = (
            nodes.join(contrib, nodes["_node"] == contrib["_d"], "left")
            .crossJoin(F.broadcast(n1))
            .select(
                "_node",
                F.round(
                    (F.lit(1.0) - F.lit(damping))
                    / F.col("_n").cast("double")
                    + F.lit(damping) * F.coalesce("_in", F.lit(0.0)),
                    12,
                ).alias("_p"),
            )
            .localCheckpoint(eager=False)  # cut lineage per round
        )
    return ranks.select(
        F.col("_node").alias("node"), F.col("_p").alias("rank")
    )
