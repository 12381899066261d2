"""Item co-occurrence graphs and exact triangle statistics — the
market-basket / citation-graph analytics a corpus pipeline runs over
"items sharing a container" relations (parts per order, users per
session, documents per near-dup cluster).

Scale shapes:

* :func:`cooccurrence_edges` projects a bipartite (group, item) frame
  into an item-item edge list.  A group of n members emits C(n, 2)
  pairs — quadratic in the hot group — so groups over ``max_group``
  are DROPPED before the self-join (the declared density cap, same
  contract as the LSH bucket cap in ``operators/dedup.py``
  ``_cap_buckets``).  With the cap, pair volume is <= max_group/2 x
  the kept membership rows — linear in the input.
* :func:`triangle_stats` never joins the raw edge list against itself
  on a bare endpoint (a hub of degree d would fan a single key into
  d^2 wedge rows).  Edges are ORIENTED from the (degree, id)-smaller
  endpoint to the larger; every out-degree is then O(sqrt(m)) (the
  classic Chiba–Nishizeki / Schank bound), so the wedge self-join —
  grouped on the oriented source — is O(m^1.5) total and no single
  key is hot.  Each triangle is counted exactly once (its unique
  (deg, id)-minimal apex emits the wedge; the closing edge lookup is
  an equi-join against the canonical edge set).

Cross-engine parity: degrees, wedge counts and triangle counts are
exact integers (wedge sums in DECIMAL(38,0) — sum of d*(d-1)/2
overflows int64 on hub-heavy petabyte graphs); the clustering
coefficient casts once to double into a mirrored expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["cooccurrence_edges", "triangle_stats"]


def cooccurrence_edges(
    df: DataFrame,
    *,
    group_col: str,
    item_col: str,
    max_group: int = 16,
    min_weight: int = 1,
) -> DataFrame:
    """Item-item co-occurrence edges from a bipartite (group, item)
    frame: ``(src, dst, weight)`` with ``src < dst`` and ``weight`` =
    number of shared groups (>= ``min_weight``).

    Groups with more than ``max_group`` distinct members are dropped
    before pairing (module docstring — the density cap).  Membership
    dedups first, so repeated (group, item) rows don't inflate
    weights.
    """
    if max_group < 2:
        raise ValueError("cooccurrence_edges: max_group must be >= 2")
    m = (
        df.select(
            F.col(group_col).alias("_g"), F.col(item_col).alias("_i")
        )
        .where(F.col("_g").isNotNull() & F.col("_i").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)  # feeds the size census + both
        # sides of the pair self-join
    )
    sizes = (
        m.groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") <= int(max_group))
        .select("_g")
    )
    kept = m.join(sizes, "_g")
    a = kept.select("_g", F.col("_i").alias("src"))
    b = kept.select("_g", F.col("_i").alias("dst"))
    return (
        a.join(b, "_g")
        .where(F.col("src") < F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.count(F.lit(1)).alias("weight"))
        .where(F.col("weight") >= int(min_weight))
    )


def triangle_stats(
    edges: DataFrame, *, src: str = "src", dst: str = "dst"
) -> DataFrame:
    """ONE summary row over an undirected edge list: ``(n_nodes,
    n_edges, n_wedges, n_triangles, clustering)``.

    ``n_wedges`` counts open two-paths ``sum(d*(d-1)/2)``;
    ``clustering = 3 * triangles / wedges`` (the global transitivity
    ratio, NULL when the graph has no wedge).  Self-loops drop;
    duplicate/reversed edges collapse.  See the module docstring for
    the degree-orientation bound.
    """
    canon = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("_a"),
            F.greatest(F.col(src), F.col(dst)).alias("_b"),
        )
        .where(
            F.col("_a").isNotNull()
            & F.col("_b").isNotNull()
            & (F.col("_a") != F.col("_b"))
        )
        .distinct()
        .localCheckpoint(eager=False)  # degrees + orientation + the
        # closing-edge join all read this frame
    )
    deg = (
        canon.select(F.col("_a").alias("_v"))
        .unionAll(canon.select(F.col("_b").alias("_v")))
        .groupBy("_v")
        .agg(F.count(F.lit(1)).alias("_d"))
        .localCheckpoint(eager=False)  # joined twice + wedge census
    )
    da = deg.select(F.col("_v").alias("_a"), F.col("_d").alias("_da"))
    db = deg.select(F.col("_v").alias("_b"), F.col("_d").alias("_db"))
    e = canon.join(da, "_a").join(db, "_b")
    # orient from the (degree, id)-smaller endpoint (_a < _b already,
    # so a degree tie breaks toward _a -> _b)
    fwd = F.col("_da") <= F.col("_db")
    oriented = e.select(
        F.when(fwd, F.col("_a")).otherwise(F.col("_b")).alias("_u"),
        F.when(fwd, F.col("_b")).otherwise(F.col("_a")).alias("_w"),
    ).localCheckpoint(eager=False)  # both sides of the wedge self-join
    p1 = oriented.select("_u", F.col("_w").alias("_x"))
    p2 = oriented.select("_u", F.col("_w").alias("_y"))
    wedges = p1.join(p2, "_u").where(F.col("_x") < F.col("_y"))
    closing = canon.select(
        F.col("_a").alias("_x"), F.col("_b").alias("_y")
    )
    tri = wedges.join(closing, ["_x", "_y"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    # per-node wedge term in long (exact to degree ~3e9), summed in
    # DECIMAL(38,0) so hub-heavy graphs can't overflow the total
    nd = deg.agg(
        F.count(F.lit(1)).alias("n_nodes"),
        F.sum(
            F.expr("(_d * (_d - 1)) div 2").cast("decimal(38,0)")
        ).alias("_w2"),
    )
    ne = canon.agg(F.count(F.lit(1)).alias("n_edges"))
    return (
        nd.crossJoin(F.broadcast(ne))
        .crossJoin(F.broadcast(tri))
        .select(
            "n_nodes",
            "n_edges",
            F.col("_w2").cast("long").alias("n_wedges"),
            "n_triangles",
            F.when(
                F.col("_w2") > 0,
                F.round(
                    F.lit(3.0)
                    * F.col("n_triangles").cast("double")
                    / F.col("_w2").cast("double"),
                    6,
                ),
            ).alias("clustering"),
        )
    )
