"""The 13 Allen interval relations as Spark Column predicates.

Semantics match GRASS ``python/grass/temporal/temporal_extent.py:431-968``
exactly, including the instant (``end IS NULL``) special cases and the
asymmetric half-open boundary handling in during/contains (``>= start``,
``< end``) that makes granule assignment deterministic.

Each predicate takes the four extent columns of A and B; ``a_end`` /
``b_end`` may be NULL for instants.  These are plain boolean column
expressions, usable in filters and join conditions (range-join friendly).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _c(x) -> Column:
    return F.col(x) if isinstance(x, str) else x


def equal(a_s, a_e, b_s, b_e) -> Column:
    a_s, a_e, b_s, b_e = map(_c, (a_s, a_e, b_s, b_e))
    both_instant = a_e.isNull() & b_e.isNull() & (a_s == b_s)
    both_interval = a_e.isNotNull() & b_e.isNotNull() & (a_s == b_s) & (a_e == b_e)
    return both_instant | both_interval


def during(a_s, a_e, b_s, b_e) -> Column:
    """A during B — temporal_extent.py:713-749."""
    a_s, a_e, b_s, b_e = map(_c, (a_s, a_e, b_s, b_e))
    b_interval = b_e.isNotNull()
    a_instant = a_e.isNull() & (a_s >= b_s) & (a_s < b_e)
    a_interval = a_e.isNotNull() & (a_s > b_s) & (a_e < b_e)
    return b_interval & (a_instant | a_interval)


def contains(a_s, a_e, b_s, b_e) -> Column:
    """A contains B — temporal_extent.py:751-788 (B instant: half-open
    membership ``A.s <= B.s < A.e``)."""
    return during(b_s, b_e, a_s, a_e)


def overlaps(a_s, a_e, b_s, b_e) -> Column:
    """A overlaps B (A starts earlier, they overlap, B ends later) —
    temporal_extent.py:824-861; never true for instants."""
    a_s, a_e, b_s, b_e = map(_c, (a_s, a_e, b_s, b_e))
    return (
        a_e.isNotNull() & b_e.isNotNull()
        & (a_s < b_s) & (a_e < b_e) & (a_e > b_s)
    )


def overlapped(a_s, a_e, b_s, b_e) -> Column:
    return overlaps(b_s, b_e, a_s, a_e)


def starts(a_s, a_e, b_s, b_e) -> Column:
    """A starts B: same start, A ends first — temporal_extent.py:431-461."""
    a_s, a_e, b_s, b_e = map(_c, (a_s, a_e, b_s, b_e))
    return a_e.isNotNull() & b_e.isNotNull() & (a_s == b_s) & (a_e < b_e)


def started(a_s, a_e, b_s, b_e) -> Column:
    return starts(b_s, b_e, a_s, a_e)


def finishes(a_s, a_e, b_s, b_e) -> Column:
    """A finishes B: same end, A starts later — temporal_extent.py:494-523."""
    a_s, a_e, b_s, b_e = map(_c, (a_s, a_e, b_s, b_e))
    return a_e.isNotNull() & b_e.isNotNull() & (a_e == b_e) & (a_s > b_s)


def finished(a_s, a_e, b_s, b_e) -> Column:
    return finishes(b_s, b_e, a_s, a_e)


def after(a_s, a_e, b_s, b_e) -> Column:
    """A after B — temporal_extent.py:556-582 (B instant compares starts)."""
    a_s, a_e, b_s, b_e = map(_c, (a_s, a_e, b_s, b_e))
    return F.when(b_e.isNull(), a_s > b_s).otherwise(a_s > b_e)


def before(a_s, a_e, b_s, b_e) -> Column:
    a_s, a_e, b_s, b_e = map(_c, (a_s, a_e, b_s, b_e))
    return F.when(a_e.isNull(), a_s < b_s).otherwise(a_e < b_s)


def follows(a_s, a_e, b_s, b_e) -> Column:
    """A follows B (meets⁻¹): A starts exactly where B ends —
    temporal_extent.py:655-681."""
    a_s, a_e, b_s, b_e = map(_c, (a_s, a_e, b_s, b_e))
    return b_e.isNotNull() & (a_s == b_e)


def precedes(a_s, a_e, b_s, b_e) -> Column:
    """A precedes B (meets): A ends exactly where B starts."""
    a_s, a_e, b_s, b_e = map(_c, (a_s, a_e, b_s, b_e))
    return a_e.isNotNull() & (a_e == b_s)


RELATIONS = {
    "equal": equal,
    "during": during,
    "contains": contains,
    "overlaps": overlaps,
    "overlapped": overlapped,
    "starts": starts,
    "started": started,
    "finishes": finishes,
    "finished": finished,
    "after": after,
    "before": before,
    "follows": follows,
    "precedes": precedes,
}

#: dispatcher priority of temporal_relation() — temporal_extent.py:903-968
RELATION_PRIORITY = (
    "equal", "during", "contains", "overlaps", "overlapped",
    "after", "before", "starts", "finishes", "started", "finished",
    "follows", "precedes",
)


def relation_name(a_s, a_e, b_s, b_e) -> Column:
    """Classify the relation of A vs B as a string column, testing in the
    reference dispatcher's priority order (first match wins)."""
    expr = F.lit(None).cast("string")
    for name in reversed(RELATION_PRIORITY):
        expr = F.when(RELATIONS[name](a_s, a_e, b_s, b_e), F.lit(name)).otherwise(expr)
    return expr


def any_relation(names: list[str], a_s, a_e, b_s, b_e) -> Column:
    """OR of the requested relations — the compiled-WHERE equivalent of
    ``create_temporal_relation_sql_where_statement``
    (spatio_temporal_relationships.py:817-1089)."""
    cond = F.lit(False)
    for n in names:
        cond = cond | RELATIONS[n](a_s, a_e, b_s, b_e)
    return cond


# ---------------------------------------------------------------------------
# builder-widened relation groups — the semantics every list-consuming
# surface (algebra topolists, t.sample, resample, t.topology census)
# actually sees
# ---------------------------------------------------------------------------

#: ``set_temporal_relationship`` (spatio_temporal_relationships.py:608-672)
#: records a ``starts``/``finishes`` pair ALSO in the DURING list and a
#: ``started``/``finished`` pair ALSO in the CONTAINS list.  The algebra's
#: topolists, t.sample's method lists, resample's priority classes and
#: t.topology's counts all read those lists, so "during"/"contains" are
#: WIDER there than the strict dispatcher predicates above.  (The SQL
#: sampling twin ``create_temporal_relation_sql_where_statement``
#: use_during/use_contain branches encode the same three-way OR.)
TOPO_GROUPS: dict[str, tuple[str, ...]] = {
    "during": ("during", "starts", "finishes"),
    "contains": ("contains", "started", "finished"),
    # the operator grammar's OVER keyword expands to both directions
    # (temporal_operator.py:106-109 doctest: over -> [overlaps, overlapped])
    "over": ("overlaps", "overlapped"),
}


def topo_relation(name: str, a_s, a_e, b_s, b_e) -> Column:
    """One builder-list membership predicate: ``name`` as the topology
    builder records it (during/contains widened, everything else 1:1)."""
    cond = F.lit(False)
    for n in TOPO_GROUPS.get(name, (name,)):
        cond = cond | RELATIONS[n](a_s, a_e, b_s, b_e)
    return cond


def topo_any(names: list[str], a_s, a_e, b_s, b_e) -> Column:
    """OR of builder-list memberships (widened ``any_relation``)."""
    cond = F.lit(False)
    for n in names:
        cond = cond | topo_relation(n, a_s, a_e, b_s, b_e)
    return cond
