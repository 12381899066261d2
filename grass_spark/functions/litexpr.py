"""SQL-text builders for literal-heavy vector expressions.

The expr-path vector kernels (PQ encode/ADC, IVF cell assignment,
SemDeDup centroid scoring) embed O(k*dims) float literals in the plan.
Building those trees one ``F.lit``/``F.struct`` at a time costs one
py4j round-trip per node — measured SECONDS of driver time per query
at m*k*sub ~ 1k (the dominant cost of the pq/ivf bench rows).  These
helpers emit the SAME expression as SQL text so the whole tree crosses
to the JVM in ONE ``F.expr`` parse.

Bit-exactness: float literals are rendered as
``CAST('<repr>' AS DOUBLE)`` — Python ``repr`` is shortest
round-trip and Java's string→double parse is correctly rounded, so the
parsed literal is the identical IEEE double that ``F.lit(float(v))``
would ship.  All arithmetic shapes (zip_with folds, left-to-right
adds, struct orderings) mirror the Column builders they replace
token for token.
"""

from __future__ import annotations

__all__ = [
    "dlit",
    "darr",
    "dot_sql",
    "l2norm_sql",
    "sq_dist_sql",
]


def dlit(v: float) -> str:
    """Exact SQL double literal for a Python float."""
    return f"CAST('{float(v)!r}' AS DOUBLE)"


def darr(vs) -> str:
    """SQL literal array<double>."""
    return "array(" + ", ".join(dlit(v) for v in vs) + ")"


def dot_sql(a: str, b: str) -> str:
    """Mirror of ``similarity.dot`` (zip_with product + left fold)."""
    return (
        f"aggregate(zip_with({a}, {b}, (x, y) -> x * y), "
        "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )


def l2norm_sql(a: str) -> str:
    """Mirror of ``similarity.l2norm``."""
    return (
        f"sqrt(aggregate(transform({a}, x -> x * x), "
        "CAST(0 AS DOUBLE), (acc, x) -> acc + x))"
    )


def sq_dist_sql(sub: str, cvec) -> str:
    """Mirror of ``pq._sq_dist``: left fold of (x-c)^2 over one
    subspace with the centroid as a literal zip_with argument."""
    return (
        f"aggregate(zip_with({sub}, {darr(cvec)}, "
        "(a, b) -> (a - b) * (a - b)), "
        "CAST(0 AS DOUBLE), (acc, x) -> acc + x)"
    )
