"""Pure-NumPy oracle implementing GRASS ``lib/stats/c_*.c`` verbatim.

Used only by tests: every Spark kernel in
:mod:`grass_spark.functions.kernels` must match these float64 results
to 0 ULP-ish tolerance (rtol 1e-12).  Each function takes the full
value vector INCLUDING NaN placeholders for NULL cells, because the
regression kernels keep the original input index of surviving values
(``lib/stats/c_reg.c:30-38``).
"""

from __future__ import annotations

import math

import numpy as np


def _nn(values) -> np.ndarray:
    a = np.asarray(values, dtype=np.float64)
    return a[~np.isnan(a)]


def average(values):  # lib/stats/c_ave.c:4-25
    v = _nn(values)
    return float(v.sum() / v.size) if v.size else None


def count(values):  # lib/stats/c_count.c
    return int(_nn(values).size)


def sum_(values):  # lib/stats/c_sum.c
    v = _nn(values)
    return float(v.sum()) if v.size else None


def minimum(values):
    v = _nn(values)
    return float(v.min()) if v.size else None


def maximum(values):
    v = _nn(values)
    return float(v.max()) if v.size else None


def range_(values):
    v = _nn(values)
    return float(v.max() - v.min()) if v.size else None


def variance(values):  # population two-pass — lib/stats/c_var.c:4-41
    v = _nn(values)
    if not v.size:
        return None
    m = v.sum() / v.size
    return float(((v - m) ** 2).sum() / v.size)


def stddev(values):  # lib/stats/c_stddev.c:7-17
    var = variance(values)
    return None if var is None else math.sqrt(var)


def median(values):  # mean of middle two — lib/stats/c_median.c:5-14
    v = np.sort(_nn(values))
    n = v.size
    if not n:
        return None
    return float((v[(n - 1) // 2] + v[n // 2]) / 2.0)


def mode(values):  # ties -> smallest (first in sorted order) — c_mode.c:5-37
    v = np.sort(_nn(values))
    if not v.size:
        return None
    best, best_n, cur, cur_n = v[0], 0, v[0], 0
    for x in v:
        if x == cur:
            cur_n += 1
        else:
            cur, cur_n = x, 1
        if cur_n > best_n:
            best, best_n = cur, cur_n
    return float(best)


def diversity(values):  # distinct non-null count — c_divr.c:4-28
    v = _nn(values)
    return int(np.unique(v).size) if v.size else 0


def quantile(values, q):  # Hyndman–Fan type 7 — c_percentile.c:7-47
    v = np.sort(_nn(values))
    n = v.size
    if not n:
        return None
    k = q * (n - 1)
    i0 = int(math.floor(k))
    i1 = int(math.ceil(k))
    if i0 == i1:
        return float(v[i0])
    return float(v[i0] * (i1 - k) + v[i1] * (k - i0))


def skewness(values):  # Σd³/(n·s³), s=sqrt(Σd²/n) — c_skew.c:6-46
    v = _nn(values)
    if not v.size:
        return None
    m = v.mean()
    s = math.sqrt(((v - m) ** 2).sum() / v.size)
    if s == 0:
        return None  # NaN in GRASS -> NULL on write-out
    return float(((v - m) ** 3).sum() / (v.size * s**3))


def kurtosis(values):  # Σd⁴/(n·var²) − 3 — c_kurt.c:4-45
    v = _nn(values)
    if not v.size:
        return None
    m = v.mean()
    var = ((v - m) ** 2).sum() / v.size
    if var == 0:
        return None
    return float(((v - m) ** 4).sum() / (v.size * var**2) - 3.0)


def min_raster(values):  # argmin index, ties earliest — c_minx.c
    a = np.asarray(values, dtype=np.float64)
    idx = None
    for i, x in enumerate(a):
        if not np.isnan(x) and (idx is None or x < a[idx]):
            idx = i
    return idx


def max_raster(values):  # argmax index, ties earliest — c_maxx.c
    a = np.asarray(values, dtype=np.float64)
    idx = None
    for i, x in enumerate(a):
        if not np.isnan(x) and (idx is None or x > a[idx]):
            idx = i
    return idx


def _regression(values):
    """OLS against the ORIGINAL input index — lib/stats/c_reg.c:16-104.

    x_i = position in the full (null-including) vector; null values are
    skipped but surviving x keep their position.
    """
    a = np.asarray(values, dtype=np.float64)
    mask = ~np.isnan(a)
    x = np.arange(a.size, dtype=np.float64)[mask]
    y = a[mask]
    n = y.size
    if n < 2:  # c_reg.c:35-37
        return None, None, None, None
    xbar, ybar = x.mean(), y.mean()
    sxx = (x * x).sum() - n * xbar * xbar
    sxy = (x * y).sum() - n * xbar * ybar
    syy = (y * y).sum() - n * ybar * ybar
    slope = sxy / sxx
    offset = ybar - xbar * slope
    if syy == 0:
        # Rsq = 0/0 = NaN -> NULL (c_reg.c:61,83-85)
        return float(slope), float(offset), None, None
    r2 = (sxy * sxy) / (sxx * syy)
    # engine rule: non-finite regression outputs -> NULL (GRASS emits +inf
    # for the perfect-fit tvalue; we extend its NaN->NULL rule to inf)
    tval = None if (r2 >= 1.0 or n <= 2) else math.sqrt(r2 * (n - 2) / (1.0 - r2))
    return float(slope), float(offset), float(r2), tval


def slope(values):
    return _regression(values)[0]


def offset(values):
    return _regression(values)[1]


def detcoeff(values):
    return _regression(values)[2]


def tvalue(values):
    return _regression(values)[3]


ORACLE = {
    "average": average,
    "count": count,
    "sum": sum_,
    "minimum": minimum,
    "maximum": maximum,
    "range": range_,
    "variance": variance,
    "stddev": stddev,
    "median": median,
    "mode": mode,
    "diversity": diversity,
    "quart1": lambda v: quantile(v, 0.25),
    "quart3": lambda v: quantile(v, 0.75),
    "perc90": lambda v: quantile(v, 0.90),
    "skewness": skewness,
    "kurtosis": kurtosis,
    "min_raster": min_raster,
    "max_raster": max_raster,
    "slope": slope,
    "offset": offset,
    "detcoeff": detcoeff,
    "tvalue": tvalue,
}
