"""Driver contract for the spark-graft builder (PySpark target).

``entry`` runs the flagship temporal rollup on sf0.001; ``queries`` /
``oracle_sql`` expose one entry per implemented operator family from
SURVEY.md §2 (plus the training-data ops), each with a DuckDB oracle.
Implementation lives in :mod:`grass_spark.queries`.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from grass_spark.queries import ORACLES, QUERIES  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: the t.rast.aggregate-equivalent hourly rollup
    (count/sum/average/min/max per user per hour) on sf0.001."""
    return QUERIES["agg_hourly"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for every query."""
    return dict(ORACLES)
