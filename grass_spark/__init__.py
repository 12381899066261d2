"""grass_spark — a PySpark-native temporal analytics engine.

A from-scratch rebuild of the query/data-processing capabilities of the
GRASS GIS temporal framework (TGRASS: t.rast.aggregate / t.rast.series /
t.rast.gapfill / temporal topology / granularity inference), re-expressed
as an idiomatic Spark DataFrame engine over time-stamped transcript
tables: cascading retention-tier rollups (1-min -> 1-hour -> 1-day
continuous aggregates), linear gap-fill, Allen-relation interval joins,
checkpoint-manifest resumability, and Gorilla-style compressed bucket
blocks.

Reference semantics studied from OSGeo/grass (read-only snapshot at
/root/reference); every module cites the reference file:line whose
behavior it reproduces.  No reference code is copied — the execution
strategy is Spark-first (DataFrame/SQL + Catalyst + Arrow pandas UDFs).
"""

__version__ = "0.1.0"

from grass_spark.session import get_spark  # noqa: F401
