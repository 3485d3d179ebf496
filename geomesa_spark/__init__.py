"""geomesa_spark: a PySpark-native spatial-join + tiling engine.

A from-scratch DataFrame/Catalyst/Arrow engine with the query surface of
GeoMesa (reference at /root/reference): st_* SQL functions, Z2/Z3/XZ2-style
cell indexing re-expressed as vectorized cell encoders + partition-prunable
predicates, spatial joins, kNN, density/tile aggregation — over parquet or
Iceberg tables of interleaved text+media documents.

Usage:
    import geomesa_spark
    geomesa_spark.init_sql(spark)   # registers all st_* SQL functions
"""

__version__ = "0.1.0"

from .functions import register as _register_functions


def init_sql(spark):
    """Register all st_* functions on a SparkSession (the analog of
    geomesa_pyspark.init_sql / SparkSession.withJTS)."""
    _register_functions(spark)
    return spark
