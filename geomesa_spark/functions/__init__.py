"""st_* Column functions + SQL registration.

Python-first analog of the reference's DataFrameFunctions.scala (97 typed
Column overloads) and geomesa_pyspark/scala/functions.py wrappers — here the
functions ARE the implementation (pandas UDFs), not JVM bridges."""

from .library import UDFS, register, st_convexhull_agg

# export every UDF as a module-level Column function: from geomesa_spark.functions import st_contains
globals().update(UDFS)

__all__ = ["register", "UDFS", "st_convexhull_agg", *UDFS.keys()]
