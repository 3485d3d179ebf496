"""Tiered attribute index: attribute-equality queries with a spatial tier.

Reference semantics: the attribute index keys rows by attribute value with a
z-curve tiebreaker so `attr = X AND bbox` scans one attribute run, z-ordered
(geomesa-index-api/.../attribute/AttributeIndexKeySpace.scala:34-71 — tiered
keys = attribute bytes ++ tier (z2/z3/xz2) bytes).

Spark-first translation (no custom key bytes needed):
  - files are PARTITIONED by hash-bucket of the attribute (partition pruning
    eliminates (buckets-1)/buckets of files for an equality predicate),
  - rows are SORTED (attr, z2) within files, so parquet row-group min/max
    stats prune on BOTH the attribute equality (tight runs after the sort)
    and the z2 ranges of the query window (the tier).
At 100 TB this is the difference between scanning one bucket's z-run and
scanning every file for a single user's data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..index.ranges import zranges_lonlat
from ..index.zorder import Z2_BITS

DEFAULT_BUCKETS = 64


def attr_bucket_col(attr_col, buckets: int = DEFAULT_BUCKETS):
    return F.pmod(F.xxhash64(attr_col.cast("string")), F.lit(buckets))


def with_z2(df: DataFrame, lon_col: str = "x", lat_col: str = "y") -> DataFrame:
    """Attach the 31-bit/dim Z2 key to a point table via the SAME numpy path
    the query-side range decomposition uses (zorder.z2_index) — one Arrow
    batch per pass, bit-identical to zranges_lonlat's normalize."""
    import pandas as pd
    from pyspark.sql.types import LongType

    from ..index.zorder import z2_index

    def z2(xs, ys):  # no hints: local pd import + future-annotations trap
        return pd.Series(z2_index(xs.to_numpy(dtype=float), ys.to_numpy(dtype=float)))

    return df.withColumn("z2", F.pandas_udf(z2, LongType())(F.col(lon_col), F.col(lat_col)))


def write_attr_indexed(
    df: DataFrame,
    path: str,
    attr: str,
    buckets: int = DEFAULT_BUCKETS,
    fmt: str = "parquet",
) -> None:
    """Write the tiered-attribute layout: partitionBy(attr_bucket) +
    sortWithinPartitions(attr, z2). Requires the z2 column (index job)."""
    out = df.withColumn("attr_bucket", attr_bucket_col(F.col(attr), buckets))
    (
        out.repartition(buckets, "attr_bucket")
        .sortWithinPartitions(attr, "z2")
        .write.mode("overwrite")
        .format(fmt)
        .partitionBy("attr_bucket")
        .save(path)
    )


def attr_equality_scan(
    spark: SparkSession,
    path: str,
    attr: str,
    value,
    bbox: tuple[float, float, float, float] | None = None,
    buckets: int = DEFAULT_BUCKETS,
    max_ranges: int = 60,
    geom_kind: str = "points",
) -> DataFrame:
    """Read path for `attr = value [AND bbox]`:
      1. attr_bucket == hash-bucket(value)   (partition pruning)
      2. attr == value                       (row-group stats: sorted runs)
      3. z2 range ORs                        (row-group stats: z-sorted tier)
      4. envelope compare                    (exact for the bbox predicate)
    All predicates are plain Columns — parquet pushdown end to end.

    CONTRACT: the z2 tier conjunct (step 3) is sound only for POINT tables —
    z2 keys the centroid, and an extent whose envelope overlaps the bbox can
    have its centroid (hence z2) outside it. For extent tables pass
    geom_kind="extents": the z2 conjunct is skipped and the envelope compare
    alone filters (the reference tiers extents on XZ2 for the same reason —
    AttributeIndexKeySpace.scala:34-71 tier selection)."""
    if geom_kind not in ("points", "extents"):
        raise ValueError(f"geom_kind must be 'points' or 'extents', got {geom_kind!r}")
    df = spark.read.parquet(path)
    lit_val = F.lit(value)
    cond = (F.col("attr_bucket") == attr_bucket_col(lit_val, buckets)) & (
        F.col(attr) == lit_val
    )
    if bbox is not None:
        minx, miny, maxx, maxy = bbox
        if geom_kind == "points":
            from ..plans.planner import ranges_between_sql

            ranges = zranges_lonlat([bbox], Z2_BITS, max_ranges=max_ranges)
            # ONE F.expr call for the whole balanced OR-tree (per-range
            # Column ops are py4j round trips — driver-time, not query-time)
            zsql = ranges_between_sql("z2", ranges)
            if zsql is not None:
                cond = cond & F.expr(zsql)
        cond = cond & (
            (F.col("minx") <= F.lit(maxx))
            & (F.col("maxx") >= F.lit(minx))
            & (F.col("miny") <= F.lit(maxy))
            & (F.col("maxy") >= F.lit(miny))
        )
    return df.filter(cond)
