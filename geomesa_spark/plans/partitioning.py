"""Spatial DataFrame partitioning strategies (reference §2.8:
RelationUtils.equalPartitioning/wholeEarthPartitioning/weightedPartitioning/
rtreePartitioning, geomesa-spark-sql; enabled there by .option("spatial","true")).

Spark-first: every strategy materializes as a `spart` column + repartition on
it — co-locating data for repeated spatial joins/aggregations. RTREE is
intentionally replaced by WEIGHTED + AQE (sample-quantile grids plus runtime
skew splitting dominate an STRtree of samples at cluster scale)."""

from __future__ import annotations

import math

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def equal_partitioning(df: DataFrame, n: int, lon_col: str = "x", lat_col: str = "y") -> DataFrame:
    """Data-bounds sqrt(n) x sqrt(n) equal grid (RelationUtils:85-105)."""
    b = df.agg(
        F.min(lon_col).alias("x0"), F.max(lon_col).alias("x1"),
        F.min(lat_col).alias("y0"), F.max(lat_col).alias("y1"),
    ).collect()[0]
    k = max(1, int(math.isqrt(n)))
    dx = (b.x1 - b.x0) / k or 1.0
    dy = (b.y1 - b.y0) / k or 1.0
    ix = F.least(F.floor((F.col(lon_col) - b.x0) / dx), F.lit(k - 1))
    iy = F.least(F.floor((F.col(lat_col) - b.y0) / dy), F.lit(k - 1))
    out = df.withColumn("spart", (ix * k + iy).cast("int"))
    return out.repartition(k * k, "spart")


def earth_partitioning(df: DataFrame, n: int, lon_col: str = "x", lat_col: str = "y") -> DataFrame:
    """Same grid over the whole earth (RelationUtils:130-132)."""
    k = max(1, int(math.isqrt(n)))
    ix = F.least(F.floor((F.col(lon_col) + 180.0) / (360.0 / k)), F.lit(k - 1))
    iy = F.least(F.floor((F.col(lat_col) + 90.0) / (180.0 / k)), F.lit(k - 1))
    out = df.withColumn("spart", (ix * k + iy).cast("int"))
    return out.repartition(k * k, "spart")


def weighted_partitioning(
    df: DataFrame, n: int, lon_col: str = "x", lat_col: str = "y",
    sample_fraction: float = 0.1,
) -> DataFrame:
    """Sample-quantile grid per axis (RelationUtils:107-128): bins hold
    roughly equal row counts, so hot regions get more partitions."""
    k = max(1, int(math.isqrt(n)))
    probs = [i / k for i in range(1, k)]
    qx = df.approxQuantile(lon_col, probs, 0.01)
    qy = df.approxQuantile(lat_col, probs, 0.01)

    def bucket(col, cuts):
        e = F.lit(0)
        for c in cuts:
            e = e + F.when(col > F.lit(float(c)), 1).otherwise(0)
        return e

    out = df.withColumn(
        "spart", (bucket(F.col(lon_col), qx) * k + bucket(F.col(lat_col), qy)).cast("int")
    )
    return out.repartition(k * k, "spart")


def partition_bounds(df: DataFrame) -> DataFrame:
    """Envelope + row count per spatial partition (bounds aggregation,
    RelationUtils.getBound:72-83)."""
    return df.groupBy("spart").agg(
        F.min("x").alias("minx"), F.min("y").alias("miny"),
        F.max("x").alias("maxx"), F.max("y").alias("maxy"),
        F.count("*").alias("rows"),
    )
