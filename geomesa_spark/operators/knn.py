"""k-nearest-neighbors search: expanding-radius geodesic kNN.

Reference semantics (geomesa-process/.../KNearestNeighborSearchProcess.scala:39-260):
for each query point start from an estimated radius, scan the bbox window,
keep the k best by geodesic distance, expand the window until k found or
maxSearchDistance reached.

Spark-first plan: query points are broadcast (they are few); each round
  1. builds per-query lon/lat windows for the current radius,
  2. joins docs via a codegen'd bbox condition on the indexed x/y columns
     (+ coarse cell IN pruning),
  3. computes geodesic distance as a pure Column expression (haversine via
     built-in trig -> whole-stage codegen, no Python),
  4. row_number() over (partition by query order by distance) keeps k,
  5. queries whose k-th best distance is already within the current radius
     are DONE (their top-k cannot change); the rest double the radius.
The loop runs on the driver; each round is one Spark job over the pruned
partitions only — the DataFrame analog of the reference's expanding window.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..geom.algorithms import EARTH_MEAN_RADIUS_M
from ..plans.planner import _cover_cells
from ..sources.docs import MULTI_CELL, PARTITION_CELL_BITS


def haversine_col(lon1, lat1, lon2, lat2):
    """Great-circle meters as a pure Column expression (codegen'd)."""
    rlon1, rlat1 = F.radians(lon1), F.radians(lat1)
    rlon2, rlat2 = F.radians(lon2), F.radians(lat2)
    h = (
        F.pow(F.sin((rlat2 - rlat1) / 2), 2)
        + F.cos(rlat1) * F.cos(rlat2) * F.pow(F.sin((rlon2 - rlon1) / 2), 2)
    )
    return 2 * F.lit(EARTH_MEAN_RADIUS_M) * F.asin(F.least(F.lit(1.0), F.sqrt(h)))


def _query_windows(queries: list[tuple], radius_m: float):
    """(qid, lon, lat) -> list of bbox windows (antimeridian-split)."""
    out = []
    for qid, lon, lat in queries:
        dlat = math.degrees(radius_m / EARTH_MEAN_RADIUS_M)
        coslat = max(0.01, math.cos(math.radians(lat)))
        dlon = min(180.0, dlat / coslat)
        y0, y1 = max(-90.0, lat - dlat), min(90.0, lat + dlat)
        x0, x1 = lon - dlon, lon + dlon
        if x0 < -180.0:
            out.append((qid, (-180.0, y0, x1, y1)))
            out.append((qid, (x0 + 360.0, y0, 180.0, y1)))
        elif x1 > 180.0:
            out.append((qid, (x0, y0, 180.0, y1)))
            out.append((qid, (-180.0, y0, x1 - 360.0, y1)))
        else:
            out.append((qid, (x0, y0, x1, y1)))
    return out


def knn(
    docs: DataFrame,
    queries: list[tuple],
    k: int = 5,
    start_radius_m: float = 1_000.0,
    max_radius_m: float = 1_000_000.0,
) -> DataFrame:
    """queries: [(query_id, lon, lat), ...]. Returns docs columns +
    query_id + dist_m, k rows per query (fewer if max radius exhausts)."""
    spark: SparkSession = docs.sparkSession
    qdf_all = spark.createDataFrame(
        [(str(q), float(lon), float(lat)) for q, lon, lat in queries],
        "query_id string, q_lon double, q_lat double",
    )

    pending = list(queries)
    results = None
    radius = start_radius_m
    while pending:
        windows = _query_windows(pending, radius)
        cells = _cover_cells([w for _, w in windows], PARTITION_CELL_BITS)
        wdf = spark.createDataFrame(
            [(str(q), *w) for q, w in windows],
            "query_id string, w_minx double, w_miny double, w_maxx double, w_maxy double",
        ).join(qdf_all, "query_id")
        # MULTI_CELL (-1) rows (multi-cell extents / null geom) are never
        # pruned; their x/y centroid still passes the window+distance check
        cand = docs.filter(F.col("cell").isin([*cells, MULTI_CELL])).join(
            F.broadcast(wdf),
            (F.col("x") >= F.col("w_minx"))
            & (F.col("x") <= F.col("w_maxx"))
            & (F.col("y") >= F.col("w_miny"))
            & (F.col("y") <= F.col("w_maxy")),
        )
        cand = cand.withColumn(
            "dist_m", haversine_col(F.col("x"), F.col("y"), F.col("q_lon"), F.col("q_lat"))
        ).filter(F.col("dist_m") <= F.lit(min(radius, max_radius_m)))
        w = Window.partitionBy("query_id").orderBy(F.col("dist_m").asc(), F.col("doc_id").asc())
        topk = (
            cand.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= k)
            .drop("w_minx", "w_miny", "w_maxx", "w_maxy", "q_lon", "q_lat")
        )
        stats = {
            r["query_id"]: (r["cnt"], r["kth"])
            for r in topk.groupBy("query_id")
            .agg(F.count("*").alias("cnt"), F.max("dist_m").alias("kth"))
            .collect()
        }
        done_ids = set()
        for q, lon, lat in pending:
            cnt, kth = stats.get(str(q), (0, None))
            # done when k found within the CURRENT radius (no farther point can
            # displace them) or the search space is exhausted
            if (cnt >= k and kth is not None and kth <= radius) or radius >= max_radius_m:
                done_ids.add(str(q))
        done_df = topk.filter(F.col("query_id").isin(sorted(done_ids))).drop("_rn")
        results = done_df if results is None else results.unionByName(done_df)
        pending = [q for q in pending if str(q[0]) not in done_ids]
        # x4 expansion: each extra round quadruples the window area, so even a
        # badly-underestimated start radius converges in a few Spark jobs
        radius = min(radius * 4, max_radius_m) if radius < max_radius_m else max_radius_m
        if pending and results is not None:
            results = results.localCheckpoint(eager=False)  # bound lineage growth
    return results if results is not None else docs.limit(0)
