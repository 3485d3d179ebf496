"""Search/analytic "processes" — the reference's geomesa-process surface
(geomesa-process-vector, SURVEY.md §2.6) as DataFrame compositions.

Each docstring cites the process it mirrors."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .knn import disc_window_deg, haversine_col


def _disc_box_cond(lon: float, lat: float, dlat: float, dlon: float):
    """Lon/lat window Column for a geodesic disc, SPLIT at the antimeridian
    (the lon axis is a ring: a window past ±180 wraps to the other side —
    the same seam the knn _query_windows split handles)."""
    ycond = (F.col("y") >= lat - dlat) & (F.col("y") <= lat + dlat)
    x0, x1 = lon - dlon, lon + dlon
    if dlon >= 180.0:
        return ycond
    if x0 < -180.0:
        xcond = (F.col("x") >= x0 + 360.0) | (F.col("x") <= x1)
    elif x1 > 180.0:
        xcond = (F.col("x") >= x0) | (F.col("x") <= x1 - 360.0)
    else:
        xcond = (F.col("x") >= x0) & (F.col("x") <= x1)
    return xcond & ycond


def proximity_search(
    docs: DataFrame,
    inputs: list[tuple[float, float]],
    meters: float,
) -> DataFrame:
    """Features within `meters` of ANY input point
    (ProximitySearchProcess.scala:25-93): bbox prefilter (codegen) + geodesic
    distance check; dwithin two-phase shape."""
    conds = None
    for lon, lat in inputs:
        dlat, dlon = disc_window_deg(lat, meters)
        box = _disc_box_cond(lon, lat, dlat, dlon) & (
            haversine_col(F.col("x"), F.col("y"), F.lit(lon), F.lit(lat)) <= meters
        )
        conds = box if conds is None else (conds | box)
    return docs.filter(conds)


def track_label(
    df: DataFrame, track_col: str, time_col: str = "ts", tiebreak: str | None = None
) -> DataFrame:
    """Last feature per track (TrackLabelProcess.scala:26-65)."""
    order = [F.col(time_col).desc()]
    if tiebreak:
        order.append(F.col(tiebreak).desc())
    w = Window.partitionBy(track_col).orderBy(*order)
    return df.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") == 1).drop("_rn")


def date_offset(df: DataFrame, time_col: str, offset_sql: str) -> DataFrame:
    """Shift a date attribute (DateOffsetProcess.scala:24-54), e.g.
    offset_sql='INTERVAL 1 HOUR'."""
    return df.withColumn(time_col, F.col(time_col) + F.expr(offset_sql))


def hash_attribute(df: DataFrame, col: str, buckets: int, out: str = "hash_bucket") -> DataFrame:
    """hash(attr) % buckets as a new column (HashAttributeProcess.scala:61-91)."""
    return df.withColumn(out, F.pmod(F.xxhash64(F.col(col)), F.lit(buckets)))


def sample_every_nth(df: DataFrame, n: int, id_col: str, by: str | None = None) -> DataFrame:
    """Deterministic 1-in-n thinning (SamplingIterator.scala:19-67 every-nth
    semantics; optionally per-track via `by`)."""
    if by is None:
        return df.filter(F.pmod(F.col(id_col), F.lit(n)) == 0)
    w = Window.partitionBy(by).orderBy(id_col)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.pmod(F.col("_rn") - 1, F.lit(n)) == 0)
        .drop("_rn")
    )


def point2point(
    df: DataFrame, track_col: str, time_col: str = "ts",
    lon_col: str = "x", lat_col: str = "y",
) -> DataFrame:
    """Aggregate point sequences into per-track consecutive segments
    (Point2PointProcess.scala:27-113): each output row is one segment with a
    geodesic length."""
    w = Window.partitionBy(track_col).orderBy(time_col)
    seg = (
        df.withColumn("_x2", F.lead(lon_col).over(w))
        .withColumn("_y2", F.lead(lat_col).over(w))
        .withColumn("_t2", F.lead(time_col).over(w))
        .filter(F.col("_x2").isNotNull())
    )
    return seg.select(
        F.col(track_col),
        F.col(time_col).alias("t_start"),
        F.col("_t2").alias("t_end"),
        F.col(lon_col).alias("x1"),
        F.col(lat_col).alias("y1"),
        F.col("_x2").alias("x2"),
        F.col("_y2").alias("y2"),
        haversine_col(F.col(lon_col), F.col(lat_col), F.col("_x2"), F.col("_y2")).alias(
            "seg_meters"
        ),
    )


def track_length(df: DataFrame, track_col: str, time_col: str = "ts") -> DataFrame:
    """Great-circle track length per track: window lag + vectorized haversine
    (cleaner than the reference's collect_list + st_aggregateDistanceSphere,
    SparkSQLDataTest.scala:649-666)."""
    segs = point2point(df, track_col, time_col)
    return segs.groupBy(track_col).agg(F.sum("seg_meters").alias("track_meters"))


def unique_values(df: DataFrame, col: str) -> DataFrame:
    """Distinct attribute values with counts (UniqueProcess.scala:27-140)."""
    return df.groupBy(col).agg(F.count("*").alias("count"))


def min_max(df: DataFrame, col: str) -> DataFrame:
    """Attribute bounds (MinMaxProcess.scala:19-52)."""
    return df.agg(
        F.min(col).alias("min_value"),
        F.max(col).alias("max_value"),
        F.count("*").alias("count"),
    )


def tube_select(
    docs: DataFrame,
    track_points: list[tuple[float, float, str]],
    meters: float,
    time_window_s: float = 3600.0,
) -> DataFrame:
    """Features within a buffered, time-binned corridor around a track
    (TubeSelectProcess.scala:33-184): per track vertex, docs within `meters`
    AND within the vertex's time window."""
    conds = None
    for lon, lat, iso_ts in track_points:
        dlat, dlon = disc_window_deg(lat, meters)
        c = (
            _disc_box_cond(lon, lat, dlat, dlon)
            & (haversine_col(F.col("x"), F.col("y"), F.lit(lon), F.lit(lat)) <= meters)
            & (
                F.abs(
                    F.unix_timestamp("ts")
                    - F.unix_timestamp(F.lit(iso_ts).cast("timestamp"))
                )
                <= time_window_s
            )
        )
        conds = c if conds is None else (conds | c)
    return docs.filter(conds)


def route_search(
    docs: DataFrame,
    route_points: list[tuple[float, float]],
    meters: float,
    heading_tolerance_deg: float | None = None,
    heading_col: str | None = None,
) -> DataFrame:
    """Features along a route, optionally matching the route's local bearing
    (RouteSearchProcess.scala:36-311): per route segment, docs within
    `meters` of the segment midpoint AND (if heading_col) heading within
    tolerance of the segment bearing."""
    import math

    from ..geom.algorithms import haversine

    conds = None
    for (x1, y1), (x2, y2) in zip(route_points[:-1], route_points[1:]):
        mx, my = (x1 + x2) / 2, (y1 + y2) / 2
        seg_len = float(haversine(x1, y1, x2, y2))
        radius = meters + seg_len / 2
        dlat, dlon = disc_window_deg(my, radius)
        c = _disc_box_cond(mx, my, dlat, dlon) & (
            haversine_col(F.col("x"), F.col("y"), F.lit(mx), F.lit(my)) <= radius
        )
        if heading_col and heading_tolerance_deg is not None:
            bearing = math.degrees(math.atan2(x2 - x1, y2 - y1)) % 360
            diff = F.abs(F.pmod(F.col(heading_col) - F.lit(bearing) + 180.0, F.lit(360.0)) - 180.0)
            c = c & (diff <= heading_tolerance_deg)
        conds = c if conds is None else (conds | c)
    return docs.filter(conds)
