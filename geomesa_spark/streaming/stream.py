"""Structured Streaming integration.

The reference has NO Spark streaming path (its Kafka store is a queryable
cache, docs/user/kafka/index.rst:10-14; SURVEY.md §1.4/§2.10) — this module
is the Spark-native extension the blueprint prescribes: readStream ->
the same cell-indexing Columns -> watermarked windowed aggregation.

Works with any streaming source (kafka/rate/file); the transformations are
source-agnostic Column expressions, so the batch and streaming paths share
one implementation."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.density import grid_i, tile_x, tile_y
from ..sources.docs import PARTITION_CELL_BITS, index_points_df


def index_stream(stream: DataFrame, lon_col: str, lat_col: str) -> DataFrame:
    """Add the engine's derived point columns to a stream (pure Columns —
    streaming-safe, no stateful ops)."""
    return index_points_df(stream, lon_col, lat_col, with_wkb=False)


def windowed_tile_counts(
    stream: DataFrame,
    zoom: int,
    time_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    lon_col: str = "x",
    lat_col: str = "y",
) -> DataFrame:
    """Documents per slippy tile per event-time window, late data handled by
    the watermark. Output mode `update`/`append` both valid."""
    return (
        stream.withWatermark(time_col, watermark)
        .groupBy(
            F.window(time_col, window).alias("w"),
            tile_x(F.col(lon_col), zoom).alias("tile_x"),
            tile_y(F.col(lat_col), zoom).alias("tile_y"),
        )
        .agg(F.count("*").alias("n_docs"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "tile_x",
            "tile_y",
            "n_docs",
        )
    )


def windowed_density(
    stream: DataFrame,
    bbox: tuple[float, float, float, float],
    width: int,
    height: int,
    time_col: str = "ts",
    window: str = "1 minute",
    watermark: str = "2 minutes",
    lon_col: str = "x",
    lat_col: str = "y",
) -> DataFrame:
    """Streaming heatmap: GridSnap pixel + event-time window aggregation."""
    minx, miny, maxx, maxy = bbox
    return (
        stream.withWatermark(time_col, watermark)
        .filter(
            (F.col(lon_col) >= minx) & (F.col(lon_col) <= maxx)
            & (F.col(lat_col) >= miny) & (F.col(lat_col) <= maxy)
        )
        .groupBy(
            F.window(time_col, window).alias("w"),
            grid_i(F.col(lon_col), minx, maxx, width).alias("i"),
            grid_i(F.col(lat_col), miny, maxy, height).alias("j"),
        )
        .agg(F.count("*").alias("weight"))
        .select(F.col("w.start").alias("window_start"), "i", "j", "weight")
    )


def streaming_proximity_alerts(
    stream: DataFrame,
    center: tuple[float, float],
    meters: float,
    lon_col: str = "x",
    lat_col: str = "y",
) -> DataFrame:
    """Stateless geofence filter: events within `meters` of a center
    (two-phase dwithin shape, streaming-safe)."""
    from ..operators.knn import haversine_col

    lon, lat = center
    return stream.filter(
        haversine_col(F.col(lon_col), F.col(lat_col), F.lit(lon), F.lit(lat))
        <= F.lit(meters)
    )
