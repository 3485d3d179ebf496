"""Slippy-map (z/x/y) tile math + grid snapping, numpy-vectorized.

Tile assignment is the raster<->vector bridge of the engine (BASELINE.json
north_star "raster<->vector tiling ... slippy-map tiles"); grid snapping is
the reference DensityScan pixel mapping (geomesa-utils/.../GridSnap.scala:60-80):
i(x) = floor((x - xmin)/dx) clamped to [0, size-1], -1 outside the envelope."""

from __future__ import annotations

import math

import numpy as np


def lonlat_to_tile(lons, lats, zoom: int) -> tuple[np.ndarray, np.ndarray]:
    """Web-Mercator slippy tile (x, y) at a zoom level. Vectorized.
    Lat clamped to the Web-Mercator limit ±85.0511287798066."""
    lon = np.asarray(lons, dtype=np.float64)
    lat = np.clip(np.asarray(lats, dtype=np.float64), -85.0511287798066, 85.0511287798066)
    n = 2.0**zoom
    xt = np.floor((lon + 180.0) / 360.0 * n)
    lat_rad = np.radians(lat)
    yt = np.floor((1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / math.pi) / 2.0 * n)
    xt = np.clip(xt, 0, n - 1).astype(np.int64)
    yt = np.clip(yt, 0, n - 1).astype(np.int64)
    return xt, yt


def tile_bounds(x: int, y: int, zoom: int) -> tuple[float, float, float, float]:
    """(west, south, east, north) of a tile."""
    n = 2.0**zoom
    west = x / n * 360.0 - 180.0
    east = (x + 1) / n * 360.0 - 180.0

    def lat(yy):
        return math.degrees(math.atan(math.sinh(math.pi * (1 - 2 * yy / n))))

    return west, lat(y + 1), east, lat(y)


def tile_key(xt, yt, zoom: int) -> np.ndarray:
    """Single int64 key: (zoom << 58) | (x << 29) | y (zoom <= 29)."""
    return (
        (np.int64(zoom) << np.int64(58))
        | (np.asarray(xt, dtype=np.int64) << np.int64(29))
        | np.asarray(yt, dtype=np.int64)
    )


# ------------------------------------------------------------ GridSnap analog


class GridSnap:
    """Envelope + width x height pixel grid (GridSnap.scala:60-80)."""

    def __init__(self, minx, miny, maxx, maxy, width: int, height: int):
        self.minx, self.miny, self.maxx, self.maxy = minx, miny, maxx, maxy
        self.width, self.height = width, height
        self.dx = (maxx - minx) / width
        self.dy = (maxy - miny) / height

    def i(self, xs) -> np.ndarray:
        """Column index; -1 outside envelope; xmax maps into last column."""
        x = np.asarray(xs, dtype=np.float64)
        i = np.floor((x - self.minx) / self.dx)
        i = np.where((x >= self.minx) & (x <= self.maxx), np.clip(i, 0, self.width - 1), -1)
        return i.astype(np.int64)

    def j(self, ys) -> np.ndarray:
        y = np.asarray(ys, dtype=np.float64)
        j = np.floor((y - self.miny) / self.dy)
        j = np.where((y >= self.miny) & (y <= self.maxy), np.clip(j, 0, self.height - 1), -1)
        return j.astype(np.int64)

    def x(self, i) -> np.ndarray:
        """Cell-center back-mapping: xmin + dx/2 + dx*i."""
        return self.minx + self.dx / 2 + self.dx * np.asarray(i, dtype=np.float64)

    def y(self, j) -> np.ndarray:
        return self.miny + self.dy / 2 + self.dy * np.asarray(j, dtype=np.float64)


def bresenham_cells(i0: int, j0: int, i1: int, j1: int) -> list[tuple[int, int]]:
    """Grid cells along a line segment (DensityScan line renderer analog,
    DensityScan.scala:287-345 uses Bresenham for LineString weights)."""
    cells = []
    di, dj = abs(i1 - i0), abs(j1 - j0)
    si = 1 if i0 < i1 else -1
    sj = 1 if j0 < j1 else -1
    err = di - dj
    i, j = i0, j0
    while True:
        cells.append((i, j))
        if i == i1 and j == j1:
            break
        e2 = 2 * err
        if e2 > -dj:
            err -= dj
            i += si
        if e2 < di:
            err += di
            j += sj
    return cells
