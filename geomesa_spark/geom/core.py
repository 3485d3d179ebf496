"""Geometry model: a tiny, numpy-backed OGC simple-features kernel.

The reference (GeoMesa) represents geometries as JTS objects serialized to WKB
inside Spark UDTs (reference: geomesa-spark/geomesa_pyspark/src/main/python/
geomesa_pyspark/types.py:8-84 — WKB wrapped in a BinaryType struct). Our engine
keeps that convention: a geometry column IS a WKB BinaryType column; this module
is the in-Python decoded form used inside Arrow-vectorized pandas UDFs.

No shapely in this environment, so the kernel is self-contained: coordinates are
numpy float64 arrays, geometry types follow the OGC simple-feature hierarchy.
"""

from __future__ import annotations

import numpy as np

# OGC WKB geometry type codes
POINT = 1
LINESTRING = 2
POLYGON = 3
MULTIPOINT = 4
MULTILINESTRING = 5
MULTIPOLYGON = 6
GEOMETRYCOLLECTION = 7

TYPE_NAMES = {
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
    GEOMETRYCOLLECTION: "GeometryCollection",
}
NAME_TYPES = {v.upper(): k for k, v in TYPE_NAMES.items()}


class Geometry:
    """A geometry value.

    coords layout by type:
      Point               -> np.ndarray shape (2,) (or (3,) with M/Z)
      LineString          -> np.ndarray shape (n, 2)
      Polygon             -> list[np.ndarray (n,2)]  (ring 0 = shell, rest holes)
      MultiPoint          -> np.ndarray shape (n, 2)
      MultiLineString     -> list[np.ndarray (n,2)]
      MultiPolygon        -> list[list[np.ndarray (n,2)]]
      GeometryCollection  -> list[Geometry]
    An EMPTY geometry has coords that are length-0 / empty list; Point EMPTY is
    represented by a (2,) array of NaN (matching WKB convention).
    """

    __slots__ = ("gtype", "coords")

    def __init__(self, gtype: int, coords):
        self.gtype = gtype
        self.coords = coords

    # ------------------------------------------------------------------ basics

    @property
    def type_name(self) -> str:
        return TYPE_NAMES[self.gtype]

    def is_empty(self) -> bool:
        g, c = self.gtype, self.coords
        if g == POINT:
            return bool(np.isnan(c[0]))
        if g in (LINESTRING, MULTIPOINT):
            return len(c) == 0
        return len(c) == 0

    def bounds(self) -> tuple[float, float, float, float]:
        """(minx, miny, maxx, maxy); NaNs if empty."""
        pts = self._all_coords()
        if len(pts) == 0:
            return (np.nan, np.nan, np.nan, np.nan)
        return (
            float(pts[:, 0].min()),
            float(pts[:, 1].min()),
            float(pts[:, 0].max()),
            float(pts[:, 1].max()),
        )

    def _all_coords(self) -> np.ndarray:
        """All vertices as an (n,2) array (first 2 dims only)."""
        g, c = self.gtype, self.coords
        if g == POINT:
            if np.isnan(c[0]):
                return np.empty((0, 2))
            return np.asarray(c[:2]).reshape(1, 2)
        if g in (LINESTRING, MULTIPOINT):
            return np.asarray(c)[:, :2] if len(c) else np.empty((0, 2))
        if g in (POLYGON, MULTILINESTRING):
            if not c:
                return np.empty((0, 2))
            return np.concatenate([np.asarray(r)[:, :2] for r in c])
        if g == MULTIPOLYGON:
            rings = [np.asarray(r)[:, :2] for poly in c for r in poly]
            return np.concatenate(rings) if rings else np.empty((0, 2))
        # collection
        arrs = [geom._all_coords() for geom in c]
        arrs = [a for a in arrs if len(a)]
        return np.concatenate(arrs) if arrs else np.empty((0, 2))

    # --------------------------------------------------------------- structure

    def num_geometries(self) -> int:
        g = self.gtype
        if g in (POINT, LINESTRING, POLYGON):
            return 0 if self.is_empty() else 1
        return len(self.coords)

    def geometry_n(self, n: int) -> "Geometry | None":
        """1-based, like the reference st_geometryN
        (GeometricAccessorFunctions.scala:29-31: null if out of range)."""
        g = self.gtype
        if g in (POINT, LINESTRING, POLYGON):
            return self if n == 1 else None
        if n < 1 or n > len(self.coords):
            return None
        part = self.coords[n - 1]
        if g == MULTIPOINT:
            return Geometry(POINT, np.asarray(part))
        if g == MULTILINESTRING:
            return Geometry(LINESTRING, np.asarray(part))
        if g == MULTIPOLYGON:
            return Geometry(POLYGON, part)
        return part  # collection: already a Geometry

    def num_points(self) -> int:
        return int(len(self._all_coords()))

    def dimension(self) -> int:
        g = self.gtype
        if g == POINT or g == MULTIPOINT:
            return 0
        if g in (LINESTRING, MULTILINESTRING):
            return 1
        if g in (POLYGON, MULTIPOLYGON):
            return 2
        return max((x.dimension() for x in self.coords), default=0)

    def __repr__(self):  # pragma: no cover
        from .wkt import to_wkt

        return f"<Geometry {to_wkt(self)}>"

    def __eq__(self, other):
        from .wkt import to_wkt

        return isinstance(other, Geometry) and to_wkt(self) == to_wkt(other)

    def __hash__(self):
        from .wkt import to_wkt

        return hash(to_wkt(self))


# ------------------------------------------------------------------- builders


def point(x: float, y: float) -> Geometry:
    return Geometry(POINT, np.array([x, y], dtype=np.float64))


def linestring(coords) -> Geometry:
    return Geometry(LINESTRING, np.asarray(coords, dtype=np.float64).reshape(-1, 2))


def polygon(shell, holes=()) -> Geometry:
    rings = [_close_ring(np.asarray(shell, dtype=np.float64).reshape(-1, 2))]
    for h in holes:
        rings.append(_close_ring(np.asarray(h, dtype=np.float64).reshape(-1, 2)))
    return Geometry(POLYGON, rings)


def box(minx: float, miny: float, maxx: float, maxy: float) -> Geometry:
    return polygon(
        [[minx, miny], [minx, maxy], [maxx, maxy], [maxx, miny], [minx, miny]]
    )


def multipoint(coords) -> Geometry:
    return Geometry(MULTIPOINT, np.asarray(coords, dtype=np.float64).reshape(-1, 2))


def multipolygon(polys) -> Geometry:
    """polys: iterable of Polygon Geometry or list-of-rings."""
    out = []
    for p in polys:
        if isinstance(p, Geometry):
            out.append(p.coords)
        else:
            out.append([_close_ring(np.asarray(r, dtype=np.float64)) for r in p])
    return Geometry(MULTIPOLYGON, out)


def multilinestring(lines) -> Geometry:
    out = []
    for l in lines:
        if isinstance(l, Geometry):
            out.append(l.coords)
        else:
            out.append(np.asarray(l, dtype=np.float64).reshape(-1, 2))
    return Geometry(MULTILINESTRING, out)


def collection(geoms) -> Geometry:
    return Geometry(GEOMETRYCOLLECTION, list(geoms))


def empty(gtype: int = GEOMETRYCOLLECTION) -> Geometry:
    if gtype == POINT:
        return Geometry(POINT, np.array([np.nan, np.nan]))
    if gtype in (LINESTRING, MULTIPOINT):
        return Geometry(gtype, np.empty((0, 2)))
    return Geometry(gtype, [])


def _close_ring(ring: np.ndarray) -> np.ndarray:
    if len(ring) and not np.array_equal(ring[0], ring[-1]):
        ring = np.vstack([ring, ring[:1]])
    return ring
