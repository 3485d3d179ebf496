"""GeoJSON encode/decode for the kernel (st_geomFromGeoJSON / st_asGeoJSON,
reference GeometricConstructorFunctions.scala:26-51 /
GeometricOutputFunctions.scala:28-32)."""

from __future__ import annotations

import json

import numpy as np

from .core import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
)

_GJ_NAMES = {
    POINT: "Point",
    LINESTRING: "LineString",
    POLYGON: "Polygon",
    MULTIPOINT: "MultiPoint",
    MULTILINESTRING: "MultiLineString",
    MULTIPOLYGON: "MultiPolygon",
    GEOMETRYCOLLECTION: "GeometryCollection",
}
_GJ_TYPES = {v: k for k, v in _GJ_NAMES.items()}


def _coords(g: Geometry):
    t = g.gtype
    if t == POINT:
        return [float(g.coords[0]), float(g.coords[1])]
    if t in (LINESTRING, MULTIPOINT):
        return [[float(x), float(y)] for x, y in np.asarray(g.coords)[:, :2]]
    if t in (POLYGON, MULTILINESTRING):
        return [[[float(x), float(y)] for x, y in np.asarray(r)[:, :2]] for r in g.coords]
    if t == MULTIPOLYGON:
        return [
            [[[float(x), float(y)] for x, y in np.asarray(r)[:, :2]] for r in p]
            for p in g.coords
        ]
    raise ValueError("collection uses geometries key")


def to_geojson(g: Geometry) -> str:
    if g.gtype == GEOMETRYCOLLECTION:
        return json.dumps(
            {
                "type": "GeometryCollection",
                "geometries": [json.loads(to_geojson(s)) for s in g.coords],
            },
            separators=(",", ":"),
        )
    return json.dumps(
        {"type": _GJ_NAMES[g.gtype], "coordinates": _coords(g)},
        separators=(",", ":"),
    )


def from_geojson(s: str) -> Geometry:
    obj = json.loads(s) if isinstance(s, str) else s
    if obj.get("type") == "Feature":
        obj = obj["geometry"]
    t = _GJ_TYPES[obj["type"]]
    if t == GEOMETRYCOLLECTION:
        return Geometry(t, [from_geojson(json.dumps(x)) for x in obj["geometries"]])
    c = obj["coordinates"]
    if t == POINT:
        return Geometry(t, np.array(c[:2], dtype=np.float64))
    if t in (LINESTRING, MULTIPOINT):
        return Geometry(t, np.array([p[:2] for p in c], dtype=np.float64))
    if t in (POLYGON, MULTILINESTRING):
        return Geometry(t, [np.array([p[:2] for p in r], dtype=np.float64) for r in c])
    if t == MULTIPOLYGON:
        return Geometry(
            t,
            [[np.array([p[:2] for p in r], dtype=np.float64) for r in poly] for poly in c],
        )
    raise ValueError(f"bad geojson type {obj['type']}")
