"""Pure numpy/python geometry kernel (no shapely in this environment).

Convention (matches the reference's geomesa_pyspark/types.py WKB UDTs):
geometry columns in Spark are BinaryType WKB; this package decodes batches
inside Arrow pandas UDFs.
"""

from . import algorithms, vectorized, wkb, wkt
from .core import (
    GEOMETRYCOLLECTION,
    LINESTRING,
    MULTILINESTRING,
    MULTIPOINT,
    MULTIPOLYGON,
    POINT,
    POLYGON,
    Geometry,
    box,
    collection,
    empty,
    linestring,
    multilinestring,
    multipoint,
    multipolygon,
    point,
    polygon,
)
from .wkb import from_wkb, to_wkb
from .wkt import from_wkt, to_wkt

__all__ = [
    "Geometry",
    "POINT",
    "LINESTRING",
    "POLYGON",
    "MULTIPOINT",
    "MULTILINESTRING",
    "MULTIPOLYGON",
    "GEOMETRYCOLLECTION",
    "point",
    "linestring",
    "polygon",
    "box",
    "multipoint",
    "multilinestring",
    "multipolygon",
    "collection",
    "empty",
    "from_wkt",
    "to_wkt",
    "from_wkb",
    "to_wkb",
    "algorithms",
    "vectorized",
    "wkb",
    "wkt",
]
