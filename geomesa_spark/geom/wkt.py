"""WKT reader/writer for the geometry kernel.

Output formatting matches JTS WKTWriter defaults (the reference's st_asText,
GeometricOutputFunctions.scala:28-32): uppercase tags, `POINT (5 5)` spacing,
integral coordinates printed without a decimal point.
"""

from __future__ import annotations

import re

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
    empty,
)

_TAG_RE = re.compile(r"\s*([A-Za-z]+)\s*(Z|M|ZM)?\s*", re.IGNORECASE)
_NUM_RE = re.compile(r"[-+]?[0-9]*\.?[0-9]+(?:[eE][-+]?[0-9]+)?")

_TAGS = {
    "POINT": POINT,
    "LINESTRING": LINESTRING,
    "POLYGON": POLYGON,
    "MULTIPOINT": MULTIPOINT,
    "MULTILINESTRING": MULTILINESTRING,
    "MULTIPOLYGON": MULTIPOLYGON,
    "GEOMETRYCOLLECTION": GEOMETRYCOLLECTION,
}


class _Parser:
    def __init__(self, s: str):
        self.s = s
        self.i = 0

    def skip_ws(self):
        while self.i < len(self.s) and self.s[self.i].isspace():
            self.i += 1

    def peek(self) -> str:
        self.skip_ws()
        return self.s[self.i] if self.i < len(self.s) else ""

    def expect(self, ch: str):
        self.skip_ws()
        if self.i >= len(self.s) or self.s[self.i] != ch:
            raise ValueError(f"WKT parse error at {self.i}: expected {ch!r} in {self.s[:80]!r}")
        self.i += 1

    def word(self) -> str:
        self.skip_ws()
        m = re.match(r"[A-Za-z]+", self.s[self.i :])
        if not m:
            raise ValueError(f"WKT parse error at {self.i}: expected tag")
        self.i += m.end()
        return m.group(0).upper()

    def number(self) -> float:
        self.skip_ws()
        m = _NUM_RE.match(self.s, self.i)
        if not m:
            raise ValueError(f"WKT parse error at {self.i}: expected number")
        self.i = m.end()
        return float(m.group(0))

    def is_empty_tag(self) -> bool:
        self.skip_ws()
        if self.s[self.i : self.i + 5].upper() == "EMPTY":
            self.i += 5
            return True
        return False

    def coord(self, dims: int) -> list[float]:
        c = [self.number(), self.number()]
        # swallow Z/M extras
        while True:
            self.skip_ws()
            m = _NUM_RE.match(self.s, self.i)
            if m:
                self.i = m.end()
                c.append(float(m.group(0)))
            else:
                break
        return c[:2]

    def coord_seq(self) -> np.ndarray:
        self.expect("(")
        pts = [self.coord(2)]
        while self.peek() == ",":
            self.expect(",")
            pts.append(self.coord(2))
        self.expect(")")
        return np.array(pts, dtype=np.float64)

    def rings(self) -> list[np.ndarray]:
        self.expect("(")
        out = [self.coord_seq()]
        while self.peek() == ",":
            self.expect(",")
            out.append(self.coord_seq())
        self.expect(")")
        return out

    def geometry(self) -> Geometry:
        tag = self.word()
        # optional Z/M/ZM designator
        save = self.i
        self.skip_ws()
        m = re.match(r"(ZM|Z|M)\b", self.s[self.i :], re.IGNORECASE)
        if m:
            self.i += m.end()
        gtype = _TAGS.get(tag)
        if gtype is None:
            raise ValueError(f"unknown WKT tag {tag!r}")
        if self.is_empty_tag():
            return empty(gtype)
        if gtype == POINT:
            self.expect("(")
            c = self.coord(2)
            self.expect(")")
            return Geometry(POINT, np.array(c[:2], dtype=np.float64))
        if gtype == LINESTRING:
            return Geometry(LINESTRING, self.coord_seq())
        if gtype == POLYGON:
            return Geometry(POLYGON, self.rings())
        if gtype == MULTIPOINT:
            # both MULTIPOINT((1 2),(3 4)) and MULTIPOINT(1 2, 3 4)
            self.expect("(")
            pts = []
            while True:
                if self.peek() == "(":
                    self.expect("(")
                    pts.append(self.coord(2))
                    self.expect(")")
                else:
                    pts.append(self.coord(2))
                if self.peek() == ",":
                    self.expect(",")
                else:
                    break
            self.expect(")")
            return Geometry(MULTIPOINT, np.array(pts, dtype=np.float64))
        if gtype == MULTILINESTRING:
            return Geometry(MULTILINESTRING, self.rings())
        if gtype == MULTIPOLYGON:
            self.expect("(")
            polys = [self.rings()]
            while self.peek() == ",":
                self.expect(",")
                polys.append(self.rings())
            self.expect(")")
            return Geometry(MULTIPOLYGON, polys)
        # collection
        self.expect("(")
        geoms = [self.geometry()]
        while self.peek() == ",":
            self.expect(",")
            geoms.append(self.geometry())
        self.expect(")")
        return Geometry(GEOMETRYCOLLECTION, geoms)


def from_wkt(s: str) -> Geometry:
    if s is None:
        raise ValueError("null WKT")
    p = _Parser(s)
    g = p.geometry()
    return g


# --------------------------------------------------------------------- writer


def _fmt(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(float(v))


def _fmt_coord(c) -> str:
    return f"{_fmt(c[0])} {_fmt(c[1])}"


def _fmt_seq(arr) -> str:
    return "(" + ", ".join(_fmt_coord(c) for c in arr) + ")"


def _fmt_rings(rings) -> str:
    return "(" + ", ".join(_fmt_seq(r) for r in rings) + ")"


def to_wkt(g: Geometry) -> str:
    t = g.gtype
    name = g.type_name.upper()
    if g.is_empty():
        return f"{name} EMPTY"
    if t == POINT:
        return f"POINT ({_fmt_coord(g.coords)})"
    if t == LINESTRING:
        return f"LINESTRING {_fmt_seq(g.coords)}"
    if t == POLYGON:
        return f"POLYGON {_fmt_rings(g.coords)}"
    if t == MULTIPOINT:
        return "MULTIPOINT (" + ", ".join(f"({_fmt_coord(c)})" for c in g.coords) + ")"
    if t == MULTILINESTRING:
        return f"MULTILINESTRING {_fmt_rings(g.coords)}"
    if t == MULTIPOLYGON:
        return "MULTIPOLYGON (" + ", ".join(_fmt_rings(p) for p in g.coords) + ")"
    return "GEOMETRYCOLLECTION (" + ", ".join(to_wkt(x) for x in g.coords) + ")"
