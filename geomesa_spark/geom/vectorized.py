"""Batch-level geometry ops for Arrow pandas UDFs.

The hot paths (point columns vs a literal polygon, haversine distance) are
single numpy passes over the whole Arrow batch — the "Shapely-batched pandas
UDF with ray-casting" execution model from BASELINE.json, minus shapely.
Slow paths fall back to per-row kernel calls but stay inside the batch.
"""

from __future__ import annotations

import numpy as np

from . import algorithms as alg
from . import wkb as wkb_mod
from .core import POINT, Geometry
from .wkb import from_wkb, points_from_wkb


def decode_many(wkbs) -> list:
    """Decode a sequence of WKB buffers to Geometry objects (None for null)."""
    out = []
    for b in wkbs:
        out.append(None if b is None else from_wkb(b))
    return out


def bounds_many(wkbs) -> np.ndarray:
    """(n,4) minx,miny,maxx,maxy; NaN rows for nulls. Fast path for points."""
    n = len(wkbs)
    pts = points_from_wkb(wkbs)
    mask = ~np.isnan(pts[:, 0])
    out = np.full((n, 4), np.nan)
    out[mask, 0] = pts[mask, 0]
    out[mask, 1] = pts[mask, 1]
    out[mask, 2] = pts[mask, 0]
    out[mask, 3] = pts[mask, 1]
    # non-point rows
    for i in np.nonzero(~mask)[0]:
        b = wkbs[i]
        if b is None:
            continue
        g = from_wkb(b)
        out[i] = g.bounds()
    return out


def ray_cast_ring(px: np.ndarray, py: np.ndarray, ring: np.ndarray):
    """Vectorized crossing-number test of n points against ONE ring.

    Returns (inside: bool[n], on_boundary: bool[n])."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    ring = np.asarray(ring, dtype=np.float64)
    ax, ay = ring[:-1, 0], ring[:-1, 1]
    bx, by = ring[1:, 0], ring[1:, 1]
    inside = np.zeros(len(px), dtype=bool)
    on_edge = np.zeros(len(px), dtype=bool)
    # edge-at-a-time over the ring (rings are short; points are the long axis)
    for i in range(len(ax)):
        a_x, a_y, b_x, b_y = ax[i], ay[i], bx[i], by[i]
        dy = b_y - a_y
        cond = (a_y > py) != (b_y > py)
        if dy != 0:
            xint = a_x + (py - a_y) * (b_x - a_x) / dy
            inside ^= cond & (px < xint)
        # boundary check
        cross = (b_x - a_x) * (py - a_y) - (b_y - a_y) * (px - a_x)
        scale = max(1.0, abs(a_x), abs(a_y), abs(b_x), abs(b_y))
        col = np.abs(cross) <= 1e-12 * scale
        within_box = (
            (px >= min(a_x, b_x) - 1e-12)
            & (px <= max(a_x, b_x) + 1e-12)
            & (py >= min(a_y, b_y) - 1e-12)
            & (py <= max(a_y, b_y) + 1e-12)
        )
        on_edge |= col & within_box
    return inside, on_edge


def points_in_polygon(px: np.ndarray, py: np.ndarray, poly: Geometry, boundary_ok: bool):
    """Vectorized point-in-polygon (with holes, multipolygon) for n points vs
    ONE literal polygon — the join-refine hot path."""
    px = np.asarray(px, dtype=np.float64)
    py = np.asarray(py, dtype=np.float64)
    result = np.zeros(len(px), dtype=bool)
    any_boundary = np.zeros(len(px), dtype=bool)
    for rings in alg._polygons_of(poly):
        inside, on_b = ray_cast_ring(px, py, np.asarray(rings[0]))
        acc = inside.copy()
        bnd = on_b.copy()
        for hole in rings[1:]:
            hin, hon = ray_cast_ring(px, py, np.asarray(hole))
            bnd |= hon & acc
            acc &= ~(hin & ~hon)
        result |= acc & ~bnd if not boundary_ok else (acc | bnd)
        any_boundary |= bnd
    if boundary_ok:
        return result | any_boundary
    return result & ~any_boundary


def predicate_many(wkbs_a, wkbs_b, pred_name: str) -> np.ndarray:
    """Row-wise DE-9IM predicate over two WKB sequences; object array with
    None for null inputs (reference nullableUDF semantics)."""
    fn = getattr(alg, pred_name)
    n = len(wkbs_a)
    out = np.empty(n, dtype=object)
    # fast path: both sides points + predicate is intersects/equals/disjoint
    cache: dict[bytes, Geometry] = {}

    def geo(b):
        g = cache.get(b)
        if g is None:
            g = from_wkb(b)
            if len(cache) < 4096:
                cache[b] = g
        return g

    for i in range(n):
        a, b = wkbs_a[i], wkbs_b[i]
        if a is None or b is None:
            out[i] = None
        else:
            out[i] = bool(fn(geo(bytes(a)), geo(bytes(b))))
    return out


def haversine_m(lon1, lat1, lon2, lat2) -> np.ndarray:
    return alg.haversine(lon1, lat1, lon2, lat2)


def points_xy(wkbs) -> tuple[np.ndarray, np.ndarray]:
    pts = points_from_wkb(wkbs)
    return pts[:, 0], pts[:, 1]


def encode_points(xs, ys) -> list[bytes]:
    return wkb_mod.points_to_wkb(np.asarray(xs, dtype=np.float64), np.asarray(ys, dtype=np.float64))
