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


def _areal_edges(g: Geometry) -> np.ndarray:
    """All boundary edges (shell + holes, every polygon) as an (n, 4) array
    of (ax, ay, bx, by)."""
    parts = []
    for rings in alg._polygons_of(g):
        for r in rings:
            r = np.asarray(r, dtype=np.float64)
            parts.append(
                np.column_stack([r[:-1, 0], r[:-1, 1], r[1:, 0], r[1:, 1]])
            )
    return np.concatenate(parts) if parts else np.empty((0, 4))


def _areal_vertices(g: Geometry) -> np.ndarray:
    """All ring vertices (without the closing duplicate) as (n, 2)."""
    parts = []
    for rings in alg._polygons_of(g):
        for r in rings:
            r = np.asarray(r, dtype=np.float64)
            parts.append(r[:-1, :2])
    return np.concatenate(parts) if parts else np.empty((0, 2))


def areal_intersects_batch(lefts: list[Geometry], right: Geometry) -> np.ndarray:
    """Vectorized closed-set intersects(A_i, right) for a batch of AREAL
    geometries against ONE areal geometry — the extent x extent join-refine
    path (one batch per distinct right geometry, mirroring the point path).

    Exact decision procedure for two closed polygonal regions:
      A intersects B  <=>  (some vertex of A in closed B)
                        or (some vertex of B in closed A)
                        or (some edge of A properly crosses some edge of B).
    Touching/collinear-overlap cases always place a vertex of one geometry on
    the other's boundary, which the boundary-inclusive ray cast detects, so
    the edge test only needs PROPER crossings (strict sign changes). Each
    step is numpy over the whole undecided set; no per-coordinate Python."""
    n = len(lefts)
    out = np.zeros(n, dtype=bool)
    if n == 0:
        return out
    # 1. any A vertex in closed B — ONE ray cast over all batch vertices
    verts = [_areal_vertices(g) for g in lefts]
    counts = np.array([len(v) for v in verts])
    allv = np.concatenate([v for v in verts if len(v)]) if counts.sum() else None
    if allv is not None:
        hit = points_in_polygon(allv[:, 0], allv[:, 1], right, boundary_ok=True)
        offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
        # segment-OR back to per-geometry verdicts (slices are numpy-cheap)
        out |= np.array(
            [c > 0 and bool(hit[o : o + c].any()) for o, c in zip(offs, counts)]
        )
    # 2. any B vertex in closed A_i (catches A-contains-B) — one vectorized
    #    ray cast of B's vertices per undecided A
    bv = _areal_vertices(right)
    undecided = np.nonzero(~out)[0]
    for i in undecided:
        if len(bv) and points_in_polygon(bv[:, 0], bv[:, 1], lefts[i], True).any():
            out[i] = True
    # 3. proper edge crossings (cross-overlaps with all vertices mutually
    #    outside) — broadcast orientation tests, chunked to bound memory
    undecided = np.nonzero(~out)[0]
    if len(undecided):
        out[undecided] |= _proper_crossings([lefts[i] for i in undecided], right)
    return out


def _proper_crossings(lefts: list[Geometry], right: Geometry) -> np.ndarray:
    """bool per left geometry: does any edge of it PROPERLY cross (strict
    sign changes on both orientation pairs) any edge of `right`? Broadcast
    orientation tests over the concatenated edge sets, chunked to bound the
    (left_edges x right_edges) intermediate."""
    res = np.zeros(len(lefts), dtype=bool)
    be = _areal_edges(right)
    if len(be) == 0 or not lefts:
        return res
    ae_list = [_areal_edges(g) for g in lefts]
    owners = np.concatenate(
        [np.full(len(e), k) for k, e in enumerate(ae_list)]
    ) if ae_list else np.empty(0, dtype=int)
    ae = np.concatenate(ae_list) if ae_list else np.empty((0, 4))
    if len(ae) == 0:
        return res
    b1x, b1y, b2x, b2y = be[:, 0], be[:, 1], be[:, 2], be[:, 3]
    chunk = max(1, int(2_000_000 // max(1, len(be))))
    for s in range(0, len(ae), chunk):
        a = ae[s : s + chunk]
        a1x, a1y = a[:, 0:1], a[:, 1:2]
        a2x, a2y = a[:, 2:3], a[:, 3:4]
        # o(b1,b2,a) for both A endpoints; o(a1,a2,b) for both B endpoints
        d1 = (b2x - b1x) * (a1y - b1y) - (b2y - b1y) * (a1x - b1x)
        d2 = (b2x - b1x) * (a2y - b1y) - (b2y - b1y) * (a2x - b1x)
        d3 = (a2x - a1x) * (b1y - a1y) - (a2y - a1y) * (b1x - a1x)
        d4 = (a2x - a1x) * (b2y - a1y) - (a2y - a1y) * (b2x - a1x)
        cross = ((d1 > 0) != (d2 > 0)) & (d1 != 0) & (d2 != 0)
        cross &= ((d3 > 0) != (d4 > 0)) & (d3 != 0) & (d4 != 0)
        rows = cross.any(axis=1)
        if rows.any():
            np.logical_or.at(res, owners[s : s + chunk][rows], True)
    return res


def _test_points(g: Geometry) -> np.ndarray:
    """Ring vertices + edge midpoints + one interior representative point
    per polygon part, as (n, 2) — the covered-side probe set. Midpoints
    catch the common improper-crossing escapes (an edge leaving the cover
    through a vertex or a collinear run of its boundary between two covered
    vertices); the interior representatives catch boundary-coincident
    traps (e.g. the covered geometry exactly filling a HOLE of the cover:
    every boundary probe sits on the shared ring, only an interior point
    reveals the miss)."""
    e = _areal_edges(g)
    if len(e) == 0:
        return np.empty((0, 2))
    mids = np.column_stack([(e[:, 0] + e[:, 2]) / 2.0, (e[:, 1] + e[:, 3]) / 2.0])
    from .core import POLYGON

    reps = np.asarray(
        [alg.representative_point(Geometry(POLYGON, rings)) for rings in alg._polygons_of(g)],
        dtype=np.float64,
    ).reshape(-1, 2)
    return np.concatenate([_areal_vertices(g), mids, reps])


def _hole_points(g: Geometry) -> np.ndarray:
    """Hole-ring vertices + midpoints as (n, 2) — probes for 'a hole of the
    cover intrudes into the covered region'."""
    parts = []
    for rings in alg._polygons_of(g):
        for r in rings[1:]:
            r = np.asarray(r, dtype=np.float64)
            mids = (r[:-1, :2] + r[1:, :2]) / 2.0
            parts.append(np.concatenate([r[:-1, :2], mids]))
    return np.concatenate(parts) if parts else np.empty((0, 2))


def areal_covers_batch(lefts: list[Geometry], right: Geometry) -> np.ndarray:
    """Vectorized closed-set covers(A_i, right) for a batch of AREAL
    geometries against ONE areal geometry (and — because a covered areal
    geometry has interior points, all necessarily interior to the cover —
    also contains(A_i, right) for non-degenerate polygons).

    A covers B  <=>  every probe point of B (vertices + edge midpoints) is
    in closed A, AND no edge of A properly crosses an edge of B, AND no
    hole of A intrudes into B (no hole vertex/midpoint strictly inside B).
    Exact for generic-position and the common touch cases; shares the
    documented approximation posture of the relate() kernel on adversarial
    collinear constructions (algorithms.py relate docstring)."""
    n = len(lefts)
    out = np.zeros(n, dtype=bool)
    bt = _test_points(right)
    if len(bt) == 0:
        return out
    cand = [
        i
        for i, g in enumerate(lefts)
        if alg._polygons_of(g)
        and bool(points_in_polygon(bt[:, 0], bt[:, 1], g, True).all())
    ]
    if not cand:
        return out
    crossing = _proper_crossings([lefts[i] for i in cand], right)
    for i, crossed in zip(cand, crossing):
        if crossed:
            continue
        hp = _hole_points(lefts[i])
        if len(hp) and bool(
            points_in_polygon(hp[:, 0], hp[:, 1], right, False).any()
        ):
            continue
        out[i] = True
    return out


def _interior_evidence_batch(lefts: list[Geometry], right: Geometry) -> np.ndarray:
    """bool per left: do the INTERIORS of left and right intersect?
    Evidence: any probe point (vertices + edge midpoints + per-part
    interior representatives) of one STRICTLY inside the other, or a
    proper edge crossing. Edge midpoints matter: two rects sharing a wall
    while overlapping (A=(0,0,2,1), B=(1,0,3,1)) have every vertex on the
    other's boundary — only A's x=2 edge midpoint sits strictly inside B."""
    n = len(lefts)
    out = np.zeros(n, dtype=bool)
    bt = _test_points(right)
    for i, g in enumerate(lefts):
        if not alg._polygons_of(g):
            continue
        if len(bt) and bool(points_in_polygon(bt[:, 0], bt[:, 1], g, False).any()):
            out[i] = True
            continue
        tp = _test_points(g)
        if len(tp) and bool(points_in_polygon(tp[:, 0], tp[:, 1], right, False).any()):
            out[i] = True
    undecided = np.nonzero(~out)[0]
    if len(undecided):
        out[undecided] |= _proper_crossings([lefts[i] for i in undecided], right)
    return out


def areal_overlaps_batch(lefts: list[Geometry], right: Geometry) -> np.ndarray:
    """Vectorized closed-set overlaps(A_i, right) for areal pairs:
    interiors intersect AND neither covers the other (the DE-9IM
    T*T***T** equal-dim rule re-expressed through the batch primitives)."""
    inter = _interior_evidence_batch(lefts, right)
    cov = areal_covers_batch(lefts, right)
    win = areal_within_batch(lefts, right)
    return inter & ~cov & ~win


def areal_touches_batch(lefts: list[Geometry], right: Geometry) -> np.ndarray:
    """Vectorized touches(A_i, right) for areal pairs: they intersect but
    ONLY on their boundaries (interiors disjoint)."""
    return areal_intersects_batch(lefts, right) & ~_interior_evidence_batch(
        lefts, right
    )


def areal_within_batch(lefts: list[Geometry], right: Geometry) -> np.ndarray:
    """Vectorized closed-set within(A_i, right) (= right covers A_i) for a
    batch of AREAL geometries against ONE areal geometry. Same decision
    procedure as areal_covers_batch with the roles swapped; the probe ray
    cast runs ONCE over the whole batch's concatenated probe points."""
    n = len(lefts)
    out = np.zeros(n, dtype=bool)
    if not alg._polygons_of(right):
        return out
    tp = [_test_points(g) for g in lefts]
    counts = np.array([len(t) for t in tp])
    if counts.sum() == 0:
        return out
    allv = np.concatenate([t for t in tp if len(t)])
    hit = points_in_polygon(allv[:, 0], allv[:, 1], right, boundary_ok=True)
    offs = np.concatenate([[0], np.cumsum(counts)[:-1]])
    cand = [
        i
        for i, (o, c) in enumerate(zip(offs, counts))
        if c > 0 and bool(hit[o : o + c].all())
    ]
    if not cand:
        return out
    crossing = _proper_crossings([lefts[i] for i in cand], right)
    hp = _hole_points(right)
    for i, crossed in zip(cand, crossing):
        if crossed:
            continue
        if len(hp) and bool(
            points_in_polygon(hp[:, 0], hp[:, 1], lefts[i], False).any()
        ):
            continue
        out[i] = True
    return out


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
