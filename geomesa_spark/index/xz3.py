"""XZ3 spatio-temporal extent indexing — the TRUE 3-D XZ ordering (Böhm,
Klump, Kriegel, "XZ-Ordering: A Space-Filling Curve for Objects with Spatial
Extension", SSD 1999, generalized to three dimensions), matching the
reference's extents+time index (geomesa-z3/.../curve/XZ3SFC.scala:53-330)
in SEMANTICS, written from the published algorithm:

- space-time element = (x-envelope, y-envelope, t-interval within one time
  bin); time is binned by week like the reference Z3/XZ3 keys, with the XZ3
  code computed on the normalized within-bin interval;
- an element is stored at resolution level l = the deepest octree level at
  which the (2x-enlarged in all three dims) cell of its lower corner still
  covers it; its code is the preorder-DFS number of that octree cell
  (subtree size (8^(g-l+1)-1)/7);
- query planning is a BFS over the octree emitting full-subtree ranges for
  windows containing the enlarged cell and singleton ranges + recursion for
  partial overlaps — identical structure to XZ2SFC.ranges, one more split
  axis.

g=18 keeps max code (8^19-1)/7 < 2^63 with margin (the reference uses a
larger g with the same long-range math; 18 octree levels already give
~1.5 m x 0.75 m x 23 s leaf cells, far below envelope noise at world scale).

A composed (week_bin, xz2) key CANNOT replace this: it loses containment
pruning on the time axis for long-duration extents (a 3-day extent stored in
one week bin matches every temporal window in that week) — the reason the
round-1 composition over-scanned.
"""

from __future__ import annotations

import math

from .ranges import IndexRange, merge_ranges
from .zorder import SECONDS_PER

DEFAULT_G = 18


class XZ3SFC:
    def __init__(
        self,
        g: int = DEFAULT_G,
        bounds=(-180.0, -90.0, 0.0, 180.0, 90.0, SECONDS_PER["week"]),
    ):
        self.g = g
        self.xmin, self.ymin, self.tmin, self.xmax, self.ymax, self.tmax = bounds
        self.xsize = self.xmax - self.xmin
        self.ysize = self.ymax - self.ymin
        self.tsize = self.tmax - self.tmin

    # ------------------------------------------------------------------ write

    def _normalize(self, minx, miny, mint, maxx, maxy, maxt):
        def nz(v, lo, sz):
            return min(max((v - lo) / sz, 0.0), 1.0)

        return (
            nz(minx, self.xmin, self.xsize),
            nz(miny, self.ymin, self.ysize),
            nz(mint, self.tmin, self.tsize),
            nz(maxx, self.xmin, self.xsize),
            nz(maxy, self.ymin, self.ysize),
            nz(maxt, self.tmin, self.tsize),
        )

    def index(self, minx, miny, mint, maxx, maxy, maxt) -> int:
        """Sequence code for a (envelope, within-bin interval) element."""
        nx0, ny0, nt0, nx1, ny1, nt1 = self._normalize(minx, miny, mint, maxx, maxy, maxt)
        max_dim = max(nx1 - nx0, ny1 - ny0, nt1 - nt0)
        if max_dim <= 0:
            l1 = self.g
        else:
            l1 = min(self.g, int(math.floor(math.log(max_dim) / math.log(0.5))))
        length = l1
        if l1 < self.g:
            w2 = 0.5 ** (l1 + 1)
            if (
                self._fits(nx0, nx1, w2)
                and self._fits(ny0, ny1, w2)
                and self._fits(nt0, nt1, w2)
            ):
                length = l1 + 1
        return self._sequence_code(nx0, ny0, nt0, length)

    @staticmethod
    def _fits(vmin: float, vmax: float, w2: float) -> bool:
        corner = math.floor(vmin / w2) * w2
        return vmax <= corner + 2 * w2

    def _sequence_code(self, x: float, y: float, t: float, length: int) -> int:
        cs = 0
        xmin, ymin, tmin = 0.0, 0.0, 0.0
        xmax, ymax, tmax = 1.0, 1.0, 1.0
        for i in range(length):
            subtree = (8 ** (self.g - i) - 1) // 7
            xc, yc, tc = (xmin + xmax) / 2, (ymin + ymax) / 2, (tmin + tmax) / 2
            q = (1 if x >= xc else 0) | (2 if y >= yc else 0) | (4 if t >= tc else 0)
            cs += 1 + q * subtree
            if x >= xc:
                xmin = xc
            else:
                xmax = xc
            if y >= yc:
                ymin = yc
            else:
                ymax = yc
            if t >= tc:
                tmin = tc
            else:
                tmax = tc
        return cs

    # ------------------------------------------------------------------ query

    def ranges(self, windows, max_ranges: int = 2000) -> list[IndexRange]:
        """Ranges whose stored elements MAY intersect any (x0,y0,t0,x1,y1,t1)
        window; over-selects, never misses (loose full-subtree emission for
        budget/depth exhaustion AND for any abandoned frontier)."""
        norm = [self._normalize(*w) for w in windows]
        out: list[IndexRange] = []
        # node = (x0, y0, t0, level, code) in normalized space
        frontier = [(0.0, 0.0, 0.0, 0, 0)]
        while frontier and len(out) < max_ranges * 4:
            nxt = []
            for x0, y0, t0, level, code in frontier:
                w = 0.5**level
                ex1, ey1, et1 = x0 + 2 * w, y0 + 2 * w, t0 + 2 * w
                inter = False
                contained = False
                for qx0, qy0, qt0, qx1, qy1, qt1 in norm:
                    if (
                        qx0 <= ex1 and qx1 >= x0
                        and qy0 <= ey1 and qy1 >= y0
                        and qt0 <= et1 and qt1 >= t0
                    ):
                        inter = True
                        if (
                            qx0 <= x0 and qx1 >= ex1
                            and qy0 <= y0 and qy1 >= ey1
                            and qt0 <= t0 and qt1 >= et1
                        ):
                            contained = True
                            break
                if not inter:
                    continue
                size = (8 ** (self.g - level + 1) - 1) // 7
                if contained:
                    out.append(IndexRange(code, code + size, True))
                    continue
                if level >= self.g or len(out) >= max_ranges:
                    out.append(IndexRange(code, code + size, False))
                    continue
                out.append(IndexRange(code, code, False))
                subtree = (8 ** (self.g - level) - 1) // 7
                half = w / 2
                for q in range(8):
                    dx = half if q & 1 else 0.0
                    dy = half if q & 2 else 0.0
                    dt = half if q & 4 else 0.0
                    nxt.append(
                        (x0 + dx, y0 + dy, t0 + dt, level + 1, code + 1 + q * subtree)
                    )
            frontier = nxt
        # cover any abandoned frontier loosely (see XZ2SFC.ranges)
        for x0, y0, t0, level, code in frontier:
            size = (8 ** (self.g - level + 1) - 1) // 7
            out.append(IndexRange(code, code + size, False))
        return merge_ranges(out)


def xz3_index_many(minx, miny, maxx, maxy, tsec, g: int = DEFAULT_G):
    """Vectorized (week_bin, xz3) codes for arrays of envelopes at instant
    timestamps (the docs index-job hot path: spans carry one instant, so the
    within-bin interval is degenerate [t, t]); one numpy pass per batch.
    Exactly equivalent to XZ3SFC.index per element."""
    import numpy as np

    per = SECONDS_PER["week"]
    ts = np.asarray(tsec, dtype=np.float64)
    week_bin = np.floor_divide(ts, per).astype(np.int64)
    tin = ts - week_bin * per

    xmin, ymin, xmax, ymax = -180.0, -90.0, 180.0, 90.0
    nx0 = np.clip((np.asarray(minx, dtype=np.float64) - xmin) / (xmax - xmin), 0.0, 1.0)
    ny0 = np.clip((np.asarray(miny, dtype=np.float64) - ymin) / (ymax - ymin), 0.0, 1.0)
    nx1 = np.clip((np.asarray(maxx, dtype=np.float64) - xmin) / (xmax - xmin), 0.0, 1.0)
    ny1 = np.clip((np.asarray(maxy, dtype=np.float64) - ymin) / (ymax - ymin), 0.0, 1.0)
    nt = np.clip(tin / per, 0.0, 1.0)

    max_dim = np.maximum(nx1 - nx0, ny1 - ny0)  # time interval is degenerate
    with np.errstate(divide="ignore"):
        l1 = np.where(
            max_dim <= 0,
            g,
            np.minimum(g, np.floor(np.log(np.maximum(max_dim, 1e-300)) / np.log(0.5))),
        ).astype(np.int64)
    l1 = np.clip(l1, 0, g)
    w2 = 0.5 ** (l1 + 1.0)
    fits = (
        (nx1 <= np.floor(nx0 / w2) * w2 + 2 * w2)
        & (ny1 <= np.floor(ny0 / w2) * w2 + 2 * w2)
        & (nt <= np.floor(nt / w2) * w2 + 2 * w2)
    )
    length = np.where((l1 < g) & fits, l1 + 1, l1)

    n = len(nx0)
    cs = np.zeros(n, dtype=np.int64)
    cx0 = np.zeros(n); cy0 = np.zeros(n); ct0 = np.zeros(n)
    cx1 = np.ones(n); cy1 = np.ones(n); ct1 = np.ones(n)
    for i in range(g):
        active = i < length
        subtree = (8 ** (g - i) - 1) // 7
        xc, yc, tc = (cx0 + cx1) / 2, (cy0 + cy1) / 2, (ct0 + ct1) / 2
        qx = nx0 >= xc
        qy = ny0 >= yc
        qt = nt >= tc
        q = qx.astype(np.int64) + 2 * qy.astype(np.int64) + 4 * qt.astype(np.int64)
        cs += np.where(active, 1 + q * subtree, 0)
        cx0 = np.where(qx, xc, cx0); cx1 = np.where(qx, cx1, xc)
        cy0 = np.where(qy, yc, cy0); cy1 = np.where(qy, cy1, yc)
        ct0 = np.where(qt, tc, ct0); ct1 = np.where(qt, ct1, tc)
    return week_bin, cs
