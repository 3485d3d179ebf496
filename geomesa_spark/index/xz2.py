"""XZ2 extent indexing (Böhm/Klump/Kriegel "XZ-Ordering: A Space-Filling
Curve for Objects with Spatial Extension", SSD 1999).

One cell per geometry — no duplication — matching the reference's extents
index (geomesa-z3/.../curve/XZ2SFC.scala:24-351, default g=12). Written from
the published algorithm, not translated from the Scala:

- an extent is stored at resolution level l = the deepest quadtree level at
  which the (enlarged, 2x) cell of its lower-left corner still covers it;
- its code is the preorder-DFS number of that quadtree cell;
- a query window matches a stored element if it intersects the element's
  enlarged cell, so query planning is a BFS emitting
  - full subtree ranges when the window contains the enlarged cell
    (Lemma 3: [cs, cs + (4^(g-l+1)-1)/3]), and
  - singleton ranges [cs, cs] for partial overlaps, recursing down.
"""

from __future__ import annotations

import math

from .ranges import IndexRange, merge_ranges

DEFAULT_G = 12  # XZ2SFC.scala:363-370 default resolution


class XZ2SFC:
    def __init__(self, g: int = DEFAULT_G, bounds=(-180.0, -90.0, 180.0, 90.0)):
        self.g = g
        self.xmin, self.ymin, self.xmax, self.ymax = bounds
        self.xsize = self.xmax - self.xmin
        self.ysize = self.ymax - self.ymin

    # ------------------------------------------------------------------ write

    def _normalize(self, minx, miny, maxx, maxy):
        nxmin = min(max((minx - self.xmin) / self.xsize, 0.0), 1.0)
        nymin = min(max((miny - self.ymin) / self.ysize, 0.0), 1.0)
        nxmax = min(max((maxx - self.xmin) / self.xsize, 0.0), 1.0)
        nymax = min(max((maxy - self.ymin) / self.ysize, 0.0), 1.0)
        return nxmin, nymin, nxmax, nymax

    def index(self, minx: float, miny: float, maxx: float, maxy: float) -> int:
        """Sequence code for a geometry envelope."""
        nxmin, nymin, nxmax, nymax = self._normalize(minx, miny, maxx, maxy)
        max_dim = max(nxmax - nxmin, nymax - nymin)
        if max_dim <= 0:
            l1 = self.g
        else:
            l1 = min(self.g, int(math.floor(math.log(max_dim) / math.log(0.5))))
        # check whether the element still fits the 2x-enlarged cell one level
        # deeper (XZ2SFC.scala:60-74 semantics)
        length = l1
        if l1 < self.g:
            w2 = 0.5 ** (l1 + 1)
            if self._fits(nxmin, nxmax, w2) and self._fits(nymin, nymax, w2):
                length = l1 + 1
        return self._sequence_code(nxmin, nymin, length)

    @staticmethod
    def _fits(vmin: float, vmax: float, w2: float) -> bool:
        corner = math.floor(vmin / w2) * w2
        return vmax <= corner + 2 * w2

    def _sequence_code(self, x: float, y: float, length: int) -> int:
        cs = 0
        xmin, ymin, xmax, ymax = 0.0, 0.0, 1.0, 1.0
        for i in range(length):
            subtree = (4 ** (self.g - i) - 1) // 3
            xc = (xmin + xmax) / 2
            yc = (ymin + ymax) / 2
            q = (1 if x >= xc else 0) | ((2 if y >= yc else 0))
            cs += 1 + q * subtree
            if x >= xc:
                xmin = xc
            else:
                xmax = xc
            if y >= yc:
                ymin = yc
            else:
                ymax = yc
        return cs

    # ------------------------------------------------------------------ query

    def ranges(
        self,
        windows: list[tuple[float, float, float, float]],
        max_ranges: int = 2000,
    ) -> list[IndexRange]:
        """Sequence-code ranges whose elements MAY intersect any window."""
        norm = [self._normalize(*w) for w in windows]
        out: list[IndexRange] = []
        # BFS: node = (x0, y0, level, code) in normalized space
        frontier: list[tuple[float, float, int, int]] = [(0.0, 0.0, 0, 0)]
        while frontier and len(out) < max_ranges * 4:
            nxt: list[tuple[float, float, int, int]] = []
            for x0, y0, level, code in frontier:
                w = 0.5**level
                # enlarged cell: doubles width/height
                ex1, ey1 = x0 + 2 * w, y0 + 2 * w
                inter = False
                contained = False
                for qxmin, qymin, qxmax, qymax in norm:
                    if qxmin <= ex1 and qxmax >= x0 and qymin <= ey1 and qymax >= y0:
                        inter = True
                        if (
                            qxmin <= x0
                            and qxmax >= ex1
                            and qymin <= y0
                            and qymax >= ey1
                        ):
                            contained = True
                            break
                if not inter:
                    continue
                size = (4 ** (self.g - level + 1) - 1) // 3
                if contained:
                    out.append(IndexRange(code, code + size, True))
                    continue
                if level >= self.g or len(out) >= max_ranges:
                    # budget/depth exhausted: emit the whole (loose) subtree so
                    # deeper-stored elements are never missed
                    out.append(IndexRange(code, code + size, False))
                    continue
                out.append(IndexRange(code, code, False))
                if level < self.g:
                    subtree = (4 ** (self.g - level) - 1) // 3
                    half = w / 2
                    for q, (dx, dy) in enumerate(
                        ((0.0, 0.0), (half, 0.0), (0.0, half), (half, half))
                    ):
                        nxt.append(
                            (x0 + dx, y0 + dy, level + 1, code + 1 + q * subtree)
                        )
            frontier = nxt
        # budget exhausted with a live frontier: those nodes' parents emitted
        # only singleton ranges, so cover every remaining subtree loosely —
        # over-scan, never a false negative
        for x0, y0, level, code in frontier:
            size = (4 ** (self.g - level + 1) - 1) // 3
            out.append(IndexRange(code, code + size, False))
        return merge_ranges(out)


def xz2_index_many(
    minx, miny, maxx, maxy, g: int = DEFAULT_G, bounds=(-180.0, -90.0, 180.0, 90.0)
):
    """Vectorized sequence codes for arrays of envelopes — one numpy pass
    over the whole Arrow batch (the index-job hot path for extents).
    Exactly equivalent to XZ2SFC.index per element."""
    import numpy as np

    xmin, ymin, xmax, ymax = bounds
    xsz, ysz = xmax - xmin, ymax - ymin
    nxmin = np.clip((np.asarray(minx, dtype=np.float64) - xmin) / xsz, 0.0, 1.0)
    nymin = np.clip((np.asarray(miny, dtype=np.float64) - ymin) / ysz, 0.0, 1.0)
    nxmax = np.clip((np.asarray(maxx, dtype=np.float64) - xmin) / xsz, 0.0, 1.0)
    nymax = np.clip((np.asarray(maxy, dtype=np.float64) - ymin) / ysz, 0.0, 1.0)
    max_dim = np.maximum(nxmax - nxmin, nymax - nymin)
    with np.errstate(divide="ignore"):
        l1 = np.where(
            max_dim <= 0,
            g,
            np.minimum(g, np.floor(np.log(np.maximum(max_dim, 1e-300)) / np.log(0.5))),
        ).astype(np.int64)
    l1 = np.clip(l1, 0, g)
    w2 = 0.5 ** (l1 + 1.0)
    fits = (nxmax <= np.floor(nxmin / w2) * w2 + 2 * w2) & (
        nymax <= np.floor(nymin / w2) * w2 + 2 * w2
    )
    length = np.where((l1 < g) & fits, l1 + 1, l1)

    cs = np.zeros(len(nxmin), dtype=np.int64)
    cxmin = np.zeros(len(nxmin))
    cymin = np.zeros(len(nxmin))
    cxmax = np.ones(len(nxmin))
    cymax = np.ones(len(nxmin))
    for i in range(g):
        active = i < length
        subtree = (4 ** (g - i) - 1) // 3
        xc = (cxmin + cxmax) / 2
        yc = (cymin + cymax) / 2
        qx = nxmin >= xc
        qy = nymin >= yc
        q = qx.astype(np.int64) + 2 * qy.astype(np.int64)
        cs += np.where(active, 1 + q * subtree, 0)
        cxmin = np.where(qx, xc, cxmin)
        cxmax = np.where(qx, cxmax, xc)
        cymin = np.where(qy, yc, cymin)
        cymax = np.where(qy, cymax, yc)
    return cs
