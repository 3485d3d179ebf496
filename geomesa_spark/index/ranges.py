"""Z-curve range decomposition: query box(es) -> minimal [zlo, zhi] ranges.

Reimplements the semantics of the reference's zranges BFS
(geomesa-z3/.../zorder/sfcurve/ZN.scala:110-242): breadth-first descent of the
quad/oct tree from the longest common prefix, emitting fully-contained
subtree ranges eagerly, bottoming out on a recursion depth (default 7,
ZN.scala:293) or a target range budget (default 2000,
QueryProperties.scala:23), then sort + merge adjacent ranges.

Driver-side pure Python: the output feeds (a) partition-prunable predicates
(`z BETWEEN lo AND hi` disjunctions / `cell IN (...)`) and (b) broadcast
candidate-cell sets. Not a translation of the Scala — a fresh BFS on the
same published algorithm."""

from __future__ import annotations

from dataclasses import dataclass

DEFAULT_MAX_RANGES = 2000  # geomesa.scan.ranges.target
DEFAULT_MAX_RECURSE = 7  # ZN.DefaultRecurse


@dataclass(frozen=True)
class IndexRange:
    lower: int
    upper: int
    contained: bool  # True: every z in range satisfies the query exactly

    def __iter__(self):
        yield self.lower
        yield self.upper


def zranges_box(
    ixmin: int,
    iymin: int,
    ixmax: int,
    iymax: int,
    bits: int,
    max_ranges: int = DEFAULT_MAX_RANGES,
    max_recurse: int = DEFAULT_MAX_RECURSE,
    itmin: int | None = None,
    itmax: int | None = None,
) -> list[IndexRange]:
    """Decompose an integer box (inclusive bounds, normalized coordinates)
    into z-ranges. 2D when itmin is None, else 3D."""
    dims = 2 if itmin is None else 3
    lo = (ixmin, iymin) + ((itmin,) if dims == 3 else ())
    hi = (ixmax, iymax) + ((itmax,) if dims == 3 else ())

    # find the longest common prefix level of the box corners
    common = 0
    for level in range(1, bits + 1):
        shift = bits - level
        if all((l >> shift) == (h >> shift) for l, h in zip(lo, hi)):
            common = level
        else:
            break

    out: list[IndexRange] = []
    # node = (cell coords per dim at `level`, level)
    root = tuple(l >> (bits - common) for l in lo) if common else tuple(0 for _ in lo)
    frontier = [(root, common)]
    max_level = min(bits, common + max_recurse)

    while frontier:
        next_frontier = []
        for cell, level in frontier:
            span = bits - level  # remaining bits per dim
            cmin = tuple(c << span for c in cell)
            cmax = tuple(((c + 1) << span) - 1 for c in cell)
            # disjoint?
            if any(cmax[d] < lo[d] or cmin[d] > hi[d] for d in range(dims)):
                continue
            zbase = _morton_prefix(cell, level, dims)
            zlo = zbase << (dims * span)
            zhi = zlo + (1 << (dims * span)) - 1
            contained = all(
                cmin[d] >= lo[d] and cmax[d] <= hi[d] for d in range(dims)
            )
            if contained or level >= max_level or len(out) >= max_ranges:
                out.append(IndexRange(zlo, zhi, contained))
            else:
                for q in range(1 << dims):
                    child = tuple(
                        (cell[d] << 1) | ((q >> d) & 1) for d in range(dims)
                    )
                    next_frontier.append((child, level + 1))
        frontier = next_frontier

    return merge_ranges(out)


def _morton_prefix(cell: tuple, level: int, dims: int) -> int:
    """Morton code of a quadtree cell path (level bits per dim, MSB first)."""
    z = 0
    for b in range(level - 1, -1, -1):
        bits_at = 0
        for d in range(dims):
            bits_at |= ((cell[d] >> b) & 1) << d
        z = (z << dims) | bits_at
    return z


def merge_ranges(ranges: list[IndexRange]) -> list[IndexRange]:
    """Sort and merge overlapping/adjacent ranges (IndexRange merge,
    ZN.scala:221-241). A merged range is `contained` only if all parts were."""
    if not ranges:
        return []
    rs = sorted(ranges, key=lambda r: (r.lower, r.upper))
    out = [rs[0]]
    for r in rs[1:]:
        last = out[-1]
        if r.lower <= last.upper + 1:
            out[-1] = IndexRange(
                last.lower, max(last.upper, r.upper), last.contained and r.contained
            )
        else:
            out.append(r)
    return out


def zranges_lonlat(
    bboxes: list[tuple[float, float, float, float]],
    bits: int,
    max_ranges: int = DEFAULT_MAX_RANGES,
    max_recurse: int = DEFAULT_MAX_RECURSE,
) -> list[IndexRange]:
    """Z2 ranges for geographic bboxes (union of boxes, merged).

    Budget is split across boxes like the reference splits the range target
    across time bins (Z3IndexKeySpace.scala:169-181)."""
    from .zorder import WORLD, normalize

    per_box = max(1, max_ranges // max(1, len(bboxes)))
    all_ranges: list[IndexRange] = []
    for minx, miny, maxx, maxy in bboxes:
        ixmin = int(normalize([minx], WORLD[0], WORLD[2], bits)[0])
        ixmax = int(normalize([maxx], WORLD[0], WORLD[2], bits)[0])
        iymin = int(normalize([miny], WORLD[1], WORLD[3], bits)[0])
        iymax = int(normalize([maxy], WORLD[1], WORLD[3], bits)[0])
        all_ranges.extend(
            zranges_box(
                ixmin, iymin, ixmax, iymax, bits, per_box, max_recurse
            )
        )
    return merge_ranges(all_ranges)
