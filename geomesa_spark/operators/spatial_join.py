"""Distributed spatial join: cell-keyed equi-join + vectorized refine.

Reference semantics: GeoMesaJoinRelation's grid-partitioned sweepline join
(geomesa-spark-sql/.../GeoMesaJoinRelation.scala:41-91 + OverlapAction.scala:17-42):
both relations are partitioned by the same grid, joined on cell id, then an
in-partition sweepline runs the exact predicate. Duplication: a geometry
intersecting k cells appears in all k (RelationUtils.scala:35-53) and the
reference leaves "TODO: filter duplicates when querying" — we fix that with
the reference-cell technique: a pair is emitted only in the grid cell that
contains the lower-left corner of the pair's envelope intersection, so each
qualifying pair survives in EXACTLY one cell and row parity is exact.

Spark-first plan:
  explode(cover_cells(envelope))      -> (cx, cy) grid key per side
  repartition/join on (cx, cy)        -> hash or broadcast equi-join (AQE skew)
  bbox overlap + reference-cell guard -> plain Column arithmetic, codegen'd
  exact predicate                     -> Arrow pandas UDF (vectorized
                                         point-in-polygon fast path)

Scale notes: the equi-join shuffles once on the grid key; hot cells are
handled by AQE skew-join splitting plus the optional `salt` knob which
subdivides only cells whose row count exceeds a threshold. The small side
should be broadcast (`broadcast=True`) to skip the shuffle entirely.
"""

from __future__ import annotations

import os

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ..geom.vectorized import (
    areal_covers_batch,
    areal_intersects_batch,
    areal_overlaps_batch,
    areal_touches_batch,
    areal_within_batch,
    lineal_evidence_batch,
    lineal_predicate_batch,
    locate_batch,
    multipoint_evidence_batch,
    multipoint_predicate_batch,
    points_from_wkb,
    points_in_polygon,
)
from ..geom.wkb import from_wkb
from ..geom import algorithms as alg
from ..geom import core as gcore
from ..index.zorder import WORLD, normalize

DEFAULT_JOIN_BITS = 6  # 64x64 world grid (~5.6 deg cells); override per join


def _grid_scale(bits: int) -> tuple[float, float]:
    return (2.0**bits) / 360.0, (2.0**bits) / 180.0


def cover_cells_expr(bits: int):
    """Envelope -> array of (cx << 32 | cy) covered grid keys as a PURE Column
    expression (sequence x transform x flatten — whole-stage codegen, no
    Python). A point envelope yields a 1-element array; a null envelope a null
    array (dropped by explode)."""
    n = 2**bits
    sx, sy = _grid_scale(bits)

    def cover(minx, miny, maxx, maxy):
        def idx(c, lo, s):
            return F.greatest(
                F.lit(0), F.least(F.floor((c - F.lit(lo)) * F.lit(s)), F.lit(n - 1))
            ).cast("long")

        ix0, ix1 = idx(minx, WORLD[0], sx), idx(maxx, WORLD[0], sx)
        iy0, iy1 = idx(miny, WORLD[1], sy), idx(maxy, WORLD[1], sy)
        return F.flatten(
            F.transform(
                F.sequence(ix0, ix1),
                lambda ix: F.transform(
                    F.sequence(iy0, iy1), lambda iy: F.shiftleft(ix, 32).bitwiseOR(iy)
                ),
            )
        )

    return cover


def _with_join_cells(df: DataFrame, p: str, bits: int) -> DataFrame:
    """Attach the exploded join_cell column in ONE pass over the input — the
    cover expression is pure Column math, so there is no point/extent split
    (a filter+union here would execute the upstream scan twice)."""
    cover = cover_cells_expr(bits)
    return df.withColumn(
        "join_cell",
        F.explode(
            cover(
                F.col(f"{p}minx"), F.col(f"{p}miny"), F.col(f"{p}maxx"), F.col(f"{p}maxy")
            )
        ),
    )


def _ref_cell_cond(bits: int):
    """Reference-cell dedupe: pair emitted only where the join cell equals the
    grid cell of the envelope-intersection lower-left corner."""
    sx, sy = _grid_scale(bits)
    n = 2**bits
    corner_x = F.greatest(F.col("l_minx"), F.col("r_minx"))
    corner_y = F.greatest(F.col("l_miny"), F.col("r_miny"))
    # clamp BOTH ends to mirror cover_cells_expr's [0, n-1] clip — without the
    # lower clamp, a corner below the world bounds computes a negative cell
    # that matches no join_cell and the pair is dropped instead of deduped
    ref_cx = F.greatest(
        F.lit(0),
        F.least(F.floor((corner_x - F.lit(WORLD[0])) * F.lit(sx)), F.lit(n - 1)),
    ).cast("long")
    ref_cy = F.greatest(
        F.lit(0),
        F.least(F.floor((corner_y - F.lit(WORLD[1])) * F.lit(sy)), F.lit(n - 1)),
    ).cast("long")
    cell = F.col("join_cell")
    return (F.shiftright(cell, 32) == ref_cx) & (
        cell.bitwiseAND(F.lit((1 << 32) - 1)) == ref_cy
    )


def _rect_info(g) -> tuple[bool, tuple[float, float, float, float] | None]:
    """(is a NON-degenerate axis-aligned rectangle, bounds). Degenerate
    rects (zero width/height) are excluded — their DE-9IM boundary semantics
    differ from solid boxes and they take the generic path."""
    polys = alg._polygons_of(g)
    if len(polys) != 1 or len(polys[0]) != 1:
        return False, None
    r = np.asarray(polys[0][0])
    if len(r) != 5:
        return False, None
    b = g.bounds()
    if not (b[0] < b[2] and b[1] < b[3]):
        return False, None
    # The 4 non-closing vertices must be the 4 DISTINCT corners in
    # rectangular (adjacent-corner) order: vertices-on-corners alone admits
    # degenerate rings (triangle with a doubled corner, corner bowtie) that
    # are NOT solid rectangles but would take the bounds-only fast path.
    corners = {(b[0], b[1]), (b[2], b[1]), (b[2], b[3]), (b[0], b[3])}
    verts = [(float(p[0]), float(p[1])) for p in r[:4, :2]]
    if set(verts) != corners:
        return False, None
    ok = all(
        (verts[i][0] == verts[(i + 1) % 4][0]) != (verts[i][1] == verts[(i + 1) % 4][1])
        for i in range(4)
    )
    return (True, b) if ok else (False, None)


def _rect_pair_predicate(predicate: str, A, B) -> bool | None:
    """Exact DE-9IM predicate for two SOLID axis-aligned rectangles from
    bounds arithmetic alone (closed-set semantics). None = not supported."""
    closed = A[0] <= B[2] and B[0] <= A[2] and A[1] <= B[3] and B[1] <= A[3]
    open_ = A[0] < B[2] and B[0] < A[2] and A[1] < B[3] and B[1] < A[3]
    a_in_b = A[0] >= B[0] and A[2] <= B[2] and A[1] >= B[1] and A[3] <= B[3]
    b_in_a = B[0] >= A[0] and B[2] <= A[2] and B[1] >= A[1] and B[3] <= A[3]
    if predicate == "intersects":
        return closed
    if predicate == "within":
        return a_in_b
    if predicate in ("contains", "covers"):
        # for SOLID rects B inside A, interiors necessarily overlap, so
        # contains == covers == containment of bounds
        return b_in_a
    if predicate == "overlaps":
        return open_ and not a_in_b and not b_in_a
    if predicate == "touches":
        return closed and not open_
    if predicate == "crosses":
        return False  # areal x areal can never cross (dim rule)
    return None


def _normalize_gc(g):
    """Homogeneous GEOMETRYCOLLECTION -> the equivalent MULTI geometry.

    Exact under this engine's union semantics: the scalar relate/locate
    flatten GCs through _points_of/_lines_of/_polygons_of, and the MULTI
    built from those same part lists yields identical results — so a GC of
    polygons routes through the areal batch kernels (simple_parts guard
    included), a GC of lines through the lineal kernel, a GC of points
    through the multipoint kernel (VERDICT r6 #3). Heterogeneous (mixed
    dimension families) and empty GCs return unchanged; non-GC input
    returns unchanged."""
    if g.gtype != gcore.GEOMETRYCOLLECTION:
        return g
    polys = alg._polygons_of(g)
    lines = alg._lines_of(g)
    pts = alg._points_of(g)
    fams = (len(polys) > 0) + (len(lines) > 0) + (len(pts) > 0)
    if fams != 1:
        return g
    if polys:
        return gcore.Geometry(gcore.MULTIPOLYGON, polys)
    if lines:
        return gcore.Geometry(gcore.MULTILINESTRING, lines)
    return gcore.Geometry(gcore.MULTIPOINT, [list(map(float, p)) for p in pts])


def _gc_family_subs(g):
    """Decompose a (heterogeneous) GC into its dimension-family MULTI
    geometries: [(MULTIPOLYGON?), (MULTILINESTRING?), (MULTIPOINT?)].
    Union-of-families equals the GC's point set, so OR over per-family
    verdicts is exact for `intersects`."""
    subs = []
    polys = alg._polygons_of(g)
    if polys:
        subs.append(gcore.Geometry(gcore.MULTIPOLYGON, polys))
    lines = alg._lines_of(g)
    if lines:
        subs.append(gcore.Geometry(gcore.MULTILINESTRING, lines))
    pts = alg._points_of(g)
    if len(pts):
        subs.append(gcore.Geometry(gcore.MULTIPOINT, [list(map(float, p)) for p in pts]))
    return subs


def _live_segs(g) -> bool:
    """Geometry-object analog of the has_segs byte-cache guard."""
    return any(
        len(a) >= 2 and bool((np.asarray(a)[:-1, :2] != np.asarray(a)[1:, :2]).any())
        for a in alg._lines_of(g)
    )


def _ring_segments(rings) -> np.ndarray:
    segs = []
    for r in rings:
        r = np.asarray(r, dtype=np.float64)
        segs.append(np.hstack([r[:-1, :2], r[1:, :2]]))
    return np.concatenate(segs) if segs else np.empty((0, 4))


# max broadcast pairs per block in _segs_intersect_any: 2^19 pairs keeps
# each of the ~8 intermediate (n,m) double arrays at ~4 MB, so a
# pathological 10k x 10k-segment part pair peaks around 32 MB instead of
# allocating ~800 MB in one shot (same chunking discipline as the lineal
# S x E kernel)
_SEG_PAIR_BLOCK = 1 << 19


def _segs_intersect_any(A: np.ndarray, B: np.ndarray) -> bool:
    """Do ANY segments of sets A (n,4) and B (m,4) intersect (proper
    crossing, touch, or collinear overlap)? Broadcast orientation tests,
    chunked so per-call memory is bounded by _SEG_PAIR_BLOCK pairs with
    early exit on the first intersecting block."""
    if not len(A) or not len(B):
        return False
    if len(A) * len(B) <= _SEG_PAIR_BLOCK:
        return _segs_intersect_block(A, B)
    ca = max(1, _SEG_PAIR_BLOCK // len(B))
    for i in range(0, len(A), ca):
        Ab = A[i : i + ca]
        cb = max(1, _SEG_PAIR_BLOCK // len(Ab))
        for j in range(0, len(B), cb):
            if _segs_intersect_block(Ab, B[j : j + cb]):
                return True
    return False


def _segs_intersect_block(A: np.ndarray, B: np.ndarray) -> bool:
    """One (n,m) broadcast block of the standard d1..d4 sign procedure —
    callers bound n*m via _SEG_PAIR_BLOCK."""
    ax, ay, bx, by = (A[:, k][:, None] for k in range(4))
    cx, cy, dx_, dy_ = (B[:, k][None, :] for k in range(4))

    def cross(ox, oy, px_, py_, qx, qy):
        return (px_ - ox) * (qy - oy) - (py_ - oy) * (qx - ox)

    d1 = cross(cx, cy, dx_, dy_, ax, ay)
    d2 = cross(cx, cy, dx_, dy_, bx, by)
    d3 = cross(ax, ay, bx, by, cx, cy)
    d4 = cross(ax, ay, bx, by, dx_, dy_)
    proper = ((d1 > 0) != (d2 > 0)) & ((d3 > 0) != (d4 > 0))
    if proper.any():
        return True

    def on(ox, oy, px_, py_, qx, qy, d):
        # collinear q on segment (o,p)
        return (
            (d == 0)
            & (qx >= np.minimum(ox, px_))
            & (qx <= np.maximum(ox, px_))
            & (qy >= np.minimum(oy, py_))
            & (qy <= np.maximum(oy, py_))
        )

    return bool(
        on(cx, cy, dx_, dy_, ax, ay, d1).any()
        or on(cx, cy, dx_, dy_, bx, by, d2).any()
        or on(ax, ay, bx, by, cx, cy, d3).any()
        or on(ax, ay, bx, by, dx_, dy_, d4).any()
    )


def _parts_batch_safe(g) -> bool:
    """Can this (multi)polygon's parts drive the areal batch kernels for the
    containment/overlap/touch family?

    The kernels assume every ring edge is true union boundary, which fails
    when part interiors overlap or parts share boundary (r6 multi-part
    sweep). Safe iff the parts' CLOSURES are pairwise disjoint: boundaries
    never intersect (exact vectorized segment test, replacing the r6
    envelope-touch over-approximation — a valid archipelago whose part
    ENVELOPES overlap now stays batched, VERDICT r6 #9) and no part vertex
    sits strictly inside a sibling (hole-nested parts locate EXTERIOR and
    remain batch-safe — a part filling a sibling's hole exactly still
    touches boundary and routes scalar via the segment test)."""
    polys = alg._polygons_of(g)
    if len(polys) <= 1:
        return True
    envs, segs = [], []
    for rings in polys:
        sh = np.asarray(rings[0], dtype=np.float64)
        envs.append((sh[:, 0].min(), sh[:, 1].min(), sh[:, 0].max(), sh[:, 1].max()))
        segs.append(_ring_segments(rings))
    for i in range(len(polys)):
        for j in range(i + 1, len(polys)):
            a, c = envs[i], envs[j]
            if not (a[0] <= c[2] and a[2] >= c[0] and a[1] <= c[3] and a[3] >= c[1]):
                continue  # envelopes disjoint -> parts disjoint
            if _segs_intersect_any(segs[i], segs[j]):
                return False
            # boundaries disjoint: i is entirely inside one face of j's
            # arrangement (interior / a hole / outside) and vice versa —
            # one vertex decides; strict interior means overlapping parts
            vx, vy = np.asarray(polys[i][0], dtype=np.float64)[0, :2]
            if alg._locate_in_polygon(float(vx), float(vy), polys[j]) == alg.INTERIOR:
                return False
            wx, wy = np.asarray(polys[j][0], dtype=np.float64)[0, :2]
            if alg._locate_in_polygon(float(wx), float(wy), polys[i]) == alg.INTERIOR:
                return False
    return True


def _pairwise_predicate_fn(predicate: str):
    """The raw batch function behind _pairwise_predicate_udf — exposed so
    tests can drive the exact refine logic on pandas Series without a Spark
    round trip.

    Fast paths:
    - point left rows vs few distinct right polygons: one numpy ray-cast per
      distinct polygon over all its points;
    - solid-rectangle x solid-rectangle pairs (parcel/bbox/tile workloads):
      pure bounds arithmetic, no per-pair geometry calls — rect-ness and
      bounds are computed ONCE per distinct geometry and cached;
    - lineal x areal / lineal x lineal / areal x lineal pairs: batched
      segment-split classification kernels grouped by the non-lineal (or
      right) partner."""
    if predicate == "equals":
        # SFS equals(A, B) == within(A, B) AND within(B, A) — compose the
        # fully-batched within refine in both directions rather than
        # duplicating every fast path for a rare predicate
        win = _pairwise_predicate_fn("within")

        def eq_pred(lw: pd.Series, rw: pd.Series) -> pd.Series:
            # byte-identical WKB is the common case in exact-dup joins:
            # same encoding => same point set, so the verdict is the
            # engine's SELF-equals. True for any non-empty geometry without
            # a degenerate areal part; empties are False (SFS: no
            # interior), and zero-AREA areal shapes defer to the scalar
            # (the engine's equals needs interior-interior evidence, which
            # a width-0 polygon lacks even against itself — the 0.3-step
            # lattice sweep caught the shortcut saying True there).
            empty_cache: dict = {}

            def nonempty(b: bytes) -> bool:
                v = empty_cache.get(b)
                if v is None:
                    try:
                        g = from_wkb(b)
                        if g.is_empty():
                            v = False
                        elif alg._polygons_of(g) and not alg.area(g) > 0.0:
                            v = bool(alg.equals(g, g))
                        else:
                            v = True
                    except Exception:
                        v = False
                    empty_cache[b] = v
                return v

            out = [None] * len(lw)
            rest_ix = []
            for k, (x, y) in enumerate(zip(lw, rw)):
                if x is None or y is None:
                    continue
                xb = bytes(x)
                if xb == bytes(y):
                    out[k] = nonempty(xb)
                else:
                    rest_ix.append(k)
            if rest_ix:
                sub_l = lw.iloc[rest_ix].reset_index(drop=True)
                sub_r = rw.iloc[rest_ix].reset_index(drop=True)
                a = win(sub_l, sub_r)
                b = win(sub_r, sub_l)
                for k, x, y in zip(rest_ix, a, b):
                    out[k] = (
                        None
                        if (x is None or y is None)
                        else bool(x) and bool(y)
                    )
            return pd.Series(out, dtype=object)

        return eq_pred
    fn = getattr(alg, predicate)

    def pred(lw: pd.Series, rw: pd.Series) -> pd.Series:
        n = len(lw)
        lbytes = [None if b is None else bytes(b) for b in lw]
        rbytes = [None if b is None else bytes(b) for b in rw]
        pts = points_from_wkb(lbytes)
        left_is_pt = ~np.isnan(pts[:, 0])
        out = np.empty(n, dtype=object)
        cache: dict[bytes, object] = {}
        rect_cache: dict[bytes, tuple] = {}

        def geo(b):
            g = cache.get(b)
            if g is None:
                g = from_wkb(b)
                if len(cache) < 8192:
                    cache[b] = g
            return g

        def rect(b):
            r = rect_cache.get(b)
            if r is None:
                r = _rect_info(geo(b))
                if len(rect_cache) < 8192:
                    rect_cache[b] = r
            return r

        # NOTE: 'covers' is deliberately NOT in the fast path — for a point
        # left row, points_in_polygon answers "right covers left", but the
        # predicate is "left covers right" (inverted). Like 'contains', covers
        # takes the generic path. touches/crosses for point lefts read a
        # single vectorized locate per distinct right (crosses is vacuously
        # false for a 0-dim left: II and IE cannot both be non-empty).
        lineal_types = (gcore.LINESTRING, gcore.MULTILINESTRING)
        areal_types = (gcore.POLYGON, gcore.MULTIPOLYGON)
        if (
            predicate in ("intersects", "within", "touches", "crosses")
            and left_is_pt.any()
        ):
            # group point rows by right geometry -> one vectorized pass each
            idx_pt = np.nonzero(left_is_pt)[0]
            groups: dict[bytes, list[int]] = {}
            for i in idx_pt:
                rb = rbytes[i]
                if rb is None:
                    out[i] = None
                else:
                    groups.setdefault(rb, []).append(i)
            for rb, idxs in groups.items():
                g = geo(rb)
                ii = np.asarray(idxs)
                mask = None
                # the ray-cast shortcut is only sound for PURELY areal
                # partners: a GC mixing polygons with line/point members has
                # interior beyond its polygons (a point on the GC's line
                # member intersects/is-within it under the scalar locate's
                # union semantics) — mixed partners take the locate_batch
                # branch, which flattens GCs with the same min-over-members
                # rule as the scalar
                purely_areal = (
                    alg._polygons_of(g)
                    and not alg._lines_of(g)
                    and not len(alg._points_of(g))
                )
                if predicate in ("intersects", "within") and purely_areal:
                    mask = points_in_polygon(
                        pts[ii, 0], pts[ii, 1],
                        g,
                        boundary_ok=(predicate == "intersects"),
                    )
                elif (
                    g.gtype in areal_types
                    or g.gtype in lineal_types
                    or g.gtype == gcore.GEOMETRYCOLLECTION
                ):
                    if predicate == "crosses":
                        mask = np.zeros(len(ii), dtype=bool)
                    else:
                        loc = locate_batch(pts[ii, 0], pts[ii, 1], g)
                        if predicate == "intersects":
                            mask = loc != alg.EXTERIOR
                        elif predicate == "within":
                            mask = loc == alg.INTERIOR
                        else:  # touches: on the boundary, not the interior
                            mask = loc == alg.BOUNDARY
                if mask is None:
                    for i in idxs:
                        out[i] = bool(fn(geo(lbytes[i]), g))
                else:
                    for k, i in enumerate(idxs):
                        out[i] = bool(mask[k])
            rest = np.nonzero(~left_is_pt)[0]
        else:
            rest = np.arange(n)
        # non-rect areal x areal pairs batch by distinct right geometry into
        # the vectorized ray-cast/crossing kernels; lineal x areal, lineal x
        # lineal and areal x lineal pairs batch through the segment-split
        # classification kernels (lineal side concatenated, ONE chunked S x E
        # parameter broadcast per group). Geometry collections route through
        # the same kernels (r7): HOMOGENEOUS GCs normalize to the equivalent
        # MULTI geometry (exact — the scalar flattens GCs identically), and
        # heterogeneous GCs decompose into dimension-family subs whose
        # per-family verdicts OR together (union semantics; intersects only).
        # Per-pair Python remains only for degenerate members and
        # heterogeneous GCs under non-intersects predicates.
        #
        # Group entries are (row index, member Geometry); the ONE partner
        # geometry per group lives in partner_of[key]. A row may appear in
        # several groups (heterogeneous-GC families) — verdicts OR-combine.
        areal_groups: dict[object, list[tuple[int, object]]] = {}
        # keyed ("l"|"r"|"pl"|"pr"|"gr", partner bytes): "l" = lineal LEFT
        # grouped by right partner; "r" = lineal RIGHT grouped by left
        # polygon; "pl"/"pr" = multipoint side; "gr" = a het-GC's areal
        # family vs a lineal partner (batch runs over the partner lines,
        # keyed by the GC bytes so it cannot collide with "r" groups)
        mixed_groups: dict[tuple[str, bytes], list[tuple[int, object]]] = {}
        partner_of: dict[object, object] = {}

        def push(groups_dict, key, partner_geom, i, member_geom):
            groups_dict.setdefault(key, []).append((i, member_geom))
            partner_of[key] = partner_geom

        def accum(i, v: bool):
            prev = out[i]
            out[i] = bool(v) if prev is None else (prev or bool(v))

        seg_ok: dict[bytes, bool] = {}
        area_ok: dict[bytes, bool] = {}
        norm_cache: dict[bytes, object] = {}

        def norm(b):
            g = norm_cache.get(b)
            if g is None:
                g = _normalize_gc(geo(b))
                if len(norm_cache) < 8192:
                    norm_cache[b] = g
            return g

        def pos_area(b):
            # degenerate zero-area polygons (a point or segment dressed as
            # a POLYGON) have empty interiors — the batch kernels' probe
            # logic and the scalar relate disagree on them, so they take
            # the scalar path (same posture as the lineal live-segment
            # guard)
            v = area_ok.get(b)
            if v is None:
                v = alg.area(geo(b)) > 0.0
                if len(area_ok) < 8192:
                    area_ok[b] = v
            return v

        parts_ok: dict[bytes, bool] = {}

        def simple_parts(b):
            # multi-part areal batch-safety (see _parts_batch_safe): parts
            # whose closures are pairwise disjoint keep the batch kernels;
            # overlapping/edge-sharing parts (invalid OGC, honored by the
            # scalar's union semantics) route to the scalar path
            v = parts_ok.get(b)
            if v is None:
                v = _parts_batch_safe(geo(b))
                if len(parts_ok) < 8192:
                    parts_ok[b] = v
            return v

        def has_segs(b):
            # require a LIVE (non-zero-length) segment: a LINESTRING of
            # identical points is effectively 0-dim and must take the
            # scalar path (the batch kernel drops degenerate segments)
            v = seg_ok.get(b)
            if v is None:
                v = any(
                    len(a) >= 2
                    and bool(
                        (np.asarray(a)[:-1, :2] != np.asarray(a)[1:, :2]).any()
                    )
                    for a in alg._lines_of(geo(b))
                )
                if len(seg_ok) < 8192:
                    seg_ok[b] = v
            return v

        batchable = predicate in (
            "intersects", "contains", "within", "covers",
            "overlaps", "touches", "crosses",
        )

        def _mp_partner_ok(pb, pt_type):
            return (pt_type in areal_types and pos_area(pb)) or (
                pt_type in lineal_types and has_segs(pb)
            )

        # heterogeneous-GC rows under the FULL predicate family (r8): the
        # named per-family predicates can't express the GC-level DE-9IM
        # matrix, but per-family CELLS can — under the engine's min-locate
        # union semantics, interior(GC) = union of family interiors and
        # closure(GC) = union of family closures, so:
        #   within(GC,B)  = AND_f covby(f,B)        AND OR_f ii(f,B)
        #   covers(B,GC)  = AND_f covby(f,B)
        #   touches       = OR_f inter(f,B)         AND AND_f NOT ii(f,B)
        #   crosses, dim(GC) < dim(B):  OR_f ii  AND OR_f ie
        #   crosses, dim(GC) = dim(B) = 1: OR_f ii AND no lineal family
        #       with a 1-dim II (dim of a union = max of dims)
        #   crosses, areal GC family vs areal B: equal dims -> False
        # Container-direction / overlaps / cross_gt need B-vs-union
        # evidence; they batch through REVERSE coverage (B against each
        # family). For 2-dim B the areal-family covby is exact (measure-
        # zero families cannot cover an open set); a 1-dim B that escapes
        # EACH family individually may still be JOINTLY covered — only
        # those rows fall back to the scalar.
        het_ev_groups: dict[tuple[str, bytes], list[tuple[int, object]]] = {}
        het_partner: dict[tuple[str, bytes], object] = {}
        het_state: dict[int, dict] = {}

        def _push_ev(kind, key, partner, i, member):
            het_ev_groups.setdefault((kind, key), []).append((i, member))
            het_partner[(kind, key)] = partner

        def push_het_full(i, het_g, het_b, partner_g, partner_b, gc_side) -> bool:
            """Route a heterogeneous-GC row under within/contains/covers/
            touches/crosses through per-family evidence batching. Returns
            False (leave to the scalar path) for non-decomposable
            directions or degenerate members/partners."""
            pt = partner_g.gtype
            p_areal = pt in areal_types and pos_area(partner_b)
            p_lineal = pt in lineal_types and has_segs(partner_b)
            if not (p_areal or p_lineal):
                return False
            subs = _gc_family_subs(het_g)
            if not subs:
                return False
            has_areal_fam = any(s.gtype == gcore.MULTIPOLYGON for s in subs)
            gc_dim = 2 if has_areal_fam else (
                1 if any(s.gtype == gcore.MULTILINESTRING for s in subs) else 0
            )
            if predicate == "within":
                kind = "cover_b" if gc_side == "l" else "in_gc"
            elif predicate == "contains":
                # contains(GC, B) == within(B, GC); contains(B, GC) == cover_b
                kind = "cover_b" if gc_side == "r" else "in_gc"
            elif predicate == "covers":
                kind = "covby_all" if gc_side == "r" else "covby_gc"
            elif predicate == "touches":
                kind = "touch"
            elif predicate == "overlaps":
                p_dim = 2 if p_areal else 1
                if gc_dim != p_dim:
                    out[i] = False  # unequal dims never overlap
                    return True
                kind = "overlap2" if p_dim == 2 else "overlap1"
            elif predicate == "crosses":
                p_dim = 2 if p_areal else 1
                if gc_dim == 2:
                    if p_dim == 2:
                        out[i] = False  # equal 2-dim never crosses
                        return True
                    kind = "cross_gt"  # dim(GC) > dim(B): EI via rev covby
                else:
                    kind = "cross_le" if p_dim == 2 else "cross_ll"
            else:
                return False
            p2_sub = next(
                (s for s in subs if s.gtype == gcore.MULTIPOLYGON), None
            )
            p1_sub = next(
                (s for s in subs if s.gtype == gcore.MULTILINESTRING), None
            )
            if kind in ("in_gc", "covby_gc") and p_areal and p2_sub is None:
                out[i] = False  # a 2-dim B can never sit inside a dim<=1 GC
                return True
            plan = []
            # container-direction / overlaps / cross_gt: reverse-direction
            # coverage evidence (B against the GC's families). For a 2-dim
            # B, escape from the areal family is escape from the union
            # (measure-zero families can't cover an open set), so rev2 is
            # EXACT; for a 1-dim B, each family's covby alone is sufficient
            # but a JOINT cover (half-in-areal, half-riding-line) is not
            # family-decomposable — those rows resolve via the scalar.
            rev2 = kind in ("in_gc", "covby_gc", "overlap2", "cross_gt")
            rev1 = (
                kind in ("in_gc", "covby_gc", "cross_gt") and p_lineal
            ) or kind == "overlap1"
            if rev2 and p2_sub is not None:
                if not alg.area(p2_sub) > 0.0:
                    return False
                if p_areal:
                    if not (
                        _parts_batch_safe(p2_sub) and simple_parts(partner_b)
                    ):
                        return False
                    plan.append(("arv", het_b, p2_sub, partner_g))
                elif kind == "covby_gc":
                    # no forward plan for covby_gc; otherwise the "arl"
                    # entry below carries covby_rev2 in the same kernel call
                    plan.append(("lrev2", het_b, p2_sub, partner_g))
            if rev1 and p1_sub is not None:
                if not _live_segs(p1_sub):
                    return False
                plan.append(("lrev1", het_b, p1_sub, partner_g))
            # in_gc with an AREAL B needs no forward evidence: B inside
            # closure(P2) forces II (an open set inside a closure must meet
            # the interior — boundaries have empty interior), so the verdict
            # is covby_rev2 alone and the whole row batches on the GC key
            if kind != "covby_gc" and not (kind == "in_gc" and p_areal):
                # forward per-family evidence
                for sub in subs:
                    st = sub.gtype
                    if st == gcore.MULTIPOLYGON:
                        if not alg.area(sub) > 0.0:
                            return False
                        if p_areal:
                            # within/touches evidence runs the areal kernels —
                            # same parts-safety contract as the main loop.
                            # ROLES SWAPPED (r8): every needed field is
                            # role-symmetric (inter/touches) or flips kernel
                            # (covby(P2,B) == covers(B,P2)), so the members
                            # are the VARYING partners and the key is the
                            # GC — one kernel call per GC, not per partner
                            if not (
                                _parts_batch_safe(sub)
                                and simple_parts(partner_b)
                            ):
                                return False
                            plan.append(("ar", het_b, sub, partner_g))
                        else:
                            plan.append(("arl", het_b, sub, partner_g))
                    elif st == gcore.MULTILINESTRING:
                        if not _live_segs(sub):
                            return False
                        plan.append(("lin", partner_b, partner_g, sub))
                    else:  # MULTIPOINT family
                        plan.append(("mp", partner_b, partner_g, sub))
            het_state[i] = {
                "kind": kind,
                "covby": True,
                "ii": False,
                "inter": False,
                "ie": False,
                "ii1": False,
                "p_areal": p_areal,
                "covby_rev2": None,
                "covby_rev1": None,
            }
            for fam_kind, key, partner, member in plan:
                _push_ev(fam_kind, key, partner, i, member)
            return True

        def push_het_intersects(i, het_g, het_b, partner_g, partner_b) -> bool:
            """Route a heterogeneous-GC row (intersects only) by pushing one
            group entry per dimension family; verdicts OR together (the GC's
            point set is the union of its families). Returns False — leaving
            the pair to the scalar path — when any family member is
            degenerate (zero-area polygon, segment-less line) or the partner
            can't drive the needed kernel."""
            pt = partner_g.gtype
            p_areal = pt in areal_types and pos_area(partner_b)
            p_lineal = pt in lineal_types and has_segs(partner_b)
            plan = []
            for sub in _gc_family_subs(het_g):
                st = sub.gtype
                if st == gcore.MULTIPOLYGON:
                    if not alg.area(sub) > 0.0:
                        return False
                    if p_areal:
                        plan.append((areal_groups, partner_b, partner_g, sub))
                    elif p_lineal:
                        # batch of partner lines vs the GC's areal family
                        plan.append((mixed_groups, ("gr", het_b), sub, partner_g))
                    else:
                        return False
                elif st == gcore.MULTILINESTRING:
                    if not _live_segs(sub):
                        return False
                    if p_areal or p_lineal:
                        plan.append((mixed_groups, ("l", partner_b), partner_g, sub))
                    else:
                        return False
                else:  # MULTIPOINT family
                    if p_areal or p_lineal:
                        plan.append((mixed_groups, ("pl", partner_b), partner_g, sub))
                    else:
                        return False
            if not plan:
                return False  # empty GC -> scalar
            out[i] = False  # OR-accumulation base
            for groups_dict, key, partner, member in plan:
                push(groups_dict, key, partner, i, member)
            return True

        for i in rest:
            if lbytes[i] is None or rbytes[i] is None:
                out[i] = None
                continue
            lr, lb = rect(lbytes[i])
            if lr:
                rr, rb = rect(rbytes[i])
                if rr:
                    v = _rect_pair_predicate(predicate, lb, rb)
                    if v is not None:
                        out[i] = v
                        continue
            if batchable:
                lg, rg = norm(lbytes[i]), norm(rbytes[i])
                lt, rt = lg.gtype, rg.gtype
                if (
                    lt in areal_types
                    and rt in areal_types
                    and pos_area(lbytes[i])
                    and pos_area(rbytes[i])
                    and (
                        predicate in ("intersects", "crosses")
                        or (simple_parts(lbytes[i]) and simple_parts(rbytes[i]))
                    )
                ):
                    push(areal_groups, rbytes[i], rg, i, lg)
                    continue
                if (
                    lt in lineal_types
                    and has_segs(lbytes[i])
                    and (
                        (rt in areal_types and pos_area(rbytes[i]))
                        or (rt in lineal_types and has_segs(rbytes[i]))
                    )
                ):
                    push(mixed_groups, ("l", rbytes[i]), rg, i, lg)
                    continue
                if (
                    lt in areal_types
                    and pos_area(lbytes[i])
                    and rt in lineal_types
                    and has_segs(rbytes[i])
                ):
                    push(mixed_groups, ("r", lbytes[i]), lg, i, rg)
                    continue
                # MULTIPOINT vs areal/lineal: one vectorized locate over
                # the member points decides every predicate
                if (
                    lt == gcore.MULTIPOINT
                    and len(alg._points_of(lg))
                    and _mp_partner_ok(rbytes[i], rt)
                ):
                    push(mixed_groups, ("pl", rbytes[i]), rg, i, lg)
                    continue
                if (
                    rt == gcore.MULTIPOINT
                    and len(alg._points_of(rg))
                    and _mp_partner_ok(lbytes[i], lt)
                ):
                    push(mixed_groups, ("pr", lbytes[i]), lg, i, rg)
                    continue
                # heterogeneous GC (one side) under intersects: OR over
                # dimension families, each through its batch kernel
                l_het = lt == gcore.GEOMETRYCOLLECTION
                r_het = rt == gcore.GEOMETRYCOLLECTION
                if predicate == "intersects":
                    if l_het and not r_het:
                        if push_het_intersects(i, lg, lbytes[i], rg, rbytes[i]):
                            continue
                    elif r_het and not l_het:
                        # intersects is symmetric: decompose the right GC
                        # against the left partner with the same machinery
                        if push_het_intersects(i, rg, rbytes[i], lg, lbytes[i]):
                            continue
                elif l_het != r_het and predicate in (
                    "within", "contains", "covers", "touches", "crosses",
                    "overlaps",
                ):
                    if l_het:
                        if push_het_full(
                            i, lg, lbytes[i], rg, rbytes[i], "l"
                        ):
                            continue
                    else:
                        if push_het_full(
                            i, rg, rbytes[i], lg, lbytes[i], "r"
                        ):
                            continue
            out[i] = bool(fn(geo(lbytes[i]), geo(rbytes[i])))
        # GC-keyed kinds first, then the per-partner lin/mp groups with a
        # lazy skip: once an AND-shaped row's areal-family coverage failed,
        # no further OR-evidence can change its verdict — don't pay the
        # per-partner kernel for it (covers(B, GC) over many distinct B's
        # is decided almost entirely by the GC-keyed areal coverage)
        _EV_LAST = ("lin", "mp")
        for (fam_kind, key), entries in sorted(
            het_ev_groups.items(), key=lambda kv: kv[0][0] in _EV_LAST
        ):
            if fam_kind in _EV_LAST:
                entries = [
                    (i, g)
                    for i, g in entries
                    if not (
                        het_state[i]["kind"] in ("cover_b", "covby_all")
                        and not het_state[i]["covby"]
                    )
                ]
                if not entries:
                    continue
            members = [g for _, g in entries]
            partner = het_partner[(fam_kind, key)]
            if fam_kind == "lin":
                ev = lineal_evidence_batch(members, partner)
            elif fam_kind == "mp":
                ev = multipoint_evidence_batch(members, partner)
            elif fam_kind == "ar":
                # members are the VARYING partners, partner is the GC's
                # areal family (see push_het_full): inter/touches are
                # role-symmetric and family-covered-by-B flips to
                # covers(B, family)
                inter_v = areal_intersects_batch(members, partner)
                touch_v = areal_touches_batch(members, partner)
                covby_v = areal_covers_batch(members, partner)
                ev = {
                    "inter": inter_v,
                    "ii": inter_v & ~touch_v,
                    # 2-dim family: some closure point outside closure(B)
                    # implies interior points outside too
                    "ie": ~covby_v,
                    "covby": covby_v,
                    "ii1": np.zeros(len(members), dtype=bool),
                }
            elif fam_kind == "arv":
                # reverse coverage: areal partner B inside the GC's areal
                # family (closed-set) — exact for 2-dim B (see push_het_full)
                ev = {"covby_rev2": areal_within_batch(members, partner)}
            elif fam_kind in ("lrev2", "lrev1"):
                lv = lineal_evidence_batch(members, partner)
                key_name = "covby_rev2" if fam_kind == "lrev2" else "covby_rev1"
                ev = {key_name: lv["covby"]}
            else:  # "arl": members are the LINE partners, partner is the
                # GC's areal family — inter/ii are symmetric; a 2-dim
                # family is never inside a line's closure, and its
                # interior always exceeds the line (ie true). The same
                # kernel output carries the partner's reverse coverage
                # (covby_rev2) for container-direction rows in the group.
                lv = lineal_evidence_batch(members, partner)
                ones = np.ones(len(members), dtype=bool)
                ev = {
                    "inter": lv["inter"],
                    "ii": lv["ii"],
                    "ie": ones,
                    "covby": np.zeros(len(members), dtype=bool),
                    "ii1": np.zeros(len(members), dtype=bool),
                    "covby_rev2": lv["covby"],
                }
            for k, (i, _) in enumerate(entries):
                st = het_state[i]
                if "covby_rev2" in ev:
                    st["covby_rev2"] = bool(ev["covby_rev2"][k])
                if "covby_rev1" in ev:
                    st["covby_rev1"] = bool(ev["covby_rev1"][k])
                if "covby" in ev:
                    st["covby"] = st["covby"] and bool(ev["covby"][k])
                    st["ii"] = st["ii"] or bool(ev["ii"][k])
                    st["inter"] = st["inter"] or bool(ev["inter"][k])
                    st["ie"] = st["ie"] or bool(ev["ie"][k])
                    st["ii1"] = st["ii1"] or bool(ev["ii1"][k])
        for i, st in het_state.items():
            kind = st["kind"]
            if kind == "cover_b":
                out[i] = st["covby"] and st["ii"]
            elif kind == "covby_all":
                out[i] = st["covby"]
            elif kind == "touch":
                out[i] = st["inter"] and not st["ii"]
            elif kind == "cross_le":
                out[i] = st["ii"] and st["ie"]
            elif kind == "cross_ll":
                out[i] = st["ii"] and not st["ii1"]
            elif kind in ("in_gc", "covby_gc"):
                # coverage of B by the union of families
                if st["p_areal"]:
                    # 2-dim B: rev2 is exact and implies II (see push)
                    out[i] = bool(st["covby_rev2"])
                elif kind == "in_gc" and not st["ii"]:
                    out[i] = False
                elif st["covby_rev2"] or st["covby_rev1"]:
                    out[i] = True  # one family alone covers the line
                elif st["covby_rev2"] is not None and st["covby_rev1"] is not None:
                    # escapes each family individually — a JOINT cover is
                    # still possible; only these rows pay the scalar
                    out[i] = bool(fn(geo(lbytes[i]), geo(rbytes[i])))
                else:
                    out[i] = False  # single family exists and it missed
            elif kind == "overlap2":
                out[i] = st["ii"] and st["ie"] and not st["covby_rev2"]
            elif kind == "overlap1":
                out[i] = st["ii1"] and st["ie"] and not st["covby_rev1"]
            else:  # cross_gt: dim(GC)=2 > dim(B)=1; EI == B escapes union
                if not st["ii"] or st["covby_rev2"] or st["covby_rev1"]:
                    out[i] = False
                elif st["covby_rev1"] is None:
                    # no line family: escape from the areal family IS
                    # escape from the union (points are measure-zero)
                    out[i] = True
                else:
                    out[i] = bool(fn(geo(lbytes[i]), geo(rbytes[i])))
        for (side, key), entries in mixed_groups.items():
            members = [g for _, g in entries]
            partner = partner_of[(side, key)]
            if side in ("l", "r", "gr"):
                verdict = lineal_predicate_batch(
                    members,
                    partner,
                    predicate,
                    lineal_side="left" if side == "l" else "right",
                )
            else:
                verdict = multipoint_predicate_batch(
                    members,
                    partner,
                    predicate,
                    points_side="left" if side == "pl" else "right",
                )
            for k, (i, _) in enumerate(entries):
                accum(i, verdict[k])
        for rb_key, entries in areal_groups.items():
            idxs = [i for i, _ in entries]
            Ls = [g for _, g in entries]
            R = partner_of[rb_key]
            if predicate == "intersects":
                verdict = areal_intersects_batch(Ls, R)
            elif predicate == "within":
                verdict = areal_within_batch(Ls, R)
            elif predicate == "overlaps":
                verdict = areal_overlaps_batch(Ls, R)
            elif predicate == "touches":
                verdict = areal_touches_batch(Ls, R)
            elif predicate == "crosses":
                # areal x areal can never cross (DE-9IM dimension rule)
                verdict = np.zeros(len(Ls), dtype=bool)
            else:
                # contains == covers for non-degenerate areal pairs: a
                # covered 2-D geometry has interior points, which are then
                # necessarily interior to the cover
                verdict = areal_covers_batch(Ls, R)
            for k, i in enumerate(idxs):
                accum(i, verdict[k])
        return pd.Series(out, dtype=object)

    return pred


def _pairwise_predicate_udf(predicate: str):
    """Arrow pandas UDF over (left_wkb, right_wkb) pairs — see
    _pairwise_predicate_fn for the batching strategy."""
    from pyspark.sql.types import BooleanType

    return F.pandas_udf(_pairwise_predicate_fn(predicate), BooleanType())


def _with_envelope(df: DataFrame, geom_col: str, prefix: str) -> DataFrame:
    """Ensure minx/miny/maxx/maxy columns exist (from the index job or
    computed on the fly)."""
    have = {"minx", "miny", "maxx", "maxy"}.issubset(set(df.columns))
    if have:
        return df
    from ..geom.vectorized import bounds_many
    from pyspark.sql.types import DoubleType, StructField, StructType

    schema = StructType(
        df.schema.fields
        + [StructField(c, DoubleType()) for c in ("minx", "miny", "maxx", "maxy")]
    )

    def add(batches):
        for pdf in batches:
            b = bounds_many([None if v is None else bytes(v) for v in pdf[geom_col]])
            pdf["minx"], pdf["miny"], pdf["maxx"], pdf["maxy"] = (
                b[:, 0],
                b[:, 1],
                b[:, 2],
                b[:, 3],
            )
            yield pdf

    return df.mapInPandas(add, schema=schema)


def _shuffle_partitions(spark) -> int:
    """`spark.sql.shuffle.partitions` as an int — some deployments set the
    AQE-style "auto", which must fall back to defaultParallelism rather
    than throw out of the salt probe."""
    try:
        return int(spark.conf.get("spark.sql.shuffle.partitions"))
    except (TypeError, ValueError):
        return spark.sparkContext.defaultParallelism


def spatial_join(
    left: DataFrame,
    right: DataFrame,
    predicate: str = "intersects",
    how: str = "inner",
    bits: int = DEFAULT_JOIN_BITS,
    left_geom: str = "geom_wkb",
    right_geom: str = "geom_wkb",
    broadcast: bool | None = None,
    salt: int | None = None,
    left_key: str | None = None,
) -> DataFrame:
    """Spatial join two DataFrames on an exact geometry predicate.

    Returns left columns + right columns (right ones suffixed `_r` on name
    clash). `how`: inner | left (outer, null right columns for unmatched
    lefts) | left_semi | left_anti (the reference supports inner only,
    SQLRules.scala:316).

    `left_key` (default: the left DataFrame's first column) MUST be
    row-unique on the left side for `how` = left / left_semi / left_anti:
    those modes identify (un)matched left rows by an equi-(anti-)join on
    this key, so a non-matching left row that SHARES a key with any
    matching row is treated as matched (silently dropped from `left`'s
    output, in the outer case). Deduplicate the left side or pass a truly
    identifying column; the engine does not scan for duplicates because
    that would cost a count-distinct pass over the full left input.
    """
    if predicate not in ("intersects", "contains", "within", "covers", "overlaps", "crosses", "touches", "equals"):
        raise ValueError(f"unsupported predicate {predicate}")

    # r9: a small single-file scan arrives as ONE input split, and the
    # broadcast-join path PRESERVES input partitioning — so the envelope
    # UDF, the cell cover, the join and the exact refine all ran on one
    # core (measured sf1.0: the whole track_region_hits join+refine, 286k
    # candidate pairs, took 23 s single-threaded). _ensure_parallel
    # round-robins only the few-split case; true at-scale inputs arrive
    # with thousands of splits and are left untouched (guide §2).
    from .dedup import _ensure_parallel

    left = _ensure_parallel(left)
    if broadcast is not True:
        right = _ensure_parallel(right)

    L = _with_envelope(left, left_geom, "l")
    R = _with_envelope(right, right_geom, "r")

    # rename to avoid ambiguity
    lcols = [F.col(c).alias(f"l_{c}") if c in ("minx", "miny", "maxx", "maxy") else F.col(c) for c in L.columns]
    overlap = set(L.columns)
    L2 = L.select(*lcols)
    rsel = []
    for c in R.columns:
        if c in ("minx", "miny", "maxx", "maxy"):
            rsel.append(F.col(c).alias(f"r_{c}"))
        elif c in overlap:
            rsel.append(F.col(c).alias(f"{c}_r"))
        else:
            rsel.append(F.col(c))
    R2 = R.select(*rsel)

    L3 = _with_join_cells(L2, "l_", bits)
    R3 = _with_join_cells(R2, "r_", bits)

    if salt:
        # ADAPTIVE salting: a single hot cell is one join KEY, which AQE skew
        # handling cannot split — so find cells holding more rows than an
        # average shuffle partition and subdivide only those `salt` ways
        # (left rows hash-salted; right rows replicated). Cold cells pay
        # nothing. Reference analog: shard-byte key prefixes (ShardStrategy)
        # + RTREE/WEIGHTED partitioning; this is strictly more targeted.
        n_shuffle = _shuffle_partitions(left.sparkSession)
        # hot-cell detection needs only approximate counts: probe a 2% SAMPLE
        # of the left side — the total-row estimate comes from the SAME
        # sample (sum of cell counts / fraction), so salting costs ONE probe
        # job and no full count pass. A cell misclassified near the threshold
        # is harmless (salting never changes results, only partitioning).
        frac = 0.02
        probe_src = L2.sample(fraction=frac, seed=42)
        # ONE probe job returns both the sample total and the candidate hot
        # cells: only cells that could clear the 10k-row floor are collected
        # (bounds the driver list even at fine grids), and no cell that could
        # be hot is dropped since thresh >= 10000 always
        floor_cnt = int(10000 * frac)
        agg = (
            _with_join_cells(probe_src, "l_", bits)
            .groupBy("join_cell")
            .count()
            .agg(
                F.sum("count").alias("_tot"),
                F.collect_list(
                    F.when(
                        F.col("count") > floor_cnt,
                        F.struct("join_cell", "count"),
                    )
                ).alias("_cands"),
            )
            .first()
        )
        sample_total = int(agg["_tot"] or 0)
        est_total = sample_total / frac
        thresh = max(10000, int(2 * est_total) // max(1, n_shuffle))
        hot = [c["join_cell"] for c in agg["_cands"] if c["count"] > thresh * frac]
        if hot:
            is_hot_l = F.col("join_cell").isin(hot)
            L3 = L3.withColumn(
                "_salt",
                F.when(
                    is_hot_l,
                    F.pmod(F.xxhash64(F.col("l_minx"), F.col("l_miny")), F.lit(salt)),
                ).otherwise(F.lit(0)),
            )
            R3 = R3.withColumn(
                "_salt",
                F.explode(
                    F.when(
                        F.col("join_cell").isin(hot),
                        F.array(*[F.lit(i) for i in range(salt)]),
                    ).otherwise(F.array(F.lit(0)))
                ),
            )
            join_keys = ["join_cell", "_salt"]
        else:
            salt = None
            join_keys = ["join_cell"]
    else:
        join_keys = ["join_cell"]

    if broadcast is None:
        # automatic broadcast-vs-sort-merge selection (north rule): broadcast
        # the exploded right side when it is small enough to ship to every
        # executor; otherwise let Spark pick hash/sort-merge on the cell key.
        try:
            thresh = int(os.environ.get("GEOMESA_SPARK_BROADCAST_ROWS", "200000"))
            # probe the RAW right input (1:1 with R): limit+count early-stops
            # and never executes the envelope UDF, so the probe job is a
            # cheap scan rather than a full second execution of R's lineage
            broadcast = right.limit(thresh + 1).count() <= thresh
        except Exception:
            broadcast = False
    right_side = F.broadcast(R3) if broadcast else R3

    bbox_overlap = (
        (F.col("l_minx") <= F.col("r_maxx"))
        & (F.col("l_maxx") >= F.col("r_minx"))
        & (F.col("l_miny") <= F.col("r_maxy"))
        & (F.col("l_maxy") >= F.col("r_miny"))
    )

    joined = L3.join(right_side, on=join_keys, how="inner").filter(
        bbox_overlap & _ref_cell_cond(bits)
    )

    pred_udf = _pairwise_predicate_udf(predicate)
    rgeom = right_geom if right_geom not in overlap else f"{right_geom}_r"
    exact = joined.filter(pred_udf(F.col(left_geom), F.col(rgeom)))

    drop = ["join_cell", "l_minx", "l_miny", "l_maxx", "l_maxy", "r_minx", "r_miny", "r_maxx", "r_maxy"]
    if salt:
        drop.append("_salt")
    result = exact.drop(*drop)

    if how == "inner":
        return result
    if how in ("left_semi", "left_anti"):
        key = left_key or left.columns[0]
        keys = result.select(key).dropDuplicates()
        return left.join(keys, on=key, how=how)
    if how == "left":
        # left-outer: matching pairs + one null-right row per unmatched
        # left (beyond the reference's inner-only join planner). The
        # unmatched side is an anti join on the left key — no second
        # spatial pass.
        key = left_key or left.columns[0]
        keys = result.select(key).dropDuplicates()
        missing = left.join(keys, on=key, how="left_anti")
        for f in result.schema.fields:
            if f.name not in missing.columns:
                missing = missing.withColumn(
                    f.name, F.lit(None).cast(f.dataType)
                )
        return result.unionByName(missing.select(result.columns))
    raise ValueError(f"unsupported how={how}")


_POLAR_NORTH, _POLAR_SOUTH = 2_000_000_000, -2_000_000_000  # sentinel jcy


def _cell_struct(x, y):
    return F.struct(x.alias("jcx"), y.alias("jcy"))


def _distance_cell_cover(meters: float, lx, ly):
    """Array<struct(jcx,jcy)> of grid cells a LEFT distance_join row must
    probe: (2k+1) x 3 cells with k = ceil(dlon/cell) — 9 at mid-latitudes —
    or ONE polar sentinel for pole-touching rows. Module-level so the
    explode factor is assertable in tests (test_distance_join)."""
    import math

    from ..geom.algorithms import EARTH_MEAN_RADIUS_M

    d_deg = math.degrees(meters / EARTH_MEAN_RADIUS_M)
    cell = max(d_deg, 1e-4)
    n_lon = int(math.ceil(360.0 / cell))
    cx = F.floor((lx + 180.0) / F.lit(cell)).cast("long")
    cy = F.floor((ly + 90.0) / F.lit(cell)).cast("long")
    # exact disc lon half-width at this latitude (spherical-cap bbox rule);
    # pole-touching rows never reach this branch (sentinel path below)
    clat = F.cos(F.radians(ly))
    dlon = F.degrees(
        F.asin(
            F.least(F.lit(1.0), F.lit(math.sin(meters / EARTH_MEAN_RADIUS_M)) / clat)
        )
    )
    # lon neighbor count: ceil(dlon/cell) is exact for non-wrapping pairs
    # (|u1-u2| <= k implies |floor(u1)-floor(u2)| <= k), but the cell ring
    # spans n_lon*cell >= 360 deg — the wrap from cell n_lon-1 to cell 0
    # jumps a PHANTOM gap of up to one cell, so a pair straddling the
    # antimeridian can sit k+1 ring-cells apart. Rows whose window touches
    # the seam take the +1; mid-longitude rows keep the tight cover.
    # Clamped at half the ring (beyond it the pmod wrap adds nothing).
    k0 = F.ceil(dlon / F.lit(cell))
    seam = (cx <= k0) | (cx >= F.lit(n_lon - 1) - k0)
    k = F.least(
        k0 + F.when(seam, F.lit(1)).otherwise(F.lit(0)), F.lit(n_lon // 2 + 1)
    ).cast("int")
    normal_cells = F.flatten(
        F.transform(
            F.array_distinct(
                F.transform(
                    F.sequence(-k, k), lambda d: F.pmod(cx + d, F.lit(n_lon))
                )
            ),
            lambda jx: F.transform(
                F.sequence(cy - 1, cy + 1), lambda jy: _cell_struct(jx, jy)
            ),
        )
    )
    north_l = ly + F.lit(d_deg) >= F.lit(90.0)
    south_l = ly - F.lit(d_deg) <= F.lit(-90.0)

    def sent(jy):
        return F.array(_cell_struct(F.lit(-1).cast("long"), F.lit(jy).cast("long")))

    return (
        F.when(north_l, sent(_POLAR_NORTH))
        .when(south_l, sent(_POLAR_SOUTH))
        .otherwise(normal_cells)
    )


def _distance_cell_cover_right(meters: float, rx, ry):
    """Array<struct(jcx,jcy)> for a RIGHT distance_join row: its own grid
    cell, plus each polar sentinel it is reachable from (within 2*d_deg of
    that pole — the only rows a pole-touching left can match)."""
    import math

    from ..geom.algorithms import EARTH_MEAN_RADIUS_M

    d_deg = math.degrees(meters / EARTH_MEAN_RADIUS_M)
    cell = max(d_deg, 1e-4)
    n_lon = int(math.ceil(360.0 / cell))
    r_normal = _cell_struct(
        F.pmod(F.floor((rx + 180.0) / F.lit(cell)).cast("long"), F.lit(n_lon)),
        F.floor((ry + 90.0) / F.lit(cell)).cast("long"),
    )
    return F.filter(
        F.array(
            r_normal,
            F.when(
                ry + F.lit(2.0 * d_deg) >= F.lit(90.0),
                _cell_struct(F.lit(-1).cast("long"), F.lit(_POLAR_NORTH).cast("long")),
            ),
            F.when(
                ry - F.lit(2.0 * d_deg) <= F.lit(-90.0),
                _cell_struct(F.lit(-1).cast("long"), F.lit(_POLAR_SOUTH).cast("long")),
            ),
        ),
        lambda c: c.isNotNull(),
    )


def distance_join(
    left: DataFrame,
    right: DataFrame,
    meters: float,
    left_lon: str = "x",
    left_lat: str = "y",
    right_lon: str = "x",
    right_lat: str = "y",
) -> DataFrame:
    """Geodesic distance-bounded pair join for two POINT tables — st_dwithin
    as a JOIN predicate (the reference's join planner accepts st_dwithin
    conditions, SQLRules.scala join-rewrite path; this is the batch sibling
    of streaming.stream_stream_proximity_join, same provable cell cover).

    Plan: both sides key on a lat/lon grid whose cell width is the angular
    radius; the LEFT side explodes to the latitude-aware neighbor cells
    (exact asin(sin r/cos lat) lon bound, ceil(dlon/cell) lon cells and +-1
    lat cells — |dlat| <= d_deg <= cell, so one lat cell of slack is exact,
    and |floor(u1)-floor(u2)| <= k whenever |u1-u2| <= k makes
    k = ceil(dlon/cell) exact for the lon axis: a 3x3 cover at
    mid-latitudes, vs the 5x5 the first version shipped), the RIGHT keeps
    its single cell, so each qualifying pair meets in EXACTLY one bucket
    (no dedup); one shuffle equi-join, exact haversine refine, all columns
    codegen'd — no Python in the join at all.

    Pole handling: a left disc that reaches a pole would need the FULL lon
    ring (up to 2*ceil(180/cell)+1 cells — millions for metre-scale radii,
    an executor-OOM skew risk). Those rows instead emit a single polar
    sentinel bucket (jcx=-1, impossible for pmod cells); right rows within
    2*d_deg of a pole — the only ones a pole-touching left can match —
    additionally emit that sentinel. Each qualifying pair still meets
    exactly once: a pole-touching left emits exactly ONE sentinel (north
    wins when the disc spans both poles, only possible at d_deg >= 90), a
    non-polar left never emits one, and a right emits each sentinel at
    most once.

    Returns left columns + right columns (right renamed `r_<name>` on
    clash) + dist_m."""
    from .dedup import _ensure_parallel
    from .knn import haversine_col

    # single-split scans otherwise run the (interpreted, per-element) cell
    # cover explode and the whole shuffle-map stage on one core (guide §2)
    left = _ensure_parallel(left)
    right = _ensure_parallel(right)

    overlap = set(left.columns) & set(right.columns)
    R = right.select(
        *[F.col(c).alias(f"r_{c}") if c in overlap else F.col(c) for c in right.columns]
    )
    r_lon = f"r_{right_lon}" if right_lon in overlap else right_lon
    r_lat = f"r_{right_lat}" if right_lat in overlap else right_lat

    lx, ly = F.col(left_lon), F.col(left_lat)
    rx, ry = F.col(r_lon), F.col(r_lat)
    l_cells = _distance_cell_cover(meters, lx, ly)
    L = (
        left.withColumn("_jc", F.explode(l_cells))
        .withColumn("jcx", F.col("_jc.jcx"))
        .withColumn("jcy", F.col("_jc.jcy"))
        .drop("_jc")
    )
    r_cells = _distance_cell_cover_right(meters, rx, ry)
    Rk = (
        R.withColumn("_jc", F.explode(r_cells))
        .withColumn("jcx", F.col("_jc.jcx"))
        .withColumn("jcy", F.col("_jc.jcy"))
        .drop("_jc")
    )
    dist = haversine_col(lx, ly, rx, ry)
    return (
        L.join(Rk, ["jcx", "jcy"])
        .filter(dist <= F.lit(float(meters)))
        .withColumn("dist_m", dist)
        .drop("jcx", "jcy")
    )
