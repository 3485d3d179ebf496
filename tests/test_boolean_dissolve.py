"""Round-3 items #5/#6: dissolved boolean output + total boolean coverage.

- st_intersection / st_difference of concave or holed polygon pairs return
  the DISSOLVED maximal-ring (multi)polygon (JTS OverlayOp shape), not a
  triangle tessellation: ring counts are asserted, areas stay exact.
- Every valid WKT type pair (point/line/polygon/multis/collections) goes
  through intersection() and difference() without NotImplementedError.
- line - line removes collinear overlaps; line x line returns shared 1-D
  parts as lines.
"""

import itertools

import numpy as np
import pytest

from geomesa_spark.geom import algorithms as alg
from geomesa_spark.geom.core import MULTIPOLYGON, POLYGON
from geomesa_spark.geom.wkt import from_wkt, to_wkt

HOLED = "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
CONCAVE = "POLYGON ((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))"


def _rings(g):
    return alg._polygons_of(g)


# ---------------------------------------------------------------- dissolve


def test_intersection_holed_is_dissolved():
    """Square straddling the hole rim: ONE shell + ONE hole, area 20."""
    I = alg.intersection(from_wkt(HOLED), from_wkt("POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))"))
    assert I.gtype == POLYGON
    rings = _rings(I)
    assert len(rings) == 1 and len(rings[0]) == 2  # shell + hole
    assert alg.area(I) == pytest.approx(20.0)
    # ring is minimal: 4 corners + closing vertex
    assert len(rings[0][0]) == 5 and len(rings[0][1]) == 5


def test_intersection_concave_is_dissolved():
    I = alg.intersection(from_wkt(CONCAVE), from_wkt("POLYGON ((1 1, 5 1, 5 5, 1 5, 1 1))"))
    assert I.gtype == POLYGON
    rings = _rings(I)
    assert len(rings) == 1 and len(rings[0]) == 1
    assert alg.area(I) == pytest.approx(7.0)
    assert len(rings[0][0]) == 7  # L-shaped hexagon + closing vertex


def test_difference_cuts_hole_dissolved():
    D = alg.difference(
        from_wkt("POLYGON ((2 2, 8 2, 8 8, 2 8, 2 2))"),
        from_wkt("POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))"),
    )
    assert D.gtype == POLYGON
    rings = _rings(D)
    assert len(rings) == 1 and len(rings[0]) == 2
    assert alg.area(D) == pytest.approx(32.0)


def test_difference_splits_to_multipolygon():
    D = alg.difference(
        from_wkt("POLYGON ((0 0, 10 0, 10 2, 0 2, 0 0))"),
        from_wkt("POLYGON ((4 -1, 6 -1, 6 3, 4 3, 4 -1))"),
    )
    assert D.gtype == MULTIPOLYGON
    assert len(_rings(D)) == 2
    assert alg.area(D) == pytest.approx(16.0)
    for rings in _rings(D):
        assert len(rings) == 1 and len(rings[0]) == 5  # two clean rectangles


def test_dissolved_region_equals_tessellation_area():
    """Random concave pairs: dissolve preserves area exactly and output
    predicates behave like a region (roundtrips through WKT)."""
    rng = np.random.default_rng(9)

    def star(cx, cy, radii):
        ang = np.linspace(0, 2 * np.pi, len(radii), endpoint=False)
        pts = [(cx + r * np.cos(t), cy + r * np.sin(t)) for r, t in zip(radii, ang)]
        pts.append(pts[0])
        return "POLYGON ((" + ", ".join(f"{x:.5f} {y:.5f}" for x, y in pts) + "))"

    for _ in range(25):
        A = from_wkt(star(*rng.uniform(-1, 1, 2), rng.uniform(1, 3, 7)))
        B = from_wkt(star(*rng.uniform(-1, 1, 2), rng.uniform(1, 3, 9)))
        I = alg.intersection(A, B)
        D = alg.difference(A, B)
        # inclusion-exclusion: area(A) == area(A∩B) + area(A∖B)
        assert alg.area(I) + alg.area(D) == pytest.approx(alg.area(A), abs=1e-7)
        if not I.is_empty():
            from_wkt(to_wkt(I))  # valid WKT roundtrip


# ------------------------------------------------- total boolean coverage


COMBO_WKTS = [
    "POINT (1 1)",
    "MULTIPOINT ((1 1), (5 5))",
    "LINESTRING (0 0, 4 4)",
    "MULTILINESTRING ((0 0, 4 0), (0 2, 4 2))",
    "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
    HOLED,
    CONCAVE,
    "MULTIPOLYGON (((0 0, 2 0, 2 2, 0 2, 0 0)), ((5 5, 7 5, 7 7, 5 7, 5 5)))",
    "GEOMETRYCOLLECTION (POINT (1 1), LINESTRING (0 0, 3 3), "
    "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)))",
]


@pytest.mark.parametrize(
    "wa,wb", list(itertools.product(COMBO_WKTS, COMBO_WKTS))
)
def test_boolean_combo_total(wa, wb):
    """No NotImplementedError for ANY valid type pair; results satisfy the
    basic region laws that hold for every combination."""
    A, B = from_wkt(wa), from_wkt(wb)
    I = alg.intersection(A, B)
    D = alg.difference(A, B)
    # intersection is within both inputs' envelopes (loose sanity)
    if not I.is_empty():
        ib = I.bounds()
        ab, bb = A.bounds(), B.bounds()
        eps = 1e-9
        assert ib[0] >= max(ab[0], bb[0]) - eps and ib[2] <= min(ab[2], bb[2]) + eps
    # difference never exceeds A's dimension or envelope
    if not D.is_empty():
        db, ab = D.bounds(), A.bounds()
        assert D.dimension() <= A.dimension()
        assert db[0] >= ab[0] - 1e-9 and db[2] <= ab[2] + 1e-9


def test_line_minus_line_collinear_overlap():
    A = from_wkt("LINESTRING (0 0, 10 0)")
    B = from_wkt("LINESTRING (4 0, 6 0)")
    D = alg.difference(A, B)
    assert D.type_name == "MultiLineString"
    segs = sorted(tuple(map(tuple, np.asarray(s))) for s in D.coords)
    assert segs == [(((0.0, 0.0)), (4.0, 0.0)), ((6.0, 0.0), (10.0, 0.0))]
    assert alg.length(D) == pytest.approx(8.0)
    # a mere crossing removes nothing
    X = alg.difference(A, from_wkt("LINESTRING (5 -1, 5 1)"))
    assert alg.length(X) == pytest.approx(10.0)


def test_line_intersection_collinear_returns_line():
    I = alg.intersection(
        from_wkt("LINESTRING (0 0, 10 0)"), from_wkt("LINESTRING (4 0, 6 0)")
    )
    assert I.dimension() == 1
    assert alg.length(I) == pytest.approx(2.0)


def test_collection_intersection_componentwise():
    GC = from_wkt(
        "GEOMETRYCOLLECTION (POINT (1 1), POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0)))"
    )
    box = from_wkt("POLYGON ((0.5 0.5, 3 0.5, 3 3, 0.5 3, 0.5 0.5))")
    I = alg.intersection(GC, box)
    assert I.type_name == "GeometryCollection"
    assert alg.area(I) == pytest.approx(1.5 * 1.5)
    D = alg.difference(GC, box)
    # the point (1,1) is inside box -> removed; polygon loses the overlap
    assert alg.area(D) == pytest.approx(4.0 - 2.25)


# --------- regressions folded from the round-advice files (round-5 hygiene)


def test_line_difference_no_ulp_fragmentation():
    from geomesa_spark.geom.core import LINESTRING

    # 0.1 + (0.3 - 0.1) != 0.3 in binary floats — the interior vertex used
    # to fragment the result into a MultiLineString
    a = from_wkt("LINESTRING (0.1 0, 0.3 0, 0.7 0)")
    b = from_wkt("LINESTRING (5 5, 6 6)")  # disjoint
    d = alg.difference(a, b)
    assert d.gtype == LINESTRING, d.type_name
    assert len(d.coords) == 3


def test_rect_intersection_holed_sliver_pieces_dissolve():
    # A convex rect clipped by a holed polygon's tessellation emits
    # zero-area sliver pieces along the hole ring; their doubled edges
    # used to sever real boundary edges in dissolve_pieces (count 3 fails
    # the appears-once test) and the whole intersection came back EMPTY.
    # Found by the exact oracle via _hole_exterior_overlap returning a
    # false negative (contains over a partially-covered sibling hole).
    rect = from_wkt("POLYGON ((1 1, 4 1, 4 4, 1 4, 1 1))")
    holed = from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 2 1, 2 2, 1 2, 1 1))")
    I = alg.intersection_areal(rect, holed)
    assert not I.is_empty()
    assert alg.area(I) == pytest.approx(8.0)
    # and the symmetric difference direction stays consistent
    D = alg.difference_areal(I, holed)
    assert alg.area(D) == pytest.approx(0.0)
