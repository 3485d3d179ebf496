"""Property-based tests (hypothesis) for the geometry kernel and SFC math —
the reference test style is seeded-random invariants (SURVEY §5); hypothesis
widens the seed space."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from geomesa_spark.geom import algorithms as alg
from geomesa_spark.geom import box, from_wkb, from_wkt, point, to_wkb, to_wkt
from geomesa_spark.geom.core import linestring, polygon
from geomesa_spark.index.zorder import (
    Z2_BITS,
    deinterleave2,
    interleave2,
    z2_index,
)

coord = st.floats(
    min_value=-180, max_value=180, allow_nan=False, allow_infinity=False, width=32
)
lat = st.floats(min_value=-90, max_value=90, allow_nan=False, allow_infinity=False, width=32)


@given(coord, lat)
@settings(max_examples=200, deadline=None)
def test_point_wkb_roundtrip(x, y):
    g = point(x, y)
    assert to_wkt(from_wkb(to_wkb(g))) == to_wkt(g)


@given(st.lists(st.tuples(coord, lat), min_size=2, max_size=12))
@settings(max_examples=100, deadline=None)
def test_linestring_roundtrips(coords):
    g = linestring(coords)
    assert to_wkt(from_wkt(to_wkt(g))) == to_wkt(g)
    assert to_wkt(from_wkb(to_wkb(g))) == to_wkt(g)


@given(coord, lat, st.floats(0.01, 10), st.floats(0.01, 10))
@settings(max_examples=100, deadline=None)
def test_predicate_consistency(cx, cy, w, h):
    """contains(a,b) == within(b,a); intersects symmetric; disjoint = !intersects."""
    a = box(cx - w, cy - h, cx + w, cy + h)
    b = box(cx - w / 2, cy - h / 3, cx + w / 3, cy + h / 2)
    assert alg.contains(a, b) == alg.within(b, a)
    assert alg.intersects(a, b) == alg.intersects(b, a)
    assert alg.disjoint(a, b) == (not alg.intersects(a, b))
    # a constructed inner box is always contained
    assert alg.intersects(a, b)


@given(st.integers(0, 2**31 - 1), st.integers(0, 2**31 - 1))
@settings(max_examples=300, deadline=None)
def test_interleave_roundtrip_prop(x, y):
    z = interleave2([x], [y])
    rx, ry = deinterleave2(z)
    assert rx[0] == x and ry[0] == y


@given(coord, lat, coord, lat)
@settings(max_examples=100, deadline=None)
def test_z2_order_preserves_locality(x1, y1, x2, y2):
    """Equal points share a cell; z values are within the 62-bit domain."""
    z = z2_index([x1, x1, x2], [y1, y1, y2])
    assert z[0] == z[1]
    assert 0 <= z[0] < 2**62 and 0 <= z[2] < 2**62


@given(st.lists(st.tuples(coord, lat), min_size=3, max_size=20))
@settings(max_examples=100, deadline=None)
def test_convex_hull_contains_all_points(pts):
    h = alg.convex_hull(np.array(pts))
    if h.dimension() < 2:
        return
    for x, y in pts:
        assert alg.locate(float(x), float(y), h) != alg.EXTERIOR


@given(coord, lat, st.floats(10, 1_000_000))
@settings(max_examples=50, deadline=None)
def test_haversine_triangle_band(x, y, d):
    """Distance to a geodesic-buffered circle's vertices ~ the radius."""
    if abs(y) > 85:
        return
    g = alg.buffer_point_geodesic(x, y, d, n=16)
    for vx, vy in np.asarray(g.coords[0])[:-1]:
        got = float(alg.haversine(x, y, vx, vy))
        assert abs(got - d) < max(1.0, d * 0.01)
