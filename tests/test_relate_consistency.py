"""DE-9IM self-consistency sweep: laws that must hold for EVERY pair
(regression net for the 'exotic corner case' tail):

- transpose law: relate(a,b) is the transpose of relate(b,a)
- intersects == not disjoint == (some of II/IB/BI/BB non-empty)
- within(a,b) == contains(b,a); equals implies within and contains
- for areal pairs, relate-derived intersects agrees with the INDEPENDENT
  batch decider (vectorized ray-casts + proper crossings)
"""

import numpy as np
import pytest

from geomesa_spark.geom import algorithms as alg
from geomesa_spark.geom.core import MULTIPOLYGON, POLYGON
from geomesa_spark.geom.wkt import from_wkt
from geomesa_spark.geom.vectorized import areal_intersects_batch


def _star(cx, cy, radii, rot=0.0):
    ang = rot + np.linspace(0, 2 * np.pi, len(radii), endpoint=False)
    pts = [(cx + r * np.cos(a), cy + r * np.sin(a)) for r, a in zip(radii, ang)]
    pts.append(pts[0])
    return "POLYGON ((" + ", ".join(f"{x:.5f} {y:.5f}" for x, y in pts) + "))"


def _fixtures():
    rng = np.random.default_rng(21)
    geoms = []
    for _ in range(12):
        cx, cy = rng.uniform(-4, 4, 2)
        geoms.append(
            from_wkt(_star(cx, cy, rng.uniform(0.5, 3, 7), rng.uniform(0, 3)))
        )
    geoms.append(
        from_wkt("POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0), (1 1, 3 1, 3 3, 1 3, 1 1))")
    )
    geoms.append(from_wkt("LINESTRING (-3 -3, 3 3)"))
    geoms.append(from_wkt("LINESTRING (0 0, 4 0)"))
    geoms.append(from_wkt("POINT (1 1)"))
    geoms.append(from_wkt("MULTIPOINT ((0 0), (2 2))"))
    geoms.append(
        from_wkt("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((2 2, 3 2, 3 3, 2 3, 2 2)))")
    )
    return geoms


GEOMS = _fixtures()


@pytest.mark.parametrize("i", range(len(GEOMS)))
def test_relate_laws_per_row(i):
    a = GEOMS[i]
    for b in GEOMS:
        m = alg.relate(a, b)
        mt = alg.relate(b, a)
        M = [m[0:3], m[3:6], m[6:9]]
        T = [mt[0:3], mt[3:6], mt[6:9]]
        for r in range(3):
            for c in range(3):
                assert M[r][c] == T[c][r], (m, mt)
        inter = alg.intersects(a, b)
        assert inter != alg.disjoint(a, b)
        assert inter == any(m[k] != "F" for k in (0, 1, 3, 4)), m
        assert alg.within(a, b) == alg.contains(b, a)
        if alg.equals(a, b):
            assert alg.within(a, b) and alg.contains(a, b)
        if a.gtype in (POLYGON, MULTIPOLYGON) and b.gtype in (POLYGON, MULTIPOLYGON):
            assert bool(areal_intersects_batch([a], b)[0]) == inter, m


# --------------------------- degenerate-position DE-9IM goldens (round 4)

DEGENERATE_GOLDENS = [
    # (name, wkt_a, wkt_b, expected relate(a, b))  — hand-derived matrices
    # for shared-boundary / collinear / vertex-touch positions, the cases
    # the relate() docstring flags as approximation-risk. The transpose law
    # below cross-checks each derivation.
    ("edge-adjacent squares", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
     "POLYGON ((1 0, 2 0, 2 1, 1 1, 1 0))", "FF2F11212"),
    ("corner-touching squares", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
     "POLYGON ((1 1, 2 1, 2 2, 1 2, 1 1))", "FF2F01212"),
    ("within sharing two corner edges", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
     "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))", "2FF11F212"),
    ("contains sharing two corner edges", "POLYGON ((0 0, 4 0, 4 4, 0 4, 0 0))",
     "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "212F11FF2"),
    ("equal squares", "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))",
     "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "2FFF1FFF2"),
    ("partial collinear edge overlap", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))",
     "POLYGON ((2 1, 4 1, 4 3, 2 3, 2 1))", "FF2F11212"),
    ("line along polygon edge", "LINESTRING (0 0, 1 0)",
     "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "F1FF0F212"),
    ("collinear line overlap", "LINESTRING (0 0, 2 0)",
     "LINESTRING (1 0, 3 0)", "1010F0102"),
    ("line through polygon corners", "LINESTRING (-1 -1, 2 2)",
     "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "101FF0212"),
    ("point on polygon corner", "POINT (0 0)",
     "POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "F0FFFF212"),
    # a polygon exactly filling another's hole: boundaries coincide but the
    # interiors are disjoint AND the filler's interior is in the holed
    # polygon's EXTERIOR (the round-4 relate() interior-evidence fix)
    ("hole filler", "POLYGON ((3 3, 7 3, 7 7, 3 7, 3 3))",
     "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))",
     "FF2F1F212"),
]


@pytest.mark.parametrize("name,wa,wb,want", DEGENERATE_GOLDENS)
def test_degenerate_position_relate_goldens(name, wa, wb, want):
    a, b = from_wkt(wa), from_wkt(wb)
    assert alg.relate(a, b) == want, name
    # transpose law cross-checks the hand derivation itself
    m = alg.relate(b, a)
    t = want[0] + want[3] + want[6] + want[1] + want[4] + want[7] + want[2] + want[5] + want[8]
    assert m == t, (name, m, t)
