"""Complete DE-9IM predicate parity with the reference's
SparkSQLSpatialRelationshipsTest direct assertions (every predicate x every
fixture geometry, ported verbatim). Kernel-level for speed; the SQL layer is
a thin null-safe wrapper already covered by test_functions_sql."""

import pytest

from geomesa_spark.geom import algorithms as alg
from geomesa_spark.geom.wkt import from_wkt

BOX_REF = "POLYGON((0 0, 0 10, 10 10, 10 0, 0 0))"
LINE_REF = "LINESTRING(0 10, 0 -10)"

POINTS = {
    "int": "POINT(5 5)",
    "edge": "POINT(0 5)",
    "corner": "POINT(0 0)",
    "ext": "POINT(-5 0)",
}
LINES = {
    "touches": "LINESTRING(0 0, 1 0)",
    "crosses": "LINESTRING(-1 0, 1 0)",
    "disjoint": "LINESTRING(1 0, 2 0)",
}
BOXES = {
    "int": "POLYGON((1 1, 1 2, 2 2, 2 1, 1 1))",
    "intEdge": "POLYGON((0 1, 0 2, 1 2, 1 1, 0 1))",
    "overlap": "POLYGON((-1 1, -1 2, 1 2, 1 1, -1 1))",
    "extEdge": "POLYGON((-1 1, -1 2, 0 2, 0 1, -1 1))",
    "ext": "POLYGON((-2 1, -2 2, -1 2, -1 1, -2 1))",
    "corner": "POLYGON((-1 -1, -1 0, 0 0, 0 -1, -1 -1))",
}

# (predicate, g1, g2, expected) — ported from
# SparkSQLSpatialRelationshipsTest.scala testDirect assertions
CASES = []
for nm, exp in [("int", True), ("edge", False), ("corner", False), ("ext", False)]:
    CASES.append(("contains", BOX_REF, POINTS[nm], exp))
for nm, exp in [("int", True), ("intEdge", True), ("overlap", False),
                ("extEdge", False), ("ext", False), ("corner", False)]:
    CASES.append(("contains", BOX_REF, BOXES[nm], exp))
for nm, exp in [("int", True), ("edge", True), ("corner", True), ("ext", False)]:
    CASES.append(("covers", BOX_REF, POINTS[nm], exp))
for nm, exp in [("int", True), ("intEdge", True), ("overlap", False),
                ("extEdge", False), ("ext", False), ("corner", False)]:
    CASES.append(("covers", BOX_REF, BOXES[nm], exp))
for nm, exp in [("touches", False), ("crosses", True), ("disjoint", False)]:
    CASES.append(("crosses", LINE_REF, LINES[nm], exp))
for nm, exp in [("int", False), ("edge", False), ("corner", False), ("ext", True)]:
    CASES.append(("disjoint", BOX_REF, POINTS[nm], exp))
for nm, exp in [("int", False), ("intEdge", False), ("overlap", False),
                ("extEdge", False), ("ext", True), ("corner", False)]:
    CASES.append(("disjoint", BOX_REF, BOXES[nm], exp))
CASES += [
    ("equals", "POINT(0 0)", POINTS["corner"], True),
    ("equals", "POINT(0 0)", POINTS["edge"], False),
    ("equals", "LINESTRING(0 0, 1 1)", "LINESTRING(1 1, 0 0)", True),
    ("equals", BOX_REF, "POLYGON((10 0, 10 10, 0 10, 0 0, 10 0))", True),
]
for nm, exp in [("int", True), ("edge", True), ("corner", True), ("ext", False)]:
    CASES.append(("intersects", BOX_REF, POINTS[nm], exp))
for nm, exp in [("int", True), ("intEdge", True), ("overlap", True),
                ("extEdge", True), ("ext", False), ("corner", True)]:
    CASES.append(("intersects", BOX_REF, BOXES[nm], exp))
for nm in POINTS:
    CASES.append(("overlaps", BOX_REF, POINTS[nm], False))
for nm, exp in [("int", False), ("intEdge", False), ("overlap", True),
                ("extEdge", False), ("ext", False), ("corner", False)]:
    CASES.append(("overlaps", BOX_REF, BOXES[nm], exp))
for nm, exp in [("int", False), ("edge", True), ("corner", True), ("ext", False)]:
    CASES.append(("touches", BOX_REF, POINTS[nm], exp))
for nm, exp in [("int", False), ("intEdge", False), ("overlap", False),
                ("extEdge", True), ("ext", False), ("corner", True)]:
    CASES.append(("touches", BOX_REF, BOXES[nm], exp))
for nm, exp in [("int", True), ("edge", False), ("corner", False), ("ext", False)]:
    CASES.append(("within", POINTS[nm], BOX_REF, exp))
for nm, exp in [("int", True), ("intEdge", True), ("overlap", False),
                ("extEdge", False), ("ext", False), ("corner", False)]:
    CASES.append(("within", BOXES[nm], BOX_REF, exp))


@pytest.mark.parametrize("pred,g1,g2,expected", CASES)
def test_direct(pred, g1, g2, expected):
    fn = getattr(alg, pred)
    assert fn(from_wkt(g1), from_wkt(g2)) is expected, (pred, g1, g2)


def test_relate_golden():
    # reference: st_relate(LINESTRING(1 2,3 4), LINESTRING(5 6,7 8)) = FF1FF0102
    m = alg.relate(from_wkt("LINESTRING(1 2, 3 4)"), from_wkt("LINESTRING(5 6, 7 8)"))
    assert m == "FF1FF0102"
    assert alg.relate_bool(
        from_wkt("LINESTRING(1 2, 3 4)"), from_wkt("LINESTRING(5 6, 7 8)"), "FF*FF****"
    )
