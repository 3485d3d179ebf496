"""Vectorized extent x extent join refine (round-3 item #3).

areal_intersects_batch decides closed-set intersects for a batch of areal
geometries against one areal geometry with ray casts + proper-crossing
tests — no per-pair Python in the refine for polygon x polygon joins.
Parity is pinned against the exact per-pair DE-9IM kernel on adversarial
shapes: concave, holed, touching, crossing, hole-contained."""

import numpy as np
import pandas as pd
import pytest

from geomesa_spark.geom import algorithms as alg
from geomesa_spark.geom.vectorized import areal_intersects_batch
from geomesa_spark.geom.wkt import from_wkt
from geomesa_spark.operators.spatial_join import spatial_join
from geomesa_spark.sources.docs import DOCS_SCHEMA, index_docs


def _star(cx, cy, radii, rot=0.0):
    """Simple star polygon (always non-self-intersecting)."""
    n = len(radii)
    ang = rot + np.linspace(0, 2 * np.pi, n, endpoint=False)
    pts = [(cx + r * np.cos(a), cy + r * np.sin(a)) for r, a in zip(radii, ang)]
    pts.append(pts[0])
    return "POLYGON ((" + ", ".join(f"{x:.6f} {y:.6f}" for x, y in pts) + "))"


HOLED = (
    "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0), (3 3, 7 3, 7 7, 3 7, 3 3))"
)
CONCAVE_L = "POLYGON ((0 0, 6 0, 6 2, 2 2, 2 6, 0 6, 0 0))"
PLUS_V = "POLYGON ((4 -1, 6 -1, 6 11, 4 11, 4 -1))"  # vertical bar
PLUS_H = "POLYGON ((-1 4, 11 4, 11 6, -1 6, -1 4))"  # horizontal bar


@pytest.mark.parametrize(
    "a_wkt,b_wkt,expect",
    [
        (PLUS_V, PLUS_H, True),  # cross overlap: all vertices mutually outside
        (CONCAVE_L, "POLYGON ((3 3, 5 3, 5 5, 3 5, 3 3))", False),  # in the notch
        ("POLYGON ((4 4, 6 4, 6 6, 4 6, 4 4))", HOLED, False),  # inside the hole
        ("POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))", HOLED, True),  # straddles hole rim
        ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "POLYGON ((2 2, 4 2, 4 4, 2 4, 2 2))", True),  # vertex touch
        ("POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))", "POLYGON ((2 0, 4 0, 4 2, 2 2, 2 0))", True),  # edge touch
        ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))", False),  # disjoint
        (HOLED, "POLYGON ((-5 -5, 15 -5, 15 15, -5 15, -5 -5))", True),  # A inside B
        ("MULTIPOLYGON (((0 0, 1 0, 1 1, 0 1, 0 0)), ((8 8, 9 8, 9 9, 8 9, 8 8)))", HOLED, True),
    ],
)
def test_batch_decider_golden_cases(a_wkt, b_wkt, expect):
    A, B = from_wkt(a_wkt), from_wkt(b_wkt)
    assert bool(areal_intersects_batch([A], B)[0]) is expect
    # and the per-pair kernel agrees (sanity on the golden truth)
    assert alg.intersects(A, B) is expect


def test_batch_decider_random_parity():
    """300 random concave-star pairs: batch verdicts == per-pair kernel."""
    rng = np.random.default_rng(12)
    rights = [
        from_wkt(_star(0, 0, rng.uniform(1, 5, size=9), rot=rng.uniform(0, 3))),
        from_wkt(HOLED),
        from_wkt(CONCAVE_L),
    ]
    lefts = []
    for _ in range(100):
        cx, cy = rng.uniform(-8, 12, size=2)
        lefts.append(from_wkt(_star(cx, cy, rng.uniform(0.5, 4, size=7), rot=rng.uniform(0, 3))))
    for B in rights:
        got = areal_intersects_batch(lefts, B)
        want = np.array([alg.intersects(A, B) for A in lefts])
        assert (got == want).all(), np.nonzero(got != want)


def _poly_doc(doc_id, wkt):
    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": "text", "text": "body", "media_ref": "", "offset": 0},
            {"kind": "geo", "text": wkt, "media_ref": "", "offset": 1},
            {"kind": "time", "text": "2016-01-02T00:00:00.000Z", "media_ref": "", "offset": 2},
        ],
    }


def test_concave_polygon_join_row_parity(spark):
    """Concave x concave spatial join (parcels x admin-areas shape): row-SET
    parity vs the brute-force kernel — exercises the batched refine, not the
    per-pair fallback."""
    rng = np.random.default_rng(3)
    left_rows, lgeos = [], {}
    for i in range(120):
        cx, cy = rng.uniform(-2.5, 2.5, size=2)
        w = _star(cx, cy, rng.uniform(0.1, 0.8, size=7), rot=rng.uniform(0, 3))
        left_rows.append(_poly_doc(f"L{i:03d}", w))
        lgeos[f"L{i:03d}"] = from_wkt(w)
    right_rows, rgeos = [], {}
    for i in range(15):
        cx, cy = rng.uniform(-2.0, 2.0, size=2)
        w = _star(cx, cy, rng.uniform(0.4, 1.6, size=9), rot=rng.uniform(0, 3))
        right_rows.append(_poly_doc(f"R{i:02d}", w))
        rgeos[f"R{i:02d}"] = from_wkt(w)
    left = index_docs(spark.createDataFrame(pd.DataFrame(left_rows), schema=DOCS_SCHEMA))
    right = index_docs(spark.createDataFrame(pd.DataFrame(right_rows), schema=DOCS_SCHEMA))
    got = {
        (r.doc_id, r.doc_id_r)
        for r in spatial_join(left, right, predicate="intersects")
        .select("doc_id", "doc_id_r")
        .collect()
    }
    want = {
        (li, ri)
        for li, lg in lgeos.items()
        for ri, rg in rgeos.items()
        if alg.intersects(lg, rg)
    }
    assert len(want) > 20, "fixture must be non-trivial"
    assert got == want
