"""Regression tests for the round-1 ADVICE findings.

1. (high) planner cell pruning must not drop an extent row whose centroid
   cell differs from the cells its envelope actually touches.
2. (medium) 'covers' with point LEFT rows must answer left-covers-right,
   not point-in-polygon (covered by the widened join parity parametrization;
   an explicit directional case lives here).
3. (low) XZ2 ranges under a tight budget must never abandon frontier
   subtrees (false negatives).
4. (low) reference-cell dedupe must clamp below-world corners so the pair is
   deduped to one row, not dropped to zero.
"""

import pandas as pd
import pytest

from geomesa_spark.index.xz2 import XZ2SFC
from geomesa_spark.operators.spatial_join import spatial_join
from geomesa_spark.plans.planner import spatial_filter
from geomesa_spark.sources.docs import DOCS_SCHEMA, MULTI_CELL, index_docs


def _doc(doc_id, wkt, iso="2016-01-02T00:00:00.000Z"):
    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": "text", "text": "body", "media_ref": "", "offset": 0},
            {"kind": "geo", "text": wkt, "media_ref": "", "offset": 1},
            {"kind": "time", "text": iso, "media_ref": "", "offset": 2},
        ],
    }


def test_extent_row_across_cell_boundary_not_pruned(spark):
    """ADVICE repro: query POLYGON((20 0, 22.4 0, 22.4 5, 20 5, 20 0)) covers
    coarse cell 192 only; an intersecting polygon with envelope
    [22.2,23.0]x[2.25,2.75] has its CENTER in cell 193. The old centroid-cell
    pruning silently dropped it; the MULTI_CELL sentinel keeps it."""
    poly = "POLYGON ((22.2 2.25, 22.2 2.75, 23.0 2.75, 23.0 2.25, 22.2 2.25))"
    inside = "POINT (21.0 2.0)"  # sanity row that was never at risk
    outside = "POINT (60.0 60.0)"
    pdf = pd.DataFrame([_doc("d-straddle", poly), _doc("d-in", inside), _doc("d-out", outside)])
    docs = index_docs(spark.createDataFrame(pdf, schema=DOCS_SCHEMA))
    # the straddling polygon spans two coarse cells -> MULTI_CELL sentinel
    cells = {r.doc_id: r.cell for r in docs.select("doc_id", "cell").collect()}
    assert cells["d-straddle"] == MULTI_CELL
    got = {
        r.doc_id
        for r in spatial_filter(docs, "POLYGON((20 0, 22.4 0, 22.4 5, 20 5, 20 0))")
        .select("doc_id")
        .collect()
    }
    assert got == {"d-straddle", "d-in"}


def test_point_left_covers_is_directional(spark):
    """covers(point, polygon) is False for an interior point (a point cannot
    cover an areal geometry); the join fast path must not invert it."""
    left = index_docs(
        spark.createDataFrame(pd.DataFrame([_doc("L-pt", "POINT (1 1)")]), schema=DOCS_SCHEMA)
    )
    right = index_docs(
        spark.createDataFrame(
            pd.DataFrame([_doc("R-poly", "POLYGON ((0 0, 0 2, 2 2, 2 0, 0 0))")]),
            schema=DOCS_SCHEMA,
        )
    )
    got = spatial_join(left, right, predicate="covers", broadcast=True).count()
    assert got == 0
    # the reverse direction (polygon covers its interior point) must hold
    got_rev = spatial_join(right, left, predicate="covers", broadcast=True).count()
    assert got_rev == 1


@pytest.mark.parametrize("max_ranges", [1, 2, 4, 8, 16, 60])
def test_xz2_tight_budget_never_abandons_frontier(max_ranges):
    """Every stored element intersecting the window must fall in SOME range,
    no matter how small the budget (budget trades precision, not recall)."""
    sfc = XZ2SFC(g=12)
    window = (-40.0, -20.0, 10.0, 25.0)
    ranges = sfc.ranges([window], max_ranges=max_ranges)

    def covered(code):
        return any(r.lower <= code <= r.upper for r in ranges)

    # a lattice of small elements inside / crossing the window
    import numpy as np

    rng = np.random.default_rng(7)
    for _ in range(300):
        cx = rng.uniform(-42, 12)
        cy = rng.uniform(-22, 27)
        w, h = rng.uniform(0.01, 2.0), rng.uniform(0.01, 2.0)
        el = (cx, cy, cx + w, cy + h)
        intersects = not (
            el[2] < window[0] or window[2] < el[0] or el[3] < window[1] or window[3] < el[1]
        )
        if intersects:
            assert covered(sfc.index(*el)), (max_ranges, el)


def test_ref_cell_clamp_below_world_bounds(spark):
    """Overlapping geometries whose envelope-intersection corner lies below
    the world bounds must still produce exactly ONE joined pair."""
    left = index_docs(
        spark.createDataFrame(
            pd.DataFrame([_doc("L", "POLYGON ((-185 -95, -185 -85, -175 -85, -175 -95, -185 -95))")]),
            schema=DOCS_SCHEMA,
        )
    )
    right = index_docs(
        spark.createDataFrame(
            pd.DataFrame([_doc("R", "POLYGON ((-184 -94, -184 -86, -176 -86, -176 -94, -184 -94))")]),
            schema=DOCS_SCHEMA,
        )
    )
    rows = spatial_join(left, right, predicate="intersects", broadcast=True).count()
    assert rows == 1


def test_rect_pair_predicate_matches_kernel():
    """The join's solid-rect bounds fast path must agree with the geometry
    kernel on every supported predicate over random rect pairs (including
    touching, nested, disjoint and identical cases)."""
    import numpy as np

    from geomesa_spark.geom import algorithms as alg
    from geomesa_spark.geom.wkt import from_wkt
    from geomesa_spark.operators.spatial_join import _rect_pair_predicate

    def box(x0, y0, x1, y1):
        return from_wkt(
            f"POLYGON(({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"
        )

    rng = np.random.default_rng(13)
    rects = []
    for _ in range(40):
        x0, y0 = rng.uniform(-5, 5, 2)
        rects.append((x0, y0, x0 + rng.uniform(0.5, 4), y0 + rng.uniform(0.5, 4)))
    # deliberate exact-touch / nested / equal cases
    rects += [(0, 0, 2, 2), (2, 0, 4, 2), (0, 2, 2, 4), (0.5, 0.5, 1.5, 1.5), (0, 0, 2, 2)]
    preds = ["intersects", "within", "contains", "covers", "overlaps", "touches", "crosses"]
    for i in range(0, len(rects), 3):
        for j in range(len(rects)):
            A, B = rects[i], rects[j]
            ga, gb = box(*A), box(*B)
            for p in preds:
                got = _rect_pair_predicate(p, A, B)
                want = bool(getattr(alg, p)(ga, gb))
                assert got == want, (p, A, B, got, want)
