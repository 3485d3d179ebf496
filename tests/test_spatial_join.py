"""Spatial-join path regressions: fast-path directionality, reference-cell
dedupe clamps, the solid-rectangle bounds fast path, and conf guards.
Consolidated from the per-round advice-regression files (round-5 hygiene);
join row-parity suites live in test_areal_*_batch / test_mixed_dim_batch."""

import numpy as np
import pandas as pd
import pytest

from geomesa_spark.geom import algorithms as alg
from geomesa_spark.geom.wkt import from_wkt
from geomesa_spark.operators.spatial_join import (
    _rect_info,
    _rect_pair_predicate,
    _shuffle_partitions,
    spatial_join,
)
from geomesa_spark.sources.docs import DOCS_SCHEMA, index_docs


def _doc(doc_id, wkt, iso="2016-01-02T00:00:00.000Z"):
    return {
        "doc_id": doc_id,
        "spans": [
            {"kind": "text", "text": "body", "media_ref": "", "offset": 0},
            {"kind": "geo", "text": wkt, "media_ref": "", "offset": 1},
            {"kind": "time", "text": iso, "media_ref": "", "offset": 2},
        ],
    }


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


@pytest.mark.parametrize(
    "wkt,expect_rect",
    [
        ("POLYGON ((0 0, 1 0, 1 1, 0 1, 0 0))", True),  # ccw rect
        ("POLYGON ((0 0, 0 1, 1 1, 1 0, 0 0))", True),  # cw rect
        ("POLYGON ((1 1, 0 1, 0 0, 1 0, 1 1))", True),  # rotated start corner
        # doubled-corner triangle: all vertices on corners, NOT a rectangle
        ("POLYGON ((0 0, 1 0, 1 1, 1 1, 0 0))", False),
        # corner bowtie: 4 distinct corners, diagonal edges
        ("POLYGON ((0 0, 1 1, 1 0, 0 1, 0 0))", False),
        # corner triangle with repeated start
        ("POLYGON ((0 0, 1 0, 0 1, 1 1, 0 0))", False),  # non-adjacent order
    ],
)
def test_rect_info_rejects_degenerate_corner_rings(wkt, expect_rect):
    is_rect, bounds = _rect_info(from_wkt(wkt))
    assert is_rect is expect_rect
    if expect_rect:
        assert bounds == (0.0, 0.0, 1.0, 1.0)


def test_salt_probe_tolerates_auto_shuffle_partitions(spark):
    """Spark 4 rejects setting the conf to "auto" locally, so exercise the
    extracted guard with a stand-in session shaped like a deployment where
    the conf reads back non-numeric."""

    class _Conf:
        def get(self, k):
            return "auto"

    class _SC:
        defaultParallelism = 7

    class _Sess:
        conf = _Conf()
        sparkContext = _SC()

    assert _shuffle_partitions(_Sess()) == 7
    assert _shuffle_partitions(spark) == int(
        spark.conf.get("spark.sql.shuffle.partitions")
    )


def test_left_outer_spatial_join(spark):
    """how='left': matching pairs plus exactly one null-right row per
    unmatched left, with the inner rows identical to how='inner'."""
    left = index_docs(
        spark.createDataFrame(
            pd.DataFrame(
                [
                    _doc("in1", "POINT (1 1)"),
                    _doc("in2", "POINT (1.5 1.5)"),
                    _doc("out1", "POINT (50 50)"),
                    _doc("out2", "POINT (-60 10)"),
                ]
            ),
            schema=DOCS_SCHEMA,
        )
    )
    right = index_docs(
        spark.createDataFrame(
            pd.DataFrame([_doc("R", "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))")]),
            schema=DOCS_SCHEMA,
        )
    )
    out = spatial_join(left, right, predicate="intersects", how="left", broadcast=True)
    rows = {r.doc_id: r for r in out.collect()}
    assert set(rows) == {"in1", "in2", "out1", "out2"}
    assert out.count() == 4
    assert rows["in1"].doc_id_r == "R" and rows["in2"].doc_id_r == "R"
    assert rows["out1"].doc_id_r is None and rows["out2"].doc_id_r is None
    inner = spatial_join(left, right, predicate="intersects", broadcast=True)
    assert {(r.doc_id, r.doc_id_r) for r in inner.collect()} == {
        ("in1", "R"), ("in2", "R"),
    }
    with pytest.raises(ValueError):
        spatial_join(left, right, how="full")


def test_segs_intersect_any_chunked_matches_block(monkeypatch):
    """_segs_intersect_any bounds per-call broadcast memory: blocks never
    exceed _SEG_PAIR_BLOCK pairs, early-exits on the first hit, and the
    chunked answer matches the unchunked one on pathological many-segment
    part pairs (VERDICT r7 #7)."""
    from geomesa_spark.operators import spatial_join as sj

    def zigzag(n, y0, amp=0.25):
        xs = np.linspace(0.0, 100.0, n + 1)
        ys = y0 + amp * (np.arange(n + 1) % 2)
        pts = np.stack([xs, ys], axis=1)
        return np.hstack([pts[:-1], pts[1:]])

    big_a = zigzag(10_000, 0.0)
    big_far = zigzag(10_000, 50.0)     # disjoint: every block must be scanned
    big_hit = zigzag(10_000, 0.125, amp=-0.25)  # interleaves -> crosses early

    seen = []
    real_block = sj._segs_intersect_block

    def spy(A, B):
        seen.append(len(A) * len(B))
        return real_block(A, B)

    monkeypatch.setattr(sj, "_segs_intersect_block", spy)
    assert sj._segs_intersect_any(big_a, big_far) is False
    n_disjoint_blocks = len(seen)
    assert n_disjoint_blocks > 1  # it actually chunked
    assert max(seen) <= sj._SEG_PAIR_BLOCK
    seen.clear()
    assert sj._segs_intersect_any(big_a, big_hit) is True
    assert len(seen) < n_disjoint_blocks  # early exit: far fewer blocks
    monkeypatch.undo()

    # randomized parity: chunked (tiny block) == one-shot block
    rng = np.random.default_rng(7)
    for _ in range(25):
        A = rng.uniform(0, 10, (17, 4))
        B = rng.uniform(0, 10, (23, 4))
        want = sj._segs_intersect_block(A, B)
        monkeypatch.setattr(sj, "_SEG_PAIR_BLOCK", 16)
        got = sj._segs_intersect_any(A, B)
        monkeypatch.undo()
        assert got == want


def test_spatial_join_gc_full_predicate_parity(spark):
    """JOIN-level row-set parity for heterogeneous GEOMETRYCOLLECTIONs on
    BOTH sides of the full predicate family — covers the r8 per-family
    evidence batching (covered AND container directions) through the whole
    join pipeline (cover cells, reference-cell dedupe, batch refine), not
    just _pairwise_predicate_fn."""
    rng = np.random.default_rng(88)

    def rect(x0, y0, w, h):
        x1, y1 = round(x0 + w, 1), round(y0 + h, 1)
        return (
            f"POLYGON (({x0} {y0}, {x1} {y0}, {x1} {y1}, {x0} {y1}, {x0} {y0}))"
        )

    lefts = []
    for i in range(30):
        if i % 3 == 0:
            a = rng.uniform(-2, 2, 4).round(1)
            lefts.append((i, f"LINESTRING ({a[0]} {a[1]}, {a[2]} {a[3]})"))
        else:
            x0, y0 = rng.uniform(-2, 1, 2).round(1)
            lefts.append((i, rect(x0, y0, 1.0, 1.0)))
    rights = []
    for j in range(15):
        x0, y0 = rng.uniform(-2, 0, 2).round(1)
        lx = rng.uniform(-2, 2, 4).round(1)
        rights.append((
            j,
            f"GEOMETRYCOLLECTION ({rect(x0, y0, 2.0, 2.0)}, "
            f"LINESTRING ({lx[0]} {lx[1]}, {lx[2]} {lx[3]}))",
        ))
    from geomesa_spark.geom.wkb import to_wkb

    L = spark.createDataFrame(
        [(i, bytes(to_wkb(from_wkt(w)))) for i, w in lefts],
        "lid long, geom binary",
    )
    R = spark.createDataFrame(
        [(j, bytes(to_wkb(from_wkt(w)))) for j, w in rights],
        "rid long, geom binary",
    )
    lg = {i: from_wkt(w) for i, w in lefts}
    rg = {j: from_wkt(w) for j, w in rights}
    for pred in ("within", "covers", "overlaps", "crosses", "contains", "touches"):
        got = set(
            map(
                tuple,
                spatial_join(
                    L, R, predicate=pred, left_geom="geom", right_geom="geom"
                )
                .select("lid", "rid")
                .collect(),
            )
        )
        want = {
            (i, j)
            for i in lg
            for j in rg
            if getattr(alg, pred)(lg[i], rg[j])
        }
        assert got == want, (pred, len(got), len(want), list(got ^ want)[:4])


def test_spatial_join_equals(spark):
    """equals joins match geometric (SFS) equality — same point set under
    different encodings: rotated ring start, reversed orientation, mid-edge
    collinear vertex, MULTI wrapper — not WKB byte equality."""
    from geomesa_spark.geom.wkb import to_wkb

    lefts = [
        (0, "POLYGON ((0 0, 2 0, 2 2, 0 2, 0 0))"),
        (1, "LINESTRING (0 0, 4 0)"),
        (2, "POLYGON ((5 5, 6 5, 6 6, 5 6, 5 5))"),
    ]
    rights = [
        # same square: rotated start, reversed orientation, extra collinear
        # mid-edge vertex
        (0, "POLYGON ((2 2, 2 0, 0 0, 0 2, 2 2))"),
        (1, "POLYGON ((0 0, 1 0, 2 0, 2 2, 0 2, 0 0))"),
        # same line split into two chained members
        (2, "MULTILINESTRING ((0 0, 2 0), (2 0, 4 0))"),
        # near-miss: shifted square
        (3, "POLYGON ((0 0, 2 0, 2 2.5, 0 2.5, 0 0))"),
        # unrelated
        (4, "POINT (9 9)"),
    ]
    L = spark.createDataFrame(
        [(i, bytes(to_wkb(from_wkt(w)))) for i, w in lefts],
        "lid long, geom binary",
    )
    R = spark.createDataFrame(
        [(j, bytes(to_wkb(from_wkt(w)))) for j, w in rights],
        "rid long, geom binary",
    )
    got = set(
        map(
            tuple,
            spatial_join(
                L, R, predicate="equals", left_geom="geom", right_geom="geom"
            )
            .select("lid", "rid")
            .collect(),
        )
    )
    assert got == {(0, 0), (0, 1), (1, 2)}, got
