"""S2 cell scheme: id algebra (face/position/level/marker-lsb), roundtrip,
containment-by-range, Hilbert locality, covering recall."""

import numpy as np
import pytest

from geomesa_spark.index.s2 import (
    MAX_LEVEL,
    cell_center_lonlat,
    cell_level,
    cell_range,
    parent_id,
    s2_cell_id,
    s2_covering,
)


def test_leaf_roundtrip_many():
    rng = np.random.default_rng(42)
    lons = rng.uniform(-179.9, 179.9, 500)
    lats = rng.uniform(-89.9, 89.9, 500)
    leafs = s2_cell_id(lons, lats)
    lon2, lat2 = cell_center_lonlat(leafs)
    # leaf cells at 2^30 resolution: center within ~1e-6 deg of the point
    dlon = np.abs(lon2 - lons)
    dlon = np.minimum(dlon, 360.0 - dlon)  # antimeridian wrap
    d = np.hypot(dlon, lat2 - lats)
    assert np.all(d < 1e-5), d.max()


def test_cell_level_and_parent_algebra():
    c = s2_cell_id(np.array([12.3]), np.array([45.6]))[0]
    assert cell_level(c) == MAX_LEVEL
    for lvl in (0, 5, 12, 20, 29):
        p = parent_id(c, lvl)
        assert int(cell_level(p)) == lvl
        lo, hi = cell_range(p)
        assert lo <= c <= hi, lvl
        # the parent's center lies inside its own range too
        assert lo <= p <= hi


def test_containment_by_range_recall():
    """Every point's leaf id falls inside the range of EVERY ancestor of the
    same point — the property that makes S2 containment a plain BETWEEN."""
    rng = np.random.default_rng(7)
    lons = rng.uniform(-180, 180, 300)
    lats = rng.uniform(-90, 90, 300)
    leafs = s2_cell_id(lons, lats)
    for lvl in (2, 6, 10, 16):
        parents = s2_cell_id(lons, lats, lvl)
        lo, hi = cell_range(parents)
        assert np.all((leafs >= lo) & (leafs <= hi)), lvl


def test_distinct_faces():
    lons = np.array([0.0, 90.0, 0.0, 180.0, -90.0, 0.0])
    lats = np.array([0.0, 0.0, 89.9, 0.0, 0.0, -89.9])
    faces = (s2_cell_id(lons, lats).astype(np.uint64) >> np.uint64(61)).astype(int)
    assert sorted(set(faces.tolist())) == [0, 1, 2, 3, 4, 5]


def test_hilbert_locality():
    """Adjacent points at fine resolution map to nearby curve positions far
    more often than random (the point of Hilbert over row-major order)."""
    rng = np.random.default_rng(3)
    lons = rng.uniform(-10, 10, 200)
    lats = rng.uniform(-10, 10, 200)
    a = s2_cell_id(lons, lats, 16).astype(np.float64)
    b = s2_cell_id(lons + 1e-4, lats, 16).astype(np.float64)
    frac_near = np.mean(np.abs(a - b) <= np.abs(a).mean() * 1e-6)
    assert frac_near > 0.5


@pytest.mark.parametrize("level", [4, 6])
def test_covering_recall(level):
    """Any point inside the bbox must land in a covered cell."""
    bbox = (-40.0, -20.0, 10.0, 25.0)
    cover = set(s2_covering(bbox, level))
    rng = np.random.default_rng(11)
    lons = rng.uniform(bbox[0], bbox[2], 400)
    lats = rng.uniform(bbox[1], bbox[3], 400)
    cells = s2_cell_id(lons, lats, level)
    assert all(int(c) in cover for c in cells)


def test_s3_point_key_recall():
    """S3 (week_bin, s2) point keys: a bbox+interval query over the composed
    key keeps every matching point (cell covering + bin range)."""
    from geomesa_spark.index.s2 import s3_index
    from geomesa_spark.index.zorder import SECONDS_PER

    rng = np.random.default_rng(5)
    n = 300
    lons = rng.uniform(-60, 20, n)
    lats = rng.uniform(-30, 40, n)
    ts = rng.uniform(1.45e9, 1.46e9, n)
    level = 6
    wb, cells = s3_index(lons, lats, ts, level)
    bbox = (-40.0, -20.0, 10.0, 25.0)
    t0, t1 = 1.452e9, 1.455e9
    cover = set(s2_covering(bbox, level))
    b0, b1 = int(t0 // SECONDS_PER["week"]), int(t1 // SECONDS_PER["week"])
    match = (
        (lons >= bbox[0]) & (lons <= bbox[2])
        & (lats >= bbox[1]) & (lats <= bbox[3])
        & (ts >= t0) & (ts < t1)
    )
    kept = np.array([int(c) in cover for c in cells]) & (wb >= b0) & (wb <= b1)
    assert match.sum() > 0
    assert np.all(kept[match])  # recall: no matching point pruned
    assert kept.sum() < n  # selectivity: something pruned


def test_covering_selective():
    cover = s2_covering((-40.0, -20.0, 10.0, 25.0), 6)
    assert 0 < len(cover) < 6 * 4**6 / 4  # covers far less than the sphere
