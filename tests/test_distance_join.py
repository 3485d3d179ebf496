"""Batch distance join (st_dwithin as a JOIN predicate, round-4): lat-aware
grid-cell equi-join + exact haversine, pure Columns. Brute-force parity on
random points INCLUDING antimeridian and polar placements — the cases that
need the wrapped lon ring and the pole full-ring explode."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geomesa_spark.geom.algorithms import haversine
from geomesa_spark.operators.spatial_join import distance_join

METERS = 150_000.0


def _mk(tag, pts):
    return pd.DataFrame(
        [{"pid": f"{tag}{i}", "x": float(x), "y": float(y)} for i, (x, y) in enumerate(pts)]
    )


@pytest.fixture(scope="module")
def tables(spark):
    rng = np.random.default_rng(44)
    lpts = [(x, y) for x, y in zip(rng.uniform(-180, 180, 300), rng.uniform(-90, 90, 300))]
    rpts = [(x, y) for x, y in zip(rng.uniform(-180, 180, 300), rng.uniform(-90, 90, 300))]
    # adversarial placements: antimeridian straddle, both poles, exact-radius
    lpts += [(179.9995, 10.0), (-179.9995, -45.0), (0.0, 89.95), (120.0, -89.9), (0.0, 0.0)]
    rpts += [(-179.9995, 10.0), (179.9995, -45.0), (180.0, 89.9), (-60.0, -89.95), (1.349, 0.0)]
    L = spark.createDataFrame(_mk("L", lpts))
    R = spark.createDataFrame(_mk("R", rpts))
    return L, R, lpts, rpts


def test_distance_join_brute_parity(spark, tables):
    L, R, lpts, rpts = tables
    got = {
        (r.pid, r.r_pid)
        for r in distance_join(L, R, METERS).select("pid", "r_pid").collect()
    }
    want = {
        (f"L{i}", f"R{j}")
        for i, (lx, lyy) in enumerate(lpts)
        for j, (rx, ry) in enumerate(rpts)
        if haversine(lx, lyy, rx, ry) <= METERS
    }
    # the adversarial pairs must actually be in the truth set
    assert ("L300", "R300") in want  # antimeridian
    assert ("L302", "R302") in want  # north pole ring
    assert ("L303", "R303") in want  # south pole ring
    assert got == want, (len(got), len(want), sorted(want - got)[:5], sorted(got - want)[:5])


def test_distance_join_no_duplicate_pairs(spark, tables):
    L, R, _, _ = tables
    out = distance_join(L, R, METERS).select("pid", "r_pid")
    assert out.count() == out.dropDuplicates().count()


def test_distance_join_plan_is_pure_column(spark, tables):
    """No python UDFs anywhere in the join plan (codegen end to end)."""
    L, R, _, _ = tables
    plan = distance_join(L, R, METERS)._jdf.queryExecution().executedPlan().toString()
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "CartesianProduct" not in plan


def test_distance_join_explode_factor(spark):
    """Round-5 fan-out trim: the left cover is 3x3=9 cells at the equator
    (k=1), bounded by 3x(2k+1) at high latitudes, and exactly ONE polar
    sentinel for pole-touching rows — never the 5x5=25 the first version
    shipped, never a full lon ring."""
    from geomesa_spark.operators.spatial_join import _distance_cell_cover

    df = spark.createDataFrame(
        pd.DataFrame(
            [
                {"pid": "eq", "x": 10.0, "y": 0.0},
                {"pid": "mid", "x": -100.0, "y": 45.0},
                {"pid": "high", "x": 30.0, "y": 75.0},
                {"pid": "npole", "x": 0.0, "y": 89.9999},
                {"pid": "spole", "x": 120.0, "y": -90.0},
            ]
        )
    )
    sizes = {
        r.pid: r.n
        for r in df.select(
            "pid", F.size(_distance_cell_cover(METERS, F.col("x"), F.col("y"))).alias("n")
        ).collect()
    }
    assert sizes["eq"] == 9, sizes  # k=1: dlon == d_deg at the equator
    # cos(45) ~ .707 -> dlon ~ 1.41*d_deg -> k=2 -> 5x3; cos(75) -> k=4 -> 9x3
    assert sizes["mid"] == 15 and sizes["high"] == 27, sizes
    assert sizes["npole"] == 1 and sizes["spole"] == 1, sizes  # sentinels


def test_distance_join_seam_phantom_gap(spark):
    """The cell ring spans ceil(360/cell)*cell >= 360 deg, so the wrap jumps
    a phantom gap of up to one cell: a high-latitude pair straddling the
    antimeridian near the exact dlon bound sits k+1 ring-cells apart (the
    sf0.01 gate caught doc 341 x event 2655 at 99.4 km exactly like this).
    Seam-adjacent rows must take the +1 lon slack."""
    lpts = [(-176.21, -84.11)]
    rpts = [(175.05, -84.15), (174.0, -84.2)]
    L = spark.createDataFrame(_mk("L", lpts))
    R = spark.createDataFrame(_mk("R", rpts))
    got = {
        (r.pid, r.r_pid)
        for r in distance_join(L, R, 100_000.0).select("pid", "r_pid").collect()
    }
    want = {
        (f"L{i}", f"R{j}")
        for i, (lx, lyy) in enumerate(lpts)
        for j, (rx, ry) in enumerate(rpts)
        if haversine(lx, lyy, rx, ry) <= 100_000.0
    }
    assert ("L0", "R0") in want
    assert got == want, (got, want)


def test_distance_join_tiny_radius_near_pole(spark):
    """The ADVICE OOM scenario: meters=100 (cell ~9e-5 deg) with a point
    near the pole. The old full-ring explode materialized ~4M cells per
    such row; the sentinel path emits ONE cell and still finds exactly the
    qualifying pairs."""
    from geomesa_spark.operators.spatial_join import _distance_cell_cover

    lpts = [(0.0, 89.99999), (45.0, 89.9999995), (10.0, 50.0)]
    rpts = [(180.0, 89.99999), (-90.0, 89.999999), (10.0005, 50.0), (11.0, 50.0)]
    L = spark.createDataFrame(_mk("L", lpts))
    R = spark.createDataFrame(_mk("R", rpts))
    meters = 100.0
    # pole-touching rows collapse to one sentinel cell
    n_cells = (
        L.filter(F.col("y") > 89.0)
        .select(F.size(_distance_cell_cover(meters, F.col("x"), F.col("y"))).alias("n"))
        .collect()
    )
    assert all(r.n == 1 for r in n_cells), n_cells
    got = {
        (r.pid, r.r_pid)
        for r in distance_join(L, R, meters).select("pid", "r_pid").collect()
    }
    want = {
        (f"L{i}", f"R{j}")
        for i, (lx, lyy) in enumerate(lpts)
        for j, (rx, ry) in enumerate(rpts)
        if haversine(lx, lyy, rx, ry) <= meters
    }
    assert ("L0", "R0") in want and ("L2", "R2") in want  # non-vacuous
    assert got == want, (got, want)


@pytest.mark.parametrize("meters", [2_000_000.0, 11_000_000.0])
def test_distance_join_large_radius_polar_regimes(spark, meters):
    """Large radii exercise the polar sentinel paths hard: at 2,000 km many
    rows are pole-touching; at 11,000 km d_deg >= 90 (a disc can span both
    poles — every left collapses to one sentinel, every right emits both).
    Brute parity AND no-duplicate-pairs in each regime."""
    rng = np.random.default_rng(23)
    n = 120
    lon_l = rng.uniform(-180, 180, n)
    lat_l = rng.uniform(-90, 90, n)
    lon_r = rng.uniform(-180, 180, n)
    lat_r = rng.uniform(-90, 90, n)
    lat_l[:12] = rng.uniform(85, 90, 12)
    lat_l[12:24] = rng.uniform(-90, -85, 12)
    lat_r[:12] = rng.uniform(85, 90, 12)
    lat_r[12:24] = rng.uniform(-90, -85, 12)
    L = spark.createDataFrame(_mk("L", list(zip(lon_l, lat_l))))
    R = spark.createDataFrame(_mk("R", list(zip(lon_r, lat_r))))
    rows = [
        (r.pid, r.r_pid)
        for r in distance_join(L, R, meters).select("pid", "r_pid").collect()
    ]
    got = set(rows)
    assert len(rows) == len(got), "duplicate pairs"
    want = {
        (f"L{i}", f"R{j}")
        for i in range(n)
        for j in range(n)
        if haversine(lon_l[i], lat_l[i], lon_r[j], lat_r[j]) <= meters
    }
    assert len(want) > 100
    assert got == want
