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
