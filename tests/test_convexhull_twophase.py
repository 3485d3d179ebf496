"""Two-phase convex hull (round-3 item #2): map-side partial hulls +
hull-of-hull-vertices final fold, matching the reference UDAF's incremental
update/merge (ConvexHull.scala:18-52). The single-phase grouped-agg UDAF
concentrates ALL of a group's coordinates on one worker — OOM on a hot
group; the two-phase form ships only O(hull-vertices) per partition."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geomesa_spark.functions.library import (
    UDFS,
    convex_hull_by,
    st_convexhull_agg,
)
from geomesa_spark.geom.wkb import from_wkb, points_to_wkb


def _pts_df(spark, coords_by_group):
    rows = []
    for g, pts in coords_by_group.items():
        xs = np.asarray([p[0] for p in pts], dtype=float)
        ys = np.asarray([p[1] for p in pts], dtype=float)
        for w in points_to_wkb(xs, ys):
            rows.append({"grp": g, "geom": w})
    return spark.createDataFrame(pd.DataFrame(rows)).repartition(8)


def _hull_pts(wkb):
    g = from_wkb(bytes(wkb))
    return {tuple(map(float, p)) for p in g._all_coords()}


def test_two_phase_matches_single_phase(spark):
    rng = np.random.default_rng(7)
    data = {
        "a": [tuple(p) for p in rng.uniform(-50, 50, size=(500, 2))],
        "b": [tuple(p) for p in rng.uniform(0, 5, size=(200, 2))],
        "c": [(0.0, 0.0), (1.0, 0.0)],  # degenerate: 2-point hull
    }
    df = _pts_df(spark, data)
    two = {
        r.grp: r.hull
        for r in convex_hull_by(df, "grp", geom_col="geom").collect()
    }
    one = {
        r.grp: r.hull
        for r in df.groupBy("grp")
        .agg(st_convexhull_agg(F.col("geom")).alias("hull"))
        .collect()
    }
    assert set(two) == set(one) == {"a", "b", "c"}
    for g in two:
        assert _hull_pts(two[g]) == _hull_pts(one[g]), g


def test_hot_group_five_million_points(spark):
    """Planted hot group: 5M points in ONE group complete through the
    two-phase fold (map-side partials keep every task's footprint bounded)
    and produce the exact hull of the generating envelope."""
    n = 5_000_000
    base = spark.range(n).select(
        F.lit("hot").alias("grp"),
        (F.col("id") % 2000).cast("double").alias("x0"),
        (F.col("id") / F.lit(2000)).cast("long").cast("double").alias("y0"),
    )
    # grid covering [0,1999] x [0,2499] -> hull area = 1999 * 2499
    pts = base.selectExpr("grp", "st_makePoint(x0, y0) as geom")
    out = convex_hull_by(pts, "grp", geom_col="geom").withColumn(
        "area", UDFS["st_area"](F.col("hull"))
    )
    rows = out.collect()
    assert len(rows) == 1
    assert rows[0].area == pytest.approx(1999.0 * 2499.0)


def test_multi_group_cols(spark):
    df = _pts_df(
        spark, {"a": [(0, 0), (2, 0), (2, 2), (0, 2), (1, 1)]}
    ).withColumn("grp2", F.lit(1))
    rows = convex_hull_by(df, ["grp", "grp2"], geom_col="geom").collect()
    assert len(rows) == 1
    assert _hull_pts(rows[0].hull) == {(0, 0), (2, 0), (2, 2), (0, 2)}
