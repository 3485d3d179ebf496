"""kNN + density/tiling tests with brute-force oracles (FIXTURES.md §6, §7)."""

import numpy as np
import pytest

from geomesa_spark.geom import algorithms as alg
from geomesa_spark.index.tiles import lonlat_to_tile
from geomesa_spark.operators.density import assign_tiles, density, tile_counts
from geomesa_spark.operators.knn import knn
from geomesa_spark.sources.docs import index_docs, synth_docs, synth_docs_pdf


@pytest.fixture(scope="module")
def docs(spark):
    df = index_docs(synth_docs(spark, 1000)).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def docs_points():
    """(doc_id, lon, lat) for every point doc in the fixture."""
    pdf = synth_docs_pdf(1000)
    out = []
    for _, row in pdf.iterrows():
        wkt = next(s["text"] for s in row["spans"] if s["kind"] == "geo")
        if wkt.startswith("POINT"):
            x, y = (float(v) for v in wkt[7:-1].split())
            out.append((row["doc_id"], x, y))
    return out


# ------------------------------------------------------------------ kNN


QUERIES = [
    ("hot", 0.5, 0.5),       # in the hot cell
    ("am", 179.9, 10.0),     # near the antimeridian
    ("pole", 12.0, 88.5),    # near the pole
    ("mid", -76.5, 38.5),
]


def brute_knn(docs_points, lon, lat, k, max_m):
    ds = [
        (d, float(alg.haversine(x, y, lon, lat)))
        for d, x, y in docs_points
    ]
    ds = [t for t in ds if t[1] <= max_m]
    ds.sort(key=lambda t: (t[1], t[0]))
    return ds[:k]


def test_knn_matches_brute_force(spark, docs, docs_points):
    res = knn(docs.filter("x = minx and y = miny"), QUERIES, k=5, max_radius_m=20_000_000)
    got = {}
    for r in res.select("query_id", "doc_id", "dist_m").collect():
        got.setdefault(r.query_id, []).append((r.doc_id, r.dist_m))
    for qid, lon, lat in QUERIES:
        want = brute_knn(docs_points, lon, lat, 5, 20_000_000)
        got_sorted = sorted(got[qid], key=lambda t: (t[1], t[0]))
        assert [d for d, _ in got_sorted] == [d for d, _ in want], qid
        for (_, gd), (_, wd) in zip(got_sorted, want):
            assert abs(gd - wd) < 1e-6


def test_knn_max_radius_bound(spark, docs, docs_points):
    res = knn(docs.filter("x = minx and y = miny"), [("mid", -76.5, 38.5)], k=5, max_radius_m=50_000)
    rows = res.select("dist_m").collect()
    want = brute_knn(docs_points, -76.5, 38.5, 5, 50_000)
    assert len(rows) == len(want)
    assert all(r.dist_m <= 50_000 for r in rows)


# ------------------------------------------------------------------ density


def test_density_mass_conservation(spark, docs):
    pts = docs.filter("x = minx and y = miny")  # points only
    n_in = pts.filter(
        "x >= -180 and x <= 180 and y >= -90 and y <= 90"
    ).count()
    grid = density(pts, (-180, -90, 180, 90), 256, 256)
    total = grid.agg({"weight": "sum"}).collect()[0][0]
    assert total == n_in


def test_density_golden_pixels(spark):
    """Hand-placed points vs the GridSnap formula (FIXTURES.md §6)."""
    df = spark.createDataFrame(
        [(0.0, 0.0), (9.99, 9.99), (10.0, 10.0), (5.0, 5.0), (5.1, 5.1)],
        "x double, y double",
    )
    grid = {(r.i, r.j): r.weight for r in density(df, (0, 0, 10, 10), 10, 10).collect()}
    assert grid[(0, 0)] == 1.0
    assert grid[(9, 9)] == 2.0  # 9.99 and the xmax clamp both land in (9,9)
    assert grid[(5, 5)] == 2.0  # 5.0 and 5.1
    assert sum(grid.values()) == 5.0


def test_density_weight_column(spark):
    df = spark.createDataFrame([(1.0, 1.0, 2.5), (1.2, 1.3, 1.5)], "x double, y double, w double")
    grid = density(df, (0, 0, 10, 10), 10, 10, weight="w").collect()
    assert len(grid) == 1 and grid[0].weight == 4.0


def test_density_polygon_render(spark, docs):
    """Rendered polygon density: every polygon covers >= 1 pixel and the grid
    matches a numpy reference for a hand case."""
    q = spark.createDataFrame([("POLYGON((1 1, 1 4, 4 4, 4 1, 1 1))",)], "wkt string")
    import geomesa_spark

    geomesa_spark.init_sql(spark)
    g = q.selectExpr("st_geomFromWKT(wkt) as geom_wkb")
    grid = {
        (r.i, r.j): r.weight
        for r in density(g, (0, 0, 10, 10), 10, 10, geometry_render=True).collect()
    }
    # pixels with centers inside [1,4]x[1,4]: i in {1,2,3}, centers 1.5,2.5,3.5
    assert set(grid) == {(i, j) for i in (1, 2, 3) for j in (1, 2, 3)}


def test_density_line_render(spark):
    import geomesa_spark

    q = spark.createDataFrame([("LINESTRING(0.5 0.5, 9.5 0.5)",)], "wkt string")
    g = q.selectExpr("st_geomFromWKT(wkt) as geom_wkb")
    grid = {
        (r.i, r.j)
        for r in density(g, (0, 0, 10, 10), 10, 10, geometry_render=True).collect()
    }
    assert grid == {(i, 0) for i in range(10)}


# ------------------------------------------------------------------ tiles


def test_tile_assignment_matches_numpy(spark, docs):
    pts = docs.filter("x = minx and y = miny").select("doc_id", "x", "y")
    got = {
        r.doc_id: (r.tile_x, r.tile_y)
        for r in assign_tiles(pts, 8).collect()
    }
    rows = pts.collect()
    xs = np.array([r.x for r in rows])
    ys = np.array([r.y for r in rows])
    tx, ty = lonlat_to_tile(xs, ys, 8)
    for i, r in enumerate(rows):
        assert got[r.doc_id] == (tx[i], ty[i])


def test_tile_counts_sum(spark, docs):
    pts = docs.filter("x = minx and y = miny")
    tc = tile_counts(pts, 4)
    assert tc.agg({"n_docs": "sum"}).collect()[0][0] == pts.count()


def test_polygonize_density_patterns(spark):
    """Raster -> vector: diagonal cells stay separate polygons
    (4-connectivity), a ring of cells dissolves to one shell + one hole,
    and the dissolved area equals n_cells x cell area exactly."""
    import pandas as pd
    from pyspark.sql import functions as F

    from geomesa_spark.geom import algorithms as alg
    from geomesa_spark.operators.density import polygonize_density

    ring = [(i, j) for i in range(3) for j in range(3) if (i, j) != (1, 1)]
    cells = spark.createDataFrame(
        pd.DataFrame(
            {"i": [c[0] for c in ring] + [10], "j": [c[1] for c in ring] + [11],
             "weight": [5.0] * len(ring) + [0.5]}
        )
    )
    bbox = (0.0, 0.0, 64.0, 32.0)  # 64x32 grid of 1x1 cells
    g, n = polygonize_density(cells, bbox, 64, 32, threshold=1.0)
    assert n == 8  # the 0.5-weight cell is below threshold
    polys = alg._polygons_of(g)
    assert len(polys) == 1 and len(polys[0]) == 2  # shell + hole
    assert alg.area(g) == 8.0
    g2, n2 = polygonize_density(
        spark.createDataFrame(
            pd.DataFrame({"i": [0, 1], "j": [0, 1], "weight": [2.0, 2.0]})
        ),
        bbox, 64, 32, threshold=1.0,
    )
    assert n2 == 2 and len(alg._polygons_of(g2)) == 2  # corner touch splits


def test_tile_pyramid_rollup_conservation(spark):
    """Every pyramid level conserves total count; each parent equals the
    sum of its (up to 4) children; base level equals tile_counts."""
    from geomesa_spark.operators.density import tile_counts, tile_pyramid
    from geomesa_spark.sources.docs import index_docs, synth_docs

    d = index_docs(synth_docs(spark, 3000, seed=5)).filter("x is not null")
    pyr = tile_pyramid(d, zoom_max=6, zoom_min=3).toPandas()
    total = d.count()
    for z in (3, 4, 5, 6):
        lvl = pyr[pyr.tile_z == z]
        assert lvl.n_docs.sum() == total, z
        assert not lvl.duplicated(["tile_x", "tile_y"]).any()
    base = tile_counts(d, 6).toPandas()
    b6 = pyr[pyr.tile_z == 6][["tile_x", "tile_y", "n_docs"]]
    assert (
        b6.sort_values(["tile_x", "tile_y"]).reset_index(drop=True)
        == base[["tile_x", "tile_y", "n_docs"]]
        .sort_values(["tile_x", "tile_y"])
        .reset_index(drop=True)
    ).all().all()
    # parent = sum of children (spot-check every parent at z5)
    kids = b6.assign(px=b6.tile_x // 2, py=b6.tile_y // 2).groupby(["px", "py"]).n_docs.sum()
    p5 = pyr[pyr.tile_z == 5].set_index(["tile_x", "tile_y"]).n_docs
    assert kids.sort_index().equals(p5.sort_index())
