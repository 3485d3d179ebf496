"""Regression tests for the round-3 ADVICE findings + VERDICT "what's wrong".

1. (medium) stream_stream_proximity_join: cell width must derive from the
   same earth radius as haversine_col, with one cell of slack in both axes —
   a lat-aligned pair 999.9 m apart with meters=1000 must not be dropped by
   the neighbor explode, at any latitude / cell-boundary alignment.
2. (medium) knn_join/_query_windows geodesic disc bound: dlon must use
   asin(sin(r)/cos(lat)) and widen to +-180 when the disc touches a pole —
   query (0, 85) radius 1,000 km must see a doc at (180, 88) (778 km away).
3. (verdict #1) z3_predicate must not epsilon-shrink the per-bin upper time
   bound (mirror of the round-3 xz3 fix).
4. (verdict #4) the salt probe must tolerate a non-numeric
   spark.sql.shuffle.partitions ("auto").
5. (low) line-line difference must not fragment a continuous result when
   p0+(p1-p0)*1.0 differs from p1 by 1 ulp.
6. (low) dedup_components must raise on non-convergence instead of
   silently returning wrong components.
"""

import datetime as _dt
import math
import time

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geomesa_spark.geom.algorithms import EARTH_MEAN_RADIUS_M, haversine
from geomesa_spark.index.zorder import SECONDS_PER, WORLD, Z3_BITS, interleave3, normalize
from geomesa_spark.operators.knn import _query_windows, disc_window_deg, knn_join
from geomesa_spark.plans.planner import z3_predicate
from geomesa_spark.sources.docs import index_points_df


# ------------------------------------------------- 1. stream-stream cell cover


def _boundary_pairs():
    """Adversarial pairs at ~0.9999 * radius, snapped just below cell
    boundaries, lat- and lon-aligned, across latitudes."""
    cell = math.degrees(1000.0 / EARTH_MEAN_RADIUS_M)
    t0 = _dt.datetime(2016, 1, 2, 12, 0, 0)
    lrows, rrows = [], []
    i = 0
    for lat_base in (0.0, 45.0, 60.05, 75.0):
        # lat-aligned: left just below a lat cell boundary, right 999.9 m
        # north (each pair 3 deg of lon apart so pairs never cross-match)
        lon_base = 10.0 + 3.0 * i
        yb = math.floor((lat_base + 90.0) / cell) * cell - 90.0
        y_l = yb - 1e-7
        y_r = y_l + math.degrees(999.9 / EARTH_MEAN_RADIUS_M)
        lrows.append({"pid": f"L{i}", "ts": t0, "x": lon_base, "y": y_l})
        rrows.append({"pid": f"R{i}", "ts": t0, "x": lon_base, "y": y_r})
        i += 1
        # lon-aligned: left just below a lon cell boundary, right ~999.9 m east
        lon_base = 10.0 + 3.0 * i
        dlon = math.degrees(
            2.0
            * math.asin(
                math.sin(999.9 / (2.0 * EARTH_MEAN_RADIUS_M))
                / math.cos(math.radians(lat_base))
            )
        )
        xb = math.floor((lon_base + 180.0) / cell) * cell - 180.0
        x_l = xb - 1e-7
        lrows.append({"pid": f"L{i}", "ts": t0, "x": x_l, "y": lat_base})
        rrows.append({"pid": f"R{i}", "ts": t0, "x": x_l + dlon, "y": lat_base})
        i += 1
    # antimeridian-straddling pair (~90 m apart across the ±180 seam)
    lrows.append({"pid": f"L{i}", "ts": t0, "x": 179.9996, "y": -20.0})
    rrows.append({"pid": f"R{i}", "ts": t0, "x": -179.9996, "y": -20.0})
    i += 1
    # polar pair: disc touches the pole, partner on the far lon side
    lrows.append({"pid": f"L{i}", "ts": t0, "x": 0.0, "y": 89.997})
    rrows.append({"pid": f"R{i}", "ts": t0, "x": 180.0, "y": 89.996})
    i += 1
    # one clearly-out pair as a negative control
    lrows.append({"pid": f"L{i}", "ts": t0, "x": -120.0, "y": 10.0})
    rrows.append({"pid": f"R{i}", "ts": t0, "x": -119.0, "y": 10.0})
    return lrows, rrows


def test_stream_stream_cell_cover_near_radius(spark, tmp_path):
    from geomesa_spark.streaming.stream import stream_stream_proximity_join

    lrows, rrows = _boundary_pairs()
    want = {
        (l["pid"], r["pid"])
        for l in lrows
        for r in rrows
        if haversine(l["x"], l["y"], r["x"], r["y"]) <= 1000.0
    }
    assert len(want) == 10, want  # all boundary pairs qualify, control doesn't

    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    ldf = spark.createDataFrame(pd.DataFrame(lrows))
    rdf = spark.createDataFrame(pd.DataFrame(rrows))
    ldf.coalesce(1).write.mode("overwrite").parquet(ldir)
    rdf.coalesce(1).write.mode("overwrite").parquet(rdir)
    pairs = stream_stream_proximity_join(
        spark.readStream.schema(ldf.schema).parquet(ldir),
        spark.readStream.schema(rdf.schema).parquet(rdir),
        meters=1000.0,
        time_window="2 minutes",
        watermark="1 hour",
    ).select("l_pid", "r_pid")
    q = (
        pairs.writeStream.format("memory")
        .queryName("ss_boundary")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        got = set()
        while time.time() < deadline:
            if q.exception() is not None:
                raise AssertionError(q.exception())
            got = {
                (r.l_pid, r.r_pid)
                for r in spark.sql("select * from ss_boundary").collect()
            }
            if got == want:
                break
            time.sleep(2)
        assert got == want, (sorted(want - got), sorted(got - want))
    finally:
        q.stop()


# ---------------------------------------------------- 2. geodesic disc bound


def test_disc_window_exact_lon_bound():
    # at lat 60, radius 1000 km: naive dlat/cos(lat) = 17.986 deg but the
    # true disc reaches asin(sin(r)/cos(lat)) = 18.21 deg of longitude
    dlat, dlon = disc_window_deg(60.0, 1_000_000.0)
    r = 1_000_000.0 / EARTH_MEAN_RADIUS_M
    naive = math.degrees(r) / math.cos(math.radians(60.0))
    exact = math.degrees(math.asin(math.sin(r) / math.cos(math.radians(60.0))))
    assert dlon == pytest.approx(exact)
    assert dlon > naive
    # a point at the disc's widest longitude must be inside the window:
    # the bearing-90deg geodesic endpoint sits at lon offset `exact`
    assert haversine(0.0, 60.0, exact, 60.0) > 1_000_000.0 * 0.999  # sanity


def test_disc_window_pole_touch_full_lon():
    dlat, dlon = disc_window_deg(85.0, 1_000_000.0)
    assert dlon == 180.0
    ws = _query_windows([("q", 0.0, 85.0)], 1_000_000.0)
    assert len(ws) == 1
    _, (x0, y0, x1, y1) = ws[0]
    assert (x0, x1) == (-180.0, 180.0)
    # the advice repro: (180, 88) is 778 km from (0, 85) over the pole
    assert haversine(0.0, 85.0, 180.0, 88.0) < 1_000_000.0
    assert x0 <= 180.0 <= x1 and y0 <= 88.0 <= y1


def test_knn_join_transpolar_neighbor(spark):
    """knn_join with a pole-touching disc must find the trans-polar doc and
    must NOT mark the query done with wrong nearer-looking neighbors."""
    pdf = pd.DataFrame(
        {
            "doc_id": ["far_lon", "near_pole", "equator"],
            "lon": [180.0, 10.0, 0.0],
            "lat": [88.0, 80.0, 0.0],
        }
    )
    docs = index_points_df(spark.createDataFrame(pdf), "lon", "lat")
    queries = spark.createDataFrame(
        [("q0", 0.0, 85.0)], "query_id string, q_lon double, q_lat double"
    )
    out = knn_join(
        docs, queries, k=2, start_radius_m=1_000_000.0, max_radius_m=1_000_000.0
    )
    got = {(r.doc_id, round(r.dist_m)) for r in out.collect()}
    d_far = round(haversine(0.0, 85.0, 180.0, 88.0))
    d_np = round(haversine(0.0, 85.0, 10.0, 80.0))
    assert {g[0] for g in got} == {"far_lon", "near_pole"}, got
    assert got == {("far_lon", d_far), ("near_pole", d_np)}


# ------------------------------------------------------------- 3. z3 boundary


def test_z3_predicate_includes_interval_upper_boundary(spark):
    """Doc timestamp == interval upper bound == z3 time-cell boundary ->
    the (week_bin, z3) pushdown must keep the row (no epsilon shrink)."""
    per = SECONDS_PER["week"]
    b = 2400
    t_in_bin = per / 2.0  # a time-cell boundary at every octree level
    x, y = 10.0, 20.0
    ix = normalize([x], WORLD[0], WORLD[2], Z3_BITS)
    iy = normalize([y], WORLD[1], WORLD[3], Z3_BITS)
    it = normalize([t_in_bin], 0, per, Z3_BITS)
    code = int(interleave3(ix, iy, it)[0])
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["d0"], "week_bin": [b], "z3": [code]})
    )
    t_abs = b * per + t_in_bin
    interval = (
        pd.Timestamp(t_abs - 3600, unit="s"),
        pd.Timestamp(t_abs, unit="s"),  # upper bound EXACTLY on the boundary
    )
    cond = z3_predicate([(x - 1, y - 1, x + 1, y + 1)], interval)
    assert cond is not None
    assert df.filter(cond).count() == 1


# ------------------------------------------------------- 4. salt probe conf


def test_salt_probe_tolerates_auto_shuffle_partitions(spark):
    """Spark 4 rejects setting the conf to "auto" locally, so exercise the
    extracted guard with a stand-in session shaped like a deployment where
    the conf reads back non-numeric."""
    from geomesa_spark.operators.spatial_join import _shuffle_partitions

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


# ----------------------------------------------------- 5. line-line stitching


def test_line_difference_no_ulp_fragmentation():
    from geomesa_spark.geom.algorithms import difference
    from geomesa_spark.geom.core import LINESTRING
    from geomesa_spark.geom.wkt import from_wkt

    # 0.1 + (0.3 - 0.1) != 0.3 in binary floats — the interior vertex used
    # to fragment the result into a MultiLineString
    a = from_wkt("LINESTRING (0.1 0, 0.3 0, 0.7 0)")
    b = from_wkt("LINESTRING (5 5, 6 6)")  # disjoint
    d = difference(a, b)
    assert d.gtype == LINESTRING, d.type_name
    assert len(d.coords) == 3


# ------------------------------------------------- 6. components convergence


def test_dedup_components_nonconvergence_handling(spark):
    from geomesa_spark.operators.dedup import dedup_components

    chain = spark.createDataFrame(
        [(f"n{i:02d}", f"n{i + 1:02d}") for i in range(12)],
        "id_a string, id_b string",
    )
    # explicit fallback="raise" fails loudly instead of returning wrong labels
    with pytest.raises(RuntimeError, match="did not converge"):
        dedup_components(chain, max_iter=2, fallback="raise").collect()
    # the default falls back to the diameter-independent star formulation
    labels = dedup_components(chain, max_iter=2)
    got = {(r.id, r.component) for r in labels.collect()}
    assert got == {(f"n{i:02d}", "n00") for i in range(13)}
    # and with enough rounds plain propagation converges to the same answer
    labels = dedup_components(chain, max_iter=30, fallback="raise")
    comps = {r.component for r in labels.collect()}
    assert comps == {"n00"}


# ------------------------------------------------- 7. bad-row ingest safety


def test_index_docs_survives_malformed_time_spans(spark):
    """One malformed/empty time span must yield NULL ts, not kill the whole
    index job under ANSI mode (found via converter try_to_timestamp rows)."""
    from geomesa_spark.sources.docs import DOCS_SCHEMA, index_docs

    rows = [
        {"doc_id": "ok", "spans": [
            {"kind": "text", "text": "b", "media_ref": "", "offset": 0},
            {"kind": "geo", "text": "POINT (1 1)", "media_ref": "", "offset": 1},
            {"kind": "time", "text": "2016-01-02T00:00:00.000Z", "media_ref": "", "offset": 2}]},
        {"doc_id": "empty_ts", "spans": [
            {"kind": "text", "text": "b", "media_ref": "", "offset": 0},
            {"kind": "geo", "text": "POINT (2 2)", "media_ref": "", "offset": 1},
            {"kind": "time", "text": "", "media_ref": "", "offset": 2}]},
        {"doc_id": "garbage_ts", "spans": [
            {"kind": "text", "text": "b", "media_ref": "", "offset": 0},
            {"kind": "geo", "text": "POINT (3 3)", "media_ref": "", "offset": 1},
            {"kind": "time", "text": "not-a-time", "media_ref": "", "offset": 2}]},
    ]
    df = spark.createDataFrame(pd.DataFrame(rows), schema=DOCS_SCHEMA)
    out = {r.doc_id: r for r in index_docs(df).select("doc_id", "ts", "x").collect()}
    assert out["ok"].ts is not None and out["ok"].x == 1.0
    assert out["empty_ts"].ts is None and out["empty_ts"].x == 2.0
    assert out["garbage_ts"].ts is None and out["garbage_ts"].x == 3.0


# ----------------------------------------------- 8. points-only refine path


def test_points_geom_kind_refine_parity_and_pruning(spark):
    """plan(geom_kind='points') must (a) return identical rows to the mixed
    refine on an all-points table, (b) keep geom_wkb's producing UDF out of
    the plan, and (c) reject unknown kinds."""
    from geomesa_spark.plans.planner import plan, spatial_filter

    pdf = pd.DataFrame(
        {
            "doc_id": [f"p{i}" for i in range(400)],
            "lon": [((i * 7919) % 360) - 180.0 + 0.5 for i in range(400)],
            "lat": [((i * 104729) % 180) - 90.0 + 0.25 for i in range(400)],
        }
    )
    d = index_points_df(spark.createDataFrame(pdf), "lon", "lat")
    pentagon = "POLYGON ((-30 -20, 30 -20, 45 10, 0 35, -45 10, -30 -20))"
    for pred in ("contains", "intersects", "within", "covers"):
        fast = {r.doc_id for r in spatial_filter(d, pentagon, pred, geom_kind="points").collect()}
        mixed = {r.doc_id for r in spatial_filter(d, pentagon, pred).collect()}
        assert fast == mixed, pred
    assert len(fast) > 5
    out = spatial_filter(d, pentagon, "contains", geom_kind="points").select("doc_id")
    p = out._jdf.queryExecution().executedPlan().toString()
    # exactly one python eval (the ray cast); the makePoint WKB UDF pruned
    assert p.count("ArrowEvalPython") == 1, p
    with pytest.raises(ValueError):
        plan(pentagon, "contains", geom_kind="bogus")


# ------------------------------------------- 9. process antimeridian windows


def test_proximity_search_antimeridian_and_pole(spark):
    """proximity_search windows split at the ±180 seam and go full-ring at
    pole touch — same seam handling as distance_join/knn windows."""
    from geomesa_spark.operators.processes import proximity_search

    pdf = pd.DataFrame(
        {
            "doc_id": ["seam", "pole", "far"],
            "lon": [-179.9995, 180.0, 0.0],
            "lat": [10.0, 89.9, 0.0],
        }
    )
    docs = index_points_df(spark.createDataFrame(pdf), "lon", "lat")
    got = {
        r.doc_id
        for r in proximity_search(
            docs, [(179.9995, 10.0), (0.0, 89.95)], 100_000.0
        ).collect()
    }
    assert got == {"seam", "pole"}, got
