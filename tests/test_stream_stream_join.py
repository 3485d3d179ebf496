"""Stream-stream spatio-temporal proximity join: two unbounded point streams,
pairs within (meters, time_window) — verified pair-for-pair against the
batch kernel over the same finite inputs."""

import datetime as _dt
import time

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geomesa_spark.geom.algorithms import haversine
from geomesa_spark.streaming.stream import stream_stream_proximity_join

METERS = 50_000.0
WINDOW_S = 120


def _mk_rows(tag, n, seed):
    rng = np.random.default_rng(seed)
    t0 = _dt.datetime(2016, 1, 2, 12, 0, 0)
    rows = []
    for i in range(n):
        rows.append(
            {
                "pid": f"{tag}{i:03d}",
                "ts": t0 + _dt.timedelta(seconds=int(rng.integers(0, 600))),
                "x": float(rng.uniform(-2.0, 2.0)),
                "y": float(rng.uniform(-1.0, 1.0)),
            }
        )
    return rows


def _brute_pairs(lrows, rrows):
    out = set()
    for l in lrows:
        for r in rrows:
            if abs((l["ts"] - r["ts"]).total_seconds()) <= WINDOW_S and haversine(
                l["x"], l["y"], r["x"], r["y"]
            ) <= METERS:
                out.add((l["pid"], r["pid"]))
    return out


def test_stream_stream_proximity_pairs(spark, tmp_path):
    lrows, rrows = _mk_rows("L", 120, 3), _mk_rows("R", 80, 4)
    want = _brute_pairs(lrows, rrows)
    assert len(want) > 20, "fixture must be non-trivial"

    ldir, rdir = str(tmp_path / "l"), str(tmp_path / "r")
    ldf = spark.createDataFrame(pd.DataFrame(lrows))
    rdf = spark.createDataFrame(pd.DataFrame(rrows))
    ldf.coalesce(1).write.mode("overwrite").parquet(ldir)
    rdf.coalesce(1).write.mode("overwrite").parquet(rdir)
    lstream = spark.readStream.schema(ldf.schema).parquet(ldir)
    rstream = spark.readStream.schema(rdf.schema).parquet(rdir)

    pairs = stream_stream_proximity_join(
        lstream, rstream, meters=METERS, time_window="2 minutes", watermark="1 hour"
    )
    q = (
        pairs.select("l_pid", "r_pid", "dist_m")
        .writeStream.format("memory")
        .queryName("ss_pairs")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 90
        got = set()
        while time.time() < deadline:
            if q.exception() is not None:
                raise AssertionError(q.exception())
            got = {
                (r.l_pid, r.r_pid)
                for r in spark.sql("select * from ss_pairs").collect()
            }
            if got == want:
                break
            time.sleep(2)
        assert got == want, (len(got), len(want), list(want - got)[:5], list(got - want)[:5])
        # distances reported are within bound
        dmax = spark.sql("select max(dist_m) m from ss_pairs").collect()[0].m
        assert dmax <= METERS
    finally:
        q.stop()


def test_stream_stream_join_no_duplicate_pairs(spark, tmp_path):
    """Each qualifying pair emits exactly once (right rows keep one cell, so
    the neighbor-explode on the left cannot double-match)."""
    lrows, rrows = _mk_rows("L", 60, 7), _mk_rows("R", 60, 8)
    ldir, rdir = str(tmp_path / "l2"), str(tmp_path / "r2")
    ldf = spark.createDataFrame(pd.DataFrame(lrows))
    rdf = spark.createDataFrame(pd.DataFrame(rrows))
    ldf.coalesce(1).write.mode("overwrite").parquet(ldir)
    rdf.coalesce(1).write.mode("overwrite").parquet(rdir)
    pairs = stream_stream_proximity_join(
        spark.readStream.schema(ldf.schema).parquet(ldir),
        spark.readStream.schema(rdf.schema).parquet(rdir),
        meters=METERS,
        time_window="2 minutes",
        watermark="1 hour",
    ).select("l_pid", "r_pid")
    q = (
        pairs.writeStream.format("memory")
        .queryName("ss_pairs_dup")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if q.exception() is not None:
                raise AssertionError(q.exception())
            n = spark.sql("select count(*) c from ss_pairs_dup").collect()[0].c
            nd = spark.sql(
                "select count(*) c from (select distinct * from ss_pairs_dup)"
            ).collect()[0].c
            if n > 0 and q.status["isDataAvailable"] is False:
                assert n == nd, (n, nd)
                break
            time.sleep(2)
        assert n == nd and n > 0
    finally:
        q.stop()


def test_streaming_exact_dedup(spark, tmp_path):
    """Only the first document per distinct text is emitted; state keys are
    32-byte hashes bounded by the watermark."""
    import datetime as dt

    from geomesa_spark.streaming.stream import streaming_exact_dedup

    t0 = dt.datetime(2016, 1, 2, 12, 0, 0)
    rows = []
    for i in range(30):
        rows.append(
            {
                "doc_id": f"d{i:03d}",
                "ts": t0 + dt.timedelta(seconds=i),
                "text": f"unique body {i}" if i % 3 else "boilerplate template",
            }
        )
    pdf = pd.DataFrame(rows)
    src = str(tmp_path / "dedup_src")
    sdf = spark.createDataFrame(pdf)
    sdf.coalesce(1).write.mode("overwrite").parquet(src)
    out = streaming_exact_dedup(
        spark.readStream.schema(sdf.schema).parquet(src), watermark="1 hour"
    )
    q = (
        out.writeStream.format("memory")
        .queryName("sdedup")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        got = []
        while time.time() < deadline:
            if q.exception() is not None:
                raise AssertionError(q.exception())
            got = spark.sql("select * from sdedup").collect()
            if len(got) >= 21:
                break
            time.sleep(2)
        # 20 unique bodies (i % 3 != 0) + exactly ONE boilerplate row
        assert len(got) == 21
        boiler = [r.doc_id for r in got if r.text == "boilerplate template"]
        assert len(boiler) == 1
    finally:
        q.stop()


def test_stream_stream_join_drops_late_pairs(spark, tmp_path):
    """Watermark contract (round-4 item #8): a pair whose rows arrive AFTER
    the watermark has advanced past their event time is dropped (bounded
    state actually evicts), while in-watermark pairs emit.

    Sequencing is real late arrival: the late left file is written to the
    source directory only after the first micro-batches have advanced the
    watermark by ~1 hour."""
    import datetime as dt
    import os

    from geomesa_spark.streaming.stream import stream_stream_proximity_join

    t0 = dt.datetime(2016, 1, 2, 12, 0, 0)
    t1 = t0 + dt.timedelta(hours=1)
    ldir, rdir = str(tmp_path / "ll"), str(tmp_path / "lr")
    os.makedirs(ldir), os.makedirs(rdir)
    mk = lambda pid, ts: pd.DataFrame([{"pid": pid, "ts": ts, "x": 1.0, "y": 1.0}])
    schema = "pid string, ts timestamp, x double, y double"
    # batch-1 files: R_old (event t0) enters right state; L_new/R_new at t1
    # advance the watermark to ~t1 - 10s, far past R_old + window
    spark.createDataFrame(mk("R_old", t0), schema).coalesce(1).write.mode(
        "append"
    ).parquet(rdir)
    spark.createDataFrame(mk("R_new", t1), schema).coalesce(1).write.mode(
        "append"
    ).parquet(rdir)
    spark.createDataFrame(mk("L_new", t1), schema).coalesce(1).write.mode(
        "append"
    ).parquet(ldir)
    pairs = stream_stream_proximity_join(
        spark.readStream.schema(schema).parquet(ldir),
        spark.readStream.schema(schema).parquet(rdir),
        meters=1000.0,
        time_window="2 minutes",
        watermark="10 seconds",
    ).select("l_pid", "r_pid")
    q = (
        pairs.writeStream.format("memory")
        .queryName("ss_late")
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
                for r in spark.sql("select * from ss_late").collect()
            }
            if ("L_new", "R_new") in got:
                break
            time.sleep(2)
        assert got == {("L_new", "R_new")}, got
        # watermark has advanced past t0 + window; NOW the late row arrives
        wm_deadline = time.time() + 45
        while time.time() < wm_deadline:
            wm = (q.lastProgress or {}).get("eventTime", {}).get("watermark", "")
            if wm and wm > "2016-01-02T12:30":
                break
            time.sleep(2)
        spark.createDataFrame(mk("L_late", t0), schema).coalesce(1).write.mode(
            "append"
        ).parquet(ldir)
        # give it several micro-batches to (wrongly) emit; it must not
        settle = time.time() + 25
        while time.time() < settle:
            if q.exception() is not None:
                raise AssertionError(q.exception())
            got = {
                (r.l_pid, r.r_pid)
                for r in spark.sql("select * from ss_late").collect()
            }
            assert ("L_late", "R_old") not in got, got
            time.sleep(2)
        assert got == {("L_new", "R_new")}, got
    finally:
        q.stop()


def test_geofence_transitions(spark, tmp_path):
    """Stateful ENTER/EXIT: exact transition sequence across two fences,
    including cross-micro-batch state (the EXIT for a batch-1 ENTER arrives
    in batch 2)."""
    import datetime as dt

    from geomesa_spark.streaming.stream import geofence_transitions

    t0 = dt.datetime(2016, 1, 2, 12, 0, 0)
    FA = ("A", "POLYGON ((0 0, 10 0, 10 10, 0 10, 0 0))")
    FB = ("B", "POLYGON ((8 8, 20 8, 20 20, 8 20, 8 8))")  # overlaps A's corner

    def rows(batch):
        if batch == 1:
            return [
                # u1: outside -> inside A -> into the A∩B overlap
                {"user_id": "u1", "ts": t0 + dt.timedelta(seconds=0), "x": -5.0, "y": -5.0},
                {"user_id": "u1", "ts": t0 + dt.timedelta(seconds=10), "x": 5.0, "y": 5.0},
                {"user_id": "u1", "ts": t0 + dt.timedelta(seconds=20), "x": 9.0, "y": 9.0},
                # u2: first event already inside B -> enter on first sight
                {"user_id": "u2", "ts": t0 + dt.timedelta(seconds=5), "x": 15.0, "y": 15.0},
            ]
        return [
            # u1 leaves A (still in B), then leaves B too
            {"user_id": "u1", "ts": t0 + dt.timedelta(seconds=30), "x": 15.0, "y": 15.0},
            {"user_id": "u1", "ts": t0 + dt.timedelta(seconds=40), "x": 50.0, "y": 50.0},
            # u2 stays put: no transitions
            {"user_id": "u2", "ts": t0 + dt.timedelta(seconds=35), "x": 16.0, "y": 16.0},
        ]

    src = str(tmp_path / "geofence_src")
    schema = "user_id string, ts timestamp, x double, y double"
    spark.createDataFrame(pd.DataFrame(rows(1)), schema).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    out = geofence_transitions(
        spark.readStream.schema(schema).option("maxFilesPerTrigger", 1).parquet(src),
        fences=[FA, FB],
    )
    q = (
        out.writeStream.format("memory")
        .queryName("gf")
        .outputMode("update")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        want1 = {
            ("u1", "A", "enter", 10), ("u1", "B", "enter", 20), ("u2", "B", "enter", 5),
        }
        deadline = time.time() + 60
        got = set()
        while time.time() < deadline:
            if q.exception() is not None:
                raise AssertionError(q.exception())
            got = {
                (r.user_id, r.fence_id, r.event, int((r.ts - t0).total_seconds()))
                for r in spark.sql("select * from gf").collect()
            }
            if got >= want1:
                break
            time.sleep(2)
        assert got == want1, got
        # batch 2: the exits arrive later — state must have persisted
        spark.createDataFrame(pd.DataFrame(rows(2)), schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        want2 = want1 | {("u1", "A", "exit", 30), ("u1", "B", "exit", 40)}
        deadline = time.time() + 60
        while time.time() < deadline:
            if q.exception() is not None:
                raise AssertionError(q.exception())
            got = {
                (r.user_id, r.fence_id, r.event, int((r.ts - t0).total_seconds()))
                for r in spark.sql("select * from gf").collect()
            }
            if got == want2:
                break
            time.sleep(2)
        assert got == want2, got
    finally:
        q.stop()


# --------- regressions folded from the round-advice files (round-5 hygiene)


def _boundary_pairs():
    """Adversarial pairs at ~0.9999 * radius, snapped just below cell
    boundaries, lat- and lon-aligned, across latitudes."""
    import math

    from geomesa_spark.geom.algorithms import EARTH_MEAN_RADIUS_M

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


def test_sessionize_tracks_custom_column_names(spark, tmp_path):
    """Non-default time/lon/lat/key column names must work end-to-end (the
    stateful fn previously hard-coded ts/x/y and raised KeyError)."""
    from geomesa_spark.streaming.stream import sessionize_tracks

    t0 = _dt.datetime.now()
    rows = [
        {
            "device": "dev-1",
            "event_time": t0 + _dt.timedelta(seconds=i * 0.01),
            "lon": float(i),
            "lat": float(i) / 2.0,
        }
        for i in range(10)
    ]
    static = spark.createDataFrame(pd.DataFrame(rows))
    srcdir = str(tmp_path / "sess_src")
    static.coalesce(1).write.mode("overwrite").parquet(srcdir)
    src = spark.readStream.schema(static.schema).parquet(srcdir)
    sess = sessionize_tracks(
        src,
        gap="2 seconds",
        watermark="10 seconds",
        key_col="device",
        time_col="event_time",
        lon_col="lon",
        lat_col="lat",
    )
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions_custom_cols")
        .outputMode("update")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        got = []
        while time.time() < deadline:
            if q.exception() is not None:
                raise AssertionError(q.exception())
            got = spark.sql(
                "select * from sessions_custom_cols where n_points > 0"
            ).collect()
            if got:
                break
            time.sleep(2)
        assert len(got) == 1 and got[0].user_id == "dev-1" and got[0].n_points == 10
        assert got[0].track_meters > 0
    finally:
        q.stop()
