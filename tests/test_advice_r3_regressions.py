"""Regression tests for the round-2 ADVICE findings.

1. (medium) xz3_predicate must not epsilon-shrink the per-bin time window:
   a doc whose timestamp equals the interval upper bound AND lands exactly
   on an octree time-cell boundary must stay inside the pushdown ranges.
2. (low) ngram_jaccard_pairs docstring recall claim corrected (doc-only; the
   near-threshold behavior itself is pinned here).
3. (low) _rect_info must reject degenerate 5-vertex rings whose vertices all
   lie on bounds corners but which are not solid rectangles (doubled-corner
   triangle, corner bowtie).
4. (low) sessionize_tracks must honor non-default time/lon/lat column names.
5. (low) attr_equality_scan with geom_kind="extents" must not AND the
   centroid-z2 prune — an extent overlapping the bbox with centroid outside
   it must be returned.
"""

import datetime as _dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geomesa_spark.geom.wkt import from_wkt
from geomesa_spark.index.xz3 import XZ3SFC
from geomesa_spark.index.zorder import SECONDS_PER
from geomesa_spark.operators.spatial_join import _rect_info
from geomesa_spark.plans.planner import xz3_predicate


# ------------------------------------------------------------- 1. XZ3 bound


def test_xz3_sfc_closed_upper_bound_on_cell_boundary():
    """SFC-level repro from the advice: element stored exactly at the
    mid-bin time-cell boundary; a query window whose maxt equals that
    boundary must cover the stored code (closed upper bound)."""
    sfc = XZ3SFC()
    per = SECONDS_PER["week"]
    t = per / 2.0  # an octree time-cell boundary at every level
    x, y = 10.0, 20.0
    code = sfc.index(x, y, t, x, y, t)
    ranges = sfc.ranges([(x - 1, y - 1, 0.0, x + 1, y + 1, t)], max_ranges=200)
    assert any(r.lower <= code <= r.upper for r in ranges)


def test_xz3_predicate_includes_interval_upper_boundary(spark):
    """Planner-level: doc timestamp == interval upper bound == time-cell
    boundary -> the (week_bin, xz3) pushdown predicate must keep the row."""
    sfc = XZ3SFC()
    per = SECONDS_PER["week"]
    b = 2400
    t_in_bin = per / 2.0
    x, y = 10.0, 20.0
    code = sfc.index(x, y, t_in_bin, x, y, t_in_bin)
    df = spark.createDataFrame(
        pd.DataFrame({"doc_id": ["d0"], "week_bin": [b], "xz3": [code]})
    )
    t_abs = b * per + t_in_bin
    interval = (
        pd.Timestamp(t_abs - 3600, unit="s"),
        pd.Timestamp(t_abs, unit="s"),  # upper bound EXACTLY on the boundary
    )
    cond = xz3_predicate([(x - 1, y - 1, x + 1, y + 1)], interval)
    assert cond is not None
    assert df.filter(cond).count() == 1


# ------------------------------------------------------- 2. ngram band miss


def test_ngram_bands32_available_for_high_recall(spark):
    """The documented high-recall configuration (bands=32, r=4) must be
    accepted and still find an obvious near-duplicate pair."""
    from geomesa_spark.operators.dedup import ngram_jaccard_pairs

    base = "the quick brown fox jumps over the lazy dog " * 8
    pdf = pd.DataFrame(
        {
            "doc_id": ["a", "b", "c"],
            "text": [base, base + "!", "completely different content here"],
            "lang": ["en", "en", "en"],
        }
    )
    pairs = ngram_jaccard_pairs(
        spark.createDataFrame(pdf), threshold=0.8, bands=32
    ).collect()
    assert {(r.id_a, r.id_b) for r in pairs} == {("a", "b")}


# ------------------------------------------------------- 3. rect fast path


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


# ------------------------------------------- 4. sessionize custom columns


def test_sessionize_tracks_custom_column_names(spark, tmp_path):
    """Non-default time/lon/lat/key column names must work end-to-end (the
    stateful fn previously hard-coded ts/x/y and raised KeyError)."""
    import time

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


# ------------------------------------------- 5. attr scan extent soundness


def test_attr_scan_extents_keeps_centroid_outside_bbox(spark, tmp_path):
    """Extent whose envelope overlaps the bbox but centroid lies outside:
    geom_kind='extents' must return it (no centroid-z2 conjunct)."""
    from geomesa_spark.sources.attr_index import (
        attr_equality_scan,
        with_z2,
        write_attr_indexed,
    )

    # extent [40,80]x[0,10]: centroid (60,5); bbox [30,  -5, 45, 15] overlaps
    # the extent but NOT the centroid
    pdf = pd.DataFrame(
        {
            "row_id": [1, 2],
            "user_id": [7, 7],
            "x": [60.0, -100.0],  # centroid (z2 key source)
            "y": [5.0, -50.0],
            "minx": [40.0, -100.0],
            "maxx": [80.0, -100.0],
            "miny": [0.0, -50.0],
            "maxy": [10.0, -50.0],
        }
    )
    path = str(tmp_path / "extents_by_user")
    write_attr_indexed(with_z2(spark.createDataFrame(pdf)), path, "user_id")
    bbox = (30.0, -5.0, 45.0, 15.0)
    got = {
        r.row_id
        for r in attr_equality_scan(
            spark, path, "user_id", 7, bbox, geom_kind="extents"
        ).collect()
    }
    assert got == {1}
    with pytest.raises(ValueError):
        attr_equality_scan(spark, path, "user_id", 7, bbox, geom_kind="bogus")
