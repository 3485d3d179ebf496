"""Tiered attribute index: layout write, equality+bbox read path, plan-string
pushdown asserts (AttributeIndexKeySpace.scala:34-71 analog)."""

import pytest
from pyspark.sql import functions as F

from geomesa_spark.sources.attr_index import (
    attr_equality_scan,
    with_z2,
    write_attr_indexed,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def attr_path(spark, tmp_path_factory):
    from geomesa_spark import oracle as O

    e = (
        spark.read.parquet(f"{SF}/events.parquet")
        .withColumn("x", F.expr(O.EVENT_LON))
        .withColumn("y", F.expr(O.EVENT_LAT))
        .withColumn("minx", F.col("x"))
        .withColumn("maxx", F.col("x"))
        .withColumn("miny", F.col("y"))
        .withColumn("maxy", F.col("y"))
    )
    path = str(tmp_path_factory.mktemp("attr") / "events_by_user")
    write_attr_indexed(with_z2(e), path, "user_id")
    return path


def test_attr_equality_row_parity(spark, attr_path):
    """Pruned scan == plain filter, attribute-only and attribute+bbox."""
    full = spark.read.parquet(attr_path)
    for bbox in (None, (-90.0, -45.0, 90.0, 45.0), (-60.0, -30.0, 60.0, 30.0)):
        got = {
            r.event_id
            for r in attr_equality_scan(spark, attr_path, "user_id", 7, bbox).collect()
        }
        cond = F.col("user_id") == 7
        if bbox:
            cond = cond & F.col("x").between(bbox[0], bbox[2]) & F.col("y").between(
                bbox[1], bbox[3]
            )
        want = {r.event_id for r in full.filter(cond).collect()}
        assert got == want and len(want) > 0


def test_attr_scan_plan_shows_both_pushdowns(spark, attr_path):
    """The physical plan must show (1) partition pruning on attr_bucket and
    (2) parquet-pushed filters on the attribute, plus z2 range predicates."""
    df = attr_equality_scan(
        spark, attr_path, "user_id", 7, (-90.0, -45.0, 90.0, 45.0)
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "attr_bucket" in plan
    assert "PushedFilters" in plan and "user_id" in plan.split("PushedFilters", 1)[1][:500]
    assert "z2" in plan


def test_attr_scan_reads_one_bucket(spark, attr_path):
    """Partition pruning: the scan touches exactly one attr_bucket directory."""
    df = attr_equality_scan(spark, attr_path, "user_id", 7)
    plan = df._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"partition count:? (\d+)", plan)
    if m:  # plan-format dependent; row parity above is the hard gate
        assert int(m.group(1)) <= 2


# --------- regressions folded from the round-advice files (round-5 hygiene)


def test_attr_scan_extents_keeps_centroid_outside_bbox(spark, tmp_path):
    """Extent whose envelope overlaps the bbox but centroid lies outside:
    geom_kind='extents' must return it (no centroid-z2 conjunct)."""
    import pandas as pd

    from geomesa_spark.sources.attr_index import (
        attr_equality_scan,
        with_z2,
        write_attr_indexed,
    )

    # extent [40,80]x[0,10]: centroid (60,5); bbox [30, -5, 45, 15] overlaps
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
