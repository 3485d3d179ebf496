"""Z3 spatio-temporal pushdown: the (week_bin, z3) range predicate must be a
pure superset filter — adding it to a query never changes results (recall
invariant, Z3IndexKeySpace semantics)."""

import pytest
from pyspark.sql import functions as F

from geomesa_spark.plans.planner import apply_plan, plan, z3_predicate
from geomesa_spark.sources.docs import index_docs, synth_docs


@pytest.fixture(scope="module")
def docs(spark):
    df = index_docs(synth_docs(spark, 1200)).cache()
    df.count()
    return df


def test_z3_predicate_no_false_negatives(spark, docs):
    wkt = "POLYGON((-30 -20, -30 25, 20 25, 20 -20, -30 -20))"
    interval = ("2016-01-03", "2016-01-20")
    qp = plan(wkt, "intersects", interval=interval)
    base = {r.doc_id for r in apply_plan(docs, qp).select("doc_id").collect()}
    z3c = z3_predicate(qp.bboxes, interval)
    assert z3c is not None
    with_z3 = {
        r.doc_id
        for r in apply_plan(docs.filter(z3c), qp).select("doc_id").collect()
    }
    assert with_z3 == base
    assert len(base) > 0


def test_z3_predicate_is_selective(spark, docs):
    """The z3 prefilter alone should reduce the candidate set well below the
    full table for a small window (points-only check: polygons' centroid z3
    may sit outside the window legitimately)."""
    pts = docs.filter("x = minx")
    interval = ("2016-01-03", "2016-01-06")
    qp = plan("POLYGON((-10 -10, -10 10, 10 10, 10 -10, -10 -10))", interval=interval)
    z3c = z3_predicate(qp.bboxes, interval)
    n_all = pts.count()
    n_pre = pts.filter(z3c).count()
    n_exact = apply_plan(pts, qp).count()
    assert n_exact <= n_pre < n_all * 0.5


# --------- regressions folded from the round-advice files (round-5 hygiene)


def test_z3_predicate_includes_interval_upper_boundary(spark):
    """Doc timestamp == interval upper bound == z3 time-cell boundary ->
    the (week_bin, z3) pushdown must keep the row (no epsilon shrink)."""
    import pandas as pd

    from geomesa_spark.index.zorder import (
        SECONDS_PER,
        WORLD,
        Z3_BITS,
        interleave3,
        normalize,
    )

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
