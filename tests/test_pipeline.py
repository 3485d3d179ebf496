"""End-to-end pipeline tests: docs synthesis -> index job -> pushdown filter
-> spatial join, checked against brute-force oracles (reference test shape:
SparkSQLDataTest.scala:404-458 join-equivalence, tightened from count equality
to row-set equality per BASELINE.md)."""

import numpy as np
import pandas as pd
import pytest

from geomesa_spark.geom import algorithms as alg
from geomesa_spark.geom.wkb import from_wkb
from geomesa_spark.geom.wkt import from_wkt
from geomesa_spark.operators.spatial_join import spatial_join
from geomesa_spark.plans.planner import plan, apply_plan, spatial_filter
from geomesa_spark.sources.docs import index_docs, synth_docs, synth_docs_pdf


@pytest.fixture(scope="module")
def docs_indexed(spark):
    df = index_docs(synth_docs(spark, 800)).cache()
    df.count()
    return df


@pytest.fixture(scope="module")
def docs_pdf():
    return synth_docs_pdf(800)


def brute_force_filter(docs_pdf, qgeom, predicate):
    out = set()
    for _, row in docs_pdf.iterrows():
        wkt = next(s["text"] for s in row["spans"] if s["kind"] == "geo")
        g = from_wkt(wkt)
        if predicate == "intersects":
            ok = alg.intersects(g, qgeom)
        elif predicate == "contains":
            ok = alg.contains(qgeom, g)
        elif predicate == "within":
            ok = alg.within(g, qgeom)
        else:
            raise ValueError(predicate)
        if ok:
            out.add(row["doc_id"])
    return out


def test_index_job_schema_and_invariant(spark, docs_indexed, docs_pdf):
    cols = set(docs_indexed.columns)
    assert {"doc_id", "spans", "geom_wkb", "ts", "x", "y", "z2", "week_bin", "z3", "xz2", "cell", "day"} <= cols
    # span-sequence invariant: spans unchanged through the index job
    out = {r["doc_id"]: r["spans"] for r in docs_indexed.select("doc_id", "spans").collect()}
    for _, row in docs_pdf.head(50).iterrows():
        got = [(s.kind, s.text, s.media_ref, s.offset) for s in out[row["doc_id"]]]
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in row["spans"]]
        assert got == want


@pytest.mark.parametrize(
    "wkt,predicate",
    [
        ("POLYGON((-10 -10, -10 10, 10 10, 10 -10, -10 -10))", "intersects"),
        ("POLYGON((-10 -10, -10 10, 10 10, 10 -10, -10 -10))", "contains"),
        ("POLYGON((0 0, 0 30, 40 30, 40 0, 0 0))", "within"),
        # non-rectangular query polygon (triangle): exercises the refine UDF
        ("POLYGON((-20 -20, 20 -20, 0 25, -20 -20))", "intersects"),
    ],
)
def test_spatial_filter_vs_brute_force(spark, docs_indexed, docs_pdf, wkt, predicate):
    q = from_wkt(wkt)
    got = {
        r.doc_id
        for r in spatial_filter(docs_indexed, wkt, predicate).select("doc_id").collect()
    }
    want = brute_force_filter(docs_pdf, q, predicate)
    assert got == want


def test_temporal_filter(spark, docs_indexed, docs_pdf):
    qp = plan(
        "POLYGON((-180 -90, -180 90, 180 90, 180 -90, -180 -90))",
        "intersects",
        interval=("2016-01-05", "2016-01-12"),
    )
    got = {r.doc_id for r in apply_plan(docs_indexed, qp).select("doc_id").collect()}
    lo = pd.Timestamp("2016-01-05", tz="UTC")
    hi = pd.Timestamp("2016-01-12", tz="UTC")
    want = set()
    for _, row in docs_pdf.iterrows():
        iso = next(s["text"] for s in row["spans"] if s["kind"] == "time")
        t = pd.Timestamp(iso)
        if lo <= t < hi:
            want.add(row["doc_id"])
    assert got == want


def test_pushdown_prunes(spark, docs_indexed):
    """Plan shape check: the filtered plan must contain pushable comparisons,
    not a bare UDF filter over the full scan."""
    df = spatial_filter(docs_indexed, "POLYGON((-10 -10, -10 10, 10 10, 10 -10, -10 -10))")
    plan_str = df._jdf.queryExecution().executedPlan().toString()
    assert "minx" in plan_str and "cell" in plan_str


# ------------------------------------------------------------- spatial join


@pytest.fixture(scope="module")
def join_sides(spark):
    """Reference join-oracle shape (SparkSQLDataTest.scala:404-458): seeded
    random points x small polygons, confined to a dense region so the join
    is non-trivial (hundreds of matching pairs)."""
    region = (-3.0, -3.0, 3.0, 3.0)
    left = index_docs(synth_docs(spark, 600, seed=42, bbox=region)).cache()
    right = index_docs(synth_docs(spark, 120, seed=7, bbox=region)).cache()
    left.count(), right.count()
    return left, right


def brute_force_join(spark, left, right, predicate):
    lrows = [(r.doc_id, bytes(r.geom_wkb)) for r in left.select("doc_id", "geom_wkb").collect()]
    rrows = [(r.doc_id, bytes(r.geom_wkb)) for r in right.select("doc_id", "geom_wkb").collect()]
    fn = getattr(alg, predicate)
    out = set()
    geos_l = [(i, from_wkb(w)) for i, w in lrows]
    geos_r = [(i, from_wkb(w)) for i, w in rrows]
    for li, lg in geos_l:
        for ri, rg in geos_r:
            if fn(lg, rg):
                out.add((li, ri))
    return out


@pytest.mark.parametrize("predicate", ["intersects", "within", "covers", "contains"])
def test_spatial_join_row_parity(spark, join_sides, predicate):
    left, right = join_sides
    got_df = spatial_join(left, right, predicate=predicate)
    got = {(r.doc_id, r.doc_id_r) for r in got_df.select("doc_id", "doc_id_r").collect()}
    want = brute_force_join(spark, left, right, predicate)
    assert len(want) > 15, "fixture must be non-trivial"
    assert got == want


def test_spatial_join_no_duplicates(spark, join_sides):
    left, right = join_sides
    got_df = spatial_join(left, right, predicate="intersects")
    n = got_df.count()
    nd = got_df.select("doc_id", "doc_id_r").dropDuplicates().count()
    assert n == nd


def test_spatial_join_broadcast_and_salt_same_result(spark, join_sides):
    left, right = join_sides
    base = {
        (r.doc_id, r.doc_id_r)
        for r in spatial_join(left, right).select("doc_id", "doc_id_r").collect()
    }
    bcast = {
        (r.doc_id, r.doc_id_r)
        for r in spatial_join(left, right, broadcast=True)
        .select("doc_id", "doc_id_r")
        .collect()
    }
    salted = {
        (r.doc_id, r.doc_id_r)
        for r in spatial_join(left, right, salt=4).select("doc_id", "doc_id_r").collect()
    }
    assert base == bcast == salted


def test_spatial_join_semi_anti(spark, join_sides):
    left, right = join_sides
    inner = spatial_join(left, right)
    semi = spatial_join(left, right, how="left_semi")
    anti = spatial_join(left, right, how="left_anti")
    inner_ids = {r.doc_id for r in inner.select("doc_id").collect()}
    semi_ids = {r.doc_id for r in semi.select("doc_id").collect()}
    anti_ids = {r.doc_id for r in anti.select("doc_id").collect()}
    assert semi_ids == inner_ids
    assert semi_ids | anti_ids == {r.doc_id for r in left.select("doc_id").collect()}
    assert not (semi_ids & anti_ids)
