"""Partitioned-layout pruning test: write days(ts) x cell layout, verify the
executed plan prunes partitions (day range + cell IN) and pushes envelope
filters to the parquet scan — the Z2Scheme/DateTimeScheme analog (SURVEY §2.9)."""

import pytest

from geomesa_spark.plans.planner import spatial_filter
from geomesa_spark.sources.docs import index_docs, synth_docs, write_indexed


@pytest.fixture(scope="module")
def part_path(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("docs") / "docs_part")
    docs = index_docs(synth_docs(spark, 1500))
    write_indexed(docs, path)
    return path


def test_partition_and_rowgroup_pruning(spark, part_path):
    df = spark.read.parquet(part_path)
    out = spatial_filter(
        df,
        "POLYGON((-10 -10, -10 10, 10 10, 10 -10, -10 -10))",
        interval=("2016-01-05", "2016-01-12"),
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    pf = plan[plan.find("PartitionFilters") :][:300]
    assert "day" in pf and "cell" in pf and "IN" in pf
    assert "PushedFilters" in plan
    push = plan[plan.find("PushedFilters") :][:300]
    assert "GreaterThan" in push or "LessThan" in push


def test_pruned_read_correct(spark, part_path):
    """Pruning must not change results vs an unpartitioned scan."""
    df = spark.read.parquet(part_path)
    wkt = "POLYGON((-10 -10, -10 10, 10 10, 10 -10, -10 -10))"
    pruned = {
        r.doc_id
        for r in spatial_filter(df, wkt, interval=("2016-01-05", "2016-01-12"))
        .select("doc_id")
        .collect()
    }
    # recompute from the raw docs without the partitioned layout
    raw = index_docs(synth_docs(spark, 1500))
    want = {
        r.doc_id
        for r in spatial_filter(raw, wkt, interval=("2016-01-05", "2016-01-12"))
        .select("doc_id")
        .collect()
    }
    assert pruned == want and len(want) > 0


def test_files_are_z2_sorted(spark, part_path):
    """write_indexed orders rows by z2 inside each file, so parquet
    row-group min/max stats are tight on z2 and (by locality) the envelope
    columns."""
    import glob

    import pyarrow.parquet as pq

    files = sorted(glob.glob(f"{part_path}/day=*/cell=*/*.parquet"))
    assert files
    checked = 0
    for f in files[:5]:
        z2 = pq.read_table(f, columns=["z2"])["z2"].to_pylist()
        z2 = [v for v in z2 if v is not None]
        if len(z2) > 1:
            assert z2 == sorted(z2), f
            checked += 1
    assert checked > 0
