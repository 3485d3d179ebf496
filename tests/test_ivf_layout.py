"""Persisted IVF layout (round-4 item #4): embeddings partitioned by
codebook cell; probes prune partitions (PartitionFilters in the plan) and
scan results match the in-memory operators exactly."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.similarity import (
    ann_join,
    ann_topk_ivf,
    random_codebook,
)
from geomesa_spark.sources.ivf_index import (
    ann_join_scan,
    ann_topk_ivf_scan,
    write_ivf_indexed,
)

DIM = 24
N_CENT = 8


@pytest.fixture(scope="module")
def layout(spark, tmp_path_factory):
    rng = np.random.default_rng(9)
    vecs = rng.normal(size=(600, DIM))
    pdf = pd.DataFrame(
        {
            "vec_id": range(600),
            "embedding": [[float(x) for x in v] for v in vecs],
        }
    )
    # one null embedding must not break the write or ever be probed
    pdf.at[17, "embedding"] = None
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")
    C = random_codebook(DIM, N_CENT, seed=4)
    path = str(tmp_path_factory.mktemp("ivf") / "emb_ivf")
    write_ivf_indexed(df, path, C)
    return path, C, df, pdf


def test_layout_directories_per_cell(layout):
    import os

    path, C, df, pdf = layout
    cells = sorted(
        d for d in os.listdir(path) if d.startswith("ivf_cell=")
    )
    vals = {d.split("=")[1] for d in cells}
    assert "__HIVE_DEFAULT_PARTITION__" in vals  # the null row
    assert len(vals - {"__HIVE_DEFAULT_PARTITION__"}) >= N_CENT - 1


def test_scan_plan_has_partition_filters(spark, layout):
    path, C, df, pdf = layout
    qvec = pdf["embedding"].iloc[0]
    scan = ann_topk_ivf_scan(spark, path, qvec, C, k=10, nprobe=3)
    plan = scan._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "ivf_cell" in plan
    # the probe set must appear as partition filters, not data filters:
    # after pruning, only the probed cells' files are read
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ivf_cell" in m.group(1), plan


def test_scan_matches_in_memory_operator(spark, layout):
    path, C, df, pdf = layout
    qvec = pdf["embedding"].iloc[5]
    mem = ann_topk_ivf(df, qvec, k=10, nprobe=3, centroids=C).collect()
    scan = ann_topk_ivf_scan(spark, path, qvec, C, k=10, nprobe=3).collect()
    assert [(r.vec_id, r.score, r.rank) for r in mem] == [
        (r.vec_id, r.score, r.rank) for r in scan
    ]
    assert len(mem) == 10


def test_join_scan_matches_ann_join(spark, layout):
    path, C, df, pdf = layout
    q = df.filter((F.col("vec_id") % 50 == 0) & F.col("embedding").isNotNull()).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    mem = ann_join(df, q, k=5, nprobe=3, centroids=C).collect()
    scan = ann_join_scan(spark, path, q, C, k=5, nprobe=3).collect()
    key = lambda r: (r.query_id, r.rank)
    assert sorted([(r.query_id, r.vec_id, r.score, r.rank) for r in mem]) == sorted(
        [(r.query_id, r.vec_id, r.score, r.rank) for r in scan]
    )
    assert len(mem) == 5 * 12


def test_join_scan_plan_prunes_partitions(spark, layout):
    path, C, df, pdf = layout
    # a single query probing 2 cells: the scan must list ONLY those cells
    q = df.filter(F.col("vec_id") == 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann_join_scan(spark, path, q, C, k=3, nprobe=2)
    plan = out._jdf.queryExecution().executedPlan().toString()
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "ivf_cell" in m.group(1), plan
    out.collect()
