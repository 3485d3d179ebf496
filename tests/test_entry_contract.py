"""Mimics the driver's correctness gate: run every queries() entry and its
oracle_sql() in DuckDB over the same parquet, compare row counts and
(order-insensitive) values. Uses sf0.001 for speed; the driver runs sf0.01."""

import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod

import os as _os
SF_DIR = _os.environ.get("CONTRACT_SF_DIR", "/root/testdata/sf0.001")
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"create view {t} as select * from '{SF_DIR}/{t}.parquet'")
    return con


def normalize(rows, cols):
    out = []
    for row in rows:
        vals = []
        for c in cols:
            v = row[c] if not isinstance(row, tuple) else row[cols.index(c)]
            if isinstance(v, float):
                if math.isnan(v):
                    v = "nan"
                else:
                    v = round(v, 9)
            vals.append(v)
        out.append(tuple(vals))
    return sorted(out, key=lambda t: tuple(str(x) for x in t))


ORACLES = entrymod.oracle_sql()
QUERIES = entrymod.queries()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


@pytest.mark.parametrize("name", sorted(ORACLES.keys()))
def test_query_matches_oracle(spark, duck, name):
    sdf = QUERIES[name](spark, SF_DIR)
    cols = sdf.columns
    srows = [tuple(r[c] for c in cols) for r in sdf.collect()]
    orows = duck.sql(ORACLES[name]).fetchall()
    got = normalize([dict(zip(cols, r)) for r in srows], cols)
    want = normalize([dict(zip(cols, r)) for r in orows], cols)
    assert len(got) == len(want), f"{name}: row count {len(got)} != {len(want)}"
    assert got == want, f"{name}: value mismatch\nfirst got:  {got[:3]}\nfirst want: {want[:3]}"


@pytest.mark.parametrize("name", sorted(set(QUERIES) - set(ORACLES)))
def test_rows_only_queries_run(spark, name):
    sdf = QUERIES[name](spark, SF_DIR)
    assert sdf.count() >= 0


def test_nontrivial_results(spark, duck):
    """Guard against vacuous oracles: these queries must return rows."""
    for name in [
        "spatial_pip_filter", "spatial_join_pip", "knn_geodesic",
        "tile_assignment_z8", "density_grid", "track_length",
        "stats_minmax", "tpch_q1ish", "ann_cosine_topk",
    ]:
        n = duck.sql(ORACLES[name]).df().shape[0]
        assert n > 0, f"{name} oracle returned no rows"
