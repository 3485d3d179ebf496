"""Batch ANN for query TABLES (round-4 item #1): ann_join gives top-k
cosine neighbors for every row of a query table via IVF cell equi-join —
all state in DataFrames, one shuffle on the cell key.

Covers: exhaustive-probe exactness (nprobe = n_centroids == brute force),
recall vs brute force with a TRAINED codebook on clustered data, null
embeddings, and the no-duplicate-pair property."""

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.similarity import (
    ann_join,
    ivf_centroids,
    ivf_probe_udf,
    random_codebook,
)

DIM = 32
N_CLUSTERS = 12


@pytest.fixture(scope="module")
def clustered(spark):
    """60 points around each of 12 well-separated unit centers."""
    rng = np.random.default_rng(17)
    centers = rng.normal(size=(N_CLUSTERS, DIM))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    rows = []
    for c in range(N_CLUSTERS):
        pts = centers[c] + 0.08 * rng.normal(size=(60, DIM))
        for j, p in enumerate(pts):
            rows.append((c * 60 + j, [float(v) for v in p]))
    pdf = pd.DataFrame(rows, columns=["vec_id", "embedding"])
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")
    return df.cache(), pdf


def _brute(pdf, qvec, k):
    M = np.stack(pdf["embedding"].map(np.asarray))
    cos = (M @ qvec) / (np.linalg.norm(M, axis=1) * np.linalg.norm(qvec))
    order = np.lexsort((pdf["vec_id"].to_numpy(), -np.round(cos, 6)))
    return [int(pdf["vec_id"].iloc[i]) for i in order[:k]]


def test_ann_join_exhaustive_probe_is_exact(spark, clustered):
    """nprobe = n_centroids scans every cell -> must equal brute force."""
    df, pdf = clustered
    qids = [0, 125, 301, 710]
    q = df.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    C = random_codebook(DIM, 8, seed=3)
    out = ann_join(df, q, k=5, nprobe=8, centroids=C)
    got = out.toPandas()
    assert sorted(got["query_id"].unique()) == qids
    for qid in qids:
        qvec = np.asarray(pdf[pdf.vec_id == qid]["embedding"].iloc[0])
        want = _brute(pdf, qvec, 5)
        have = list(
            got[got.query_id == qid].sort_values("rank")["vec_id"].astype(int)
        )
        assert have == want, (qid, have, want)


def test_ann_join_trained_codebook_recall(spark, clustered):
    """Trained spherical-kmeans codebook, nprobe=3 of 12: recall@5 >= 0.9
    averaged over a 36-query table (clustered data is the IVF use case)."""
    df, pdf = clustered
    q = df.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    C = ivf_centroids(df, n_centroids=N_CLUSTERS, sample_n=720)
    out = ann_join(df, q, k=5, nprobe=3, centroids=C).toPandas()
    qids = sorted(pdf[pdf.vec_id % 20 == 0]["vec_id"])
    hits = total = 0
    for qid in qids:
        qvec = np.asarray(pdf[pdf.vec_id == qid]["embedding"].iloc[0])
        want = set(_brute(pdf, qvec, 5))
        have = set(got for got in out[out.query_id == qid]["vec_id"].astype(int))
        hits += len(want & have)
        total += 5
    assert total == 5 * len(qids)
    assert hits / total >= 0.9, hits / total


def test_ann_join_no_duplicate_pairs_and_rank_shape(spark, clustered):
    """A (query, doc) pair can meet in at most one cell; ranks are 1..k
    dense per query."""
    df, _ = clustered
    q = df.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann_join(df, q, k=7, nprobe=4, centroids=random_codebook(DIM, 8, seed=3))
    got = out.toPandas()
    assert not got.duplicated(["query_id", "vec_id"]).any()
    for _, grp in got.groupby("query_id"):
        assert sorted(grp["rank"]) == list(range(1, len(grp) + 1))


def test_ann_join_null_embeddings_skipped(spark):
    pdf = pd.DataFrame(
        {
            "vec_id": [1, 2, 3],
            "embedding": [[1.0, 0.0], None, [0.9, 0.1]],
        }
    )
    df = spark.createDataFrame(pdf, "vec_id long, embedding array<double>")
    q = spark.createDataFrame(
        pd.DataFrame({"query_id": [10], "embedding": [[1.0, 0.05]]}),
        "query_id long, embedding array<double>",
    )
    out = ann_join(df, q, k=5, nprobe=4, centroids=random_codebook(2, 4)).toPandas()
    assert set(out["vec_id"]) == {1, 3}  # null corpus row never matches


def test_ivf_probe_udf_matches_numpy(spark):
    """Probe ranking (d desc, i asc on round-9 dots) matches the driver-side
    rule used by ann_topk_ivf."""
    C = random_codebook(16, 8, seed=5)
    rng = np.random.default_rng(2)
    vecs = rng.normal(size=(40, 16))
    pdf = pd.DataFrame(
        {"i": range(40), "v": [[float(x) for x in row] for row in vecs]}
    )
    df = spark.createDataFrame(pdf, "i long, v array<double>")
    got = (
        df.withColumn("p", ivf_probe_udf(C, 3)(F.col("v")))
        .orderBy("i")
        .toPandas()["p"]
    )
    for i in range(40):
        d = np.round(vecs[i] @ C.T, 9)
        want = list(np.argsort(-d, kind="stable")[:3])
        assert list(got.iloc[i]) == want, i


# ----------------------------------------------------------- LSH batch ANN


def test_ann_join_lsh_zero_bits_is_brute_force(spark, clustered):
    """bits=0 puts everything in one bucket per table -> exact top-k."""
    from geomesa_spark.operators.similarity import ann_join_lsh

    df, pdf = clustered
    qids = [0, 301, 710]
    q = df.filter(F.col("vec_id").isin(qids)).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann_join_lsh(df, q, k=5, bits=0, tables=1).toPandas()
    for qid in qids:
        qvec = np.asarray(pdf[pdf.vec_id == qid]["embedding"].iloc[0])
        want = _brute(pdf, qvec, 5)
        have = list(
            out[out.query_id == qid].sort_values("rank")["vec_id"].astype(int)
        )
        assert have == want, (qid, have, want)


def test_ann_join_lsh_recall_and_no_duplicates(spark, clustered):
    """Multi-table LSH on clustered data: recall@5 >= 0.85 over 36 queries;
    pairs that met in several tables emit once."""
    from geomesa_spark.operators.similarity import ann_join_lsh

    df, pdf = clustered
    q = df.filter(F.col("vec_id") % 20 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = ann_join_lsh(df, q, k=5, bits=6, tables=8).toPandas()
    assert not out.duplicated(["query_id", "vec_id"]).any()
    qids = sorted(pdf[pdf.vec_id % 20 == 0]["vec_id"])
    hits = total = 0
    for qid in qids:
        qvec = np.asarray(pdf[pdf.vec_id == qid]["embedding"].iloc[0])
        want = set(_brute(pdf, qvec, 5))
        have = set(out[out.query_id == qid]["vec_id"].astype(int))
        hits += len(want & have)
        total += 5
    assert hits / total >= 0.85, hits / total


def test_ann_join_cell_salt_identical_results(spark, clustered):
    """cell_salt=4 hash-splits every cell (bounded cogroup blocks) without
    changing a single output row."""
    df, pdf = clustered
    q = df.filter(F.col("vec_id") % 40 == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    C = random_codebook(DIM, 8, seed=3)
    plain = sorted(
        (r.query_id, r.vec_id, r.score, r.rank)
        for r in ann_join(df, q, k=5, nprobe=3, centroids=C).collect()
    )
    salted = sorted(
        (r.query_id, r.vec_id, r.score, r.rank)
        for r in ann_join(df, q, k=5, nprobe=3, centroids=C, cell_salt=4).collect()
    )
    assert plain == salted and len(plain) > 0


def test_ann_join_string_ids(spark):
    """Output schema follows caller id dtypes (string ids end-to-end)."""
    from geomesa_spark.operators.similarity import ann_join_lsh

    pdf = pd.DataFrame(
        {
            "vec_id": [f"doc-{i:03d}" for i in range(60)],
            "embedding": [
                [float(((i * 31 + j * 17) % 97) - 48) for j in range(8)]
                for i in range(60)
            ],
        }
    )
    df = spark.createDataFrame(pdf, "vec_id string, embedding array<double>")
    q = df.limit(5).select(F.col("vec_id").alias("query_id"), "embedding")
    for out in (
        ann_join(df, q, k=3, nprobe=4, centroids=random_codebook(8, 4)),
        ann_join_lsh(df, q, k=3, bits=2, tables=2),
    ):
        rows = out.collect()
        assert len(rows) == 15
        assert all(isinstance(r.query_id, str) and isinstance(r.vec_id, str) for r in rows)
        # every query's own vector is its rank-1 neighbor (cosine 1.0)
        assert {(r.query_id, r.vec_id) for r in rows if r.rank == 1} == {
            (f"doc-{i:03d}", f"doc-{i:03d}") for i in range(5)
        }
