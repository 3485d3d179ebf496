"""Similarity search over embedding columns (array<float>).

Brute-force cosine top-k as the exactness baseline; random-hyperplane LSH
bucketing as the 100TB scale path (bucket equi-join instead of cross join).
Dot products are pure Column expressions (zip_with + aggregate -> codegen),
no Python in the hot path."""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def dot_col(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def norm_col(a):
    return F.sqrt(
        F.aggregate(
            a, F.lit(0.0), lambda acc, v: acc + v.cast("double") * v.cast("double")
        )
    )


def cosine_col(a, b):
    return dot_col(a, b) / (norm_col(a) * norm_col(b))


def brute_force_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k vs one query vector: one scan, one top-k reduce
    (no shuffle of the vectors themselves)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col), F.round(cosine_col(F.col(vec_col), q), 6).alias("score")
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "score", "rank")
    )


def rp_bucket_col(vec, bits: int, seed: int = 42, dim_hint: int | None = None):
    """Random-hyperplane LSH bucket id: sign bits of `bits` projections.
    Hyperplane h_b component j = +-1 derived from a deterministic hash of
    (seed, b, j) — computable as a Column without materializing matrices."""
    def proj(b):
        # sum_j vec[j] * sign(hash(seed, b, j))
        return F.aggregate(
            F.zip_with(
                vec,
                F.sequence(F.lit(0), F.size(vec) - 1),
                lambda v, j: v.cast("double")
                * F.when(
                    F.pmod(F.xxhash64(F.lit(seed), F.lit(b), j), F.lit(2)) == 0,
                    F.lit(1.0),
                ).otherwise(F.lit(-1.0)),
            ),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )

    bucket = F.lit(0).cast("long")
    for b in range(bits):
        bucket = bucket + F.when(proj(b) > 0, F.lit(1 << b).cast("long")).otherwise(
            F.lit(0).cast("long")
        )
    return bucket


def ann_topk_lsh(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    bits: int = 8,
    probes: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed: int = 42,
) -> DataFrame:
    """Approximate top-k: score only vectors in the query's bucket and its
    `probes` nearest buckets (by Hamming distance). At scale the table is
    bucketed/partitioned on the LSH key so this prunes partitions."""
    qv = np.asarray(query_vec, dtype=np.float64)

    # compute the query's bucket with the same deterministic hyperplanes
    # (must match rp_bucket_col: sign of hash-derived +-1 dot product)
    import pandas as pd
    from pyspark.sql import SparkSession

    spark = df.sparkSession
    qdf = spark.createDataFrame([(query_vec,)], f"{vec_col} array<double>")
    qbucket = qdf.select(rp_bucket_col(F.col(vec_col), bits, seed).alias("b")).collect()[0]["b"]

    # probe buckets: qbucket plus single-bit flips ordered by bit index
    buckets = [qbucket] + [qbucket ^ (1 << i) for i in range(min(probes, bits))]

    bdf = df.withColumn("_bkt", rp_bucket_col(F.col(vec_col), bits, seed))
    cand = bdf.filter(F.col("_bkt").isin(buckets))
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = cand.select(
        F.col(id_col), F.round(cosine_col(F.col(vec_col), q), 6).alias("score")
    )
    w = Window.orderBy(F.col("score").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(id_col, "score", "rank")
    )
