"""Persisted IVF (inverted-file) layout for embedding tables.

Vectors are written PARTITIONED BY their coarse-quantizer cell, so an ANN
probe becomes Spark PARTITION PRUNING: scanning nprobe of n_centroids cells
reads nprobe/n_centroids of the files — the classic IVF index (Jegou et
al., "Product Quantization for Nearest Neighbor Search", TPAMI'11)
expressed as a partitioned table instead of a custom file format.

Reference-shape analog: the index-key partition pruning the whole engine is
built on (reference Z2Scheme partition scheme semantics,
geomesa-fs-storage/.../Z2Scheme.scala:31-55) — here the "curve" is the
codebook cell id.

Within each cell files are sorted by vec_id so id-range lookups inside a
cell also prune row groups.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.similarity import (
    _topk,
    cosine_query_udf,
    ivf_assign_udf,
    ivf_probe_udf,
)


def write_ivf_indexed(
    df: DataFrame,
    path: str,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    fmt: str = "parquet",
) -> None:
    """Write the IVF layout: one directory per codebook cell
    (partitionBy("ivf_cell")), vec_id-sorted within files. Assignment is the
    same one-matmul-per-Arrow-batch UDF the query side mirrors, so a row's
    partition and a query's probe set always agree. NULL embeddings land in
    the HIVE_DEFAULT_PARTITION directory and are never probed."""
    out = df.withColumn("ivf_cell", ivf_assign_udf(centroids)(F.col(vec_col)))
    (
        out.repartition("ivf_cell")
        .sortWithinPartitions(id_col)
        .write.mode("overwrite")
        .format(fmt)
        .partitionBy("ivf_cell")
        .save(path)
    )


def _probe_cells(centroids: np.ndarray, query_vec, nprobe: int) -> list[int]:
    """nprobe nearest cells for one vector, driver-side numpy — the same
    (round-9 dot desc, index asc) rule as ivf_probe_udf / the SQL mirror."""
    qv = np.asarray(query_vec, dtype=np.float64)
    qd = np.round(np.asarray(centroids, dtype=np.float64) @ qv, 9)
    return [int(i) for i in np.argsort(-qd, kind="stable")[:nprobe]]


def ann_topk_ivf_scan(
    spark: SparkSession,
    path: str,
    query_vec: list[float],
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Single-vector top-k over the PERSISTED layout: the probe set is a
    literal isin on the partition column, so the scan's PartitionFilters
    prune every non-probed cell's files before any IO. Same results as
    similarity.ann_topk_ivf with the same codebook (tested)."""
    probe = _probe_cells(centroids, query_vec, nprobe)
    cand = spark.read.parquet(path).filter(F.col("ivf_cell").isin(probe))
    scored = cand.select(
        F.col(id_col),
        F.round(cosine_query_udf(query_vec)(F.col(vec_col)), 6).alias("score"),
    )
    return _topk(scored, k, id_col)


def ann_join_scan(
    spark: SparkSession,
    path: str,
    queries: DataFrame,
    centroids: np.ndarray,
    k: int = 10,
    nprobe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    q_vec_col: str = "embedding",
    q_id_col: str = "query_id",
) -> DataFrame:
    """Batch ANN over the persisted layout (the scan form of
    operators.similarity.ann_join). The union of all queries' probe cells is
    bounded by n_centroids — NOT by the query count — so collecting it to
    the driver for the partition-pruning isin stays O(codebook) no matter
    how large the query table is; the per-pair candidate generation remains
    a distributed cell equi-join."""
    from pyspark.sql.types import DoubleType, StructField, StructType

    from ..operators.similarity import _cogroup_topk_by_cell

    qx = queries.select(
        F.col(q_id_col).alias("query_id"),
        F.col(q_vec_col).alias("_qv"),
        F.explode(
            ivf_probe_udf(np.asarray(centroids), nprobe)(F.col(q_vec_col))
        ).alias("ivf_cell"),
    )
    cells = [int(r[0]) for r in qx.select("ivf_cell").distinct().collect()]
    corp = (
        spark.read.parquet(path)
        .filter(F.col("ivf_cell").isin(cells))
        .select(
            F.col(id_col).alias("vec_id"),
            F.col(vec_col).alias("_v"),
            F.col("ivf_cell").cast("int").alias("ivf_cell"),
        )
    )
    out_schema = StructType(
        [
            StructField("query_id", queries.schema[q_id_col].dataType),
            StructField("vec_id", corp.schema["vec_id"].dataType),
            StructField("score", DoubleType()),
        ]
    )
    return _cogroup_topk_by_cell(corp, qx, "ivf_cell", k, out_schema)
