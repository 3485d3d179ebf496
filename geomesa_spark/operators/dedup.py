"""Deduplication operators for large-scale training-data pipelines.

Exact (hash groupBy), n-gram Jaccard (blocked pair generation), MinHash+LSH
(shingle -> minhash -> band -> bucket join), SimHash, and embedding-cosine
near-dup. All shuffle-aware: candidate generation is always a blocked/bucketed
equi-join — never a cross join — so the plan scales with duplicate density,
not n^2."""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, LongType


def _ensure_parallel(df: DataFrame) -> DataFrame:
    """Single-file reads arrive as one partition; spread heavy per-row work."""
    par = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < par:
        return df.repartition(par)
    return df


def shingles_col(text_col, k: int = 3):
    """Distinct lowercase character k-shingles as a Column (pure built-ins)."""
    t = F.lower(text_col)
    return F.array_distinct(
        F.transform(
            F.sequence(F.lit(1), F.greatest(F.length(t) - (k - 1), F.lit(1))),
            lambda i: F.substring(t, i, k),
        )
    )


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: (text_hash, n_dups, canonical_id, dup_ids).
    One shuffle on the 256-bit hash; map-side partial agg applies."""
    h = F.sha2(F.col(text_col), 256).alias("text_hash")
    return (
        df.select(h, F.col(id_col))
        .groupBy("text_hash")
        .agg(
            F.count("*").alias("n_dups"),
            F.min(id_col).alias("canonical_id"),
            F.sort_array(F.collect_list(id_col)).alias("dup_ids"),
        )
        .filter(F.col("n_dups") > 1)
    )


def ngram_jaccard_pairs(
    df: DataFrame,
    threshold: float = 0.9,
    k: int = 3,
    block_col: str | None = "lang",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Near-duplicate pairs by character-k-gram Jaccard >= threshold.
    Blocking: pairs are generated only within `block_col` groups (equi-join,
    one shuffle) — the deterministic analog of LSH banding for moderate
    cardinality blocks."""
    sh = _ensure_parallel(df).select(
        F.col(id_col), F.col(block_col) if block_col else F.lit(0).alias("_b"),
        shingles_col(F.col(text_col), k).alias("_sh"),
    )
    b = block_col or "_b"
    a = sh.alias("a")
    c = sh.alias("c")
    pairs = a.join(c, on=b).filter(F.col(f"a.{id_col}") < F.col(f"c.{id_col}"))
    jac = F.size(F.array_intersect("a._sh", "c._sh")) / F.size(
        F.array_union("a._sh", "c._sh")
    )
    return pairs.select(
        F.col(f"a.{id_col}").alias("id_a"),
        F.col(f"c.{id_col}").alias("id_b"),
        jac.alias("jaccard"),
    ).filter(F.col("jaccard") >= threshold)


# ------------------------------------------------------------------ MinHash


def _minhash_udf(num_hashes: int, k: int, seed: int = 42):
    """shingle array -> minhash signature, fully vectorized numpy.

    Shingles (short strings) pack directly into uint64 words via a fixed-width
    bytes view; the hash family is h_i(x) = (a_i*x + b_i) mod (2^31-1) with
    a,b,x < 2^31 so products stay inside uint64 — no object math, one matrix
    op per document."""
    rng = np.random.default_rng(seed)
    P = np.uint64((1 << 31) - 1)
    A = rng.integers(1, int(P), num_hashes, dtype=np.uint64)
    B = rng.integers(0, int(P), num_hashes, dtype=np.uint64)

    def mh(shingles: pd.Series) -> pd.Series:
        out = []
        for arr in shingles:
            if arr is None or len(arr) == 0:
                out.append(None)
                continue
            # pack each shingle's first 8 utf-8 bytes into a uint64
            packed = np.frombuffer(
                np.asarray(arr, dtype="S8").tobytes(), dtype=np.uint64
            )
            x = ((packed >> np.uint64(31)) ^ packed) & P  # fold to 31 bits
            sig = ((A[:, None] * x[None, :] + B[:, None]) % P).min(axis=1)
            out.append([int(v) for v in sig])
        return pd.Series(out, dtype=object)

    return F.pandas_udf(mh, ArrayType(LongType()))


def minhash_lsh_pairs(
    df: DataFrame,
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """MinHash + LSH near-dup candidates, verified by estimated Jaccard.

    shingle -> minhash signature -> band buckets -> bucket equi-join (the
    scale path: shuffle keyed on (band, bucket-hash); a pair collides in some
    band with prob 1-(1-s^r)^b). Returns (id_a, id_b, est_jaccard >= threshold).
    """
    rows_per_band = num_hashes // bands
    mh = _minhash_udf(num_hashes, k)
    df = _ensure_parallel(df)
    sig = df.select(
        F.col(id_col), shingles_col(F.col(text_col), k).alias("_sh")
    ).withColumn("_sig", mh(F.col("_sh"))).filter(F.col("_sig").isNotNull())
    sig = sig.persist()
    # candidate generation shuffles ONLY (id, band, bucket) — signatures are
    # re-attached afterwards (high-collision corpora otherwise shuffle the
    # full 64-long signature per candidate pair)
    bands_df = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.xxhash64(
                            F.slice(F.col("_sig"), i * rows_per_band + 1, rows_per_band)
                        ).alias("bucket"),
                    )
                    for i in range(bands)
                ]
            )
        ).alias("_bb"),
    ).select(id_col, "_bb.band", "_bb.bucket")
    a = bands_df.alias("a")
    b = bands_df.alias("b")
    cand = (
        a.join(b, on=["band", "bucket"])
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    sigs = sig.select(F.col(id_col), F.col("_sig"))
    cand = cand.join(
        F.broadcast(sigs.withColumnRenamed(id_col, "id_a").withColumnRenamed("_sig", "_siga")),
        on="id_a",
    ).join(
        F.broadcast(sigs.withColumnRenamed(id_col, "id_b").withColumnRenamed("_sig", "_sigb")),
        on="id_b",
    )
    est = F.size(
        F.filter(
            F.zip_with("_siga", "_sigb", lambda x, y: x == y), lambda v: v
        )
    ) / F.lit(float(num_hashes))
    return cand.select("id_a", "id_b", est.alias("est_jaccard")).filter(
        F.col("est_jaccard") >= threshold
    )


# ------------------------------------------------------------------ SimHash


def simhash_col(text_col, bits: int = 64):
    """64-bit SimHash over whitespace tokens as a Column expression:
    bit b of the signature = sign of sum over tokens of (+-1 by token-hash
    bit b). Pure built-ins (xxhash64 + aggregate)."""
    tokens = F.split(F.lower(text_col), " ")
    # for each bit, sum +-1 across tokens, then pack sign bits
    def bit(b):
        contrib = F.aggregate(
            tokens,
            F.lit(0),
            lambda acc, t: acc
            + F.when(F.shiftright(F.xxhash64(t), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1),
        )
        return F.when(contrib > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long")) * F.lit(1 << b).cast("long")

    return sum([bit(b) for b in range(bits - 1)], F.lit(0).cast("long"))


def simhash_pairs(
    df: DataFrame,
    max_hamming: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    prefix_bits: int = 16,
) -> DataFrame:
    """Near-dup candidates with Hamming(simhash) <= max_hamming, bucketed by
    signature prefix (standard simhash table trick; multiple rotations would
    give full recall — one prefix table is the demonstration path)."""
    sh = _ensure_parallel(df).select(F.col(id_col), simhash_col(F.col(text_col)).alias("_sh"))
    bucket = F.shiftrightunsigned(F.col("_sh"), 64 - prefix_bits).alias("_bkt")
    sb = sh.select(id_col, "_sh", bucket)
    a = sb.alias("a")
    b = sb.alias("b")
    ham = F.bit_count(F.col("a._sh").bitwiseXOR(F.col("b._sh")))
    return (
        a.join(b, on="_bkt")
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            ham.alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )


def embedding_cosine_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    lsh_bits: int = 8,
    seed: int = 42,
) -> DataFrame:
    """Embedding near-duplicates: random-hyperplane LSH bucket join + exact
    cosine verify. Bucket key = sign bits of `lsh_bits` random projections."""
    from .similarity import cosine_col, rp_bucket_col

    b = df.select(
        F.col(id_col),
        F.col(vec_col),
        rp_bucket_col(F.col(vec_col), lsh_bits, seed, dim_hint=None).alias("_bkt"),
    )
    a = b.alias("a")
    c = b.alias("c")
    cos = cosine_col(F.col(f"a.{vec_col}"), F.col(f"c.{vec_col}"))
    return (
        a.join(c, on="_bkt")
        .filter(F.col(f"a.{id_col}") < F.col(f"c.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"c.{id_col}").alias("id_b"),
            cos.alias("cosine"),
        )
        .filter(F.col("cosine") >= threshold)
    )
