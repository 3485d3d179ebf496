"""Interleaved A/B: fused single attach (sig+txt per side, current) vs the
pre-r7 two-phase attach (sig-only prefilter, then txt on survivors) for the
minhash_dedup exact-verify path. Fixed conditions, alternating runs, min over
k — the bisect_minhash.py methodology (this host's CPU steal makes single
runs meaningless; see CLAUDE.md traps).

Run: python scripts/bisect_attach.py [k]
"""

from __future__ import annotations

import sys
import time

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")

from geomesa_spark.operators.dedup import (  # noqa: E402
    _attach,
    _ensure_parallel,
    _exact_jaccard_udf,
    _lsh_candidates,
    _minhash_text_udf,
    _sig_match_frac_udf,
    _EST_MARGIN,
    canonicalize_exact,
)

SF = "/root/testdata/sf0.1"
THRESHOLD = 0.8
NH, BANDS, K = 128, 16, 3


def _base(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    df = canonicalize_exact(df, "text", "doc_id")
    df = _ensure_parallel(df)
    txt = df.select(F.col("doc_id"), F.col("text").alias("_txt")).localCheckpoint(
        eager=False
    )
    sig = (
        txt.withColumn("_sig", _minhash_text_udf(NH, K)(F.col("_txt")))
        .filter(F.col("_sig").isNotNull())
        .localCheckpoint(eager=False)
    )
    cand = _lsh_candidates(sig.select("doc_id", "_sig"), "doc_id", NH, BANDS, None)
    return txt, sig, cand


def fused(spark):
    txt, sig, cand = _base(spark)
    combo = sig.select("doc_id", "_txt", "_sig")
    cand = _attach(cand, combo, "doc_id", "id_a")
    cand = _attach(cand, combo, "doc_id", "id_b")
    est = _sig_match_frac_udf(NH)(F.col("_sig_id_a"), F.col("_sig_id_b"))
    cand = cand.filter(est >= THRESHOLD - _EST_MARGIN)
    jac = _exact_jaccard_udf(K)(F.col("_txt_id_a"), F.col("_txt_id_b"))
    return cand.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= THRESHOLD
    )


def twophase(spark):
    txt, sig, cand = _base(spark)
    sigs = sig.select("doc_id", "_sig")
    pre = _attach(cand, sigs, "doc_id", "id_a")
    pre = _attach(pre, sigs, "doc_id", "id_b")
    est = _sig_match_frac_udf(NH)(F.col("_sig_id_a"), F.col("_sig_id_b"))
    cand2 = pre.filter(est >= THRESHOLD - _EST_MARGIN).select("id_a", "id_b")
    cand2 = _attach(cand2, txt, "doc_id", "id_a")
    cand2 = _attach(cand2, txt, "doc_id", "id_b")
    jac = _exact_jaccard_udf(K)(F.col("_txt_id_a"), F.col("_txt_id_b"))
    return cand2.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= THRESHOLD
    )


def _ngram_base(spark):
    df = spark.read.parquet(f"{SF}/documents.parquet")
    df = canonicalize_exact(df, "text", "doc_id", carry=("lang",))
    df = _ensure_parallel(df)
    txt = df.select("doc_id", "lang", F.col("text").alias("_txt")).localCheckpoint(
        eager=False
    )
    sig = (
        txt.withColumn("_sig", _minhash_text_udf(NH, K)(F.col("_txt")))
        .filter(F.col("_sig").isNotNull())
        .localCheckpoint(eager=False)
    )
    cand = _lsh_candidates(sig.select("doc_id", "_sig"), "doc_id", NH, BANDS, None)
    return txt, sig, cand


def ngram_fused(spark):
    txt, sig, cand = _ngram_base(spark)
    cand = _attach(cand, sig, "doc_id", "id_a")
    cand = _attach(cand, sig, "doc_id", "id_b")
    est = _sig_match_frac_udf(NH)(F.col("_sig_id_a"), F.col("_sig_id_b"))
    cand = cand.filter(est >= 0.9 - _EST_MARGIN)
    cand = cand.filter(F.col("lang_id_a") == F.col("lang_id_b"))
    jac = _exact_jaccard_udf(K)(F.col("_txt_id_a"), F.col("_txt_id_b"))
    return cand.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= 0.9
    )


def ngram_twophase(spark):
    txt, sig, cand = _ngram_base(spark)
    sigs = sig.select("doc_id", "_sig")
    pre = _attach(cand, sigs, "doc_id", "id_a")
    pre = _attach(pre, sigs, "doc_id", "id_b")
    est = _sig_match_frac_udf(NH)(F.col("_sig_id_a"), F.col("_sig_id_b"))
    cand2 = pre.filter(est >= 0.9 - _EST_MARGIN).select("id_a", "id_b")
    cand2 = _attach(cand2, txt, "doc_id", "id_a")
    cand2 = _attach(cand2, txt, "doc_id", "id_b")
    cand2 = cand2.filter(F.col("lang_id_a") == F.col("lang_id_b"))
    jac = _exact_jaccard_udf(K)(F.col("_txt_id_a"), F.col("_txt_id_b"))
    return cand2.select("id_a", "id_b", jac.alias("jaccard")).filter(
        F.col("jaccard") >= 0.9
    )


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = (
        SparkSession.builder.master("local[32]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "48g")
        .config("spark.ui.showConsoleProgress", "false")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    # warm python workers
    fused(spark).write.format("noop").mode("overwrite").save()
    # result parity first
    rows_f = sorted(map(tuple, fused(spark).collect()))
    rows_t = sorted(map(tuple, twophase(spark).collect()))
    assert rows_f == rows_t, f"variant results differ: {len(rows_f)} vs {len(rows_t)}"
    print(f"parity OK: {len(rows_f)} pairs")
    rows_nf = sorted(map(tuple, ngram_fused(spark).collect()))
    rows_nt = sorted(map(tuple, ngram_twophase(spark).collect()))
    assert rows_nf == rows_nt, f"ngram variants differ: {len(rows_nf)} vs {len(rows_nt)}"
    print(f"ngram parity OK: {len(rows_nf)} pairs")
    variants = (
        ("fused", fused),
        ("twophase", twophase),
        ("ngram_fused", ngram_fused),
        ("ngram_twophase", ngram_twophase),
    )
    times = {name: [] for name, _ in variants}
    for i in range(k):
        for name, fn in variants:
            t0 = time.time()
            fn(spark).write.format("noop").mode("overwrite").save()
            times[name].append(round(time.time() - t0, 2))
    for name, ts in times.items():
        print(f"{name}: min {min(ts)} runs {ts}")


if __name__ == "__main__":
    main()
