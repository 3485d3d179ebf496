#!/usr/bin/env python
"""Round-9 profiling: stage decomposition + cardinalities for the sf1.0
heavy gates (guide §1: measure first, noop sink, labeled jobs).

Usage: python scripts/profile_r09.py [sf_dir] [query ...]
Writes nothing to bench_out.json; prints a JSON dict of timings/counts.
"""
from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"
ONLY = set(sys.argv[2:])


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    import bench

    spark = bench.make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    sc = spark.sparkContext
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    out: dict = {"sf_dir": SF_DIR}

    def t(label, fn):
        sc.setJobDescription(label)
        t0 = time.time()
        r = fn()
        dt = round(time.time() - t0, 3)
        out[label] = r if r is not None else dt
        if r is not None:
            out[label + "_s"] = dt
        sc.setJobDescription(None)
        print(f"  {label}: {out[label]} ({dt}s)", file=sys.stderr)

    # warm: one columnar query + one pandas-UDF query
    qs = entry.queries()
    noop(qs["spatial_bbox_temporal"](spark, SF_DIR))
    noop(qs["spatial_pip_filter"](spark, "/root/testdata/sf0.001"))

    def want(name):
        return not ONLY or name in ONLY

    # ---- whole-query timings (2 runs each) --------------------------------
    for name in (
        "minhash_dedup", "embedding_dedup", "distance_join",
        "track_region_hits", "dedup_components", "ngram_dedup",
        "equals_join_snap", "simhash_dedup", "convexhull_by_type",
    ):
        if not want(name):
            continue
        for i in (1, 2):
            t(f"{name}_run{i}", lambda n=name: noop(qs[n](spark, SF_DIR)) )

    # ---- minhash_dedup stage decomposition --------------------------------
    if want("minhash_dedup"):
        from geomesa_spark.operators.dedup import (
            _ensure_parallel, _est_prefilter, _lsh_candidates,
            _minhash_text_udf, _pack_sig_udf, canonicalize_exact,
        )

        d = entry._read(spark, SF_DIR, "documents")
        t("mh_canon_count", lambda: canonicalize_exact(d, "text", "doc_id").count())
        df = _ensure_parallel(canonicalize_exact(d, "text", "doc_id"))
        txt = df.select("doc_id", F.col("text").alias("_txt")).localCheckpoint(eager=False)
        sig = (
            txt.withColumn("_sig", _minhash_text_udf(128, 3)(F.col("_txt")))
            .filter(F.col("_sig").isNotNull())
            .withColumn("_sigb", _pack_sig_udf()(F.col("_sig")))
            .localCheckpoint(eager=False)
        )
        t("mh_sig", lambda: noop(sig))
        cand = _lsh_candidates(sig.select("doc_id", "_sig"), "doc_id", 128, 16, None)
        cand = cand.localCheckpoint(eager=False)
        t("mh_cand_count", lambda: cand.count())
        pre = _est_prefilter(cand, sig, "doc_id", 0.8, 128).localCheckpoint(eager=False)
        t("mh_prefilter_count", lambda: pre.count())
        from geomesa_spark.operators.dedup import _attach, _exact_jaccard_udf
        c2 = _attach(pre, txt, "doc_id", "id_a")
        c2 = _attach(c2, txt, "doc_id", "id_b")
        jac = _exact_jaccard_udf(3)(F.col("_txt_id_a"), F.col("_txt_id_b"))
        t("mh_verify_count", lambda: c2.select("id_a", "id_b", jac.alias("j")).filter(F.col("j") >= 0.8).count())

    # ---- embedding_dedup decomposition ------------------------------------
    if want("embedding_dedup"):
        from geomesa_spark.operators.similarity import hyperplane_signs, rp_buckets_udf

        emb = entry._read(spark, SF_DIR, "embeddings")
        t("emb_count", lambda: emb.count())
        signs = hyperplane_signs(64, entry.DEDUP_LSH_BITS, entry.DEDUP_LSH_TABLES, 42)
        keyed = emb.select(
            F.col("vec_id"),
            F.posexplode(rp_buckets_udf(signs)(F.col("embedding"))).alias("tbl", "bkt"),
        ).localCheckpoint(eager=False)
        t("emb_keyed_count", lambda: keyed.count())
        t("emb_bucket_max", lambda: keyed.groupBy("tbl", "bkt").count().agg(
            F.max("count").alias("m"), F.avg("count").alias("a")).collect()[0].asDict())
        a = keyed.alias("a")
        c = keyed.alias("c")
        cand = (
            a.join(c, on=["tbl", "bkt"])
            .filter(F.col("a.vec_id") < F.col("c.vec_id"))
            .select(F.col("a.vec_id").alias("id_a"), F.col("c.vec_id").alias("id_b"))
        )
        t("emb_rawpairs_count", lambda: cand.count())
        t("emb_cand_count", lambda: cand.dropDuplicates(["id_a", "id_b"]).count())

    # ---- distance_join decomposition ---------------------------------------
    if want("distance_join"):
        from geomesa_spark.operators.spatial_join import (
            _distance_cell_cover, _distance_cell_cover_right,
        )

        d = entry._docs_pts(spark, SF_DIR).select("doc_id", "x", "y")
        e = entry._events_pts(spark, SF_DIR).select("event_id", "x", "y")
        t("dj_left_count", lambda: d.count())
        t("dj_right_count", lambda: e.count())
        lcells = d.select(F.explode(_distance_cell_cover(100_000.0, F.col("x"), F.col("y"))).alias("c"))
        t("dj_left_exploded", lambda: lcells.count())
        L = lcells.select("c.jcx", "c.jcy").groupBy("jcx", "jcy").count()
        Rc = e.select(F.explode(_distance_cell_cover_right(100_000.0, F.col("x"), F.col("y"))).alias("c")) \
             .select("c.jcx", "c.jcy").groupBy("jcx", "jcy").count()
        t("dj_cand_pairs", lambda: L.join(Rc.withColumnRenamed("count", "rc"), ["jcx", "jcy"])
              .agg(F.sum(F.col("count") * F.col("rc"))).collect()[0][0])

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
