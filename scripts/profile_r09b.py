#!/usr/bin/env python
"""Round-9 profiling pass 2: minhash residue, track_region_hits and
distance_join decomposition at sf1.0."""
from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf1.0"


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def main():
    import bench

    spark = bench.make_spark(int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    sc = spark.sparkContext
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    qs = entry.queries()
    noop(qs["spatial_bbox_temporal"](spark, SF_DIR))
    noop(qs["spatial_pip_filter"](spark, "/root/testdata/sf0.001"))

    def t(label, fn):
        sc.setJobDescription(label)
        t0 = time.time()
        r = fn()
        dt = round(time.time() - t0, 3)
        print(f"  {label}: {r if r is not None else ''} ({dt}s)", file=sys.stderr, flush=True)
        sc.setJobDescription(None)

    # ---- minhash residue ---------------------------------------------------
    from geomesa_spark.operators.dedup import (
        _collect_sig_table, _ensure_parallel, _est_match_frac_gather_udf,
        _est_prefilter, _exact_verify, _lsh_candidates, _minhash_text_udf,
        _pack_sig_udf, canonicalize_exact,
    )

    d = entry._read(spark, SF_DIR, "documents")
    df = _ensure_parallel(canonicalize_exact(d, "text", "doc_id"))
    txt = df.select("doc_id", F.col("text").alias("_txt")).localCheckpoint(eager=False)
    sig = (
        txt.withColumn("_sig", _minhash_text_udf(128, 3)(F.col("_txt")))
        .filter(F.col("_sig").isNotNull())
        .withColumn("_sigb", _pack_sig_udf()(F.col("_sig")))
        .localCheckpoint(eager=False)
    )
    t("mh_sig", lambda: noop(sig))
    cand_lazy = _lsh_candidates(sig.select("doc_id", "_sig"), "doc_id", 128, 16, None)
    t("mh_cand_noop", lambda: noop(cand_lazy))
    cand = cand_lazy.localCheckpoint(eager=False)
    t("mh_cand_ckpt_count", lambda: cand.count())
    pre_lazy = _est_prefilter(cand, sig, "doc_id", 0.8, 128)
    t("mh_est_noop", lambda: noop(pre_lazy))
    pre = pre_lazy.localCheckpoint(eager=False)
    t("mh_pre_count", lambda: pre.count())
    t("mh_verify", lambda: _exact_verify(pre, txt, "doc_id", 3, 0.8).count())

    # ---- track_region_hits decomposition -----------------------------------
    from geomesa_spark.functions.library import UDFS
    from geomesa_spark.operators.spatial_join import (
        _pairwise_predicate_udf, _ref_cell_cond, _with_join_cells,
    )

    e = entry._read(spark, SF_DIR, "events")
    seg = (
        e.withColumn("ax", F.expr(entry.SEG_AX))
        .withColumn("ay", F.expr(entry.SEG_AY))
        .withColumn("bx", F.expr(entry.SEG_AX) + F.expr(entry.SEG_DX))
        .withColumn("by", F.expr(entry.SEG_AY) + F.expr(entry.SEG_DY))
        .select(
            F.col("event_id").alias("seg_id"),
            F.least("ax", "bx").alias("minx"),
            F.least("ay", "by").alias("miny"),
            F.greatest("ax", "bx").alias("maxx"),
            F.greatest("ay", "by").alias("maxy"),
            UDFS["st_makeLine"](
                F.array(
                    UDFS["st_makePoint"](F.col("ax"), F.col("ay")),
                    UDFS["st_makePoint"](F.col("bx"), F.col("by")),
                )
            ).alias("geom_wkb"),
        )
    )
    polys = entry._part_polys(spark, SF_DIR)
    t("trh_polys_count", lambda: polys.count())
    t("trh_seg_noop", lambda: noop(seg))
    # mirror of spatial_join internals (broadcast path)
    L2 = seg.select(
        *[F.col(c).alias(f"l_{c}") if c in ("minx", "miny", "maxx", "maxy") else F.col(c) for c in seg.columns]
    )
    R2 = polys.select(
        *[F.col(c).alias(f"r_{c}") if c in ("minx", "miny", "maxx", "maxy") else F.col(c) for c in polys.columns]
    )
    L3 = _with_join_cells(L2, "l_", 6)
    R3 = _with_join_cells(R2, "r_", 6)
    bbox = (
        (F.col("l_minx") <= F.col("r_maxx")) & (F.col("l_maxx") >= F.col("r_minx"))
        & (F.col("l_miny") <= F.col("r_maxy")) & (F.col("l_maxy") >= F.col("r_miny"))
    )
    joined = L3.join(F.broadcast(R3), on=["join_cell"], how="inner").filter(
        bbox & _ref_cell_cond(6)
    )
    t("trh_cand_count", lambda: joined.count())
    pred = _pairwise_predicate_udf("intersects")
    t("trh_full", lambda: joined.filter(pred(F.col("geom_wkb"), F.col("geom_wkb_r"))).count())

    # ---- distance_join variants --------------------------------------------
    from geomesa_spark.operators.knn import haversine_col
    from geomesa_spark.operators.spatial_join import (
        _distance_cell_cover, _distance_cell_cover_right,
    )

    dd = entry._docs_pts(spark, SF_DIR).select("doc_id", "x", "y")
    ee = entry._events_pts(spark, SF_DIR).select("event_id", "x", "y")
    R = ee.select(F.col("event_id"), F.col("x").alias("r_x"), F.col("y").alias("r_y"))
    lx, ly, rx, ry = F.col("x"), F.col("y"), F.col("r_x"), F.col("r_y")
    L = dd.withColumn("_jc", F.explode(_distance_cell_cover(100_000.0, lx, ly))).select(
        "doc_id", "x", "y", F.col("_jc.jcx").alias("jcx"), F.col("_jc.jcy").alias("jcy")
    )
    Rk = R.withColumn("_jc", F.explode(_distance_cell_cover_right(100_000.0, rx, ry))).select(
        "event_id", "r_x", "r_y", F.col("_jc.jcx").alias("jcx"), F.col("_jc.jcy").alias("jcy")
    )
    t("dj_join_raw_count", lambda: L.join(Rk, ["jcx", "jcy"]).count())
    dist = haversine_col(lx, ly, rx, ry)
    t("dj_full", lambda: L.join(Rk, ["jcx", "jcy"]).filter(dist <= F.lit(100_000.0)).count())
    import math
    d_deg = math.degrees(100_000.0 / 6371008.8)
    pre = (F.abs(ly - ry) <= F.lit(d_deg))
    t("dj_latpre", lambda: L.join(Rk, ["jcx", "jcy"]).filter(pre & (dist <= F.lit(100_000.0))).count())

    spark.stop()


if __name__ == "__main__":
    main()
