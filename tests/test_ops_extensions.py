"""Tests: dedup operators (vs exact-Jaccard oracle), similarity (LSH recall),
streaming windowed aggregation, multimodal plumbing, metrics/checkpoint-resume."""

import os
import shutil

import numpy as np
import pytest
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def documents(spark):
    return spark.read.parquet(f"{SF}/documents.parquet").cache()


@pytest.fixture(scope="module")
def embeddings(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


# ------------------------------------------------------------------- dedup


def exact_jaccard_pairs(documents, threshold, k=3):
    rows = documents.select("doc_id", "lang", "text").collect()
    sh = {}
    for r in rows:
        t = r.text.lower()
        sh[r.doc_id] = (r.lang, {t[i : i + k] for i in range(len(t) - k + 1)})
    out = set()
    ids = sorted(sh)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            if sh[a][0] != sh[b][0]:
                continue
            ja = len(sh[a][1] & sh[b][1]) / len(sh[a][1] | sh[b][1])
            if ja >= threshold:
                out.add((a, b))
    return out


def test_ngram_jaccard_vs_oracle(spark, documents):
    from geomesa_spark.operators.dedup import ngram_jaccard_pairs

    got = {
        (r.id_a, r.id_b)
        for r in ngram_jaccard_pairs(documents, threshold=0.9).collect()
    }
    want = exact_jaccard_pairs(documents, 0.9)
    assert got == want
    assert len(want) > 0, "fixture should contain planted near-dups"


def test_minhash_lsh_recall(spark, documents):
    """MinHash-LSH must find the high-similarity pairs (est_jaccard is an
    unbiased estimate; at threshold .7 vs true .9 recall should be total)."""
    from geomesa_spark.operators.dedup import minhash_lsh_pairs

    got = {
        (r.id_a, r.id_b): r.est_jaccard
        for r in minhash_lsh_pairs(documents, threshold=0.7, num_hashes=64, bands=16).collect()
    }
    want = exact_jaccard_pairs(documents, 0.9)
    missing = want - set(got)
    assert not missing, f"LSH missed true near-dups: {missing}"
    for pair in want:
        assert got[pair] >= 0.7


def test_exact_dedup(spark, documents):
    from geomesa_spark.operators.dedup import exact_dedup

    dup = documents.union(documents.limit(5))
    groups = exact_dedup(dup).collect()
    assert len(groups) == 5
    assert all(g.n_dups == 2 for g in groups)


def test_simhash_finds_near_dups(spark, documents):
    from geomesa_spark.operators.dedup import simhash_pairs

    got = {(r.id_a, r.id_b) for r in simhash_pairs(documents, max_hamming=8).collect()}
    want = exact_jaccard_pairs(documents, 0.95)
    # shingle-Jaccard >= 0.95 pairs are near-identical texts; their token
    # multisets agree, so their simhash Hamming distance must be small
    assert want <= got or len(want) == 0


def test_simhash_pigeonhole_full_recall(spark, documents):
    """The multi-block construction must return EXACTLY the brute-force
    Hamming <= h pair set (pigeonhole guarantees no false negatives; the
    exact verify removes false positives)."""
    from geomesa_spark.operators.dedup import simhash_col, simhash_pairs

    h = 6
    sigs = {
        r.doc_id: r.sig
        for r in documents.select("doc_id", simhash_col(F.col("text")).alias("sig")).collect()
    }
    ids = sorted(sigs)
    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if bin(sigs[a] ^ sigs[b]).count("1") <= h
    }
    got = {(r.id_a, r.id_b) for r in simhash_pairs(documents, max_hamming=h).collect()}
    assert got == want
    assert len(want) > 0  # non-vacuous on this fixture


def test_minhash_exact_verify_full_recall(spark, documents):
    """LSH candidates + exact verify must reproduce the global exact pair set
    at threshold 0.8 (banding miss probability < 2e-18 per pair)."""
    from geomesa_spark.operators.dedup import minhash_lsh_pairs

    rows = documents.select("doc_id", "text").collect()
    sh = {r.doc_id: {r.text.lower()[i : i + 3] for i in range(len(r.text) - 2)} for r in rows}
    ids = sorted(sh)
    want = {
        (a, b)
        for i, a in enumerate(ids)
        for b in ids[i + 1 :]
        if len(sh[a] & sh[b]) / len(sh[a] | sh[b]) >= 0.8
    }
    got = {
        (r.id_a, r.id_b)
        for r in minhash_lsh_pairs(documents, threshold=0.8, verify="exact").collect()
    }
    assert got == want


def test_embedding_pairs_verified_subset(spark, embeddings):
    """Multi-table RP-LSH + exact verify: every returned pair must truly be
    >= threshold (perfect precision), and the candidate sweep must catch a
    reasonable share of the exact pair set on this fixture."""
    import numpy as np

    from geomesa_spark.operators.dedup import embedding_cosine_pairs

    rows = embeddings.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in rows])
    V = np.stack([np.asarray(r.embedding, dtype=np.float64) for r in rows])
    nv = V / np.linalg.norm(V, axis=1, keepdims=True)
    S = nv @ nv.T
    thr = 0.40
    exact = set()
    for i in range(len(ids)):
        for j in range(i + 1, len(ids)):
            if S[i, j] >= thr:
                a, b = int(ids[i]), int(ids[j])
                exact.add((min(a, b), max(a, b)))
    got = {
        (r.id_a, r.id_b)
        for r in embedding_cosine_pairs(
            embeddings, threshold=thr, lsh_bits=6, tables=8
        ).collect()
    }
    assert got <= exact  # exact verify -> no false positives
    if exact:
        assert len(got) / len(exact) >= 0.25  # documented approximate recall


def test_topk_plan_is_take_ordered(spark, embeddings):
    """top-k must plan as TakeOrderedAndProject (distributed per-partition
    local k), never a global single-partition window."""
    from geomesa_spark.operators.similarity import ann_topk_lsh, brute_force_topk

    q = [float(v) for v in embeddings.filter("vec_id = 0").first().embedding]
    for df in (
        brute_force_topk(embeddings, q, k=10),
        ann_topk_lsh(embeddings, q, k=10, bits=4, probes=2),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "TakeOrderedAndProject" in plan, plan[:2000]


# --------------------------------------------------------------- similarity


def test_brute_force_topk_vs_numpy(spark, embeddings):
    from geomesa_spark.operators.similarity import brute_force_topk

    rows = embeddings.collect()
    mat = np.array([r.embedding for r in rows], dtype=np.float64)
    ids = np.array([r.vec_id for r in rows])
    q = mat[ids == 0][0]
    sims = mat @ q / (np.linalg.norm(mat, axis=1) * np.linalg.norm(q))
    order = sorted(zip(np.round(sims, 6), -ids), key=lambda t: (-t[0], t[1]))
    want = [int(-i) for s, i in order[:10]]
    got = [r.vec_id for r in brute_force_topk(embeddings, list(q), k=10).orderBy("rank").collect()]
    assert got == want


def test_ann_lsh_contains_top1(spark, embeddings):
    from geomesa_spark.operators.similarity import ann_topk_lsh, brute_force_topk

    rows = embeddings.filter("vec_id = 0").collect()
    q = [float(v) for v in rows[0].embedding]
    exact = [r.vec_id for r in brute_force_topk(embeddings, q, k=5).orderBy("rank").collect()]
    # the sf0.001 embeddings are unclustered (max pairwise cos ~0.5), so wide
    # buckets (bits=4) are needed for a stable overlap on 500 rows
    approx = [r.vec_id for r in ann_topk_lsh(embeddings, q, k=20, bits=4, probes=4).collect()]
    # the query vector itself (top-1) must be found; decent overlap expected
    assert exact[0] in approx
    assert len(set(exact) & set(approx)) >= 2


# ---------------------------------------------------------------- streaming


def test_streaming_tile_counts(spark, tmp_path):
    from geomesa_spark.streaming.stream import windowed_tile_counts

    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "500").load()
        .withColumn("x", (F.col("value") * 7919 % 36000) / 100.0 - 180.0)
        .withColumn("y", (F.col("value") * 104729 % 18000) / 100.0 - 90.0)
        .withColumnRenamed("timestamp", "ts")
    )
    agg = windowed_tile_counts(src, zoom=2, time_col="ts", window="10 seconds", watermark="10 seconds")
    q = (
        agg.writeStream.format("memory")
        .queryName("tiles_stream")
        .outputMode("update")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        import time

        deadline = time.time() + 30
        rows = 0
        while time.time() < deadline:
            rows = spark.sql("select count(*) from tiles_stream").collect()[0][0]
            if rows > 0:
                break
            time.sleep(1)
        assert rows > 0
        bad = spark.sql(
            "select count(*) from tiles_stream where tile_x < 0 or tile_x > 3 or tile_y < 0 or tile_y > 3"
        ).collect()[0][0]
        assert bad == 0
    finally:
        q.stop()


def test_streaming_spatial_join(spark):
    """Stream-static spatial join: streamed points land only in the polygons
    that truly contain them (cell equi-join + exact refine per micro-batch)."""
    import time

    from geomesa_spark.streaming.stream import streaming_spatial_join
    from geomesa_spark.sources.docs import index_docs, synth_docs

    polys = (
        index_docs(synth_docs(spark, 200, seed=7, bbox=(-10.0, -10.0, 10.0, 10.0)))
        .filter(F.col("minx") < F.col("maxx"))
        .select(F.col("doc_id").alias("poly_id"), "geom_wkb")
    ).cache()
    n_polys = polys.count()
    assert n_polys > 0
    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "2000").load()
        .withColumn("x", (F.col("value") * 7919 % 2000) / 100.0 - 10.0)
        .withColumn("y", (F.col("value") * 104729 % 2000) / 100.0 - 10.0)
    )
    out = streaming_spatial_join(src, polys)
    q = (
        out.select("value", "x", "y", "poly_id")
        .writeStream.format("memory")
        .queryName("sjoin_stream")
        .outputMode("append")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql("select * from sjoin_stream").collect()
            if len(rows) >= 5:
                break
            time.sleep(2)
        assert q.exception() is None
        assert len(rows) >= 5, "stream-static join produced too few matches"
        # verify every emitted pair against the kernel
        from geomesa_spark.geom import algorithms as alg
        from geomesa_spark.geom.wkb import from_wkb
        from geomesa_spark.geom.core import Geometry

        geoms = {r.poly_id: bytes(r.geom_wkb) for r in polys.collect()}
        for r in rows[:50]:
            g = from_wkb(geoms[r.poly_id])
            from geomesa_spark.geom.algorithms import point

            assert alg.intersects(point(r.x, r.y), g), (r.x, r.y, r.poly_id)
    finally:
        q.stop()


def test_streaming_sessionize_tracks(spark):
    """Custom stateful operator (applyInPandasWithState): sessions close
    after the inactivity gap and report per-session point counts + geodesic
    track length accumulated incrementally in state."""
    import time

    from geomesa_spark.streaming.stream import sessionize_tracks

    import tempfile

    # FINITE file source: after the one file is consumed the feed goes idle,
    # so the 3-second inactivity gap elapses and every session times out and
    # EMITS — deterministic, unlike a continuous rate source
    srcdir = tempfile.mkdtemp(prefix="sess_src_")
    pdf_rows = []
    import datetime as _dt

    t0 = _dt.datetime.now()
    for i in range(60):
        pdf_rows.append(
            {
                "user_id": i % 3,
                "ts": t0 + _dt.timedelta(seconds=i * 0.01),
                "x": (i * 7919 % 36000) / 100.0 - 180.0,
                "y": (i * 104729 % 18000) / 100.0 - 90.0,
            }
        )
    import pandas as pd

    static = spark.createDataFrame(pd.DataFrame(pdf_rows))
    static.coalesce(1).write.mode("overwrite").parquet(srcdir)
    src = spark.readStream.schema(static.schema).parquet(srcdir)
    sess = sessionize_tracks(src, gap="3 seconds", watermark="10 seconds")
    q = (
        sess.writeStream.format("memory")
        .queryName("sessions_stream")
        .outputMode("update")
        .trigger(processingTime="1 second")
        .start()
    )
    try:
        deadline = time.time() + 60
        rows = []
        while time.time() < deadline:
            rows = spark.sql(
                "select * from sessions_stream where n_points > 0"
            ).collect()
            if len(rows) >= 3:
                break
            time.sleep(2)
        assert q.exception() is None
        assert len(rows) == 3, rows  # one closed session per user key
        assert {r.user_id for r in rows} == {"0", "1", "2"}
        assert all(r.n_points == 20 for r in rows)
        assert all(r.track_meters > 0 for r in rows)
    finally:
        q.stop()


# --------------------------------------------------------------- multimodal


def test_media_plumbing(spark):
    from geomesa_spark.multimodal.media import (
        decode_image_meta,
        extract_features,
        frame_sample,
        synth_media,
    )

    media = synth_media(spark, 60).cache()
    assert media.count() == 60
    dec = decode_image_meta(media)
    rows = dec.select("media_ref", "width", "decoded_w", "height", "decoded_h").collect()
    for r in rows:
        assert r.width == r.decoded_w and r.height == r.decoded_h
    feats = extract_features(media, dim=16)
    frow = feats.select("features").first()
    assert len(frow.features) == 16
    norm = sum(v * v for v in frow.features) ** 0.5
    assert abs(norm - 1.0) < 1e-5
    fr = frame_sample(media, every_ms=1000)
    vids = media.filter("media_type = 'video/fake'").select("media_ref", "duration_ms").collect()
    want_frames = sum(max(1, (v.duration_ms + 999) // 1000) if v.duration_ms > 0 else 1 for v in vids)
    assert fr.count() == want_frames


def test_media_real_format_raises(spark):
    from geomesa_spark.multimodal.media import _parse_header

    # PNG and baseline JPEG decode for real (pure-python codecs) — a
    # truncated blob of either is a decode error, not an unimplemented format
    with pytest.raises(ValueError):
        _parse_header(b"\x89PNG\r\n\x1a\n....")
    with pytest.raises(ValueError):
        _parse_header(b"\xff\xd8\xff\xe0\x00\x10JFIF")
    # formats with no real codec still raise the honest not-implemented marker
    with pytest.raises(NotImplementedError):
        _parse_header(b"GIF89a" + b"\x00" * 16)


def test_media_unexpected_error_logged_not_silent(spark, caplog):
    # Expected null cases (corrupt blob -> ValueError, unknown format ->
    # NotImplementedError) stay silent; anything else is a codec BUG and
    # must emit a warning before nulling (ADVICE r7)
    import logging

    from geomesa_spark.multimodal import media as m

    m._UNEXPECTED_DECODE_ERRORS.clear()
    with caplog.at_level(logging.WARNING, logger=m.__name__):
        m._log_unexpected_decode_error(ValueError("corrupt"))
        m._log_unexpected_decode_error(NotImplementedError("gif"))
        assert not caplog.records and not m._UNEXPECTED_DECODE_ERRORS
        m._log_unexpected_decode_error(TypeError("codec bug"))
        m._log_unexpected_decode_error(TypeError("same type, logged once"))
        assert len(caplog.records) == 1
        assert "codec bug" in caplog.records[0].message
    m._UNEXPECTED_DECODE_ERRORS.clear()


def test_join_docs_media(spark):
    from geomesa_spark.multimodal.media import join_docs_media, synth_media
    from geomesa_spark.sources.docs import synth_docs

    docs = synth_docs(spark, 100)
    media = synth_media(spark, 100)
    j = join_docs_media(docs, media)
    n_media_docs = docs.filter(
        F.exists("spans", lambda s: s["kind"] == F.lit("media"))
    ).count()
    assert j.count() == n_media_docs
    assert j.count() > 0


# -------------------------------------------------------- metrics/checkpoint


def test_stage_runner_resume(spark, tmp_path):
    from geomesa_spark.plans.metrics import StageRunner

    root = str(tmp_path / "pipe")
    calls = {"n": 0}

    def make():
        calls["n"] += 1
        return spark.range(100).withColumn("v", F.col("id") * 2)

    r1 = StageRunner(spark, root)
    df1 = r1.stage("s1", make)
    assert df1.count() == 100 and calls["n"] == 1
    # resume: second runner skips the completed stage
    r2 = StageRunner(spark, root)
    df2 = r2.stage("s1", make)
    assert df2.count() == 100 and calls["n"] == 1
    lin = r2.lineage()
    assert lin[0]["skipped"] is True and lin[0]["rows"] == 100


def test_partition_metrics_and_observe(spark):
    from geomesa_spark.plans.metrics import observe_rows, partition_metrics

    df = spark.range(0, 1000, 1, 8)
    pm = partition_metrics(df).collect()
    assert sum(r.rows for r in pm) == 1000
    assert len(pm) == 8
    odf, obs = observe_rows(df, "reads")
    odf.write.format("noop").mode("overwrite").save()
    assert obs.get["rows"] == 1000


def test_streaming_density_and_geofence(spark):
    from geomesa_spark.streaming.stream import (
        streaming_proximity_alerts,
        windowed_density,
    )

    src = (
        spark.readStream.format("rate").option("rowsPerSecond", "400").load()
        .withColumn("x", (F.col("value") * 7919 % 2000) / 100.0 - 10.0)
        .withColumn("y", (F.col("value") * 104729 % 2000) / 100.0 - 10.0)
        .withColumnRenamed("timestamp", "ts")
    )
    dens = windowed_density(src, (-10, -10, 10, 10), 8, 8, window="5 seconds", watermark="5 seconds")
    alerts = streaming_proximity_alerts(src, (0.0, 0.0), 300_000.0)
    q1 = dens.writeStream.format("memory").queryName("dens_stream").outputMode("update").start()
    q2 = alerts.writeStream.format("memory").queryName("alert_stream").outputMode("append").start()
    try:
        import time

        deadline = time.time() + 30
        while time.time() < deadline:
            n1 = spark.sql("select count(*) from dens_stream").collect()[0][0]
            n2 = spark.sql("select count(*) from alert_stream").collect()[0][0]
            if n1 > 0 and n2 > 0:
                break
            time.sleep(1)
        assert n1 > 0 and n2 > 0
        bad = spark.sql("select count(*) from dens_stream where i < 0 or i > 7 or j < 0 or j > 7").collect()[0][0]
        assert bad == 0
        from geomesa_spark.geom.algorithms import haversine

        for r in spark.sql("select x, y from alert_stream limit 10").collect():
            assert float(haversine(r.x, r.y, 0.0, 0.0)) <= 300_000.0
    finally:
        q1.stop()
        q2.stop()


def test_media_resize(spark):
    from geomesa_spark.multimodal.media import decode_image_meta, resize_image, synth_media

    media = synth_media(spark, 10)
    resized = resize_image(media, 64, 48)
    rows = decode_image_meta(resized).select("decoded_w", "decoded_h").collect()
    assert all(r.decoded_w == 64 and r.decoded_h == 48 for r in rows)


def test_ivf_trained_recall(spark, embeddings):
    """IVF with a TRAINED spherical-kmeans codebook: deterministic training,
    probing more cells monotonically improves recall, and full probe equals
    brute force exactly."""
    from geomesa_spark.operators.similarity import (
        ann_topk_ivf,
        brute_force_topk,
        ivf_centroids,
    )

    emb = embeddings
    qvec = [float(v) for v in emb.filter("vec_id = 3").collect()[0]["embedding"]]
    C = ivf_centroids(emb, n_centroids=8, sample_n=256)
    C2 = ivf_centroids(emb, n_centroids=8, sample_n=256)
    assert (C == C2).all()  # deterministic training
    truth = [r.vec_id for r in brute_force_topk(emb, qvec, k=10).collect()]

    def recall(nprobe):
        got = {
            r.vec_id
            for r in ann_topk_ivf(
                emb, qvec, k=10, nprobe=nprobe, centroids=C
            ).collect()
        }
        return len(got & set(truth)) / len(truth)

    r2, r8 = recall(2), recall(8)
    assert r8 == 1.0  # probing every cell == exact
    assert r2 <= r8
    assert recall(4) >= 0.5  # codebook is useful, not degenerate


# --------- regressions folded from the round-advice files (round-5 hygiene)


def test_proximity_search_antimeridian_and_pole(spark):
    """proximity_search windows split at the ±180 seam and go full-ring at
    pole touch — same seam handling as distance_join/knn windows."""
    import pandas as pd

    from geomesa_spark.operators.processes import proximity_search
    from geomesa_spark.sources.docs import index_points_df

    pdf = pd.DataFrame(
        {
            "doc_id": ["seam", "pole", "far"],
            "lon": [-179.9995, 180.0, 0.0],
            "lat": [10.0, 89.9, 0.0],
        }
    )
    docs = index_points_df(spark.createDataFrame(pdf), "lon", "lat")
    got = {
        r.doc_id
        for r in proximity_search(
            docs, [(179.9995, 10.0), (0.0, 89.95)], 100_000.0
        ).collect()
    }
    assert got == {"seam", "pole"}, got
