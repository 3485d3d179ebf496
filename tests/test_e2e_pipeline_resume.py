"""End-to-end staged pipeline with checkpoint-resume + span invariant through
the full flow (north rule: per-partition lineage, metrics, checkpoint-resumable
stages; span-sequence equality end-to-end)."""

import pytest
from pyspark.sql import functions as F

from geomesa_spark.operators.density import tile_counts
from geomesa_spark.operators.spatial_join import spatial_join
from geomesa_spark.plans.metrics import StageRunner
from geomesa_spark.sources.docs import index_docs, synth_docs, synth_docs_pdf


def test_staged_pipeline_resume_and_invariant(spark, tmp_path):
    root = str(tmp_path / "pipeline")
    region = (-3.0, -3.0, 3.0, 3.0)

    def run_pipeline():
        r = StageRunner(spark, root)
        indexed = r.stage("indexed", lambda: index_docs(synth_docs(spark, 400, bbox=region)))
        polys = r.stage(
            "polys", lambda: index_docs(synth_docs(spark, 80, seed=7, bbox=region))
        )
        joined = r.stage(
            "joined",
            lambda: spatial_join(indexed, polys, predicate="intersects"),
            inputs=["indexed", "polys"],
        )
        tiles = r.stage(
            "tiles", lambda: tile_counts(indexed, 6), inputs=["indexed"]
        )
        return r, joined, tiles

    r1, joined1, tiles1 = run_pipeline()
    assert all(not s["skipped"] for s in r1.lineage())
    n_join = joined1.count()
    assert n_join > 0

    # resume: everything is read back, nothing recomputed
    r2, joined2, tiles2 = run_pipeline()
    assert all(s["skipped"] for s in r2.lineage())
    assert joined2.count() == n_join

    # lineage records inputs + per-stage rows
    lin = {s["stage"]: s for s in r2.lineage()}
    assert lin["joined"]["inputs"] == ["indexed", "polys"]
    assert lin["indexed"]["rows"] == 400

    # span-sequence invariant THROUGH the join (kind, text, media_ref, order)
    src = {row["doc_id"]: row["spans"] for _, row in synth_docs_pdf(400, bbox=region).iterrows()}
    for row in joined2.select("doc_id", "spans").limit(50).collect():
        got = [(s.kind, s.text, s.media_ref, s.offset) for s in row.spans]
        want = [(s["kind"], s["text"], s["media_ref"], s["offset"]) for s in src[row.doc_id]]
        assert got == want

    # per-partition metrics present in the stage markers
    import json
    import os

    with open(os.path.join(root, "joined", "_STAGE_COMPLETE")) as f:
        meta = json.load(f)
    assert sum(p["rows"] for p in meta["partitions"]) == n_join
