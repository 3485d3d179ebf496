"""pack_documents: token-budget packing via two-pass distributed prefix sum.

The correctness hazards are the distributed seams: Arrow slices one
partition into many batches (running totals must carry across them) and a
group spans many range partitions (broadcast offsets must line up). Both are
forced explicitly here; the driver gate (doc_packing) checks value parity
against a DuckDB window-cumsum oracle."""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from geomesa_spark.operators.packing import pack_documents


def _truth(rows, budget):
    """Single-threaded reference: per-group sequential fill."""
    out = {}
    run: dict = {}
    for doc_id, lang, text in sorted(rows, key=lambda r: (r[1], r[0])):
        n = len(text.lower().split(" "))
        prefix = run.get(lang, 0)
        out[doc_id] = prefix // budget
        run[lang] = prefix + n
    return out


def _rows(n):
    rows = []
    for i in range(n):
        lang = ["en", "fr", "de"][i % 3]
        text = " ".join(f"w{j}" for j in range((i * 7) % 23 + 1))
        rows.append((f"d{i:05d}", lang, text))
    return rows


def test_pack_documents_matches_reference(spark):
    rows = _rows(400)
    df = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    got = {
        r.doc_id: r.pack_id
        for r in pack_documents(df, budget_tokens=64).select(
            "doc_id", "pack_id"
        ).collect()
    }
    assert got == _truth(rows, 64)


def test_pack_documents_cross_batch_and_partition(spark):
    """Force the seams: 1-row Arrow batches (running totals must carry
    across every batch boundary) and many range partitions (offsets)."""
    rows = _rows(150)
    df = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "1")
    try:
        packed = pack_documents(
            df.repartition(16), budget_tokens=32
        )  # repartition upstream: pack_documents re-ranges it
        got = {r.doc_id: r.pack_id for r in packed.select("doc_id", "pack_id").collect()}
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
    assert got == _truth(rows, 32)


def test_pack_documents_join_fallback_parity(spark):
    """Extreme (partitions x groups) cardinality trips max_offset_entries and
    routes through the all-JVM join fallback — results must be identical to
    the broadcast path, and the fallback plan must contain no Arrow stage."""
    rows = _rows(400)
    df = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    truth = _truth(rows, 64)
    fb = pack_documents(df, budget_tokens=64, max_offset_entries=2)
    got = {r.doc_id: r.pack_id for r in fb.select("doc_id", "pack_id").collect()}
    assert got == truth
    plan = fb._jdf.queryExecution().executedPlan().toString()
    assert "mapInPandas" not in plan and "MapInPandas" not in plan
    assert "Window" in plan
    # schema parity with the broadcast path (column names AND types)
    bc = pack_documents(df, budget_tokens=64)
    assert [(f.name, f.dataType) for f in fb.schema.fields] == [
        (f.name, f.dataType) for f in bc.schema.fields
    ]
    # n_tok also carried through the fallback
    n = {r.doc_id: r.n_tok for r in fb.select("doc_id", "n_tok").limit(5).collect()}
    assert all(v >= 1 for v in n.values())


def test_pack_documents_fallback_high_cardinality_group(spark):
    """Group by a near-unique column (the anti-pattern the cap exists for):
    each doc is its own group, so every pack_id is 0 — and the driver never
    collects the O(rows) offset table."""
    rows = _rows(200)
    df = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    out = pack_documents(
        df, budget_tokens=10_000, group_col="doc_id", max_offset_entries=10
    )
    got = [r.pack_id for r in out.select("pack_id").collect()]
    assert len(got) == 200 and set(got) == {0}


def test_pack_documents_oversized_and_args(spark):
    # a doc larger than the budget still gets exactly one pack id, and the
    # stream continues after it
    rows = [
        ("a", "en", "one two"),
        ("b", "en", " ".join(["w"] * 50)),  # 50 tokens >> budget 8
        ("c", "en", "three four five"),
    ]
    df = spark.createDataFrame(rows, "doc_id string, lang string, text string")
    got = {r.doc_id: r.pack_id for r in pack_documents(df, budget_tokens=8).collect()}
    assert got == {"a": 0, "b": 0, "c": 6}  # prefix 52 // 8 = 6
    with pytest.raises(ValueError):
        pack_documents(df, budget_tokens=0)
    # n_tok column present and correct
    n = {r.doc_id: r.n_tok for r in pack_documents(df, budget_tokens=8).collect()}
    assert n == {"a": 2, "b": 50, "c": 3}
