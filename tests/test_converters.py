"""File + converter sources (SURVEY §2.1): WKT-CSV and GeoJSON-lines ->
canonical docs schema -> the SAME index job and planner as parquet docs.
Closes the 'partial' converter row: external formats are first-class inputs.
"""

import json

import pytest
from pyspark.sql import functions as F

from geomesa_spark.plans.planner import spatial_filter
from geomesa_spark.sources.converters import read_geojson_lines, read_wkt_csv
from geomesa_spark.sources.docs import DOCS_SCHEMA, index_docs

BOX = "POLYGON((0 0, 20 0, 20 20, 0 20, 0 0))"


def test_wkt_csv_roundtrip(spark, tmp_path):
    p = tmp_path / "pts.csv"
    p.write_text(
        "id,geom,ts,body\n"
        'a1,POINT (5 5),2016-01-02T10:00:00,"hello world"\n'
        'a2,POINT (50 50),2016-01-03T10:00:00,"far away"\n'
        'a3,"POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))",2016-01-04T10:00:00,"an extent"\n',
    )
    docs = read_wkt_csv(spark, str(p), text_col="body")
    assert docs.schema == DOCS_SCHEMA or [f.name for f in docs.schema.fields] == [
        "doc_id",
        "spans",
    ]
    # span-sequence invariant: kinds in order, offsets 0..n
    row = docs.filter("doc_id = 'a1'").collect()[0]
    assert [s["kind"] for s in row.spans] == ["text", "geo", "time"]
    assert [s["offset"] for s in row.spans] == [0, 1, 2]
    assert row.spans[0]["text"] == "hello world"
    # flows through the standard index job + planner
    idx = index_docs(docs)
    got = {r.doc_id for r in spatial_filter(idx, BOX).select("doc_id").collect()}
    assert got == {"a1", "a3"}


def test_geojson_lines_roundtrip(spark, tmp_path):
    feats = [
        {
            "type": "Feature",
            "id": "g1",
            "geometry": {"type": "Point", "coordinates": [5.0, 6.0]},
            "properties": {"ts": "2016-01-02T10:00:00", "body": "inside"},
        },
        {
            "type": "Feature",
            "geometry": {
                "type": "Polygon",
                "coordinates": [[[1, 1], [4, 1], [4, 4], [1, 4], [1, 1]]],
            },
            "properties": {"id": "g2", "ts": "2016-01-03T10:00:00", "body": "poly"},
        },
        {
            "type": "Feature",
            "id": "g3",
            "geometry": {"type": "Point", "coordinates": [120.0, 70.0]},
            "properties": {"ts": "2016-01-04T10:00:00", "body": "outside"},
        },
    ]
    p = tmp_path / "feats.jsonl"
    p.write_text("\n".join(json.dumps(f) for f in feats) + "\n")
    docs = read_geojson_lines(spark, str(p), text_field="body")
    rows = {r.doc_id: r for r in docs.collect()}
    assert set(rows) == {"g1", "g2", "g3"}  # id field OR properties.id both work
    assert rows["g1"].spans[1]["text"].startswith("POINT")
    assert rows["g2"].spans[1]["text"].startswith("POLYGON")
    idx = index_docs(docs)
    got = {r.doc_id for r in spatial_filter(idx, BOX).select("doc_id").collect()}
    assert got == {"g1", "g2"}
    # timestamps parsed into the time span and survive the index job
    ts = {r.doc_id: r.ts for r in idx.select("doc_id", "ts").collect()}
    assert ts["g1"] is not None and ts["g1"].year == 2016


def test_csv_scan_prunes_columns(spark, tmp_path):
    """The converter keeps the native CSV scan: only mapped columns are
    read (ReadSchema shows the pruned set, not every CSV column)."""
    p = tmp_path / "wide.csv"
    p.write_text(
        "id,geom,ts,a,b,c,d\n"
        "r1,POINT (1 1),2016-01-01T00:00:00,1,2,3,4\n"
    )
    docs = read_wkt_csv(spark, str(p))
    plan = docs._jdf.queryExecution().executedPlan().toString()
    assert "ReadSchema" in plan
    read_schema = plan.split("ReadSchema:", 1)[1].splitlines()[0]
    assert "a" not in read_schema.replace("struct<", "")


def test_fixed_width_roundtrip(spark, tmp_path):
    """Fixed-width converter: pure-Column substring slicing -> docs ->
    index job -> planner (round-4; closes the geomesa-convert fixed-width
    format)."""
    # layout: id[1-4] geom[5-44] ts[45-70]
    lines = [
        "a1  POINT (5 5)                             2016-01-02T10:00:00",
        "a2  POINT (50 50)                           2016-01-03T10:00:00",
        "a3  POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))     2016-01-04T10:00:00",
    ]
    p = tmp_path / "fw.txt"
    p.write_text("\n".join(lines) + "\n")
    from geomesa_spark.sources.converters import read_fixed_width

    docs = read_fixed_width(
        spark, str(p), fields={"id": (1, 4), "geom": (5, 40), "ts": (45, 26)}
    )
    rows = {r.doc_id: r for r in docs.collect()}
    assert set(rows) == {"a1", "a2", "a3"}
    assert [s["kind"] for s in rows["a1"].spans] == ["text", "geo", "time"]
    assert [s["offset"] for s in rows["a1"].spans] == [0, 1, 2]
    idx = index_docs(docs)
    got = {r.doc_id for r in spatial_filter(idx, BOX).select("doc_id").collect()}
    assert got == {"a1", "a3"}


def test_xml_roundtrip(spark, tmp_path):
    """XML converter: per-file ElementTree parse inside Arrow batches;
    child paths and @attributes both resolve (geomesa-convert-xml analog)."""
    xml1 = """<features>
      <feature id="x1">
        <where><wkt>POINT (5 5)</wkt></where>
        <ts>2016-01-02T10:00:00</ts>
        <body>inside</body>
      </feature>
      <feature id="x2">
        <where><wkt>POINT (70 70)</wkt></where>
        <ts>2016-01-03T10:00:00</ts>
        <body>outside</body>
      </feature>
    </features>"""
    xml2 = """<features>
      <feature id="x3">
        <where><wkt>POLYGON ((1 1, 3 1, 3 3, 1 3, 1 1))</wkt></where>
        <ts>2016-01-04T10:00:00</ts>
        <body>poly</body>
      </feature>
    </features>"""
    d = tmp_path / "xml_src"
    d.mkdir()
    (d / "a.xml").write_text(xml1)
    (d / "b.xml").write_text(xml2)
    from geomesa_spark.sources.converters import read_xml

    docs = read_xml(
        spark,
        str(d),
        record_tag="feature",
        id_field="@id",
        wkt_field="where/wkt",
        time_field="ts",
        text_field="body",
    )
    rows = {r.doc_id: r for r in docs.collect()}
    assert set(rows) == {"x1", "x2", "x3"}
    assert rows["x1"].spans[0]["text"] == "inside"
    assert rows["x3"].spans[1]["text"].startswith("POLYGON")
    idx = index_docs(docs)
    got = {r.doc_id for r in spatial_filter(idx, BOX).select("doc_id").collect()}
    assert got == {"x1", "x3"}


def test_json_path_roundtrip(spark, tmp_path):
    """read_json (geomesa-convert-json analog): arbitrary JsonPath per
    attribute — nested properties, array indices, GeoJSON geometry objects
    — through the standard index job + planner."""
    from geomesa_spark.sources.converters import read_json

    recs = [
        {
            "meta": {"id": "j1", "when": "2016-01-02T10:00:00"},
            "geometry": {"type": "Point", "coordinates": [5.0, 6.0]},
            "tags": ["alpha", "beta"],
        },
        {
            "meta": {"id": "j2", "when": "2016-01-03T10:00:00"},
            "geometry": {
                "type": "Polygon",
                "coordinates": [[[1, 1], [4, 1], [4, 4], [1, 4], [1, 1]]],
            },
            "tags": ["gamma", "delta"],
        },
        {
            "meta": {"id": "j3", "when": "2016-01-04T10:00:00"},
            "geometry": {"type": "Point", "coordinates": [120.0, 70.0]},
            "tags": ["epsilon", "zeta"],
        },
    ]
    p = tmp_path / "recs.jsonl"
    p.write_text("\n".join(json.dumps(r) for r in recs) + "\n")
    docs = read_json(
        spark,
        str(p),
        id_path="$.meta.id",
        time_path="$.meta.when",
        text_path="$.tags[1]",
    )
    rows = {r.doc_id: r for r in docs.collect()}
    assert set(rows) == {"j1", "j2", "j3"}
    # span-sequence invariant holds
    assert [s["kind"] for s in rows["j1"].spans] == ["text", "geo", "time"]
    assert [s["offset"] for s in rows["j1"].spans] == [0, 1, 2]
    assert rows["j1"].spans[0]["text"] == "beta"  # array-index path
    assert rows["j2"].spans[1]["text"].startswith("POLYGON")
    idx = index_docs(docs)
    got = {r.doc_id for r in spatial_filter(idx, BOX).select("doc_id").collect()}
    assert got == {"j1", "j2"}
    ts = {r.doc_id: r.ts for r in idx.select("doc_id", "ts").collect()}
    assert ts["j3"] is not None and ts["j3"].day == 4


def test_json_record_path_collection(spark, tmp_path):
    """record_path splats a FeatureCollection-style array inside one
    document into one doc per element (the converter feature-path), with a
    WKT geometry attribute and a content-hash id fallback."""
    from geomesa_spark.sources.converters import read_json

    doc = {
        "kind": "batch",
        "features": [
            {"id": "c1", "wkt": "POINT (2 2)", "ts": "2016-01-02T00:00:00"},
            {"id": "c2", "wkt": "POINT (50 50)", "ts": "2016-01-03T00:00:00"},
            {"wkt": "POINT (3 3)", "ts": "2016-01-04T00:00:00"},  # no id
        ],
    }
    p = tmp_path / "collection.json"
    p.write_text(json.dumps(doc))
    docs = read_json(
        spark,
        str(p),
        id_path="$.id",
        wkt_path="$.wkt",
        geojson_geom_path=None,
        time_path="$.ts",
        record_path="$.features",
        multiline=True,
    )
    rows = docs.collect()
    assert len(rows) == 3
    ids = {r.doc_id for r in rows}
    assert {"c1", "c2"} <= ids
    assert len(ids) == 3  # the id-less record got a stable hash id
    idx = index_docs(docs)
    got = {r.doc_id for r in spatial_filter(idx, BOX).select("doc_id").collect()}
    assert "c1" in got and len(got) == 2  # c1 + hashed (3 3); c2 outside


def test_json_bad_rows_do_not_kill_ingest(spark, tmp_path):
    """ANSI-safety: malformed geometry / unparseable timestamps map to
    null spans, not job failure (try_to_timestamp + null-safe geometry)."""
    from geomesa_spark.sources.converters import read_json

    p = tmp_path / "bad.jsonl"
    p.write_text(
        '{"meta": {"id": "ok"}, "geometry": {"type": "Point", "coordinates": [1, 1]}, "ts": "2016-01-02T00:00:00"}\n'
        '{"meta": {"id": "badgeom"}, "geometry": {"type": "Nope"}, "ts": "2016-01-02T00:00:00"}\n'
        '{"meta": {"id": "badts"}, "geometry": {"type": "Point", "coordinates": [2, 2]}, "ts": "not a time"}\n'
    )
    docs = read_json(spark, str(p), id_path="$.meta.id", time_path="$.ts")
    rows = {r.doc_id: r for r in docs.collect()}
    assert set(rows) == {"ok", "badgeom", "badts"}
    assert rows["badgeom"].spans[1]["text"] == ""  # null geom -> empty span
    assert rows["badts"].spans[2]["text"] == ""  # unparseable ts -> empty
