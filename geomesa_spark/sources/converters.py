"""File + converter sources: external formats -> the engine's docs schema.

Reference analog: the converter framework (geomesa-convert) that maps
delimited text / GeoJSON / etc. into SimpleFeatures at ingest
(docs/user/convert/index.rst; SURVEY.md §2.1 "file + converter source").
Spark-first translation: each converter is a spark.read of the native
format plus PURE-COLUMN mapping into the canonical (doc_id, spans) shape,
so converted sources flow through the SAME index job (index_docs) and
planner as parquet docs — no separate ingest path, full pushdown on the
native reader (CSV/JSON scan with column pruning).

Converters return the DOCS_SCHEMA shape; call index_docs() on the result.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .docs import DOCS_SCHEMA  # noqa: F401  (schema contract re-export)


def _span(kind, text, media_ref, offset: int):
    return F.struct(
        kind.alias("kind"),
        text.alias("text"),
        media_ref.alias("media_ref"),
        F.lit(offset).cast("int").alias("offset"),
    )


def _to_docs(
    df: DataFrame,
    id_col,
    wkt_col,
    time_col,
    text_col=None,
    media_col=None,
) -> DataFrame:
    """Assemble the canonical spans array (kind/text/media_ref/offset, in
    span order — the per-row span-sequence invariant) from typed columns."""
    empty = F.lit("")
    spans = [
        _span(F.lit("text"), F.coalesce(text_col, empty) if text_col is not None else empty, empty, 0),
        _span(F.lit("geo"), F.coalesce(wkt_col, empty), empty, 1),
        _span(
            F.lit("time"),
            F.coalesce(F.date_format(time_col, "yyyy-MM-dd'T'HH:mm:ss.SSS'Z'"), empty),
            empty,
            2,
        ),
    ]
    if media_col is not None:
        spans.append(_span(F.lit("media"), empty, F.coalesce(media_col, empty), 3))
    return df.select(
        id_col.cast("string").alias("doc_id"), F.array(*spans).alias("spans")
    )


def read_wkt_csv(
    spark: SparkSession,
    path: str,
    id_col: str = "id",
    wkt_col: str = "geom",
    time_col: str = "ts",
    text_col: str | None = None,
    media_col: str | None = None,
    header: bool = True,
    delimiter: str = ",",
) -> DataFrame:
    """Delimited text with a WKT column -> docs. The CSV scan keeps Spark's
    native pushdown (column pruning; only the mapped columns are read)."""
    raw = (
        spark.read.option("header", str(header).lower())
        .option("delimiter", delimiter)
        .csv(path)
    )
    return _to_docs(
        raw,
        F.col(id_col),
        F.col(wkt_col),
        F.try_to_timestamp(F.col(time_col)),
        F.col(text_col) if text_col else None,
        F.col(media_col) if media_col else None,
    )


def read_fixed_width(
    spark: SparkSession,
    path: str,
    fields: dict[str, tuple[int, int]],
    id_col: str = "id",
    wkt_col: str = "geom",
    time_col: str = "ts",
    text_col: str | None = None,
) -> DataFrame:
    """Fixed-width text files -> docs (the geomesa-convert fixed-width
    delimited-text converter analog). `fields` maps column name ->
    (1-based start, length). Slicing is pure-Column substring+trim —
    whole-stage codegen, no Python — over Spark's native text scan."""
    raw = spark.read.text(path).filter(F.length(F.col("value")) > 0)
    cols = [
        F.trim(F.substring(F.col("value"), start, length)).alias(name)
        for name, (start, length) in fields.items()
    ]
    df = raw.select(*cols)
    return _to_docs(
        df,
        F.col(id_col),
        F.col(wkt_col),
        F.try_to_timestamp(F.col(time_col)),
        F.col(text_col) if text_col else None,
    )


def read_xml(
    spark: SparkSession,
    path: str,
    record_tag: str = "feature",
    id_field: str = "id",
    wkt_field: str = "geom",
    time_field: str = "ts",
    text_field: str | None = None,
) -> DataFrame:
    """XML files -> docs (the geomesa-convert-xml analog; its XPath surface
    restricted to child-element paths `a/b` and attributes `@name`). Files
    are read with Spark's binaryFile source and parsed INSIDE Arrow batches
    with the stdlib ElementTree — distributed by file, no driver IO, no
    external XML package."""
    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    fields = [(("id", id_field)), ("geom", wkt_field), ("ts", time_field)]
    if text_field:
        fields.append(("body", text_field))
    out_schema = StructType([StructField(n, StringType()) for n, _ in fields])

    def get(elem, spec: str):
        if spec.startswith("@"):
            return elem.get(spec[1:])
        cur = elem
        for part in spec.split("/"):
            if cur is None:
                return None
            cur = cur.find(part)
        return None if cur is None else (cur.text or "").strip()

    def decode(batches):
        import xml.etree.ElementTree as ET

        for pdf in batches:
            rows: dict[str, list] = {n: [] for n, _ in fields}
            for blob in pdf["content"]:
                root = ET.fromstring(bytes(blob).decode("utf-8"))
                recs = root.iter(record_tag)
                for rec in recs:
                    for name, spec in fields:
                        rows[name].append(get(rec, spec))
            yield pd.DataFrame(rows, dtype=object)

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.xml")
        .load(path)
        .select("content")
        .mapInPandas(decode, schema=out_schema)
    )
    return _to_docs(
        raw,
        F.col("id"),
        F.col("geom"),
        F.try_to_timestamp(F.col("ts")),
        F.col("body") if text_field else None,
    )


def read_avro(
    spark: SparkSession,
    path: str,
    id_col: str = "id",
    wkt_col: str = "geom",
    time_col: str = "ts",
    text_col: str | None = None,
    media_col: str | None = None,
) -> DataFrame:
    """Avro object-container files with a WKT column -> docs (the reference's
    geomesa-convert-avro analog). Prefers the spark-avro data source when its
    jar is deployed (adds sync-marker splitting of single huge files); in
    bare environments it decodes with the engine's pure-Python Avro reader
    (sources/avro_io.py, written from the public Avro spec) — files read via
    Spark's binaryFile source and decoded inside Arrow batches, one file per
    task, no driver IO. Timestamp-logical-type longs and ISO strings both
    work for `time_col`; unions with null map to NULL."""
    try:
        raw = spark.read.format("avro").load(path)
        return _to_docs(
            raw,
            F.col(id_col),
            F.col(wkt_col),
            F.try_to_timestamp(F.col(time_col)),
            F.col(text_col) if text_col else None,
            F.col(media_col) if media_col else None,
        )
    except Exception as e:  # jar absent -> pure-Python fallback
        # Spark's wording varies across versions ("Failed to find data
        # source" vs "Failed to find the data source"); the error class is
        # the stable signal, with a case-insensitive substring fallback.
        klass = ""
        get_klass = getattr(e, "getCondition", None) or getattr(
            e, "getErrorClass", None
        )
        if callable(get_klass):
            try:
                klass = get_klass() or ""
            except Exception:
                klass = ""
        msg = str(e).lower()
        jar_absent = (
            "DATA_SOURCE_NOT_FOUND" in klass
            or ("data source" in msg and "avro" in msg and "find" in msg)
        )
        if not jar_absent:
            raise

    import pandas as pd
    from pyspark.sql.types import StringType, StructField, StructType

    from .avro_io import read_ocf_bytes

    fields = [id_col, wkt_col, time_col]
    if text_col:
        fields.append(text_col)
    if media_col:
        fields.append(media_col)
    out_schema = StructType([StructField(f, StringType()) for f in fields])

    def decode(batches):
        for pdf in batches:
            rows: dict[str, list] = {f: [] for f in fields}
            for blob in pdf["content"]:
                _, recs = read_ocf_bytes(bytes(blob))
                for r in recs:
                    for f in fields:
                        v = r.get(f)
                        if v is None:
                            rows[f].append(None)
                        elif isinstance(v, pd.Timestamp):
                            rows[f].append(v.isoformat(sep=" "))
                        elif isinstance(v, str):
                            rows[f].append(v)
                        else:
                            rows[f].append(str(v))
            yield pd.DataFrame(rows, dtype=object)

    raw = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.avro")
        .load(path)
        .select("content")
        .mapInPandas(decode, schema=out_schema)
    )
    return _to_docs(
        raw,
        F.col(id_col),
        F.col(wkt_col),
        F.try_to_timestamp(F.col(time_col)),
        F.col(text_col) if text_col else None,
        F.col(media_col) if media_col else None,
    )


def _geojson_to_wkt_udf():
    """Arrow-batch GeoJSON-geometry-string -> WKT (bad geometries -> null)."""
    import pandas as pd
    from pyspark.sql.types import StringType

    from ..geom.geojson import from_geojson
    from ..geom.wkt import to_wkt

    def gj_to_wkt(s):  # no hints (local-import annotations trap)
        out = []
        for v in s:
            if v is None:
                out.append(None)
                continue
            try:
                out.append(to_wkt(from_geojson(v)))
            except Exception:
                out.append(None)
        return pd.Series(out, dtype=object)

    return F.pandas_udf(gj_to_wkt, StringType())


def read_json(
    spark: SparkSession,
    path: str,
    id_path: str = "$.id",
    wkt_path: str | None = None,
    geojson_geom_path: str | None = "$.geometry",
    time_path: str = "$.ts",
    text_path: str | None = None,
    media_path: str | None = None,
    record_path: str | None = None,
    multiline: bool = False,
) -> DataFrame:
    """Configurable JSON-path extraction into the docs schema — the
    geomesa-convert-json analog (arbitrary JsonPath per attribute,
    geomesa-convert/geomesa-convert-json). Paths use Spark's
    get_json_object JsonPath subset ($.a.b, $.a[0].c), evaluated JVM-side
    (whole-stage codegen, no Python); geometry comes either from
    `wkt_path` (a WKT string attribute) or `geojson_geom_path` (a GeoJSON
    geometry object, converted in one Arrow batch pass).

    `record_path` iterates a collection INSIDE each document (the
    converter framework's feature-path, e.g. "$.features" for a
    FeatureCollection): the array splats to one record per row via
    from_json(array<string>) + explode — still pure Columns.
    `multiline=True` reads whole files (one JSON document per file)
    instead of JSON-lines. Missing ids fall back to a content hash."""
    if multiline:
        raw = spark.read.text(path, wholetext=True)
    else:
        raw = spark.read.text(path).filter(F.length(F.trim(F.col("value"))) > 0)
    rec = F.col("value")
    if record_path:
        arr = F.from_json(
            F.get_json_object(F.col("value"), record_path), "array<string>"
        )
        raw = raw.select(F.explode(arr).alias("_rec"))
        rec = F.col("_rec")

    def jp(p):
        return F.get_json_object(rec, p)

    if wkt_path:
        wkt = jp(wkt_path)
    elif geojson_geom_path:
        wkt = _geojson_to_wkt_udf()(jp(geojson_geom_path))
    else:
        raise ValueError("one of wkt_path / geojson_geom_path is required")
    fid = F.coalesce(jp(id_path), F.sha2(rec, 256))
    return _to_docs(
        raw,
        fid,
        wkt,
        F.try_to_timestamp(jp(time_path)),
        jp(text_path) if text_path else None,
        jp(media_path) if media_path else None,
    )


def read_geojson_lines(
    spark: SparkSession,
    path: str,
    id_field: str = "id",
    time_field: str = "ts",
    text_field: str | None = None,
) -> DataFrame:
    """Newline-delimited GeoJSON Features -> docs. Geometry is converted
    GeoJSON->WKB->WKT inside one Arrow batch pass (the geometry kernel's
    from_geojson); ids/times/props come from `properties` via pure Columns.
    Features without an id fall back to a content hash (stable)."""
    raw = spark.read.text(path).filter(F.length(F.trim(F.col("value"))) > 0)
    geom_json = F.get_json_object(F.col("value"), "$.geometry")
    props = F.get_json_object(F.col("value"), f"$.properties.{time_field}")
    fid = F.coalesce(
        F.get_json_object(F.col("value"), "$.id"),
        F.get_json_object(F.col("value"), f"$.properties.{id_field}"),
        F.sha2(F.col("value"), 256),
    )
    text = (
        F.get_json_object(F.col("value"), f"$.properties.{text_field}")
        if text_field
        else None
    )
    wkt = _geojson_to_wkt_udf()(geom_json)
    return _to_docs(raw, fid, wkt, F.try_to_timestamp(props), text)
