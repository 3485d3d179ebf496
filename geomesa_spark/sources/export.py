"""Export formats: BIN (16/24-byte packed), GeoJSON, Arrow.

Reference semantics:
- BIN: each row packs to 16 bytes (trackId:int32, dtg:int32-seconds,
  lat:float32, lon:float32), 24 with a label (int64)
  (BinaryOutputEncoder.scala:79-98; BinAggregatingScan.scala:26-90).
- GeoJSON: FeatureCollection of rows (SpatialRDD.scala:60-75).
- Arrow: Spark is Arrow-native — `to_arrow` returns pyarrow batches via
  the same path toPandas uses (ArrowScan parity is free)."""

from __future__ import annotations

import json
import struct

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType

from ..geom.wkb import from_wkb
from ..geom.geojson import to_geojson


def bin_encode(
    df: DataFrame,
    track_col: str,
    dtg_col: str = "ts",
    lat_col: str = "y",
    lon_col: str = "x",
    label_col: str | None = None,
    sort: bool = False,
) -> DataFrame:
    """-> single `bin` BinaryType column of 16-byte (24 with label) packed
    rows; optional within-partition dtg sort (BinSorter merge semantics are
    Spark's own orderBy when a total sort is wanted)."""
    cols = [
        F.hash(F.col(track_col)).alias("_track"),
        F.unix_timestamp(F.col(dtg_col)).cast("int").alias("_dtg"),
        F.col(lat_col).cast("float").alias("_lat"),
        F.col(lon_col).cast("float").alias("_lon"),
    ]
    if label_col:
        cols.append(F.xxhash64(F.col(label_col)).alias("_label"))
    proj = df.select(*cols)
    if sort:
        proj = proj.sortWithinPartitions("_dtg")

    has_label = label_col is not None

    def pack(batches):
        for pdf in batches:
            n = len(pdf)
            out = []
            for i in range(n):
                b = struct.pack(
                    "<iiff",
                    int(pdf["_track"].iloc[i]),
                    int(pdf["_dtg"].iloc[i]) if pd.notna(pdf["_dtg"].iloc[i]) else 0,
                    float(pdf["_lat"].iloc[i]),
                    float(pdf["_lon"].iloc[i]),
                )
                if has_label:
                    b += struct.pack("<q", int(pdf["_label"].iloc[i]))
                out.append(b)
            yield pd.DataFrame({"bin": out})

    from pyspark.sql.types import StructField, StructType

    return proj.mapInPandas(pack, StructType([StructField("bin", BinaryType())]))


def bin_decode_bytes(buf: bytes, label: bool = False) -> list[tuple]:
    """Decode a concatenation of packed BIN rows (client-side check)."""
    size = 24 if label else 16
    out = []
    for off in range(0, len(buf), size):
        t, d, la, lo = struct.unpack_from("<iiff", buf, off)
        if label:
            (lb,) = struct.unpack_from("<q", buf, off + 16)
            out.append((t, d, la, lo, lb))
        else:
            out.append((t, d, la, lo))
    return out


def to_geojson_feature_collection(
    df: DataFrame, geom_col: str = "geom_wkb", limit: int | None = 10000
) -> str:
    """FeatureCollection JSON string; all non-geometry columns become
    properties. Driver-side collect — intended for result sets, not scans."""
    props = [c for c in df.columns if c != geom_col]
    if limit:
        df = df.limit(limit)
    feats = []
    for r in df.collect():
        g = r[geom_col]
        feats.append(
            {
                "type": "Feature",
                "geometry": json.loads(to_geojson(from_wkb(bytes(g)))) if g is not None else None,
                "properties": {c: _json_safe(r[c]) for c in props},
            }
        )
    return json.dumps({"type": "FeatureCollection", "features": feats})


def write_geojson_seq(
    df: DataFrame, path: str, geom_col: str = "geom_wkb", mode: str = "overwrite"
) -> None:
    """Newline-delimited GeoJSON features (RFC 8142 text-sequence style)
    written DISTRIBUTED through the text sink — the scale path for
    full-table exports (the FeatureCollection string above is driver-side
    and capped for small result sets). One Arrow batch -> one block of JSON
    lines; no collect."""
    import pandas as pd

    props = [c for c in df.columns if c != geom_col]

    def to_lines(batches):
        for pdf in batches:
            lines = []
            for _, r in pdf.iterrows():
                g = r[geom_col]
                feat = {
                    "type": "Feature",
                    "geometry": json.loads(to_geojson(from_wkb(bytes(g))))
                    if g is not None
                    else None,
                    "properties": {c: _json_safe(r[c]) for c in props},
                }
                lines.append(json.dumps(feat))
            yield pd.DataFrame({"value": lines})

    df.mapInPandas(to_lines, schema="value string").write.mode(mode).text(path)


def _json_safe(v):
    if isinstance(v, (bytes, bytearray)):
        return v.hex()
    if hasattr(v, "isoformat"):
        return v.isoformat()
    if hasattr(v, "asDict"):
        return v.asDict()
    if isinstance(v, (list, tuple)) or type(v).__name__ == "ndarray":
        return [_json_safe(x) for x in v]
    if hasattr(v, "item"):  # numpy scalar from the Arrow batch path
        return v.item()
    return v


def to_arrow(df: DataFrame):
    """pyarrow.Table of the DataFrame (Arrow export parity — Spark's own
    Arrow collect path)."""
    import pyarrow as pa

    return pa.Table.from_pandas(df.toPandas())
