"""Round-3 items #9/#10: Kafka-shaped streaming coverage + real PIL decode.

- The kafka VALUE-parsing transformation is source-agnostic Column code and
  is tested on a batch DataFrame with the kafka wire shape (runs in any
  env). The format('kafka') source itself needs the connector jar; that
  test skips with a documented reason when the jar is absent (this sandbox)
  and runs when present.
- The real-codec media branch (_pil_decode) runs when Pillow is importable
  (a 1x1 PNG golden); skips otherwise.
"""

import base64
import datetime as _dt

import pandas as pd
import pytest
from pyspark.sql import functions as F

from geomesa_spark.streaming.stream import (
    kafka_point_stream,
    parse_kafka_points,
    windowed_tile_counts,
)


def test_kafka_value_parsing_batch(spark):
    """Kafka wire rows -> typed points -> tile counts, in batch mode (the
    streaming transformations are the same Column expressions)."""
    t0 = _dt.datetime(2016, 1, 2, 0, 0, 0)
    rows = []
    for i in range(40):
        ts = (t0 + _dt.timedelta(seconds=30 * i)).strftime("%Y-%m-%dT%H:%M:%S")
        val = (
            '{"doc_id": "d%03d", "ts": "%s", "x": %.2f, "y": %.2f}'
            % (i, ts, (i % 8) * 40.0 - 140.0, (i % 4) * 30.0 - 45.0)
        ).encode()
        rows.append({"key": b"k", "value": val, "topic": "pts", "partition": 0, "offset": i})
    rows.append({"key": b"k", "value": b"not json", "topic": "pts", "partition": 0, "offset": 99})
    raw = spark.createDataFrame(pd.DataFrame(rows))
    pts = parse_kafka_points(raw)
    assert pts.columns == ["doc_id", "ts", "x", "y"]
    assert pts.count() == 40  # the malformed row is dropped, not fatal
    tiles = windowed_tile_counts(pts, zoom=3, window="10 minutes", watermark="0 seconds")
    got = tiles.agg(F.sum("n_docs")).collect()[0][0]
    assert got == 40


def test_kafka_source_smoke(spark):
    """format('kafka') end-to-end requires the connector jar; skip with a
    documented reason when absent (parity-neutral: the reference's Kafka
    layer is a queryable cache, docs/user/kafka/index.rst:10-14)."""
    try:
        stream = kafka_point_stream(spark, "localhost:9092", "pts")
    except Exception as e:  # AnalysisException: Failed to find data source
        if "kafka" in str(e).lower():
            pytest.skip(f"kafka connector not on classpath: {type(e).__name__}")
        raise
    assert stream.isStreaming
    assert stream.columns == ["doc_id", "ts", "x", "y"]


def test_pil_real_png_decode(spark):
    """Real-codec branch: decode an actual 1x1 PNG via Pillow when present."""
    pytest.importorskip("PIL")
    from geomesa_spark.multimodal.media import decode_image_meta

    png = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
        "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
    )
    df = spark.createDataFrame(
        pd.DataFrame({"media_ref": ["m1"], "media_type": ["image/png"], "content": [png]})
    )
    row = decode_image_meta(df).collect()[0]
    assert (row.decoded_w, row.decoded_h) == (1, 1)
    assert row.checksum is not None


def test_real_format_decode_and_degrade(spark):
    """PNG and baseline JPEG decode through the pure-python codecs with NO
    Pillow (rounds 5/6); corrupt or unsupported blobs degrade to null
    metadata — honest failure, never a job failure."""
    import numpy as np

    from geomesa_spark.multimodal.jpeg import encode_jpeg
    from geomesa_spark.multimodal.media import decode_image_meta

    png = base64.b64decode(
        "iVBORw0KGgoAAAANSUhEUgAAAAEAAAABCAYAAAAfFcSJAAAADUlEQVR42mP8"
        "z8BQDwAEhQGAhKmMIQAAAABJRU5ErkJggg=="
    )
    truncated_jpeg = b"\xff\xd8\xff\xe0\x00\x10JFIF\x00\x01" + b"\x00" * 32
    real_jpeg = encode_jpeg(np.full((8, 12), 99, dtype=np.uint8))
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_ref": ["m1", "m2", "m3"],
                "media_type": ["image/png", "image/jpeg", "image/jpeg"],
                "content": [png, truncated_jpeg, real_jpeg],
            }
        )
    )
    rows = {r.media_ref: r for r in decode_image_meta(df).collect()}
    # the 1x1 PNG decodes for real
    assert (rows["m1"].decoded_w, rows["m1"].decoded_h) == (1, 1)
    assert rows["m1"].checksum is not None
    # a real baseline JPEG decodes for real (round 6)
    assert (rows["m3"].decoded_w, rows["m3"].decoded_h) == (12, 8)
    assert rows["m3"].checksum is not None
    # a truncated JPEG (no scan) degrades to null metadata
    assert rows["m2"].decoded_w is None and rows["m2"].checksum is None


def test_adversarial_corrupt_blobs_degrade(spark):
    """ADVICE r6: corrupt blobs whose parse failures are NOT ValueError at
    the codec layer (struct.error from a truncated SOF, IndexError from a
    truncated DHT or chopped entropy data, zlib.error from a corrupt IDAT
    with a valid CRC) must still degrade to null metadata, never kill the
    job. _parse_header normalizes them all to ValueError and the UDFs catch
    Exception as the last-resort guard."""
    import struct
    import zlib

    import numpy as np

    from geomesa_spark.multimodal.jpeg import decode_jpeg, encode_jpeg
    from geomesa_spark.multimodal.media import _parse_header, decode_image_meta
    from geomesa_spark.multimodal.png import PNG_SIGNATURE

    def png_chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    truncated_sof = b"\xff\xd8\xff\xc0\x00\x11\x08"
    truncated_dht = b"\xff\xd8\xff\xc4\x00\x1f\x00\x00\x01"
    # structurally valid PNG, garbage zlib stream, CRCs recomputed so the
    # failure is zlib.error (not the codec's own CRC ValueError)
    corrupt_idat = (
        PNG_SIGNATURE
        + png_chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 4, 8, 2, 0, 0, 0))
        + png_chunk(b"IDAT", b"\x99" * 30)
        + png_chunk(b"IEND", b"")
    )
    rng = np.random.default_rng(3)
    good = encode_jpeg(rng.integers(0, 256, size=(32, 32), dtype=np.uint8))
    chopped_entropy = good[:-40]  # EOI + a run of entropy bytes removed
    short_fake = b"FAKEIMG1\x01\x02"

    blobs = [truncated_sof, truncated_dht, corrupt_idat, chopped_entropy, short_fake]
    # every class normalizes to ValueError at the _parse_header layer
    for blob in blobs:
        with pytest.raises(ValueError):
            _parse_header(blob)
    # a substantially chopped entropy segment raises (no silent zero-fill
    # pixels), while the untouched file still decodes — _BitReader guard
    with pytest.raises(ValueError, match="entropy data exhausted"):
        decode_jpeg(chopped_entropy)
    assert decode_jpeg(good)[:2] == (32, 32)
    # ... and through the Spark UDF every one degrades to null metadata
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_ref": [f"c{i}" for i in range(len(blobs))] + ["ok"],
                "media_type": ["image/x-corrupt"] * len(blobs) + ["image/jpeg"],
                "content": blobs + [good],
            }
        )
    )
    rows = {r.media_ref: r for r in decode_image_meta(df).collect()}
    for i in range(len(blobs)):
        assert rows[f"c{i}"].decoded_w is None and rows[f"c{i}"].checksum is None
    assert (rows["ok"].decoded_w, rows["ok"].decoded_h) == (32, 32)


def test_resize_real_png_roundtrip(spark):
    """resize_image on REAL PNG content re-encodes a valid PNG at the new
    dimensions with exact nearest-neighbor pixels (previously this path
    prepended the fake-format header onto the PNG tail — a corrupt hybrid,
    ADVICE r5)."""
    import numpy as np

    from geomesa_spark.multimodal.media import resize_image
    from geomesa_spark.multimodal.png import PNG_SIGNATURE, decode_png, encode_png

    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, size=(6, 4, 3), dtype=np.uint8)
    png = encode_png(px)
    df = spark.createDataFrame(
        pd.DataFrame(
            {
                "media_ref": ["p1"],
                "media_type": ["image/png"],
                "content": [png],
                "width": [4],
                "height": [6],
            }
        )
    )
    row = resize_image(df, 2, 3).collect()[0]
    blob = bytes(row.content)
    assert blob.startswith(PNG_SIGNATURE), "output must be a valid PNG"
    w, h, got = decode_png(blob)
    assert (w, h) == (2, 3)
    yi = np.minimum(np.arange(3) * 6 // 3, 5)
    xi = np.minimum(np.arange(2) * 4 // 2, 3)
    assert (got == px[yi][:, xi]).all()
