"""Avro object-container-file reader/writer (pure Python, no jar needed).

The reference's most-used converter format beyond delimited text is Avro
(geomesa-convert-avro/, docs/user/convert/avro.rst). Spark ships Avro as an
external module (spark-avro jar) that is absent from a bare pip install, so
this module implements the PUBLIC Avro 1.x specification directly:

  - binary encoding: zigzag-varint ints/longs, little-endian float/double,
    length-prefixed bytes/strings, records/enums/arrays/maps/unions/fixed
    (https://avro.apache.org/docs/ — "Binary encoding" spec section)
  - object container files: Obj\\x01 magic, metadata map (avro.schema,
    avro.codec), 16-byte sync marker, blocks of (count, size, data, sync);
    null and deflate codecs

Execution model: `sources.converters.read_avro` reads files with Spark's
binaryFile source and decodes each file INSIDE an Arrow batch (mapInPandas)
— distributed by file, no driver-side IO. (The spark-avro jar additionally
splits single huge files at sync markers; per-file parallelism is the
documented difference. Avro ingest corpora are many-file by construction.)

The writer (null codec) exists so the converter is testable end-to-end in
environments without any Avro tooling, and doubles as an export sink.
"""

from __future__ import annotations

import io
import json
import struct
import zlib

MAGIC = b"Obj\x01"


# ----------------------------------------------------------- binary decoding


def _read_long(buf: memoryview, pos: int) -> tuple[int, int]:
    """Zigzag base-128 varint (int and long share the encoding)."""
    shift = 0
    acc = 0
    while True:
        b = buf[pos]
        pos += 1
        acc |= (b & 0x7F) << shift
        if not (b & 0x80):
            break
        shift += 7
    return (acc >> 1) ^ -(acc & 1), pos


def _read_bytes(buf: memoryview, pos: int) -> tuple[bytes, int]:
    n, pos = _read_long(buf, pos)
    return bytes(buf[pos : pos + n]), pos + n


def _decode(schema, buf: memoryview, pos: int):
    """Decode one value of `schema` (parsed JSON) at pos -> (value, pos)."""
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):  # union: long index then value
        idx, pos = _read_long(buf, pos)
        return _decode(schema[idx], buf, pos)
    else:
        t = schema["type"]
        if t == "record":
            out = {}
            for f in schema["fields"]:
                out[f["name"]], pos = _decode(f["type"], buf, pos)
            return out, pos
        if t == "enum":
            idx, pos = _read_long(buf, pos)
            return schema["symbols"][idx], pos
        if t == "fixed":
            n = schema["size"]
            return bytes(buf[pos : pos + n]), pos + n
        if t == "array":
            items = []
            while True:
                cnt, pos = _read_long(buf, pos)
                if cnt == 0:
                    break
                if cnt < 0:  # block with byte size prefix
                    cnt = -cnt
                    _, pos = _read_long(buf, pos)
                for _ in range(cnt):
                    v, pos = _decode(schema["items"], buf, pos)
                    items.append(v)
            return items, pos
        if t == "map":
            m = {}
            while True:
                cnt, pos = _read_long(buf, pos)
                if cnt == 0:
                    break
                if cnt < 0:
                    cnt = -cnt
                    _, pos = _read_long(buf, pos)
                for _ in range(cnt):
                    k, pos = _read_bytes(buf, pos)
                    m[k.decode("utf-8")], pos = _decode(schema["values"], buf, pos)
            return m, pos
        # logical types ride on a primitive "type" (handled below)

    if t == "null":
        return None, pos
    if t == "boolean":
        return buf[pos] != 0, pos + 1
    if t in ("int", "long"):
        v, pos = _read_long(buf, pos)
        if isinstance(schema, dict):
            lt = schema.get("logicalType")
            if lt in ("timestamp-millis", "timestamp-micros"):
                import pandas as pd

                unit = "ms" if lt == "timestamp-millis" else "us"
                return pd.Timestamp(v, unit=unit), pos
        return v, pos
    if t == "float":
        return struct.unpack_from("<f", buf, pos)[0], pos + 4
    if t == "double":
        return struct.unpack_from("<d", buf, pos)[0], pos + 8
    if t == "bytes":
        return _read_bytes(buf, pos)
    if t == "string":
        b, pos = _read_bytes(buf, pos)
        return b.decode("utf-8"), pos
    raise ValueError(f"unsupported Avro type: {schema!r}")


def read_ocf_bytes(data: bytes) -> tuple[dict, list]:
    """Decode a whole object container file -> (schema, records)."""
    buf = memoryview(data)
    if bytes(buf[:4]) != MAGIC:
        raise ValueError("not an Avro object container file (bad magic)")
    pos = 4
    meta = {}
    while True:
        cnt, pos = _read_long(buf, pos)
        if cnt == 0:
            break
        if cnt < 0:
            cnt = -cnt
            _, pos = _read_long(buf, pos)
        for _ in range(cnt):
            k, pos = _read_bytes(buf, pos)
            meta[k.decode("utf-8")], pos = _read_bytes(buf, pos)
    schema = json.loads(meta["avro.schema"].decode("utf-8"))
    codec = meta.get("avro.codec", b"null").decode("utf-8")
    sync = bytes(buf[pos : pos + 16])
    pos += 16
    records = []
    n = len(buf)
    while pos < n:
        cnt, pos = _read_long(buf, pos)
        size, pos = _read_long(buf, pos)
        block = buf[pos : pos + size]
        pos += size
        if codec == "deflate":
            block = memoryview(zlib.decompress(bytes(block), -15))
        elif codec != "null":
            raise ValueError(f"unsupported Avro codec: {codec}")
        bpos = 0
        for _ in range(cnt):
            v, bpos = _decode(schema, block, bpos)
            records.append(v)
        if bytes(buf[pos : pos + 16]) != sync:
            raise ValueError("Avro sync marker mismatch (corrupt block)")
        pos += 16
    return schema, records


# ----------------------------------------------------------- binary encoding


def _zigzag(v: int) -> int:
    return ((-v - 1) << 1) | 1 if v < 0 else v << 1


def _write_varint(out: io.BytesIO, v: int) -> None:
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.write(bytes([b | 0x80]))
        else:
            out.write(bytes([b]))
            break


def _write_zlong(out: io.BytesIO, v: int) -> None:
    _write_varint(out, _zigzag(int(v)))


def _write_bytes(out: io.BytesIO, b: bytes) -> None:
    _write_zlong(out, len(b))
    out.write(b)


def _encode(schema, v, out: io.BytesIO) -> None:
    if isinstance(schema, str):
        t = schema
    elif isinstance(schema, list):
        # union: pick the first branch matching the value's nullness
        if v is None:
            idx = schema.index("null")
            _write_zlong(out, idx)
            return
        idx = next(i for i, s in enumerate(schema) if s != "null")
        _write_zlong(out, idx)
        _encode(schema[idx], v, out)
        return
    else:
        t = schema["type"]
        if t == "record":
            for f in schema["fields"]:
                _encode(f["type"], v[f["name"]], out)
            return
        if t == "enum":
            _write_zlong(out, schema["symbols"].index(v))
            return
        if t == "fixed":
            out.write(v)
            return
        if t == "array":
            if v:
                _write_zlong(out, len(v))
                for item in v:
                    _encode(schema["items"], item, out)
            _write_zlong(out, 0)
            return
        if t == "map":
            if v:
                _write_zlong(out, len(v))
                for k, val in v.items():
                    _write_bytes(out, k.encode("utf-8"))
                    _encode(schema["values"], val, out)
            _write_zlong(out, 0)
            return
    if t == "null":
        return
    if t == "boolean":
        out.write(b"\x01" if v else b"\x00")
    elif t in ("int", "long"):
        _write_zlong(out, v)
    elif t == "float":
        out.write(struct.pack("<f", v))
    elif t == "double":
        out.write(struct.pack("<d", v))
    elif t == "bytes":
        _write_bytes(out, v)
    elif t == "string":
        _write_bytes(out, v.encode("utf-8"))
    else:
        raise ValueError(f"unsupported Avro type: {schema!r}")


def write_ocf_bytes(schema: dict, records: list, sync: bytes | None = None) -> bytes:
    """Encode records as a single-block, null-codec container file."""
    sync = sync or b"\x07" * 16
    out = io.BytesIO()
    out.write(MAGIC)
    meta = {
        "avro.schema": json.dumps(schema).encode("utf-8"),
        "avro.codec": b"null",
    }
    _write_zlong(out, len(meta))
    for k, v in meta.items():
        _write_bytes(out, k.encode("utf-8"))
        _write_bytes(out, v)
    _write_zlong(out, 0)
    out.write(sync)
    if records:
        body = io.BytesIO()
        for r in records:
            _encode(schema, r, body)
        payload = body.getvalue()
        _write_zlong(out, len(records))
        _write_zlong(out, len(payload))
        out.write(payload)
        out.write(sync)
    return out.getvalue()
